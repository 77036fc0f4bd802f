"""Process-wide thread budget (the reference's global rayon pool, -t).

sylph sizes ONE global rayon pool from `-t` (src/sketch.rs:133-136,
src/contain.rs:136-139); every parallel stage draws from it. Here the
streaming-ingest stages (BGZF inflate, parse+seed workers) size their
pools from the CPU count by default — the CLI entry points register the
user's `-t` so those pools never exceed it.
"""

from typing import Optional

_BUDGET: Optional[int] = None


def set_thread_budget(n: Optional[int]) -> None:
    global _BUDGET
    _BUDGET = int(n) if n else None


def cap_workers(default: int) -> int:
    """default, capped to the registered budget (>= 1)."""
    if _BUDGET is None:
        return default
    return max(1, min(default, _BUDGET))
