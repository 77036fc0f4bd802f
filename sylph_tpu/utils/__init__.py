from .timing import stage_timer  # noqa: F401
