"""Microbenchmarks for the fused seed kernel's primitive costs (dev tool).

Times tiny Pallas kernels on the attached chip to attribute the
seed_pack_pallas budget: lane rolls (full/half width), ALU chains, the
hash, prefix-sum, butterfly route. Usage: python scripts/kbench.py
"""
import functools
import os
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 256, 256                 # one seed-kernel tile
NTILE = 256                     # tiles per dispatch (= one 65536-read batch)
N = R * NTILE


def timeit(fn, *args, reps=30):
    out = fn(*args)
    _ = float(np.asarray(out.reshape(-1)[:1].astype(jnp.int32).sum()))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(np.asarray(out.reshape(-1)[:1].astype(jnp.int32).sum()))
    return (time.perf_counter() - t0) / reps


def make(kern_body, n_out=1):
    def kern(x_ref, *o_refs):
        outs = kern_body(x_ref[...])
        if not isinstance(outs, tuple):
            outs = (outs,)
        for r, o in zip(o_refs, outs):
            r[...] = o

    spec = pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern, grid=(NTILE,), in_specs=[spec],
        out_specs=tuple([spec] * n_out) if n_out > 1 else spec,
        out_shape=tuple(jax.ShapeDtypeStruct((N, L), jnp.uint32)
                        for _ in range(n_out)) if n_out > 1
        else jax.ShapeDtypeStruct((N, L), jnp.uint32),
    )
    return jax.jit(f)


def roll_chain(n, width):
    def body(x):
        if width == L:
            for i in range(n):
                x = pltpu.roll(x, 1 + (i % 7), axis=1)
            return x
        xl, xr = x[:, :width], x[:, width:]
        for i in range(n // 2):
            xl = pltpu.roll(xl, 1 + (i % 7), axis=1)
            xr = pltpu.roll(xr, 1 + (i % 7), axis=1)
        return jnp.concatenate([xl, xr], axis=1)
    return body


def alu_chain(n):
    def body(x):
        y = x
        for i in range(n):
            y = y + (x >> np.uint32(1 + (i % 7)))
        return y
    return body


def sublane_roll_chain(n):
    def body(x):
        for i in range(n):
            x = pltpu.roll(x, 1 + (i % 7), axis=0)
        return x
    return body


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 2**32, size=(N, L), dtype=np.uint32))

    base = timeit(make(lambda v: v), x)
    print(f"identity (HBM rt):        {base*1e3:8.3f} ms", flush=True)

    for n in (16, 64):
        t = timeit(make(alu_chain(n)), x)
        print(f"alu x{n:3d}:                 {t*1e3:8.3f} ms "
              f"({(t-base)/n*1e6:6.2f} us/op)")
    for n in (16, 64):
        t = timeit(make(roll_chain(n, L)), x)
        print(f"roll256 x{n:3d}:             {t*1e3:8.3f} ms "
              f"({(t-base)/n*1e6:6.2f} us/op)")
    for n in (16, 64):
        t = timeit(make(roll_chain(n, L // 2)), x)
        print(f"roll128x2 x{n:3d}:           {t*1e3:8.3f} ms "
              f"({(t-base)/n*1e6:6.2f} us/op-pair)")
    for n in (16, 64):
        t = timeit(make(sublane_roll_chain(n)), x)
        print(f"sublane roll x{n:3d}:        {t*1e3:8.3f} ms "
              f"({(t-base)/n*1e6:6.2f} us/op)")

    # the real kernels for reference
    from sylph_tpu.tpu.pallas_seeding import (seed_pack_pallas,
                                              seed_pack_pallas_t)
    lengths = jax.device_put(np.full(N, L, np.int32))
    codes = jax.device_put((x & np.uint32(3)))
    f = functools.partial(seed_pack_pallas, c=200, k=31)
    t = timeit(lambda b, ln: f(b, ln)[0], codes, lengths)
    print(f"seed_pack_pallas:         {t*1e3:8.3f} ms  "
          f"({N*L/t/1e9:.2f} Gbp/s)")
    codes_t = jax.device_put(np.ascontiguousarray(
        np.asarray(codes).T))
    for lanes in (256, 512, 1024):
        ft = functools.partial(seed_pack_pallas_t, c=200, k=31, lanes=lanes)
        t = timeit(lambda b, ln: ft(b, ln)[0], codes_t, lengths)
        print(f"seed_pack_pallas_t l{lanes:4d}: {t*1e3:8.3f} ms  "
              f"({N*L/t/1e9:.2f} Gbp/s)", flush=True)

    # transpose-included: row-major input -> XLA transpose -> _t kernel
    @jax.jit
    def tr_then_t(b, ln):
        return seed_pack_pallas_t(b.T, ln, c=200, k=31, lanes=512)[0]
    t = timeit(tr_then_t, codes, lengths)
    print(f"transpose + _t l512:      {t*1e3:8.3f} ms  "
          f"({N*L/t/1e9:.2f} Gbp/s)", flush=True)


if __name__ == "__main__":
    main()
