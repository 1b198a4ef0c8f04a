"""Characterize the bulk row-gather cost model on the TPU.

The frame's stage-2 gather (rows = table[cell_p]) measured ~66M rows/s
at BOTH 1536 B and 768 B rows (prof sweep, 2026-08-17), i.e. row-rate
bound, not byte bound. This sweeps row width x dtype x index layout to
find where the knee is — if narrow rows gather no faster, the only
lever on stage 2 is fewer rows (tighter pair caps); if they do, a
two-tier row table is worth building.

Usage: python tools/gather_model.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, n=5):
    out = fn(*args)
    _ = jax.device_get(out[:2, :2])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = jax.device_get(out[:2, :2])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    N = 2_097_152
    M = 3_407_872  # ~ the tight-cap padded pair count
    rng = np.random.default_rng(0)
    # tile-sorted-ish indices: sorted blocks of ~300 with random bases,
    # matching the frame's per-tile depth-sorted lists
    base = rng.integers(0, N, M // 300 + 1)
    idx = np.minimum(
        base[:, None] + np.arange(300)[None, :] * 7, N - 1
    ).reshape(-1)[:M].astype(np.int32)
    idx_d = jnp.asarray(idx)

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    # build the table on device — a 3.2 GB host upload over the axon
    # tunnel takes longer than every measurement combined
    base_tbl = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (N, 384))
    )()
    for dt in (jnp.float32, jnp.bfloat16):
        tbl = base_tbl.astype(dt)
        for W in (384, 256, 128):
            t = timed(take, tbl[:, :W], idx_d)
            gb = M * W * tbl.dtype.itemsize / 1e9
            print(
                f"dtype={jnp.dtype(dt).name:9s} W={W:4d} "
                f"{t*1000:7.1f} ms  {M/t/1e6:6.0f} M rows/s  "
                f"{gb/t:6.0f} GB/s(out)",
                flush=True,
            )


if __name__ == "__main__":
    main()
