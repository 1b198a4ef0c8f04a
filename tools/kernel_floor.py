"""Decompose the composite kernel's cost: per-tile floor vs per-chunk.

Runs composite_pallas over the full 1080p tile grid with synthetic
lists of a uniform length L per tile (L = 0 -> pure grid + setup floor;
L = 16, 32, ... -> adds chunk cost). The real frame has mean ~2.5 LIVE
chunks/tile after early exit, so fitting time(L) localizes where the
~200 ms composite goes (prof 2026-08-17: only 13% of pairs are ever
composited, yet composite time barely moves with entry math changes).

Usage: python tools/kernel_floor.py [--rw 8] [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rw", type=int, default=8)
    ap.add_argument("--ce", type=int, default=16)
    ap.add_argument("--k", type=int, default=72)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from radfoam_tpu.ops import raster as R

    W, H = 1920, 1080
    SH = 3
    K = args.k
    A = 1 + 3 * (SH + 1) ** 2
    CE = args.ce
    ntx, nty = R._grid_shape(W, H, 16)
    n_tiles = ntx * nty
    Wrow = -(-(3 + 3 * K + A + 8) // 128) * 128
    dtype = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)
    cfg = R.RasterConfig(
        sh_degree=SH, weight_threshold=0.05, tile=16, max_pairs=1 << 20,
        table_k=K, entry_chunk=CE, reorder_window=args.rw,
    )
    cam = jnp.asarray(
        np.concatenate([
            np.array([4.5, 0.0, 1.5], np.float32),        # pos
            np.array([-1.0, 0.0, 0.0], np.float32),       # fwd
            np.array([0.0, 1.0, 0.0], np.float32),        # rgt
            np.array([0.0, 0.0, 1.0], np.float32),        # up
            np.asarray(R.fov_intrin(1.0, width=W, height=H), np.float32),
        ])
    )

    for L in (0, 16, 32, 64):
        Lp = max(L, CE)
        Mp = n_tiles * Lp + CE
        # plausible row content: small offsets, low density, real degree
        rows_np = np.zeros((Mp, Wrow), np.float32)
        rows_np[:, 0:3] = rng.uniform(-1, 1, (Mp, 3))
        rows_np[:, 3 : 3 + 3 * K] = rng.standard_normal((Mp, 3 * K)) * 0.05
        rows_np[:, 3 + 3 * K : 3 + 3 * K + A] = 0.1
        rows_np[:, 3 + 3 * K + A - 1] = 0.2  # sigma: no early exit
        rows_np[:, 3 + 3 * K + A + 3] = 0.05  # extent
        rows_np[:, 3 + 3 * K + A + 4] = 16.0  # degree
        rows = jnp.asarray(rows_np).astype(dtype)
        nstarts = jnp.asarray(
            np.arange(n_tiles + 1, dtype=np.int32) * Lp
        )
        lens = jnp.full((n_tiles,), L, jnp.int32)

        fn = jax.jit(lambda r, s, l, c: R.composite_pallas(
            r, s, l, c, width=W, height=H, cfg=cfg, K=K, A=A))
        out = fn(rows, nstarts, lens, cam)
        _ = jax.device_get(out[0][:2])
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(rows, nstarts, lens, cam)
            _ = jax.device_get(out[0][:2])
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        print(f"L={L:3d}  {t*1000:7.1f} ms   "
              f"({t/n_tiles*1e6:.2f} us/tile)", flush=True)


if __name__ == "__main__":
    main()
