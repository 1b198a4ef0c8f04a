"""Host-only incremental-retriangulation benchmark (VERDICT r3 task 4).

Measures the native engine's full rebuild vs the incremental repair path
(cold margin cache, then warm steady-state scans) under training-like
motion: EVERY point moves a little each optimizer step and the
triangulation cadence is <= 100 steps, so the repair scan sees global
small deltas, not a sparse moved set (reference delete_violations.cu:7-32
re-checks all tets per incremental rebuild too).

Pure host C++ through the ctypes backend — no JAX, safe to run while the
TPU tunnel is busy.

Usage: python tools/retri_bench.py --points 500000 --reps 3
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=500_000)
    ap.add_argument("--motion", type=float, default=1e-6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from radfoam_tpu.delaunay import Triangulation

    rng = np.random.default_rng(args.seed)
    # clustered foam like a trained scene: gaussian blobs + background
    n = args.points
    centers = rng.standard_normal((64, 3)).astype(np.float32)
    blob = centers[rng.integers(0, 64, n)] + 0.15 * rng.standard_normal(
        (n, 3)
    ).astype(np.float32)
    pts = blob.astype(np.float32)

    t0 = time.time()
    tri = Triangulation(pts)
    t_full = time.time() - t0
    pts = pts[tri.permutation()]
    print(f"full build: {t_full:.1f}s  n_tets={tri.tets().shape[0]}",
          flush=True)

    t0 = time.time()
    tri.rebuild(pts + 0, incremental=False)
    print(f"warm full rebuild: {time.time() - t0:.1f}s", flush=True)

    cur = pts.copy()
    for rep in range(args.reps):
        cur = cur + rng.standard_normal(cur.shape).astype(
            np.float32
        ) * args.motion
        t0 = time.time()
        tri.rebuild(cur, incremental=True)
        dt = time.time() - t0
        stats = getattr(tri._backend, "last_update_stats", None)
        label = "cold" if rep == 0 else "warm"
        print(f"incremental rep {rep} ({label} cache): {dt:.1f}s "
              f"stats={stats}", flush=True)


if __name__ == "__main__":
    main()
