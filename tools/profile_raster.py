"""Stage-level raster profile at the 2M trained-like bench scene.

Times the three frame stages (bin+sort, relayout+gather, Pallas
composite) through the exact render_frame code path, plus list-shape
statistics that explain where the time goes. Run on the TPU (no env
override) for real numbers; runs on CPU in interpreter mode too (slow).

Usage: python tools/profile_raster.py [--width W] [--height H]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, args, n, tail):
    """Median wall time of fn(*args); tail = fn of output to device_get.

    Drops the previous rep's output before each call so only one copy of
    any multi-GB stage output is ever live (the 2M scene's gathered rows
    are ~6.6 GB — two copies OOM the 16 GB HBM).
    """
    out = fn(*args)
    _ = jax.device_get(tail(out))
    ts = []
    for _ in range(n):
        out = None
        t0 = time.perf_counter()
        out = fn(*args)
        _ = jax.device_get(tail(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ce", type=int, default=16, help="entry_chunk")
    ap.add_argument("--cap", type=int, default=1 << 22, help="max_pairs")
    ap.add_argument("--rw", type=int, default=8, help="reorder_window")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float16", "bfloat16"],
                    help="row table dtype (f16 does not lower on this "
                         "Mosaic stack; bfloat16 is the working 2-byte "
                         "path)")
    ap.add_argument("--cull", type=float, default=1e-3, help="alpha_cull")
    ap.add_argument("--lcap", type=int, default=0, help="tile_list_cap")
    ap.add_argument("--away", action="store_true",
                    help="face away from the scene (near-empty tile "
                         "lists: measures the per-tile kernel floor)")
    ap.add_argument("--stats", action="store_true",
                    help="report processed entries/tile (kernel stats "
                         "mode) instead of forced pops")
    ap.add_argument("--cm", type=int, default=0,
                    help="merge_chunk (0 = entry_chunk)")
    ap.add_argument("--tile", type=int, default=16, help="tile edge px")
    ap.add_argument("--binsplit", action="store_true",
                    help="also time bin_pairs' expansion vs sort halves")
    args = ap.parse_args()
    W, H = args.width, args.height

    import bench
    from radfoam_tpu.ops import raster as R
    from radfoam_tpu.ops.camera import look_at
    from radfoam_tpu.ops.cellbound import clamp_bounds

    SH = 3
    pts, attrs, table, bb_min, bb_max = bench.build_scene()
    bb_min, bb_max, clamp_r = clamp_bounds(pts, bb_min, bb_max)
    N, K = table.shape[0], int(table.shape[1])
    A = 1 + 3 * (SH + 1) ** 2
    print(f"N={N} K={K} A={A} clamp_r={clamp_r:.3f}", flush=True)

    dtype = jnp.dtype(args.dtype)
    cfg = R.RasterConfig(
        sh_degree=SH, weight_threshold=0.05, tile=args.tile,
        max_pairs=args.cap, alpha_cull=args.cull, table_k=K,
        entry_chunk=args.ce, reorder_window=args.rw, stats=args.stats,
        tile_list_cap=args.lcap, merge_chunk=args.cm,
    )
    bbmin_d, bbmax_d = jnp.asarray(bb_min), jnp.asarray(bb_max)
    dens_d = jnp.asarray(attrs[:, -1].astype(np.float32))

    rtable = jax.jit(
        lambda p, a, t, b0, b1: R.build_scene_table(
            p, a, t, b0, b1, sh_degree=SH, dtype=dtype)
    )(jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
      bbmin_d, bbmax_d)
    # NB: block_until_ready over the axon tunnel does not reliably wait
    # for remote completion (DEVNOTES gotcha) — the table build's multi-GB
    # XLA temps must be retired before the next stage launches or the two
    # overlap and OOM the 16 GB HBM. device_get of a slice really waits.
    _ = jax.device_get(rtable[:2, :2])
    Wrow = rtable.shape[1]
    print(f"row table: {rtable.shape} {rtable.dtype} CE={args.ce} "
          f"({rtable.size * dtype.itemsize / 1e9:.2f} GB)", flush=True)

    eye = np.array([4.5, 0.0, 1.5])
    target = [9.0, 0.0, 3.0] if args.away else [0, 0, 0]
    cam = look_at(eye, target, [0, 0, 1], fov=1.0, width=W, height=H)
    pos, fwd, rgt, up = [jnp.asarray(np.asarray(x, np.float32)) for x in
                         (cam.position, cam.forward, cam.right, cam.up)]
    fov = jnp.float32(1.0)

    # ---- stage 1: bin + sort
    intrin = R.fov_intrin(fov, width=W, height=H)
    bin_fn = jax.jit(lambda b0, b1, dd, p, f, r, u: R.bin_pairs(
        b0, b1, dd, p, f, r, u, intrin, width=W, height=H, cfg=cfg))
    t_bin, out = timed(bin_fn, (bbmin_d, bbmax_d, dens_d, pos, fwd, rgt, up),
                       args.reps, lambda o: o[3])
    cell_s, key_cell, starts, n_pairs = out
    print(f"bin+sort: {t_bin*1000:.1f} ms  n_pairs={int(n_pairs)}",
          flush=True)

    if args.binsplit:
        # expansion half alone, then the sort alone on its outputs
        exp_fn = jax.jit(lambda b0, b1, dd, p, f, r, u: R._bin_expand(
            b0, b1, dd, p, f, r, u, intrin, width=W, height=H, cfg=cfg))
        t_exp, eo = timed(
            exp_fn, (bbmin_d, bbmax_d, dens_d, pos, fwd, rgt, up),
            args.reps, lambda o: o[3])
        fused, cell = eo[0], eo[1]
        sort_fn = jax.jit(
            lambda f, c: jax.lax.sort((f, c), num_keys=1))
        t_sort, _ = timed(sort_fn, (fused, cell), args.reps,
                          lambda o: o[1][:2])
        print(f"  bin split: expand {t_exp*1000:.1f} ms, "
              f"sort {t_sort*1000:.1f} ms "
              f"(M={fused.shape[0]})", flush=True)

    lens_np = np.asarray(starts[1:] - starts[:-1])
    nz = lens_np[lens_np > 0]
    if nz.size == 0:
        nz = np.zeros(1, np.int64)  # --away: empty lists
    print("entries/tile: nonzero %d/%d mean %.0f p50 %d p90 %d p99 %d max %d"
          % ((lens_np > 0).sum(), lens_np.size, nz.mean(),
             *np.percentile(nz, [50, 90, 99]).astype(int), nz.max()),
          flush=True)

    # ---- stage 2: relayout + gather
    def rg(rt, cs, st):
        cell_p, nstarts, lens = R.relayout_pairs(
            cs, st, width=W, height=H, cfg=cfg)
        return jnp.take(rt, cell_p, axis=0), nstarts, lens

    rg_fn = jax.jit(rg)
    t_g, out = timed(rg_fn, (rtable, cell_s, starts), max(args.reps - 2, 1),
                     lambda o: o[0][:2, :2])
    rows, nstarts, lens = out
    gb = rows.size * rows.dtype.itemsize / 1e9
    print(f"relayout+gather: {t_g*1000:.1f} ms  rows={rows.shape} "
          f"({gb:.2f} GB)", flush=True)

    # sub-timing: the index re-layout alone (scatter-seed + cummax +
    # takes) vs the big row gather it feeds
    rl_fn = jax.jit(lambda cs, st: R.relayout_pairs(
        cs, st, width=W, height=H, cfg=cfg)[0])
    t_rl, _ = timed(rl_fn, (cell_s, starts), args.reps,
                    lambda o: o[:2])
    print(f"  relayout indices only: {t_rl*1000:.1f} ms "
          f"(row gather ~{(t_g - t_rl)*1000:.1f} ms)", flush=True)

    # ---- stage 3: Pallas composite
    cam_v = jnp.concatenate(
        [pos, fwd, rgt, up]
        + [jnp.reshape(jnp.asarray(v, jnp.float32), (1,)) for v in intrin])
    comp_fn = jax.jit(lambda rows, ns, ls, cv: R.composite_pallas(
        rows, ns, ls, cv, width=W, height=H, cfg=cfg, K=K, A=A))
    t_c, out = timed(comp_fn, (rows, nstarts, lens, cam_v), args.reps,
                     lambda o: o[0][:2])
    tiles, forced = out
    if args.stats:
        proc = np.asarray(forced)[:, 0, 0]
        live = np.minimum(proc, lens_np)
        print("processed entries/tile: total %d (%.0f%% of pairs) mean "
              "%.0f p50 %d p90 %d p99 %d max %d"
              % (live.sum(), 100.0 * live.sum() / max(lens_np.sum(), 1),
                 live.mean(), *np.percentile(live, [50, 90, 99]).astype(int),
                 live.max()), flush=True)
    print(f"composite: {t_c*1000:.1f} ms  forced={float(jnp.sum(forced)):.0f}",
          flush=True)
    del rows, tiles, forced, out  # free ~7 GB before the fused e2e pass

    tot = t_bin + t_g + t_c
    print(f"STAGES {1000*tot:.1f} ms -> {1/tot:.2f} fps "
          f"(bin {100*t_bin/tot:.0f}% gather {100*t_g/tot:.0f}% "
          f"composite {100*t_c/tot:.0f}%)", flush=True)

    # ---- end-to-end staged render (the product path — bench.py)
    rf = lambda rt, b0, b1, dd, p, f, r, u: R.render_frame_staged(
        rt, b0, b1, dd, p, f, r, u, fov, width=W, height=H, cfg=cfg)
    t_e2e, out = timed(rf, (rtable, bbmin_d, bbmax_d, dens_d,
                            pos, fwd, rgt, up),
                       args.reps, lambda o: o[0][:2, :2])
    print(f"E2E staged render: {t_e2e*1000:.1f} ms -> {1/t_e2e:.2f} fps",
          flush=True)


if __name__ == "__main__":
    main()
