"""Differentiable tile rasterizer: the training-speed render engine.

The walk tracer (ops/trace.py) is the exact-parity gradient engine, but its
serially-dependent gather chain caps a 1M-ray train step near ~9 s on a
v5e. This module makes the tile rasterizer (ops/raster.py) differentiable
so training can run at raster speed, the way 3D Gaussian Splatting trains:
render whole images (tiles of ONE camera per step), backprop through the
per-tile composite with a reverse-sweep Pallas kernel, and let JAX autodiff
carry the per-pair row gradients back through the bulk gather (scatter-add)
and the row-table build to the point positions and attributes.

Loss semantics match the walk exactly (reference src/tracing/pipeline.cu
forward/backward, train.py:176-216):
  * alpha compositing in front-to-back list order with the weight-threshold
    transmittance gate,
  * transmittance-quantile depth with the in-segment closed form
    t = t_in + log(T/q)/sigma (pipeline.cu quantile extraction), including
    the backward "current depth grad" accumulation (g_q / sigma summed over
    later hits -> earlier segments' optical-depth grads),
  * gradients w.r.t. positions flow through BOTH the cell's own plane
    offsets and each neighbor's (the gather backward scatter-adds them).

The one semantic difference from the walk is shared with the inference
rasterizer: entries composite in the conservative front-to-back LIST order
(no per-pixel reorder buffer), so rare local inversions of overlapping
bounding spheres reorder adjacent intervals. 3DGS trains with exactly this
class of approximation; tests bound the divergence. Additionally the
per-segment optical depth is clamped at OD_CLAMP (=30, alpha saturated to
1 - 9e-14) so the backward transmittance reconstruction T_i = T_{i+1}
e^{od_i} (the 3DGS trick) stays in f32 range.

Backward math (per pixel, entries i in list order, reverse sweep):
  T_i = prod_{j<i} exp(-od_j),  w_i = [T_i > wt] T_i (1 - exp(-od_i))
  dL/dc_i   = w_i g_rgb
  dL/dod_i  = g_rgb . (T_{i+1} c_i - S_{i+1}) + g_alpha T_end - cdg_{i+1}
  where S_{i+1} = sum_{j>i} w_j c_j (suffix color accumulator) and
  cdg_{i+1} = sum_{j>i, q hit at j} g_q / sigma_j. The live set
  {i : T_i > wt} is a prefix whose per-pixel length the forward kernel
  records (n_live), which resolves the T>wt gate without re-walking.
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radfoam_tpu.ops.raster import (
    RasterConfig,
    _grid_dir_rows,
    _grid_shape,
    _mxu_transpose,
    _pixel_dir_rows,
    _sh_basis_rows,
    _chunk_precompute,
    bin_pairs,
    build_row_table,
    build_scene_table,
    image_to_tiles,
    pack_raster_table,
    relayout_pairs,
    tiles_to_image,
)

OD_CLAMP = 30.0  # max per-segment optical depth (see module docstring)


_KB = 8  # plane block width for the degree skip


def _block_dent(pre, e, dir_rows, kb):
    """Plane block kb's (den, t), each (_KB, P)."""
    vx, vy, vz, num, _sig, _key, _rgb = pre
    dirx, diry, dirz = dir_rows
    den = (
        vx[kb : kb + _KB, e : e + 1] * dirx
        + vy[kb : kb + _KB, e : e + 1] * diry
        + vz[kb : kb + _KB, e : e + 1] * dirz
    )
    return den, num[kb : kb + _KB, e : e + 1] / den


def _entry_interval(pre, e, dir_rows, degm):
    """Entry e's ray interval (t_out, t_in), each (1, P).

    Plane blocks past the chunk's max real degree are skipped ENTIRELY —
    including the per-plane divides, which dominate the train kernels'
    cost at K=72 vs mean degree ~15 (the inference kernel does the same,
    raster.py:_entry_from_chunk). Skipped blocks hold only padding planes
    (v = 0, num = 0 -> t = NaN) which belong to neither the entry nor the
    exit set.
    """
    K = pre[0].shape[0]
    P = dir_rows[0].shape[1]

    t_out = jnp.full((1, P), jnp.inf, jnp.float32)
    t_in = jnp.zeros((1, P), jnp.float32)
    for kb in range(0, K, _KB):
        def upd(to, ti, kb=kb):
            d_b, t_b = _block_dent(pre, e, dir_rows, kb)
            to = jnp.minimum(
                to,
                jnp.min(jnp.where(d_b > 0.0, t_b, jnp.inf), axis=0,
                        keepdims=True),
            )
            ti = jnp.maximum(
                ti,
                jnp.max(jnp.where(d_b < 0.0, t_b, 0.0), axis=0,
                        keepdims=True),
            )
            return to, ti

        t_out, t_in = jax.lax.cond(
            kb < degm, upd, lambda to, ti: (to, ti), t_out, t_in
        )
    return t_out, t_in


def _composite_train_fwd_kernel(cfg, K, A, Q, width, height, ntx,
                                has_dirs, starts_ref,
                                lens_ref, cam_ref, rows_hbm, qlv_ref,
                                *rest):
    """Forward: list-order composite + quantile depth + live count."""
    if has_dirs:
        dirs_ref, out_ref, nlive_ref, buf, sems = rest
    else:
        out_ref, nlive_ref, buf, sems = rest
        dirs_ref = None
    TS = cfg.tile
    P = TS * TS
    CE = cfg.entry_chunk
    wt = cfg.weight_threshold
    deg_col = 3 + 3 * K + A + 4

    t_id = pl.program_id(0)
    start = pl.multiple_of(starts_ref[t_id], CE)
    length = lens_ref[t_id]
    tx = t_id % ntx
    ty = t_id // ntx

    origin = (cam_ref[0], cam_ref[1], cam_ref[2])
    cam9 = tuple(cam_ref[i] for i in range(3, 12))
    intrin = tuple(cam_ref[i] for i in range(12, 16))

    if has_dirs:
        dir_rows = _grid_dir_rows(dirs_ref[0], cam9)
    else:
        dir_rows = _pixel_dir_rows(tx, ty, cam9, intrin,
                                   width=width, height=height, tile=TS)
    basis = _sh_basis_rows(*dir_rows, cfg.sh_degree)
    qlv = qlv_ref[0]  # (Q, P)

    n_chunks = pl.cdiv(length, CE)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * CE, CE)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(state):
        c, T, rr, rg, rb, qd, nlive = state

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(c % 2, c).wait()
        chunk_t = _mxu_transpose(buf[c % 2].astype(jnp.float32))
        pre = _chunk_precompute(chunk_t, origin, basis, K, A)
        sig_row = pre[4]  # (1, CE)
        rgb = pre[6]
        degm_c = jnp.max(chunk_t[deg_col : deg_col + 1])

        for e in range(CE):
            # chunk-max degree gates the plane-block skip (per-entry
            # lax.cond gating measured slower than the plane math it
            # saves — see raster._chunk_entries)
            t_out, t_in = _entry_interval(pre, e, dir_rows, degm_c)
            seg = jnp.where(
                jnp.isfinite(t_out), jnp.maximum(t_out - t_in, 0.0), 0.0
            )
            sig_e = sig_row[0:1, e : e + 1]
            in_list = c * CE + e < length
            live = in_list & (T > wt)
            od = jnp.where(live, jnp.minimum(sig_e * seg, OD_CLAMP), 0.0)
            decay = jnp.exp(-od)
            T_next = T * decay
            w = T - T_next
            color_on = sig_e > 1e-6
            c_r = jnp.where(color_on, rgb[0][e : e + 1], 0.0)
            c_g = jnp.where(color_on, rgb[1][e : e + 1], 0.0)
            c_b = jnp.where(color_on, rgb[2][e : e + 1], 0.0)
            rr = rr + w * c_r
            rg = rg + w * c_g
            rb = rb + w * c_b
            # quantile depth: T crosses level q inside this segment
            # (trace.py:240-253 / reference pipeline.cu)
            hit = live & (T >= qlv) & (T_next < qlv)  # (Q, P)
            # Mosaic cannot broadcast (1,1) -> (Q,P) in one op: widen
            # sigma to lanes first, then the (Q,P)/(1,P) divide is a
            # sublane-only broadcast
            sig_p = sig_e * (t_in * 0.0 + 1.0)  # (1, P)
            dq = t_in + jnp.log(T / qlv) / sig_p
            qd = jnp.where(hit, dq, qd)
            nlive = nlive + live.astype(jnp.float32)
            T = T_next

        return (c + 1, T, rr, rg, rb, qd, nlive)

    def cond(state):
        c, T = state[0], state[1]
        return (c < n_chunks) & (jnp.max(T) > wt)

    z = jnp.zeros((1, P), jnp.float32)
    state0 = (jnp.int32(0), jnp.ones((1, P), jnp.float32), z, z, z,
              jnp.full((Q, P), -1.0, jnp.float32), z)
    state = jax.lax.while_loop(cond, body, state0)
    c_f, T, rr, rg, rb, qd, nlive = state

    @pl.when(c_f < n_chunks)
    def _():
        get_dma(c_f % 2, c_f).wait()

    out_ref[0] = jnp.concatenate([rr, rg, rb, 1.0 - T, qd], axis=0)
    nlive_ref[0] = nlive


def _composite_train_bwd_kernel(cfg, K, A, Q, width, height, ntx,
                                has_dirs, starts_ref,
                                lens_ref, cam_ref, rows_hbm, qlv_ref,
                                fwd_ref, g_ref, nlive_ref, *rest):
    """Backward: reverse sweep emitting per-pair grads to HBM.

    drows carries the per-pair row-table cotangent EXCEPT the neighbor
    offsets; those route through the compact dnbr channel instead: per
    pair, the cfg.grad_planes highest-|dv| planes' (neighbor id, dv)
    — turning the dense N*K scatter (TPU vector-scatter wall, ~13 s at
    2M points) into a pairs*S scatter. The own-cell side of every dv
    (d p = -sum_k dv_k) is folded into the position columns exactly, so
    only sub-top-S NEIGHBOR contributions are dropped (the reference
    backward likewise touches only selected faces).

    Every chunk in this tile's [start, start + cdiv(length, CE) * CE)
    range is written (zeros for chunks past the live prefix), including
    the tail beyond the last tile's range.
    """
    if has_dirs:
        (dirs_ref, drows_hbm, dnbr_hbm, buf, sems, dbuf, osems, nbuf,
         nsems) = rest
    else:
        (drows_hbm, dnbr_hbm, buf, sems, dbuf, osems, nbuf,
         nsems) = rest
        dirs_ref = None
    TS = cfg.tile
    P = TS * TS
    CE = cfg.entry_chunk
    S = min(cfg.grad_planes, K)
    deg_col = 3 + 3 * K + A + 4
    D = (A - 1) // 3
    base = 3 + 3 * K
    Wt = base + A
    Wrow = dbuf.shape[2]
    Wnb = nbuf.shape[2]

    t_id = pl.program_id(0)
    start = pl.multiple_of(starts_ref[t_id], CE)
    length = lens_ref[t_id]
    tx = t_id % ntx
    ty = t_id // ntx

    origin = (cam_ref[0], cam_ref[1], cam_ref[2])
    ox, oy, oz = origin
    cam9 = tuple(cam_ref[i] for i in range(3, 12))
    intrin = tuple(cam_ref[i] for i in range(12, 16))

    if has_dirs:
        dir_rows = _grid_dir_rows(dirs_ref[0], cam9)
    else:
        dir_rows = _pixel_dir_rows(tx, ty, cam9, intrin,
                                   width=width, height=height, tile=TS)
    dirx, diry, dirz = dir_rows
    basis = _sh_basis_rows(*dir_rows, cfg.sh_degree)
    qlv = qlv_ref[0]  # (Q, P)
    ones_1p = dirx * 0.0 + 1.0  # (1, P)
    dmat = jnp.concatenate([dirx, diry, dirz], axis=0)  # (3, P)

    if cfg.emit_contrib:
        # valid-pixel lane mask for this tile (edge tiles are padded)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        px_i = tx * TS + col_i % TS
        py_i = ty * TS + col_i // TS
        lane_mask = ((px_i < width) & (py_i < height)).astype(jnp.float32)

    g_r = g_ref[0, 0:1]
    g_g = g_ref[0, 1:2]
    g_b = g_ref[0, 2:3]
    g_a = g_ref[0, 3:4]
    g_q = g_ref[0, 4 : 4 + Q]  # (Q, P)
    T_end = 1.0 - fwd_ref[0, 3:4]
    nlive = nlive_ref[0]  # (1, P)

    n_ct = pl.cdiv(length, CE)  # chunks to WRITE (cover the list)
    maxlive = jnp.max(nlive).astype(jnp.int32)
    n_cl = pl.cdiv(jnp.minimum(maxlive, length), CE)  # chunks to COMPUTE

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * CE, CE)],
            buf.at[slot],
            sems.at[slot],
        )

    def put_dma(slot, c):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            drows_hbm.at[pl.ds(start + c * CE, CE)],
            osems.at[slot],
        )

    def put_nbr(slot, c):
        return pltpu.make_async_copy(
            nbuf.at[slot],
            dnbr_hbm.at[pl.ds(start + c * CE, CE)],
            nsems.at[slot],
        )

    @pl.when(n_cl > 0)
    def _():
        get_dma((n_cl - 1) % 2, n_cl - 1).start()

    def body(state):
        (c, T_cur, S_r, S_g, S_b, cdg) = state
        slot = c % 2

        # puts issued two iterations ago reused these slots — drain them
        @pl.when(c + 2 < n_ct)
        def _():
            put_dma(slot, c + 2).wait()
            put_nbr(slot, c + 2).wait()

        def zero_chunk():
            dbuf[slot] = jnp.zeros((CE, Wrow), jnp.float32)
            nbuf[slot] = jnp.zeros((CE, Wnb), jnp.float32)
            return (T_cur, S_r, S_g, S_b, cdg)

        def live_chunk():
            @pl.when(c - 1 >= 0)
            def _():
                get_dma((c - 1) % 2, c - 1).start()

            get_dma(slot, c).wait()
            chunk_t = _mxu_transpose(buf[slot].astype(jnp.float32))
            pre = _chunk_precompute(chunk_t, origin, basis, K, A)
            vx, vy, vz, _num, sig_row, _key, rgb = pre
            degm_c = jnp.max(chunk_t[deg_col : deg_col + 1])
            nbrf = chunk_t[Wt + 8 : Wt + 8 + K]  # (K, CE) neighbor ids
            pxr = chunk_t[0:1] + chunk_t[Wt + 5 : Wt + 6]  # (1, CE)
            pyr = chunk_t[1:2] + chunk_t[Wt + 6 : Wt + 7]
            pzr = chunk_t[2:3] + chunk_t[Wt + 7 : Wt + 8]

            T_c, Sr, Sg, Sb, cd = T_cur, S_r, S_g, S_b, cdg
            # per-entry gradient pieces, gathered per component and
            # lane-concatenated into (rows, CE) blocks after the loop —
            # Mosaic rejects sublane concatenation of mixed-layout
            # single-lane columns, so assembly is block-wise instead
            acc = {k: [None] * CE for k in
                   ("dpx", "dpy", "dpz", "dvx", "dvy", "dvz")}
            num_pre = pre[3]  # (K, CE) plane numerators
            dnum_l = [None] * CE
            dden_l = [None] * CE
            integ_l = [None] * CE
            wg_l = [[None] * CE for _ in range(3)]
            wmax_l = [None] * CE
            for e in reversed(range(CE)):
                t_out, t_in = _entry_interval(pre, e, dir_rows, degm_c)
                seg = jnp.where(
                    jnp.isfinite(t_out), jnp.maximum(t_out - t_in, 0.0),
                    0.0,
                )
                sig_e = sig_row[0:1, e : e + 1]
                i_gl = c * CE + e
                live = (i_gl < length) & (i_gl < nlive)
                od = jnp.where(
                    live, jnp.minimum(sig_e * seg, OD_CLAMP), 0.0
                )
                T_prev = T_c * jnp.exp(od)
                w = T_prev - T_c
                color_on = sig_e > 1e-6
                c_r = jnp.where(color_on, rgb[0][e : e + 1], 0.0)
                c_g = jnp.where(color_on, rgb[1][e : e + 1], 0.0)
                c_b = jnp.where(color_on, rgb[2][e : e + 1], 0.0)

                gdot = g_r * c_r + g_g * c_g + g_b * c_b
                sdot = g_r * Sr + g_g * Sg + g_b * Sb
                dod = jnp.where(
                    live, gdot * T_c - sdot + g_a * T_end - cd, 0.0
                )

                # quantile-depth own terms (exact fwd hit reconstruction)
                hit = live & (T_prev >= qlv) & (T_c < qlv)  # (Q, P)
                g_hit = jnp.where(hit, g_q, 0.0)
                g_hit_sum = jnp.sum(g_hit, axis=0, keepdims=True)
                lnT = jnp.log(jnp.maximum(T_prev, 1e-30)) - jnp.log(qlv)
                ds_q = -jnp.sum(g_hit * lnT, axis=0, keepdims=True) / (
                    sig_e * sig_e + 1e-30
                )

                # od clamp: past the clamp the segment stops depending on
                # sigma/seg (matches fwd exactly)
                unclamped = (sig_e * seg) < OD_CLAMP
                seg_on = live & unclamped & (seg > 0.0) \
                    & jnp.isfinite(t_out)
                dseg = jnp.where(seg_on, dod * sig_e, 0.0)
                dt_out = dseg
                dt_in = -dseg + jnp.where(t_in > 0.0, g_hit_sum, 0.0)

                # per-plane cotangents, full K (the MXU reductions are
                # deferred and chunk-batched below — per-entry dot issues
                # dominated this kernel at ~18/entry)
                den = (
                    vx[:, e : e + 1] * dirx + vy[:, e : e + 1] * diry
                    + vz[:, e : e + 1] * dirz
                )  # (K, P)
                den_s = jnp.where(den == 0.0, 1.0, den)
                t = num_pre[:, e : e + 1] / den_s
                so = (den > 0.0) & (t == t_out)
                si = (den < 0.0) & (t == t_in) & (t_in > 0.0)
                dnum = (
                    jnp.where(so, dt_out, 0.0) + jnp.where(si, dt_in, 0.0)
                ) / den_s
                dden = jnp.where(so | si, -dnum * t, 0.0)
                dnum_l[e] = dnum
                dden_l[e] = dden
                integ_l[e] = (
                    jnp.where(live, dod * seg * unclamped, 0.0) + ds_q
                )
                for ch, g in ((0, g_r), (1, g_g), (2, g_b)):
                    wg_l[ch][e] = jnp.where(
                        (rgb[ch][e : e + 1] > 0.0) & color_on, w * g, 0.0
                    )

                if cfg.emit_contrib:
                    # per-view contribution is the reference's SUMMED
                    # weight over rays (pipeline.cu:80-82 atomicAdd);
                    # padding lanes of edge tiles are masked out
                    wmax_l[e] = jnp.sum(
                        w * lane_mask, axis=1, keepdims=True
                    )  # (1, 1)
                Sr = Sr + w * c_r
                Sg = Sg + w * c_g
                Sb = Sb + w * c_b
                cd = cd + g_hit_sum / jnp.maximum(sig_e, 1e-30)
                T_c = T_prev

            # chunk-batched MXU reductions: ONE pair of dots over the
            # stacked (CE*K, P) plane cotangents and one per SH channel
            # over the stacked (CE, P) integrands
            dnum_all = jnp.concatenate(dnum_l, axis=0)  # (CE*K, P)
            dden_all = jnp.concatenate(dden_l, axis=0)
            s_dnum_all = jax.lax.dot_general(
                dnum_all, ones_1p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (CE*K, 1)
            s_dden_all = jax.lax.dot_general(
                dden_all, dmat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (CE*K, 3)
            integ_all = jnp.concatenate(integ_l, axis=0)  # (CE, P)
            dsig_blk = jax.lax.dot_general(
                ones_1p, integ_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, CE)
            dcoef_blk = [
                jax.lax.dot_general(
                    basis, jnp.concatenate(wg_l[ch], axis=0),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (D, CE)
                for ch in range(3)
            ]
            for e in range(CE):
                s_dnum = s_dnum_all[e * K : (e + 1) * K]
                s_dden = s_dden_all[e * K : (e + 1) * K]
                vxe = vx[:, e : e + 1]
                vye = vy[:, e : e + 1]
                vze = vz[:, e : e + 1]
                px = pxr[0:1, e : e + 1]
                py = pyr[0:1, e : e + 1]
                pz = pzr[0:1, e : e + 1]
                dvx = s_dnum * ((px - ox) + vxe) + s_dden[:, 0:1]
                dvy = s_dnum * ((py - oy) + vye) + s_dden[:, 1:2]
                dvz = s_dnum * ((pz - oz) + vze) + s_dden[:, 2:3]
                # explicit num term + own-cell side of off = q - p
                acc["dpx"][e] = jnp.sum(
                    s_dnum * vxe - dvx, axis=0, keepdims=True
                )
                acc["dpy"][e] = jnp.sum(
                    s_dnum * vye - dvy, axis=0, keepdims=True
                )
                acc["dpz"][e] = jnp.sum(
                    s_dnum * vze - dvz, axis=0, keepdims=True
                )
                acc["dvx"][e] = dvx
                acc["dvy"][e] = dvy
                acc["dvz"][e] = dvz

            # block-wise assembly: lane-concat each component's columns
            # to (rows, CE), MXU-transpose to (CE, rows), store into the
            # output chunk at its static column range
            blk = {k: jnp.concatenate(v, axis=1) for k, v in acc.items()}
            dbuf[slot] = jnp.zeros((CE, Wrow), jnp.float32)
            dp_t = _mxu_transpose(
                jnp.concatenate([blk["dpx"], blk["dpy"], blk["dpz"]],
                                axis=0)
            )  # (CE, 3)
            dbuf[slot, :, 0:3] = dp_t
            for ch in range(3):
                dbuf[slot, :, base + ch * D : base + (ch + 1) * D] = (
                    _mxu_transpose(dcoef_blk[ch])
                )
            dbuf[slot, :, base + 3 * D : base + 3 * D + 1] = (
                _mxu_transpose(dsig_blk)
            )
            dbuf[slot, :, Wt + 5 : Wt + 8] = dp_t  # p_lo mirrors p_hi
            # compact neighbor channel: [ids(S) | dvx(S) | dvy(S) | dvz(S)]
            # — the per-entry rows are already row-major, no transpose
            # chunk-level top-S: select each entry's S highest-|dv|
            # planes over the whole (K, CE) block at once — per-entry
            # sublane reductions on (K, 1) vectors were the dominant bwd
            # cost (1/128 lane utilization); here every reduction covers
            # all CE entries
            dvx_a = blk["dvx"]
            dvy_a = blk["dvy"]
            dvz_a = blk["dvz"]
            mag = jnp.abs(dvx_a) + jnp.abs(dvy_a) + jnp.abs(dvz_a)
            kio = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            pieces = []  # 4S x (1, CE), slot-major [ids | vx | vy | vz]
            for _s in range(S):
                m = jnp.max(mag, axis=0, keepdims=True)  # (1, CE)
                cand = mag == m
                kfirst = jnp.min(
                    jnp.where(cand, kio, K), axis=0, keepdims=True
                )
                sel = (cand & (kio == kfirst)).astype(jnp.float32)
                pieces.append((
                    jnp.sum(nbrf * sel, axis=0, keepdims=True),
                    jnp.sum(dvx_a * sel, axis=0, keepdims=True),
                    jnp.sum(dvy_a * sel, axis=0, keepdims=True),
                    jnp.sum(dvz_a * sel, axis=0, keepdims=True),
                ))
                mag = jnp.where(sel > 0.0, -1.0, mag)
            s4sub = jax.lax.broadcasted_iota(
                jnp.int32, (4 * S, 1), 0
            )
            big = jnp.zeros((4 * S, CE), jnp.float32)
            for _s, pc in enumerate(pieces):
                for comp in range(4):
                    big = big + jnp.where(
                        s4sub == comp * S + _s, pc[comp], 0.0
                    )
            nbuf[slot] = jnp.zeros((CE, Wnb), jnp.float32)
            nbuf[slot, :, 0 : 4 * S] = _mxu_transpose(big)
            if cfg.emit_contrib:
                # per-pair summed compositing weight -> spare column 4S
                nbuf[slot, :, 4 * S : 4 * S + 1] = _mxu_transpose(
                    jnp.concatenate(wmax_l, axis=1)  # (1, CE)
                )
            return (T_c, Sr, Sg, Sb, cd)

        T_cur, S_r, S_g, S_b, cdg = jax.lax.cond(
            c < n_cl, live_chunk, zero_chunk
        )
        put_dma(slot, c).start()
        put_nbr(slot, c).start()
        return (c - 1, T_cur, S_r, S_g, S_b, cdg)

    def cond(state):
        return state[0] >= 0

    z = jnp.zeros((1, P), jnp.float32)
    state0 = (n_ct - 1, T_end, z, z, z, z)
    jax.lax.while_loop(cond, body, state0)

    # drain the last (up to) two outstanding put pairs
    @pl.when(n_ct > 1)
    def _():
        put_dma(1, 1).wait()
        put_nbr(1, 1).wait()

    @pl.when(n_ct > 0)
    def _():
        put_dma(0, 0).wait()
        put_nbr(0, 0).wait()

    # the tail [nstarts[n_tiles], Mp) belongs to no tile: the last grid
    # step zeroes it in place so the caller needs no masking copy (a
    # full-size copy would defeat the rows -> drows buffer aliasing)
    n_tiles = pl.num_programs(0)

    @pl.when(t_id == n_tiles - 1)
    def _():
        tail0 = pl.multiple_of(starts_ref[n_tiles], CE)
        n_tail = (drows_hbm.shape[0] - tail0) // CE
        dbuf[0] = jnp.zeros((CE, Wrow), jnp.float32)
        nbuf[0] = jnp.zeros((CE, Wnb), jnp.float32)

        def tbody(i, _):
            cp = pltpu.make_async_copy(
                dbuf.at[0],
                drows_hbm.at[pl.ds(tail0 + i * CE, CE)],
                osems.at[0],
            )
            cp.start()
            cn = pltpu.make_async_copy(
                nbuf.at[0],
                dnbr_hbm.at[pl.ds(tail0 + i * CE, CE)],
                nsems.at[0],
            )
            cn.start()
            cp.wait()
            cn.wait()
            return 0

        jax.lax.fori_loop(0, n_tail, tbody, 0)


@lru_cache(maxsize=8)
def _make_render_core(width, height, cfg, K, A, Q, N, has_dirs=False):
    """Custom-vjp differentiable render core over (points, attrs).

    The VJP is fully manual: forward builds the row table (with neighbor
    ids) OUTSIDE autodiff — so its narrow concat operands fuse like the
    inference path instead of becoming (N, 128)-padded residuals — and
    backward chains the reverse-sweep kernel's outputs by hand:
      drows --scatter by pair--> d_table --dense slices--> d_points,
      d_attrs;  dnbr (top-S planes) --scatter by neighbor id--> d_points.
    This replaces both the jnp.take VJP and the table-build VJP, whose
    dense N*K neighbor scatter is the TPU wall (DEVNOTES: 12.9 s at 2M).
    """
    ntx, nty = _grid_shape(width, height, cfg.tile)
    n_tiles = ntx * nty
    P = cfg.tile * cfg.tile
    S = min(cfg.grad_planes, K)
    Wnb = -(-(4 * S + (1 if cfg.emit_contrib else 0)) // 128) * 128
    D = (A - 1) // 3
    base = 3 + 3 * K
    Wt = base + A
    interpret = cfg.interpret or jax.default_backend() == "cpu"

    if cfg.max_pairs % cfg.entry_chunk:
        raise ValueError("max_pairs must be a multiple of entry_chunk "
                         "(the bwd kernel zeroes the tail chunk-wise)")
    fwd_kernel = partial(_composite_train_fwd_kernel, cfg, K, A, Q,
                         width, height, ntx, has_dirs)
    bwd_kernel = partial(_composite_train_bwd_kernel, cfg, K, A, Q,
                         width, height, ntx, has_dirs)
    dir_specs = (
        [pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                      memory_space=pltpu.VMEM)]
        if has_dirs else []
    )

    def run_fwd(rows, nstarts, lens, cam, qlv, dirs):
        Wrow = rows.shape[1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
                pl.BlockSpec(memory_space=pl.ANY),  # rows in HBM
                pl.BlockSpec((1, Q, P), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # qlv
            ] + dir_specs,
            out_specs=[
                pl.BlockSpec((1, 4 + Q, P), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, cfg.entry_chunk, Wrow), rows.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        args = (nstarts, lens, cam, rows, qlv) + (
            (dirs,) if has_dirs else ()
        )
        return pl.pallas_call(
            fwd_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, 4 + Q, P), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.float32),
            ],
            interpret=interpret,
        )(*args)

    def run_bwd(rows, nstarts, lens, cam, qlv, tiles, nlive, g_tiles,
                dirs):
        Wrow = rows.shape[1]
        Mp = rows.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
                pl.BlockSpec(memory_space=pl.ANY),  # rows in HBM
                pl.BlockSpec((1, Q, P), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # qlv
                pl.BlockSpec((1, 4 + Q, P), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # fwd tiles
                pl.BlockSpec((1, 4 + Q, P), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # cotangent
                pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # nlive
            ] + dir_specs,
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # drows stay in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # dnbr stays in HBM
            ],
            scratch_shapes=[
                pltpu.VMEM((2, cfg.entry_chunk, Wrow), rows.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, cfg.entry_chunk, Wrow), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, cfg.entry_chunk, Wnb), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        # alias rows -> drows: every chunk region is DMA-read strictly
        # before its gradient chunk is written back (and zero-chunks are
        # never read), so the rows residual is reused in place — the
        # difference between the 2M train step fitting HBM or not.
        # Input index 3 = rows in (nstarts, lens, cam, rows, ...).
        alias = {} if rows.dtype != jnp.float32 else {3: 0}
        args = (nstarts, lens, cam, rows, qlv, tiles, g_tiles, nlive) + (
            (dirs,) if has_dirs else ()
        )
        drows, dnbr = pl.pallas_call(
            bwd_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Mp, Wrow), jnp.float32),
                jax.ShapeDtypeStruct((Mp, Wnb), jnp.float32),
            ],
            input_output_aliases=alias,
            interpret=interpret,
        )(*args)
        return drows, dnbr

    def fwd_only(points, attrs, nbr_idx, bb_min, bb_max, cell_p, nstarts,
                 lens, cam, qlv, dirs):
        table = build_scene_table(
            points, attrs, nbr_idx, bb_min, bb_max,
            sh_degree=cfg.sh_degree, with_nbr_ids=True,
        )
        rows = jnp.take(table, cell_p, axis=0)
        return run_fwd(rows, nstarts, lens, cam, qlv, dirs), rows

    @jax.custom_vjp
    def render_core(points, attrs, nbr_idx, bb_min, bb_max, cell_p,
                    nstarts, lens, cam, qlv, dirs):
        (tiles, _), _rows = fwd_only(points, attrs, nbr_idx, bb_min,
                                     bb_max, cell_p, nstarts, lens, cam,
                                     qlv, dirs)
        return tiles

    def core_fwd(points, attrs, nbr_idx, bb_min, bb_max, cell_p, nstarts,
                 lens, cam, qlv, dirs):
        (tiles, nlive), rows = fwd_only(points, attrs, nbr_idx, bb_min,
                                        bb_max, cell_p, nstarts, lens,
                                        cam, qlv, dirs)
        return tiles, (rows, cell_p, nstarts, lens, cam, qlv, tiles,
                       nlive, dirs)

    def core_bwd(res, g_tiles):
        rows, cell_p, nstarts, lens, cam, qlv, tiles, nlive, dirs = res
        Wrow = rows.shape[1]
        drows, dnbr = run_bwd(rows, nstarts, lens, cam, qlv, tiles,
                              nlive, g_tiles, dirs)
        # per-pair row grads -> per-cell table grads (87 ms at 2.5M pairs)
        dtable = jnp.zeros((N, Wrow), jnp.float32).at[cell_p].add(drows)
        # manual build-VJP: dense slices (the offset columns are zero by
        # construction — their gradient rides the dnbr channel). p enters
        # the row as p_hi + p_lo with IDENTICAL cotangents in both column
        # groups, and d p = that cotangent ONCE (p_lo = p - p_hi has zero
        # net sensitivity) — so read only the p_hi slice.
        d_points = dtable[:, 0:3]
        d_sh = (
            dtable[:, base : base + 3 * D]
            .reshape(N, 3, D).transpose(0, 2, 1).reshape(N, 3 * D)
        )
        d_attrs = jnp.concatenate(
            [d_sh, dtable[:, base + 3 * D : base + 3 * D + 1]], axis=1
        )
        # compact neighbor-offset grads: pairs*S rows instead of N*K
        ids = dnbr[:, 0:S].astype(jnp.int32).reshape(-1)
        vals = jnp.stack(
            [dnbr[:, S : 2 * S], dnbr[:, 2 * S : 3 * S],
             dnbr[:, 3 * S : 4 * S]],
            axis=-1,
        ).reshape(-1, 3)
        d_points = d_points.at[ids].add(vals)

        zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
        return (d_points, d_attrs, zero_i(jnp.zeros((N, K), jnp.int32)),
                jnp.zeros((N, 3), jnp.float32),
                jnp.zeros((N, 3), jnp.float32), zero_i(cell_p),
                zero_i(nstarts), zero_i(lens), jnp.zeros_like(cam),
                jnp.zeros_like(qlv), jnp.zeros_like(dirs))

    render_core.defvjp(core_fwd, core_bwd)

    def error_map(points, attrs, nbr_idx, bb_min, bb_max, cell_p,
                  nstarts, lens, cam, gt_tiles, mask_tiles, wb, dirs):
        """Densification error collection for one view (reference
        scene.py:497-548): one fwd + one reverse sweep, with the loss
        cotangent formed analytically (L1 color over valid pixels).

        Returns (err (N,) position-grad norms, contrib (N,) summed
        compositing weight per point). Requires cfg.emit_contrib.
        """
        if not cfg.emit_contrib:
            raise ValueError("error_map needs cfg.emit_contrib=True")
        qlv = jnp.full((n_tiles, Q, P), 2.0, jnp.float32)  # never crossed
        (tiles, nlive), rows = fwd_only(
            points, attrs, nbr_idx, bb_min, bb_max, cell_p, nstarts,
            lens, cam, qlv, dirs,
        )
        rgb = tiles[:, 0:3]
        alpha = tiles[:, 3:4]
        rgb_out = rgb + wb * (1.0 - alpha)
        g_rgb = mask_tiles * jnp.sign(rgb_out - gt_tiles) / 3.0
        g_alpha = -wb * jnp.sum(g_rgb, axis=1, keepdims=True)
        g_tiles = jnp.concatenate(
            [g_rgb, g_alpha,
             jnp.zeros((n_tiles, Q, P), jnp.float32)], axis=1,
        )
        drows, dnbr = run_bwd(rows, nstarts, lens, cam, qlv, tiles,
                              nlive, g_tiles, dirs)
        Wrow = rows.shape[1]
        dtable = jnp.zeros((N, Wrow), jnp.float32).at[cell_p].add(drows)
        d_points = dtable[:, 0:3]
        ids = dnbr[:, 0:S].astype(jnp.int32).reshape(-1)
        vals = jnp.stack(
            [dnbr[:, S : 2 * S], dnbr[:, 2 * S : 3 * S],
             dnbr[:, 3 * S : 4 * S]],
            axis=-1,
        ).reshape(-1, 3)
        d_points = d_points.at[ids].add(vals)
        err = jnp.linalg.norm(d_points, axis=-1)
        # per-view contribution: sum of this view's per-pair weight sums
        # (reference accumulates atomicAdd per forward call; the caller
        # maxes across views, scene.py:497-548)
        contrib = jnp.zeros((N,), jnp.float32).at[cell_p].add(
            dnbr[:, 4 * S]
        )
        return err, contrib

    render_core.error_map = error_map
    return render_core


def render_train(points, attrs, nbr_idx, bb_min, bb_max, pos, fwd, rgt,
                 up, intrin, qlv_tiles, *, width, height, cfg,
                 dir_grid=None, pad_px=0.0):
    """Differentiable full-frame raster render for training steps.

    points (N, 3), attrs (N, A) ACTIVATED attributes, nbr_idx (N, K)
    padded adjacency (static per triangulation), bb_min/bb_max (N, 3)
    clamped cell bounds (culling/sort only — non-differentiable), camera
    basis + intrin (raster.fov_intrin / dataset_intrin 4-tuple),
    qlv_tiles (n_tiles, Q, P) per-pixel transmittance quantile levels
    (descending along Q to match train.py:176-180). dir_grid/pad_px:
    exact camera path (ops/dirgrid) for distorted/fisheye cameras.

    Returns ((H, W, 4 + Q) rgba + quantile-depth image, n_pairs).
    Gradients flow to points (own position, the own-cell side of every
    plane offset, the hi/lo table split, and the cfg.grad_planes
    top-|dv| neighbor contributions per pair) and attrs.
    """
    A = attrs.shape[1]
    K = nbr_idx.shape[1]
    Q = qlv_tiles.shape[1]
    N = points.shape[0]
    sg = jax.lax.stop_gradient

    cell_s, _key, starts, n_pairs = bin_pairs(
        sg(bb_min), sg(bb_max), sg(attrs[:, -1]), sg(pos), sg(fwd),
        sg(rgt), sg(up), intrin, width=width, height=height, cfg=cfg,
        pad_px=pad_px,
    )
    cell_p, nstarts, lens = relayout_pairs(
        cell_s, starts, width=width, height=height, cfg=cfg
    )

    cam = jnp.concatenate(
        [pos, fwd, rgt, up]
        + [jnp.reshape(jnp.asarray(v, jnp.float32), (1,)) for v in intrin]
    ).astype(jnp.float32)

    has_dirs = dir_grid is not None
    dirs = (
        jnp.asarray(dir_grid, jnp.float32) if has_dirs
        else jnp.zeros((1,), jnp.float32)
    )
    core = _make_render_core(width, height, cfg, K, A, Q, N, has_dirs)
    tiles = core(points, attrs, nbr_idx, sg(bb_min), sg(bb_max),
                 sg(cell_p), nstarts, lens, sg(cam), sg(qlv_tiles),
                 sg(dirs))
    img = tiles_to_image(tiles, width=width, height=height, tile=cfg.tile)
    return img, n_pairs


def render_error_map(points, attrs, nbr_idx, bb_min, bb_max, pos, fwd,
                     rgt, up, intrin, gt_rgb, *, width, height, cfg,
                     white_background=True, dir_grid=None, pad_px=0.0):
    """Per-view densification error map through the raster engine.

    Replaces the walk-engine collect_error_map inner step (reference
    scene.py:497-548, VERDICT r2 task 7): instead of re-walking every
    ray forward AND backward (~105 s/view at 2M points), this runs ONE
    raster fwd + reverse sweep with the L1-loss cotangent formed in
    closed form. Returns (err (N,) per-point position-grad norms for this
    view, contrib (N,) this view's summed compositing weight per point —
    the reference's `contribution`, accumulated per forward call and
    maxed across views by the caller). cfg must have emit_contrib=True.
    Edge-tile padding lanes are masked out of both channels.
    """
    A = attrs.shape[1]
    K = nbr_idx.shape[1]
    N = points.shape[0]

    cell_s, _key, starts, _n_pairs = bin_pairs(
        bb_min, bb_max, attrs[:, -1], pos, fwd, rgt, up, intrin,
        width=width, height=height, cfg=cfg, pad_px=pad_px,
    )
    cell_p, nstarts, lens = relayout_pairs(
        cell_s, starts, width=width, height=height, cfg=cfg
    )
    cam = jnp.concatenate(
        [pos, fwd, rgt, up]
        + [jnp.reshape(jnp.asarray(v, jnp.float32), (1,)) for v in intrin]
    ).astype(jnp.float32)

    has_dirs = dir_grid is not None
    dirs = (
        jnp.asarray(dir_grid, jnp.float32) if has_dirs
        else jnp.zeros((1,), jnp.float32)
    )
    gt_tiles = image_to_tiles(
        gt_rgb.astype(jnp.float32), width=width, height=height,
        tile=cfg.tile,
    )
    mask_tiles = image_to_tiles(
        jnp.ones((height, width, 1), jnp.float32), width=width,
        height=height, tile=cfg.tile,
    )
    wb = jnp.float32(1.0 if white_background else 0.0)
    core = _make_render_core(width, height, cfg, K, A, 1, N, has_dirs)
    return core.error_map(
        points, attrs, nbr_idx, bb_min, bb_max, cell_p, nstarts, lens,
        cam, gt_tiles, mask_tiles, wb, dirs,
    )
