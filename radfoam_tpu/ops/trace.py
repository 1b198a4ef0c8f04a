"""Differentiable Voronoi-cell ray tracing — the engine.

This is the TPU-native equivalent of the reference's CUDA megakernels
(src/tracing/pipeline.cu): the per-ray walk through the Voronoi adjacency
graph with alpha compositing, transmittance-quantile depth extraction,
per-point contribution accumulation, and the handwritten analytic backward
pass (attribute gradients + 3-point position stencil).

Design (SURVEY.md §7.1), tuned to measured TPU gather behavior:
  * The irregular CSR walk becomes a vectorized walk over a fixed-degree
    padded neighbor table ``nbr_idx (N, K)`` (padding = self index, rejected
    by the same ``offset . dir > 0`` test that rejects backfacing faces,
    reference tracing_utils.cuh:62).
  * The data-dependent walk length (<= max_intersections, pipeline.h:15-19)
    becomes a ``lax.while_loop`` over a large ray chunk with a per-lane
    active mask.
  * Gather economics on TPU (measured on v5e): a row gather costs a large
    fixed overhead per *op* and a tiny marginal cost per row. Two design
    rules follow: process rays in chunks of ~1M lanes (amortize the fixed
    cost), and fetch EVERYTHING a walk step needs — cell position, fp16
    neighbor offsets, neighbor ids, cell attributes — with ONE gather from
    a packed row table (pack_trace_table). The fp16 offsets are the same
    bandwidth trick as the reference's prefetch_adjacent_diff
    (pipeline.cu:546-586); packing is recomputed per call during training
    (points/attrs change every step, matching pipeline.cu:613-620) and
    hoisted at inference (the benchmark path precomputes it like
    benchmark.py:41-54 does for adjacent_offsets).
  * CUDA atomicAdd gradient scatter (pipeline.cu:240, 306, 322-328) becomes
    deterministic XLA scatter-add — an improvement: gradients are exactly
    reproducible run to run.

The backward pass replicates the reference formulas line for line
(pipeline.cu:219-331), including its quirks (the unflushed gradient
accumulators for the final two cells of a walk, and the dt0/d current term
evaluated against a zero prev_point on the first cell), because those
formulas are the spec that training dynamics were tuned against.

Walk-step math (tracing_utils.cuh:43-67): for current cell p with neighbor
offset v = q - p, the exit face is the perpendicular bisector plane with
origin p + v/2 and normal v; the ray (o, d) hits it at
``t = [(p - o) . v + |v|^2 / 2] / (v . d)``, and the exit face is the min-t
face among those with v . d > 0.
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from radfoam_tpu.ops.sh import sh_basis, sh_to_rgb, rgb_grad_to_sh


class TraceConfig(NamedTuple):
    """Static trace configuration (hashable; reference TraceSettings,
    src/tracing/pipeline.h:10-20, plus vectorization knobs)."""

    sh_degree: int = 3
    num_quantiles: int = 0
    weight_threshold: float = 0.001
    max_intersections: int = 1024
    return_contribution: bool = False
    chunk_size: int = 1 << 21  # big chunks amortize per-gather fixed cost
    # backward: derive the next cell's position as p + offset (fp16 offset
    # from the packed row) instead of an exact per-step position gather.
    # Saves one row-op per backward step (~25% of the backward); position
    # gradients shift by the fp16 rounding of the offset (~1e-3 relative).
    approx_next_point: bool = True


class TraceOutput(NamedTuple):
    rgba: jax.Array  # (R, 4)
    depth: jax.Array  # (R, Q)
    quantile_point_indices: jax.Array  # (R, Q) int32, -1 = not reached
    num_intersections: jax.Array  # (R,) int32
    contribution: jax.Array  # (N,) accumulated weights (zeros if disabled)


# ---------------------------------------------------------------------------
# packed per-point row table: ONE gather per walk step


class PackLayout(NamedTuple):
    K: int  # neighbor slots
    A: int  # attribute width (sh... + density)

    @property
    def width(self):
        # f32 words: [p(3) | vx(K) | vy(K) | vz(K) | nbr-bits(K) | attrs(A)]
        return 3 + 4 * self.K + self.A


def pack_layout(nbr_idx, attrs):
    return PackLayout(K=nbr_idx.shape[1], A=attrs.shape[1])


def pack_trace_table(points, attrs, nbr_idx):
    """Build the (N, W) float32 packed row table.

    Each row holds everything a walk step needs for one cell: position,
    neighbor offsets (rounded through f16 to match the reference's Vec4h
    precision, pipeline.cu:546-586, then stored as f32 — decode-free slices
    beat the 2x bandwidth saving on this hardware), neighbor indices
    (int32 bit pattern), and attributes. Padding neighbor slots (self
    index) have exactly-zero offsets.
    """
    bc = jax.lax.bitcast_convert_type

    q = jnp.take(points, nbr_idx, axis=0)  # (N, K, 3)
    off = (q - points[:, None, :]).astype(jnp.float16).astype(jnp.float32)
    idxw = bc(nbr_idx.astype(jnp.int32), jnp.float32)

    return jnp.concatenate(
        [
            points.astype(jnp.float32),
            off[..., 0],
            off[..., 1],
            off[..., 2],
            idxw,
            attrs.astype(jnp.float32),
        ],
        axis=1,
    )


def _walk_step(packed, lay, cell, origins, dirs, basis):
    """One fused walk step: single gather + exit-face test + attr decode.

    Returns (t1, next_idx, has_exit, p, s, rgb_p).
    """
    K = lay.K
    bc = jax.lax.bitcast_convert_type
    row = jnp.take(packed, cell, axis=0)  # THE gather
    p = row[:, 0:3]
    vx = row[:, 3 : 3 + K]
    vy = row[:, 3 + K : 3 + 2 * K]
    vz = row[:, 3 + 2 * K : 3 + 3 * K]
    nbrs = bc(row[:, 3 + 3 * K : 3 + 4 * K], jnp.int32)
    a = row[:, 3 + 4 * K :]

    dp = (
        vx * dirs[:, 0:1] + vy * dirs[:, 1:2] + vz * dirs[:, 2:3]
    )  # (R, K)
    po = p - origins
    num = (
        vx * po[:, 0:1] + vy * po[:, 1:2] + vz * po[:, 2:3]
        + 0.5 * (vx * vx + vy * vy + vz * vz)
    )
    t = num / dp
    t = jnp.where((dp > 0.0) & jnp.isfinite(t), t, jnp.inf)

    # min + masked-select instead of argmin + take_along_axis: the latter
    # lowers to a per-row gather that costs ~12x more per step on TPU.
    # Tie-break on exactly-equal t picks the smallest neighbor index.
    t1 = jnp.min(t, axis=-1)
    next_idx = jnp.min(
        jnp.where(t <= t1[:, None], nbrs, jnp.int32(2**30)), axis=-1
    )
    has_exit = jnp.isfinite(t1)

    s = a[:, lay.A - 1]
    rgb_p = sh_to_rgb(basis, a[:, : lay.A - 1])
    rgb_p = jnp.where((s > 1e-6)[:, None], rgb_p, 0.0)
    return t1, next_idx, has_exit, p, s, rgb_p, (t, t1, nbrs, vx, vy, vz)


def _chosen_offset(extras, next_idx):
    """The fp16 offset vector of the exit face (for approx_next_point)."""
    t, t1, nbrs, vx, vy, vz = extras
    m = (t <= t1[:, None]) & (nbrs == next_idx[:, None])
    mf = m.astype(jnp.float32)
    return jnp.stack(
        [(vx * mf).sum(1), (vy * mf).sum(1), (vz * mf).sum(1)], axis=-1
    )


def _cell_intersection_grad(primal, opposite, origins, dirs):
    """d t / d primal for the bisector-face intersection
    (reference tracing_utils.cuh:91-103)."""
    face_origin = 0.5 * (primal + opposite)
    n = opposite - primal
    num = jnp.sum((face_origin - origins) * n, axis=-1, keepdims=True)
    dp = jnp.sum(n * dirs, axis=-1, keepdims=True)
    return (num * dirs + dp * (origins - primal)) / (dp * dp)


# ---------------------------------------------------------------------------
# forward walk over one chunk


def _forward_chunk(cfg, lay, packed, rays, start, quant, contrib):
    R = rays.shape[0]
    Q = cfg.num_quantiles
    origins = rays[:, :3]
    dirs = rays[:, 3:6]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    basis = sh_basis(dirs, cfg.sh_degree)

    state = dict(
        cell=start.astype(jnp.int32),
        t0=jnp.zeros((R,), jnp.float32),
        T=jnp.ones((R,), jnp.float32),
        rgb=jnp.zeros((R, 3), jnp.float32),
        qidx=jnp.zeros((R,), jnp.int32),
        qdepth=jnp.full((R, Q), -1.0, jnp.float32),
        qpoint=jnp.full((R, Q), -1, jnp.int32),
        active=jnp.ones((R,), bool),
        n=jnp.zeros((R,), jnp.int32),
        overflow=jnp.zeros((R,), bool),
        contrib=contrib,
    )

    qslots = jnp.arange(Q, dtype=jnp.int32)[None, :]

    def cond(st):
        return jnp.any(st["active"])

    def body(st):
        act = st["active"]
        t1, next_idx, has_exit, p, s, rgb_p, _ = _walk_step(
            packed, lay, st["cell"], origins, dirs, basis
        )
        run = act & has_exit & (t1 > st["t0"])

        delta = jnp.maximum(t1 - st["t0"], 0.0)
        alpha = jnp.where(run, 1.0 - jnp.exp(-s * delta), 0.0)
        wgt = st["T"] * alpha
        # gate the whole contribution: rgb_p is NaN for degenerate
        # (zero-direction) rays and 0 * NaN would poison the accumulator
        rgb = st["rgb"] + jnp.where(run[:, None], wgt[:, None] * rgb_p, 0.0)
        T_next = st["T"] * (1.0 - alpha)

        if cfg.return_contribution:
            st["contrib"] = st["contrib"].at[st["cell"]].add(
                jnp.where(run, wgt, 0.0)
            )

        qidx = st["qidx"]
        qdepth, qpoint = st["qdepth"], st["qpoint"]
        if Q > 0:
            # quantiles are sorted descending per ray (train.py:176-180), so
            # the vectorized hit test matches the sequential while loop at
            # pipeline.cu:86-97.
            hit = (
                run[:, None]
                & (T_next[:, None] < quant)
                & (qslots >= qidx[:, None])
            )
            dq = st["t0"][:, None] + jnp.log(st["T"][:, None] / quant) / s[
                :, None
            ]
            qdepth = jnp.where(hit, dq, qdepth)
            qpoint = jnp.where(hit, st["cell"][:, None], qpoint)
            qidx = qidx + hit.sum(axis=1).astype(jnp.int32)

        n = st["n"] + act.astype(jnp.int32)
        cont = jnp.where(run, T_next > cfg.weight_threshold, True)
        would_continue = act & has_exit & cont
        active = would_continue & (n < cfg.max_intersections)
        overflow = st["overflow"] | (
            would_continue & (n >= cfg.max_intersections)
        )

        mv = act & has_exit
        return dict(
            cell=jnp.where(mv, next_idx, st["cell"]),
            t0=jnp.where(mv, jnp.maximum(st["t0"], t1), st["t0"]),
            T=jnp.where(run, T_next, st["T"]),
            rgb=rgb,
            qidx=qidx,
            qdepth=qdepth,
            qpoint=qpoint,
            active=active,
            n=n,
            overflow=overflow,
            contrib=st["contrib"],
        )

    st = jax.lax.while_loop(cond, body, state)
    rgba = jnp.concatenate(
        [st["rgb"], (1.0 - st["T"])[:, None]], axis=-1
    )
    n_out = st["n"] + st["overflow"].astype(jnp.int32)
    return rgba, st["qdepth"], st["qpoint"], n_out, st["contrib"]


# ---------------------------------------------------------------------------
# backward walk over one chunk (reference pipeline.cu:133-343)


def _backward_chunk(cfg, lay, packed, points, attrs, rays, start, quant,
                    rgba, qpoint, g_rgba, g_depth, g_ray_err, accs):
    """One chunk of the analytic backward.

    Gradient scatters are merged into ONE (R, A+3) combined scatter per step
    targeting the *previous* cell: the position-gradient flush already lags
    one cell behind the walk (pipeline.cu:305-313), so the attribute
    contribution of step k-1 is buffered in ``pend_attr`` and flushed
    together with the position gradient at step k (same totals, one row-op
    instead of two+). The buffered tail is flushed once after the loop.
    """
    R = rays.shape[0]
    Q = cfg.num_quantiles
    A = lay.A
    origins = rays[:, :3]
    dirs = rays[:, 3:6]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    basis = sh_basis(dirs, cfg.sh_degree)
    grad_acc, point_err = accs  # grad_acc: (N, A+3) = [attr | points]

    # current_depth_grad pre-pass (pipeline.cu:192-207): sum of g_i / s_i
    # over quantiles that were reached in the forward pass.
    if Q > 0:
        qvalid = qpoint >= 0
        s_q = jnp.take(attrs[:, -1], jnp.maximum(qpoint, 0), axis=0).astype(
            jnp.float32
        )
        cdg = jnp.sum(jnp.where(qvalid, g_depth / s_q, 0.0), axis=1)
    else:
        cdg = jnp.zeros((R,), jnp.float32)

    state = dict(
        cell=start.astype(jnp.int32),
        t0=jnp.zeros((R,), jnp.float32),
        T=jnp.ones((R,), jnp.float32),
        acc_rgb=jnp.zeros((R, 3), jnp.float32),
        qidx=jnp.zeros((R,), jnp.int32),
        cdg=cdg,
        prev_idx=jnp.full((R,), -1, jnp.int32),
        prev_point=jnp.zeros((R, 3), jnp.float32),
        prev_grad=jnp.zeros((R, 3), jnp.float32),
        cur_grad=jnp.zeros((R, 3), jnp.float32),
        next_grad=jnp.zeros((R, 3), jnp.float32),
        pend_attr=jnp.zeros((R, A), jnp.float32),
        active=jnp.ones((R,), bool),
        n=jnp.zeros((R,), jnp.int32),
        grad_acc=grad_acc,
        point_err=point_err,
    )

    qslots = jnp.arange(Q, dtype=jnp.int32)[None, :]

    def cond(st):
        return jnp.any(st["active"])

    def body(st):
        act = st["active"]
        t1, next_idx, has_exit, p, s, rgb_p, extras = _walk_step(
            packed, lay, st["cell"], origins, dirs, basis
        )
        run = act & has_exit & (t1 > st["t0"])
        runf = run.astype(jnp.float32)

        delta = jnp.maximum(t1 - st["t0"], 0.0)
        alpha = jnp.where(run, 1.0 - jnp.exp(-s * delta), 0.0)
        wgt = st["T"] * alpha
        dalpha_ds = delta * (1.0 - alpha)
        dalpha_ddt = jnp.where(delta > 0.0, s * (1.0 - alpha), 0.0)

        acc_rgb = st["acc_rgb"] + jnp.where(
            run[:, None], wgt[:, None] * rgb_p, 0.0
        )

        dL_drgb_p = g_rgba[:, :3] * wgt[:, None]

        rgb_rest = (rgba[:, :3] - acc_rgb) / (
            st["T"] * (1.0 - alpha + 1e-6)
        )[:, None]
        dL_dalpha = st["T"] * jnp.sum(
            (rgb_p - rgb_rest) * g_rgba[:, :3], axis=-1
        )
        dL_dalpha = dL_dalpha + (1.0 - rgba[:, 3]) * g_rgba[:, 3] / (
            1.0 - alpha + 1e-6
        )

        dL_ds = dL_dalpha * dalpha_ds
        dL_ddt = dL_dalpha * dalpha_ddt
        dL_dt0 = jnp.zeros((R,), jnp.float32)

        T_next = st["T"] * (1.0 - alpha)
        qidx = st["qidx"]
        cdg_v = st["cdg"]
        if Q > 0:
            hit = (
                run[:, None]
                & (T_next[:, None] < quant)
                & (qslots >= qidx[:, None])
            )
            dgi = jnp.where(hit, g_depth / s[:, None], 0.0)
            dL_dt0 = dL_dt0 + dgi.sum(axis=1)
            dL_ds = dL_ds - jnp.sum(
                dgi * jnp.log(st["T"][:, None] / quant), axis=1
            ) / s
            cdg_v = cdg_v - dgi.sum(axis=1)
            qidx = qidx + hit.sum(axis=1).astype(jnp.int32)
            not_done = (qidx < Q) & run
            dL_ds = dL_ds + jnp.where(not_done, -delta * cdg_v, 0.0)
            dL_ddt = dL_ddt + jnp.where(not_done, -s * cdg_v, 0.0)

        dL_dt0 = dL_dt0 - dL_ddt
        dL_dt1 = dL_ddt

        # 3-point position stencil (pipeline.cu:284-313)
        if cfg.approx_next_point:
            next_point = p + _chosen_offset(extras, next_idx)
        else:
            next_point = jnp.take(points, next_idx, axis=0)
        prev_valid = (st["prev_idx"] >= 0)[:, None]
        dt0_dprev = jnp.where(
            prev_valid,
            _cell_intersection_grad(st["prev_point"], p, origins, dirs),
            0.0,
        )
        dt1_dcur = _cell_intersection_grad(p, next_point, origins, dirs)
        dt0_dcur = _cell_intersection_grad(p, st["prev_point"], origins, dirs)
        dt1_dnext = _cell_intersection_grad(next_point, p, origins, dirs)

        prev_grad = st["prev_grad"] + runf[:, None] * dL_dt0[:, None] * dt0_dprev
        cur_grad = st["cur_grad"] + runf[:, None] * (
            dL_dt0[:, None] * dt0_dcur + dL_dt1[:, None] * dt1_dcur
        )
        next_grad = st["next_grad"] + runf[:, None] * dL_dt1[:, None] * dt1_dnext

        # attribute gradients (pipeline.cu:317-328); the ReLU clamp in
        # sh_to_rgb backpropagates as a zero where the clamped color is 0.
        dL_drgb_p = jnp.where(rgb_p == 0.0, 0.0, dL_drgb_p)
        sh_g = rgb_grad_to_sh(basis, dL_drgb_p)
        ag = jnp.concatenate([sh_g, dL_ds[:, None]], axis=-1)

        # one combined flush at the previous cell: its completed position
        # gradient plus its buffered attribute contribution
        flush = run & (st["prev_idx"] >= 0)
        combined = jnp.concatenate([st["pend_attr"], prev_grad], axis=-1)
        st["grad_acc"] = st["grad_acc"].at[
            jnp.where(flush, st["prev_idx"], 0)
        ].add(jnp.where(flush[:, None], combined, 0.0))

        if point_err is not None:
            st["point_err"] = st["point_err"].at[st["cell"]].add(
                jnp.where(run, wgt * g_ray_err, 0.0)
            )

        n = st["n"] + act.astype(jnp.int32)
        cont = jnp.where(run, T_next > cfg.weight_threshold, True)
        active = act & has_exit & cont & (n < cfg.max_intersections)
        mv = act & has_exit

        return dict(
            cell=jnp.where(mv, next_idx, st["cell"]),
            t0=jnp.where(mv, jnp.maximum(st["t0"], t1), st["t0"]),
            T=jnp.where(run, T_next, st["T"]),
            acc_rgb=acc_rgb,
            qidx=qidx,
            cdg=jnp.where(run, cdg_v, st["cdg"]),
            prev_idx=jnp.where(run, st["cell"], st["prev_idx"]),
            prev_point=jnp.where(run[:, None], p, st["prev_point"]),
            prev_grad=jnp.where(run[:, None], cur_grad, st["prev_grad"]),
            cur_grad=jnp.where(run[:, None], next_grad, st["cur_grad"]),
            next_grad=jnp.where(run[:, None], 0.0, st["next_grad"]),
            pend_attr=jnp.where(run[:, None], ag, st["pend_attr"]),
            active=active,
            n=n,
            grad_acc=st["grad_acc"],
            point_err=st["point_err"],
        )

    st = jax.lax.while_loop(cond, body, state)
    # flush the buffered attribute contribution of each ray's final cell.
    # Deliberately REFERENCE semantics: the position gradients still in
    # the register pipeline (prev_grad for the last flushed-attr cell,
    # cur_grad for the terminal cell) are dropped, exactly like the
    # reference backward, whose per-ray functor never flushes
    # prev_point_grad after the trace loop ends (pipeline.cu:284-343).
    # Finite differences show the true loss gradient w.r.t. those hull/
    # terminal cell positions is nonzero (DEVNOTES "engine convergence
    # A/B round 5"); frozen-points A/Bs show the omission does not affect
    # convergence, so parity wins over mathematical completeness here.
    tail = st["prev_idx"] >= 0
    tail_vals = jnp.concatenate(
        [st["pend_attr"], jnp.zeros((R, 3), jnp.float32)], axis=-1
    )
    grad_acc = st["grad_acc"].at[jnp.where(tail, st["prev_idx"], 0)].add(
        jnp.where(tail[:, None], tail_vals, 0.0)
    )
    return grad_acc, st["point_err"]


# ---------------------------------------------------------------------------
# chunked drivers


def _pad_chunks(cfg, arrs, R):
    chunk = min(cfg.chunk_size, max(R, 1))
    n_chunks = -(-R // chunk)
    pad = n_chunks * chunk - R
    out = []
    for a in arrs:
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0
            )
        out.append(a.reshape(n_chunks, chunk, *a.shape[1:]))
    return out, n_chunks, chunk


def _trace_forward_packed(cfg, lay, packed, n_points, rays, start, quant):
    """Forward trace against a prebuilt packed table (inference hot path)."""
    R = rays.shape[0]
    contrib0 = jnp.zeros((n_points,), jnp.float32)

    (rays_c, start_c, quant_c), n_chunks, chunk = _pad_chunks(
        cfg, [rays, start, quant], R
    )

    if n_chunks == 1:
        rgba, qd, qp, n, contrib = _forward_chunk(
            cfg, lay, packed, rays_c[0], start_c[0], quant_c[0], contrib0,
        )
    else:
        def scan_body(contrib, xs):
            rays_i, start_i, quant_i = xs
            rgba, qd, qp, n, contrib = _forward_chunk(
                cfg, lay, packed, rays_i, start_i, quant_i, contrib,
            )
            return contrib, (rgba, qd, qp, n)

        contrib, (rgba, qd, qp, n) = jax.lax.scan(
            scan_body, contrib0, (rays_c, start_c, quant_c)
        )
        total = n_chunks * chunk
        rgba = rgba.reshape(total, 4)
        qd = qd.reshape(total, cfg.num_quantiles)
        qp = qp.reshape(total, cfg.num_quantiles)
        n = n.reshape(total)

    return TraceOutput(
        rgba=rgba[:R],
        depth=qd[:R],
        quantile_point_indices=qp[:R],
        num_intersections=n[:R],
        contribution=contrib,
    )


def _trace_forward_impl(cfg, points, attrs, nbr_idx, rays, start, quant):
    lay = pack_layout(nbr_idx, attrs)
    packed = pack_trace_table(points, attrs, nbr_idx)
    out = _trace_forward_packed(
        cfg, lay, packed, points.shape[0], rays, start, quant
    )
    return out._replace(rgba=out.rgba.astype(attrs.dtype))


def _trace_backward_impl(cfg, points, attrs, nbr_idx, rays, start, quant,
                         rgba, qpoint, g_rgba, g_depth, ray_error=None):
    R = rays.shape[0]
    lay = pack_layout(nbr_idx, attrs)
    packed = pack_trace_table(points, attrs, nbr_idx)
    N = points.shape[0]
    A = attrs.shape[1]
    accs = (
        jnp.zeros((N, A + 3), jnp.float32),  # [attr | points] combined
        jnp.zeros((N,), jnp.float32) if ray_error is not None else None,
    )
    per_ray = [rays, start, quant, rgba.astype(jnp.float32),
               qpoint, g_rgba.astype(jnp.float32), g_depth]
    if ray_error is not None:
        per_ray.append(ray_error.astype(jnp.float32))
    padded, n_chunks, chunk = _pad_chunks(cfg, per_ray, R)
    if ray_error is not None:
        (rays_c, start_c, quant_c, rgba_c, qp_c, gr_c, gd_c, err_c) = padded
    else:
        (rays_c, start_c, quant_c, rgba_c, qp_c, gr_c, gd_c) = padded
        err_c = None

    if n_chunks == 1:
        accs = _backward_chunk(
            cfg, lay, packed, points, attrs,
            rays_c[0], start_c[0], quant_c[0], rgba_c[0], qp_c[0],
            gr_c[0], gd_c[0], err_c[0] if err_c is not None else None, accs,
        )
    else:
        def scan_body(accs, xs):
            if err_c is not None:
                rays_i, start_i, quant_i, rgba_i, qp_i, gr_i, gd_i, e_i = xs
            else:
                rays_i, start_i, quant_i, rgba_i, qp_i, gr_i, gd_i = xs
                e_i = None
            accs = _backward_chunk(
                cfg, lay, packed, points, attrs,
                rays_i, start_i, quant_i, rgba_i, qp_i, gr_i, gd_i, e_i,
                accs,
            )
            return accs, None

        xs = (rays_c, start_c, quant_c, rgba_c, qp_c, gr_c, gd_c)
        if err_c is not None:
            xs = xs + (err_c,)
        accs, _ = jax.lax.scan(scan_body, accs, xs)

    grad_acc, point_err = accs
    attr_grad = grad_acc[:, :A]
    points_grad = grad_acc[:, A:]
    # non-finite gradient scrub (reference render.py:98-99)
    points_grad = jnp.where(jnp.isfinite(points_grad), points_grad, 0.0)
    attr_grad = jnp.where(jnp.isfinite(attr_grad), attr_grad, 0.0)
    return points_grad, attr_grad, point_err


# ---------------------------------------------------------------------------
# custom_vjp wiring


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trace(cfg, points, attrs, nbr_idx, rays, start, quant):
    return _trace_forward_impl(cfg, points, attrs, nbr_idx, rays, start, quant)


def _trace_fwd(cfg, points, attrs, nbr_idx, rays, start, quant):
    out = _trace_forward_impl(cfg, points, attrs, nbr_idx, rays, start, quant)
    res = (points, attrs, nbr_idx, rays, start, quant, out.rgba,
           out.quantile_point_indices)
    return out, res


def _trace_bwd(cfg, res, cot):
    points, attrs, nbr_idx, rays, start, quant, rgba, qpoint = res
    g_rgba = cot.rgba
    g_depth = cot.depth
    points_grad, attr_grad, _ = _trace_backward_impl(
        cfg, points, attrs, nbr_idx, rays, start, quant, rgba, qpoint,
        g_rgba, g_depth,
    )
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (
        points_grad,
        attr_grad.astype(attrs.dtype),
        f0(nbr_idx),
        jnp.zeros_like(rays),
        f0(start),
        jnp.zeros_like(quant),
    )


_trace.defvjp(_trace_fwd, _trace_bwd)


def trace(points, attrs, nbr_idx, rays, start_point, depth_quantiles=None,
          config=TraceConfig()):
    """Differentiable trace of a flat ray batch.

    Args:
      points: (N, 3) f32 Voronoi sites (spatially sorted for locality).
      attrs: (N, 1 + 3*(deg+1)^2) activated attributes [sh..., density],
        f32 or f16 (reference attr_dtype, pipeline.cu:776-805).
      nbr_idx: (N, K) int32 padded neighbor table.
      rays: (R, 6) [origin, direction] (direction need not be unit).
      start_point: (R,) int starting cell per ray.
      depth_quantiles: (R, Q) descending per-ray transmittance quantiles, or
        None (Q must match config.num_quantiles).
      config: TraceConfig statics.

    Returns:
      TraceOutput. Gradients flow to points and attrs only (the reference
      returns ray gradients from trace_backward but discards them,
      render.py:112-122).
    """
    rays = jnp.asarray(rays)
    R = rays.shape[0]
    if depth_quantiles is None:
        assert config.num_quantiles == 0
        depth_quantiles = jnp.zeros((R, 0), jnp.float32)
    else:
        assert depth_quantiles.shape[-1] == config.num_quantiles
    start_point = jnp.asarray(start_point).astype(jnp.int32)
    return _trace(config, points, attrs, nbr_idx, rays, start_point,
                  depth_quantiles)


def trace_point_error(points, attrs, nbr_idx, rays, start_point, rgba,
                      ray_error, config=TraceConfig()):
    """Scatter a per-ray scalar error into per-point error (the reference's
    ErrorBox side channel, pipeline.cu:239-241 / render.py:4-8). Kept as an
    explicit function since JAX has no mutable autograd side channels; the
    training loop uses position-gradient norms instead
    (scene.py:538-540), so this is API-completeness only.
    """
    R = rays.shape[0]
    quant = jnp.zeros((R, 0), jnp.float32)
    qpoint = jnp.zeros((R, 0), jnp.int32)
    g_rgba = jnp.zeros((R, 4), jnp.float32)
    g_depth = jnp.zeros((R, 0), jnp.float32)
    cfg = config._replace(num_quantiles=0)
    _, _, point_err = _trace_backward_impl(
        cfg, points, attrs, nbr_idx, rays,
        jnp.asarray(start_point).astype(jnp.int32), quant,
        rgba, qpoint, g_rgba, g_depth, ray_error=ray_error,
    )
    return point_err


def pack_rgba8(rgb, alpha=None):
    """Pack float rgb(a) into uint32 RGBA8 (reference make_rgba8,
    tracing_utils.cuh:105-115). Used by the benchmark/viewer paths."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    if alpha is None:
        alpha = jnp.ones(rgb.shape[:-1], rgb.dtype)
    a = jnp.clip(alpha, 0.0, 1.0)
    to8 = lambda x: (x * 255.0).astype(jnp.uint32)
    r, g, b = to8(rgb[..., 0]), to8(rgb[..., 1]), to8(rgb[..., 2])
    return (to8(a) << 24) | (b << 16) | (g << 8) | r
