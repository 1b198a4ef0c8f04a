"""Sequential scalar reference tracer for tests.

Independent numpy re-implementation of the per-ray walk semantics
(reference src/tracing/pipeline.cu forward/backward and
tracing_utils.cuh trace), written as straight-line scalar Python. The
vectorized JAX implementation in radfoam_tpu.ops.trace is validated against
this, including the backward pass's exact accumulator/flush bookkeeping.
"""

import numpy as np

from radfoam_tpu.ops.sh import sh_basis


def _basis(d, degree):
    import jax.numpy as jnp

    return np.asarray(sh_basis(jnp.asarray(d[None], jnp.float32), degree))[0]


def _load_attrs(attrs, idx, basis):
    a = attrs[idx].astype(np.float32)
    s = a[-1]
    if s > 1e-6:
        D = basis.shape[0]
        coeffs = a[:-1].reshape(D, 3)
        rgb = np.maximum(0.5 + basis @ coeffs, 0.0)
    else:
        rgb = np.zeros(3, np.float32)
    return s, rgb


def _exit_face(points, adj, offsets, cell, o, d, use_f16=True):
    lo, hi = int(offsets[cell]), int(offsets[cell + 1])
    nbrs = adj[lo:hi].astype(np.int64)
    p = points[cell]
    offs = points[nbrs] - p
    if use_f16:
        offs = offs.astype(np.float16).astype(np.float32)
    dp = offs @ d
    num = offs @ (p - o) + 0.5 * np.sum(offs * offs, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = num / dp
    t = np.where((dp > 0) & np.isfinite(t), t, np.inf)
    face = int(np.argmin(t))
    return float(t[face]), int(nbrs[face]), np.isfinite(t[face]), p


def _cig(primal, opposite, o, d):
    fo = 0.5 * (primal + opposite)
    n = opposite - primal
    num = (fo - o) @ n
    dp = n @ d
    return (num * d + dp * (o - primal)) / (dp * dp)


def trace_ray_forward(points, attrs, adj, offsets, start, ray, quantiles,
                      sh_degree=3, weight_threshold=0.001, max_steps=1024,
                      contribution=None):
    o, d = ray[:3].astype(np.float32), ray[3:6].astype(np.float32)
    d = d / np.linalg.norm(d)
    basis = _basis(d, sh_degree)
    Q = len(quantiles)

    T, t0, n, cell = 1.0, 0.0, 0, int(start)
    rgb = np.zeros(3, np.float32)
    qi = 0
    qdepth = np.full(Q, -1.0, np.float32)
    qpoint = np.full(Q, -1, np.int64)

    while True:
        n += 1
        if n > max_steps:
            break
        t1, nxt, has_exit, p = _exit_face(points, adj, offsets, cell, o, d)
        if not has_exit:
            break
        if t1 > t0:
            s, rgb_p = _load_attrs(attrs, cell, basis)
            delta = max(t1 - t0, 0.0)
            alpha = 1.0 - np.exp(-s * delta)
            w = T * alpha
            if contribution is not None:
                contribution[cell] += w
            rgb += w * rgb_p
            T_next = T * (1.0 - alpha)
            while qi < Q and T_next < quantiles[qi]:
                qdepth[qi] = t0 + np.log(T / quantiles[qi]) / s
                qpoint[qi] = cell
                qi += 1
            T = T_next
            if not (T > weight_threshold):
                break
        t0 = max(t0, t1)
        cell = nxt

    rgba = np.concatenate([rgb, [1.0 - T]]).astype(np.float32)
    return rgba, qdepth, qpoint, n


def trace_ray_backward(points, attrs, adj, offsets, start, ray, quantiles,
                       qpoint, rgba, g_rgba, g_depth, sh_degree=3,
                       weight_threshold=0.001, max_steps=1024,
                       points_grad=None, attr_grad=None):
    o, d = ray[:3].astype(np.float32), ray[3:6].astype(np.float32)
    d = d / np.linalg.norm(d)
    basis = _basis(d, sh_degree)
    Q = len(quantiles)
    D = basis.shape[0]

    cdg = 0.0
    for i in range(Q):
        if qpoint[i] >= 0:
            s = float(attrs[qpoint[i], -1])
            cdg += g_depth[i] / s

    T, t0, n, cell = 1.0, 0.0, 0, int(start)
    acc_rgb = np.zeros(3, np.float32)
    qi = 0
    prev_idx = -1
    prev_point = np.zeros(3, np.float32)
    prev_grad = np.zeros(3, np.float32)
    cur_grad = np.zeros(3, np.float32)
    next_grad = np.zeros(3, np.float32)

    while True:
        n += 1
        if n > max_steps:
            break
        t1, nxt, has_exit, p = _exit_face(points, adj, offsets, cell, o, d)
        if not has_exit:
            break
        if t1 > t0:
            s, rgb_p = _load_attrs(attrs, cell, basis)
            delta = max(t1 - t0, 0.0)
            alpha = 1.0 - np.exp(-s * delta)
            w = T * alpha
            dalpha_ds = delta * (1.0 - alpha)
            dalpha_ddt = s * (1.0 - alpha) if delta > 0 else 0.0

            acc_rgb = acc_rgb + w * rgb_p
            dL_drgb_p = g_rgba[:3] * w

            rgb_rest = (rgba[:3] - acc_rgb) / (T * (1.0 - alpha + 1e-6))
            dL_dalpha = T * (rgb_p - rgb_rest) @ g_rgba[:3]
            dL_dalpha += (1.0 - rgba[3]) * g_rgba[3] / (1.0 - alpha + 1e-6)

            dL_ds = dL_dalpha * dalpha_ds
            dL_ddt = dL_dalpha * dalpha_ddt
            dL_dt0 = 0.0

            T_next = T * (1.0 - alpha)
            while qi < Q and T_next < quantiles[qi]:
                dgi = g_depth[qi] / s
                dL_dt0 += dgi
                dL_ds += -dgi * np.log(T / quantiles[qi]) / s
                cdg -= dgi
                qi += 1
            if qi < Q:
                dL_ds += -delta * cdg
                dL_ddt += -s * cdg

            dL_dt0 += -dL_ddt
            dL_dt1 = dL_ddt

            next_point = points[nxt]
            if prev_idx >= 0:
                dt0_dprev = _cig(prev_point, p, o, d)
            else:
                dt0_dprev = np.zeros(3, np.float32)
            dt1_dcur = _cig(p, next_point, o, d)
            dt0_dcur = _cig(p, prev_point, o, d)
            dt1_dnext = _cig(next_point, p, o, d)

            prev_grad = prev_grad + dL_dt0 * dt0_dprev
            cur_grad = cur_grad + dL_dt0 * dt0_dcur + dL_dt1 * dt1_dcur
            next_grad = next_grad + dL_dt1 * dt1_dnext

            if prev_idx >= 0 and points_grad is not None:
                points_grad[prev_idx] += prev_grad
            prev_point, prev_idx = p, cell
            prev_grad, cur_grad, next_grad = (
                cur_grad, next_grad, np.zeros(3, np.float32)
            )

            if attr_grad is not None:
                g = np.where(rgb_p == 0.0, 0.0, dL_drgb_p)
                sh_g = (basis[:, None] * g[None, :]).reshape(-1)
                attr_grad[cell, :-1] += sh_g
                attr_grad[cell, -1] += dL_ds

            T = T_next
            if not (T > weight_threshold):
                break
        t0 = max(t0, t1)
        cell = nxt
