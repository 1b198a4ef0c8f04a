"""Pipeline: the tracer's user-facing handle.

API-parity shim for the reference's ``radfoam.create_pipeline(sh_degree,
attr_dtype)`` + ``Pipeline.trace_forward/trace_backward/trace_benchmark``
(torch_bindings/pipeline_bindings.cpp:107-693). The model layer calls
``ops.trace`` directly through JAX autodiff; this class exists so code
written against the reference binding surface ports mechanically, and it is
what the benchmark path uses.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from radfoam_tpu.ops.adjacency import csr_to_padded
from radfoam_tpu.ops.camera import Camera, cast_rays
from radfoam_tpu.ops import trace as trace_mod
from radfoam_tpu.ops.trace import TraceConfig, pack_rgba8


@lru_cache(maxsize=32)
def _jitted_forward(cfg):
    return jax.jit(
        lambda points, attrs, nbr_idx, rays, start, quant: trace_mod
        ._trace_forward_impl(cfg, points, attrs, nbr_idx, rays, start, quant)
    )


@lru_cache(maxsize=32)
def _jitted_benchmark(cfg):
    def run(points, attrs, nbr_idx, rays, start):
        out = trace_mod._trace_forward_impl(
            cfg, points, attrs, nbr_idx, rays, start,
            jnp.zeros((rays.shape[0], 0), jnp.float32),
        )
        return pack_rgba8(out.rgba[:, :3].astype(jnp.float32))

    return jax.jit(run)


class Pipeline:
    """Tracing pipeline for a fixed sh_degree / attribute dtype
    (reference CUDATracingPipeline, pipeline.cu:588-774)."""

    def __init__(self, sh_degree: int, attr_dtype=jnp.float32):
        if sh_degree not in (0, 1, 2, 3):
            raise ValueError("Unsupported SH degree")
        self.sh_degree = sh_degree
        self.attr_dtype = attr_dtype

    def attribute_dim(self):
        return 1 + 3 * (1 + self.sh_degree) ** 2

    def _padded(self, point_adjacency, point_adjacency_offsets):
        """Padded neighbor table for a CSR adjacency, cached.

        The host-side O(E) padding pass only reruns when the adjacency
        actually changes (each triangulation rebuild); repeated renders of
        the same scene (benchmark / viewer frames) hit the cache. Keyed by
        a cheap content fingerprint, not object identity, so numpy views
        and re-wrapped arrays still hit.
        """
        adj = np.asarray(point_adjacency)
        off = np.asarray(point_adjacency_offsets)
        stride = max(1, adj.shape[0] // 64)
        key = (
            adj.shape[0], off.shape[0],
            hash(adj[::stride].tobytes()), hash(off[::stride].tobytes()),
        )
        if getattr(self, "_padded_key", None) != key:
            self._padded_key = key
            self._padded_val = jnp.asarray(csr_to_padded(adj, off))
        return self._padded_val

    def trace_forward(self, points, attributes, point_adjacency,
                      point_adjacency_offsets, rays, start_point,
                      depth_quantiles=None, return_contribution=False,
                      weight_threshold=0.001, max_intersections=1024):
        """Returns the reference's result dict (pipeline_bindings.cpp:107-265):
        rgba, depth, depth_indices, contribution, num_intersections."""
        from radfoam_tpu.utils.validation import check_trace_inputs

        check_trace_inputs(
            points, attributes, point_adjacency, point_adjacency_offsets,
            jnp.asarray(rays), self.sh_degree,
        )
        nbr_idx = self._padded(point_adjacency, point_adjacency_offsets)
        rays = jnp.asarray(rays)
        shape = rays.shape[:-1]
        rays_flat = rays.reshape(-1, 6)
        start = jnp.broadcast_to(
            jnp.asarray(start_point), shape
        ).reshape(-1)
        nq = 0
        quant = jnp.zeros((rays_flat.shape[0], 0), jnp.float32)
        if depth_quantiles is not None:
            nq = depth_quantiles.shape[-1]
            quant = jnp.asarray(depth_quantiles).reshape(-1, nq)
        cfg = TraceConfig(
            sh_degree=self.sh_degree,
            num_quantiles=nq,
            weight_threshold=weight_threshold,
            max_intersections=max_intersections,
            return_contribution=return_contribution,
        )
        out = _jitted_forward(cfg)(
            jnp.asarray(points), jnp.asarray(attributes, dtype=self.attr_dtype),
            nbr_idx, rays_flat, start.astype(jnp.int32), quant,
        )
        result = {
            "rgba": out.rgba.reshape(*shape, 4),
            "num_intersections": out.num_intersections.reshape(shape),
        }
        if depth_quantiles is not None:
            result["depth"] = out.depth.reshape(*shape, nq)
            result["depth_indices"] = out.quantile_point_indices.reshape(
                *shape, nq
            )
        if return_contribution:
            result["contribution"] = out.contribution[:, None]
        return result

    def trace_backward(self, points, attributes, point_adjacency,
                       point_adjacency_offsets, rays, start_point,
                       rgba, depth_indices=None, rgba_grad=None,
                       depth_grad=None, ray_error=None,
                       depth_quantiles=None, weight_threshold=0.001,
                       max_intersections=1024):
        """Analytic backward walk; the reference binding surface
        (pipeline_bindings.cpp:267-497).

        Returns a dict {points_grad, attr_grad, ray_grad, point_error}.
        ``ray_grad`` is returned zero-filled: the reference's autograd
        bridge discards it too (render.py:112-122), so no consumer exists;
        it is present for result-dict parity. ``point_error`` is None
        unless ``ray_error`` is given (the ErrorBox side channel,
        render.py:4-8).
        """
        if depth_quantiles is not None and depth_indices is None:
            raise ValueError(
                "depth_indices is required when depth_quantiles is given "
                "(pass the per-quantile cell indices from trace_forward)"
            )
        rays = jnp.asarray(rays)
        shape = rays.shape[:-1]
        rays_flat = rays.reshape(-1, 6)
        R = rays_flat.shape[0]
        start = jnp.broadcast_to(
            jnp.asarray(start_point), shape
        ).reshape(-1).astype(jnp.int32)
        nq = 0
        quant = jnp.zeros((R, 0), jnp.float32)
        qpoint = jnp.zeros((R, 0), jnp.int32)
        g_depth = jnp.zeros((R, 0), jnp.float32)
        if depth_quantiles is not None:
            nq = depth_quantiles.shape[-1]
            quant = jnp.asarray(depth_quantiles).reshape(-1, nq)
            qpoint = jnp.asarray(depth_indices).reshape(-1, nq)
            g_depth = (
                jnp.asarray(depth_grad).reshape(-1, nq)
                if depth_grad is not None else jnp.zeros((R, nq), jnp.float32)
            )
        g_rgba = (
            jnp.asarray(rgba_grad).reshape(-1, 4)
            if rgba_grad is not None else jnp.zeros((R, 4), jnp.float32)
        )
        err = (
            jnp.asarray(ray_error).reshape(-1)
            if ray_error is not None else None
        )
        nbr_idx = self._padded(point_adjacency, point_adjacency_offsets)
        cfg = TraceConfig(
            sh_degree=self.sh_degree, num_quantiles=nq,
            weight_threshold=weight_threshold,
            max_intersections=max_intersections,
        )
        points_grad, attr_grad, point_err = trace_mod._trace_backward_impl(
            cfg, jnp.asarray(points),
            jnp.asarray(attributes, dtype=self.attr_dtype), nbr_idx,
            rays_flat, start, quant,
            jnp.asarray(rgba).reshape(-1, 4), qpoint, g_rgba, g_depth,
            ray_error=err,
        )
        return {
            "points_grad": points_grad,
            "attr_grad": attr_grad,
            "ray_grad": jnp.zeros_like(rays),
            "point_error": point_err,
        }

    def trace_visualization(self, points, attributes, point_adjacency,
                            point_adjacency_offsets, camera, start_point,
                            vis_mode="rgb", color_map="viridis",
                            weight_threshold=0.05, max_intersections=1024,
                            depth_quantile=0.5, max_depth=10.0,
                            background="checker"):
        """Render one camera in a visualization mode (pipeline.cu:346-470):
        rgb (over a checkerboard or solid background), depth (quantile
        colormap), alpha, or intersections heat map. Returns (H, W, 3)
        float32 in [0, 1]. This is the kernel the interactive viewer calls
        per frame (viewer/viewer.py delegates the same math)."""
        if isinstance(camera, dict):
            camera = Camera.from_dict(camera)
        nbr_idx = self._padded(point_adjacency, point_adjacency_offsets)
        rays = cast_rays(camera).reshape(-1, 6)
        R = rays.shape[0]
        nq = 1 if vis_mode == "depth" else 0
        cfg = TraceConfig(
            sh_degree=self.sh_degree, num_quantiles=nq,
            weight_threshold=weight_threshold,
            max_intersections=max_intersections, chunk_size=1 << 17,
        )
        quant = (
            jnp.full((R, 1), float(depth_quantile), jnp.float32)
            if nq else jnp.zeros((R, 0), jnp.float32)
        )
        out = _jitted_forward(cfg)(
            jnp.asarray(points),
            jnp.asarray(attributes, dtype=self.attr_dtype), nbr_idx, rays,
            jnp.full((R,), int(start_point), jnp.int32), quant,
        )
        h, w = camera.height, camera.width
        rgba = np.asarray(out.rgba, np.float32).reshape(h, w, 4)
        if vis_mode == "rgb":
            if background == "solid":
                bg = np.float32(1.0)
            else:
                yy, xx = np.mgrid[0:h, 0:w]
                checker = (
                    (((xx // 20) % 2) * 2 - 1) * (((yy // 20) % 2) * 2 - 1)
                )
                bg = np.where(checker[..., None] > 0, 0.3, 0.5).astype(
                    np.float32
                )
            img = rgba[..., :3] + (1 - rgba[..., 3:]) * bg
        elif vis_mode == "alpha":
            img = np.repeat(rgba[..., 3:], 3, axis=-1)
        elif vis_mode == "depth":
            from radfoam_tpu.viewer.colormaps import apply_colormap

            d = np.asarray(out.depth, np.float32).reshape(h, w)
            img = apply_colormap(d / max_depth, color_map)
        elif vis_mode == "intersections":
            from radfoam_tpu.viewer.colormaps import apply_colormap

            nint = np.asarray(out.num_intersections, np.float32).reshape(
                h, w
            )
            img = apply_colormap(nint / 256.0, color_map)
        else:
            raise ValueError(f"unknown vis_mode {vis_mode!r}")
        return np.clip(img, 0.0, 1.0).astype(np.float32)

    def _raster_scene(self, points, attributes):
        """Triangulation-derived raster inputs, cached by points content."""
        import jax

        from radfoam_tpu.delaunay import Triangulation
        from radfoam_tpu.ops import raster as R

        pts = np.ascontiguousarray(points, dtype=np.float32)
        stride = max(1, pts.shape[0] // 64)
        key = (pts.shape[0], hash(pts[::stride].tobytes()))
        if getattr(self, "_raster_key", None) != key:
            tri = Triangulation(pts)
            perm = tri.permutation()
            pts_s = pts[perm]
            attrs_s = np.asarray(attributes)[perm]
            table = csr_to_padded(
                tri.point_adjacency(), tri.point_adjacency_offsets()
            )
            bb_min, bb_max, _ = tri.cell_bounds()
            from radfoam_tpu.ops.cellbound import clamp_bounds

            bb_min, bb_max, _ = clamp_bounds(pts_s, bb_min, bb_max)
            rtable = jax.jit(
                lambda p, a, t, b0, b1: R.build_scene_table(
                    p, a, t, b0, b1, sh_degree=self.sh_degree,
                )
            )(
                jnp.asarray(pts_s), jnp.asarray(attrs_s),
                jnp.asarray(table), jnp.asarray(bb_min),
                jnp.asarray(bb_max),
            )
            self._raster_key = key
            self._raster_val = (
                rtable, jnp.asarray(bb_min), jnp.asarray(bb_max),
                jnp.asarray(attrs_s[:, -1].astype(np.float32)),
                int(table.shape[1]),
            )
        return self._raster_val

    def trace_benchmark(self, points, attributes, point_adjacency,
                        point_adjacency_offsets, adjacent_offsets, camera,
                        start_point, output=None, weight_threshold=0.05,
                        max_intersections=1024, engine="raster"):
        """Render one camera to packed RGBA8 (pipeline.cu:472-544).

        ``adjacent_offsets`` is accepted for signature parity but the fp16
        offsets are derived on device. ``engine`` selects the tile
        rasterizer (default; pinhole only) or the adjacency walk.
        Returns (H, W) uint32.
        """
        if isinstance(camera, dict):
            camera = Camera.from_dict(camera)

        if engine == "raster" and camera.model == 0:  # pinhole
            from radfoam_tpu.ops import raster as R

            rtable, bbmin, bbmax, dens, k_tab = self._raster_scene(
                points, attributes
            )
            n = rtable.shape[0]
            cap = int(min(1 << 22, max(1 << 16, 64 * n)))
            rcfg = R.RasterConfig(
                sh_degree=self.sh_degree,
                weight_threshold=weight_threshold,
                alpha_cull=1e-3, max_pairs=cap, table_k=k_tab,
            )
            img, n_pairs, _ = R.render_frame_staged(
                rtable, bbmin, bbmax, dens,
                jnp.asarray(camera.position, jnp.float32),
                jnp.asarray(camera.forward, jnp.float32),
                jnp.asarray(camera.right, jnp.float32),
                jnp.asarray(camera.up, jnp.float32),
                jnp.float32(camera.fov),
                width=camera.width, height=camera.height, cfg=rcfg,
            )
            if int(n_pairs) > cap:
                import warnings

                warnings.warn(
                    f"raster pair capacity overflow ({int(n_pairs)} > "
                    f"{cap}); image incomplete"
                )
            # alpha defaults to 1 exactly like the walk path below
            return pack_rgba8(img[..., :3].astype(jnp.float32))
        nbr_idx = self._padded(point_adjacency, point_adjacency_offsets)
        rays = cast_rays(camera).reshape(-1, 6)
        start = jnp.full((rays.shape[0],), int(start_point), jnp.int32)
        cfg = TraceConfig(
            sh_degree=self.sh_degree,
            num_quantiles=0,
            weight_threshold=weight_threshold,
            max_intersections=max_intersections,
            chunk_size=1 << 17,
        )
        img = _jitted_benchmark(cfg)(
            jnp.asarray(points),
            jnp.asarray(attributes, dtype=self.attr_dtype),
            nbr_idx, rays, start,
        )
        return img.reshape(camera.height, camera.width)


def create_pipeline(sh_degree: int, attr_dtype=jnp.float32):
    """Factory (reference pipeline.cu:776-805). attr_dtype may be a jnp/torch
    dtype or the strings 'float32'/'float16'."""
    if isinstance(attr_dtype, str):
        attr_dtype = {"float32": jnp.float32, "float16": jnp.float16}[
            attr_dtype
        ]
    try:
        import torch

        if attr_dtype in (torch.float32, torch.float16):
            attr_dtype = (
                jnp.float32 if attr_dtype == torch.float32 else jnp.float16
            )
    except Exception:
        pass
    return Pipeline(sh_degree, attr_dtype)
