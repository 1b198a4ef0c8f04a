"""Synthetic ground-truth scenes + in-memory data handler.

The image ships no datasets, so end-to-end tests train against
procedurally generated foams rendered by the tracer itself: a smooth
colored blob whose images any correct training loop can fit.  The
:class:`SyntheticDataHandler` exposes the same surface as
:class:`radfoam_tpu.data.DataHandler` so the full training loop runs
unmodified on in-memory arrays (SURVEY.md §4 smoke strategy).
"""

import numpy as np

from radfoam_tpu.data.fetcher import BatchFetcher


def make_ground_truth_scene(n_points=400, sh_degree=1, seed=0):
    """A trainable GT foam: dense smooth-colored core, thin outer haze.

    Returns (points, attrs, padded-adjacency table, triangulation); points
    are in the triangulation's spatial order and attrs are in activated
    space (ready for ``trace``).
    """
    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.ops.adjacency import csr_to_padded

    rng = np.random.default_rng(seed)
    core = rng.standard_normal((n_points // 2, 3)) * 0.8
    shell = rng.standard_normal((n_points - n_points // 2, 3)) * 2.2
    pts = np.concatenate([core, shell]).astype(np.float32)

    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    table = csr_to_padded(tri.point_adjacency(), tri.point_adjacency_offsets())

    D = (sh_degree + 1) ** 2
    attrs = np.zeros((pts.shape[0], 1 + 3 * D), np.float32)
    # smooth position-dependent DC color (channel-major coefficient layout)
    base = 0.5 + 0.4 * np.sin(pts * np.array([1.7, 2.3, 1.1]) + [0, 2, 4])
    attrs[:, 0 * D] = base[:, 0]
    attrs[:, 1 * D] = base[:, 1]
    attrs[:, 2 * D] = base[:, 2]
    if D > 1:
        attrs[:, : 3 * D] += (
            rng.standard_normal((pts.shape[0], 3 * D)) * 0.03
        ).astype(np.float32)
    r = np.linalg.norm(pts, axis=1)
    attrs[:, -1] = np.where(r < 1.2, 2.5, 0.01).astype(np.float32)
    return pts, attrs, table, tri


def render_views(pts, attrs, table, sh_degree, n_views=5, wh=(48, 48),
                 radius=3.5, z=1.2, return_cams=False):
    """Render an orbit of GT views with the exact tracer.

    Returns (rays (V,H,W,6), rgbs (V,H,W,3) white-composited,
    alphas (V,H,W,1)) as numpy arrays.
    """
    import jax.numpy as jnp

    from radfoam_tpu.ops.camera import cast_rays, look_at
    from radfoam_tpu.ops.trace import TraceConfig, trace

    w, h = wh
    cfg = TraceConfig(sh_degree=sh_degree, num_quantiles=0)
    all_rays, all_rgbs, all_alphas, cams = [], [], [], []
    for v in range(n_views):
        ang = 2 * np.pi * v / n_views
        eye = np.array(
            [radius * np.cos(ang), radius * np.sin(ang), z], np.float32
        )
        cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=np.deg2rad(50),
                      width=w, height=h)
        rays = np.asarray(cast_rays(cam)).reshape(-1, 6)
        start = int(np.argmin(np.sum((pts - eye) ** 2, axis=1)))
        out = trace(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
            jnp.asarray(rays),
            jnp.full((rays.shape[0],), start, jnp.int32), config=cfg,
        )
        rgba = np.asarray(out.rgba, np.float32)
        alpha = np.clip(rgba[:, 3:4], 0, 1)
        rgb = np.clip(rgba[:, :3] + (1 - alpha), 0, 1)
        cams.append(cam)
        all_rays.append(rays.reshape(h, w, 6))
        all_rgbs.append(rgb.reshape(h, w, 3))
        all_alphas.append(alpha.reshape(h, w, 1))
    out3 = (
        np.stack(all_rays).astype(np.float32),
        np.stack(all_rgbs).astype(np.float32),
        np.stack(all_alphas).astype(np.float32),
    )
    return out3 + (cams,) if return_cams else out3


class SyntheticDataHandler:
    """DataHandler-compatible wrapper around in-memory view arrays."""

    def __init__(self, rays, rgbs, alphas=None, rays_per_batch=0,
                 points3D=None, points3D_colors=None, cams=None):
        self.rays = np.asarray(rays, np.float32)
        self.rgbs = np.asarray(rgbs, np.float32)
        if alphas is None:
            alphas = np.ones_like(self.rgbs[..., :1])
        self.alphas = np.asarray(alphas, np.float32)
        self.rays_per_batch = rays_per_batch
        V, H, W = self.rays.shape[:3]
        self.img_wh = (W, H)
        self.fx = self.fy = float(W)  # nominal
        self.points3D = points3D
        self.points3D_colors = points3D_colors
        self.batch_size = rays_per_batch if rays_per_batch else V * H * W
        self.cams = cams
        self.viewer_pos = self.rays[0, 0, 0, :3]
        self.viewer_forward = self.rays[0, H // 2, W // 2, 3:]
        self.viewer_up = np.array([0, 0, 1], np.float32)
        self._fetcher = None

    def reload(self, split=None, downsample=None):
        pass  # data lives in memory; nothing to reload

    def raster_camera(self, i):
        """Raster camera for view i (cast_rays fov convention)."""
        from radfoam_tpu.ops.raster import fov_intrin

        cam = self.cams[i]
        w, h = self.img_wh
        basis = np.stack(
            [cam.position, cam.forward, cam.right, cam.up]
        ).astype(np.float32)
        intrin = np.array(
            [float(v) for v in fov_intrin(cam.fov, width=w, height=h)],
            np.float32,
        )
        return basis, intrin

    def raster_dir_grid(self, tile=16):
        """Synthetic cameras are exact pinholes: affine path, no grid."""
        _, intrin = self.raster_camera(0)
        return None, intrin, 0.0

    def get_iter(self):
        V, H, W = self.rays.shape[:3]
        img_idx = np.broadcast_to(
            np.arange(V, dtype=np.float32)[:, None, None, None],
            (V, H, W, 1),
        )
        packed = np.concatenate(
            [self.rays, self.rgbs, self.alphas, img_idx], axis=-1
        ).reshape(-1, 11)
        self.stop()
        self._fetcher = BatchFetcher(packed, self.batch_size, shuffle=True)
        while True:
            batch = self._fetcher.next()
            yield (
                batch[..., :6],
                batch[..., 6:9],
                batch[..., 9:10],
                batch[..., 10:11],
            )

    def stop(self):
        if self._fetcher is not None:
            self._fetcher.stop()
            self._fetcher = None
