"""Dataset handler: split loading, ray flattening, batch iteration.

Mirrors the reference DataHandler (data_loader/__init__.py:36-128) with one
structural change: instead of three independently-shuffled fetchers whose
RNGs must stay aligned, the (ray, rgb, alpha, image-index) columns are
packed into ONE array and served by a single :class:`BatchFetcher` — the
same batches, but alignment holds by construction, and the per-ray image
index lets the jitted train step look up its camera start cell without
host round-trips.
"""

import os

import numpy as np


def get_up(c2ws):
    """Global up vector from camera frames (reference
    data_loader/__init__.py:19-33): the direction least aligned with the
    cameras' right axes (plus a small forward penalty), signed to match
    the cameras' average up."""
    right = np.asarray(c2ws[:, :3, 0], np.float64)
    down = np.asarray(c2ws[:, :3, 1], np.float64)
    forward = np.asarray(c2ws[:, :3, 2], np.float64)

    A = right.T @ right + 0.02 * (forward.T @ forward)
    eigvals, eigvecs = np.linalg.eigh(A)
    up = eigvecs[:, np.argmin(eigvals)]
    up *= np.sign((-down @ up).sum())
    return up.astype(np.float32)


class DataHandler:
    PATCH_SIZE = 8

    def __init__(self, dataset_args, rays_per_batch, device=None):
        self.args = dataset_args
        self.rays_per_batch = rays_per_batch
        self.img_wh = None
        self.patch_size = self.PATCH_SIZE
        self._fetcher = None

    def _make_dataset(self, split, downsample):
        from radfoam_tpu.data.blender import BlenderDataset
        from radfoam_tpu.data.colmap import COLMAPDataset

        dataset_dict = {"colmap": COLMAPDataset, "blender": BlenderDataset}
        data_dir = os.path.join(self.args.data_path, self.args.scene)
        cls = dataset_dict[self.args.dataset]
        if downsample is not None:
            return cls(data_dir, split=split, downsample=downsample)
        return cls(data_dir, split=split)

    def reload(self, split, downsample=None):
        ds = self._make_dataset(split, downsample)
        self.img_wh = ds.img_wh
        self.fx = ds.fx
        self.fy = ds.fy
        self.cx = getattr(ds, "cx", ds.img_wh[0] / 2.0)
        self.cy = getattr(ds, "cy", ds.img_wh[1] / 2.0)
        self.cam_dirs = getattr(ds, "cam_dirs", None)
        self._dir_grid_cache = None
        self._dir_grid_dev = None
        self.c2ws = np.asarray(ds.poses)
        self.rays = np.asarray(ds.all_rays)
        self.rgbs = np.asarray(ds.all_rgbs)
        self.alphas = np.asarray(
            getattr(ds, "all_alphas", np.ones_like(self.rgbs[..., :1]))
        )

        self.viewer_up = get_up(self.c2ws)
        self.viewer_pos = self.c2ws[0, :3, 3]
        self.viewer_forward = self.c2ws[0, :3, 2]

        self.points3D = getattr(ds, "points3D", None)
        self.points3D_colors = getattr(ds, "points3D_color", None)

        if split == "train":
            self._pack_train()

    def _pack_train(self):
        """Pack per-ray training columns into one (rows, ..., 11) array."""
        V, H, W = self.rays.shape[:3]
        img_idx = np.broadcast_to(
            np.arange(V, dtype=np.float32)[:, None, None, None],
            (V, H, W, 1),
        )
        packed = np.concatenate(
            [
                self.rays.astype(np.float32),
                self.rgbs.astype(np.float32),
                self.alphas.astype(np.float32),
                img_idx,
            ],
            axis=-1,
        )
        if getattr(self.args, "patch_based", False):
            ps = self.patch_size
            # resample to patch-aligned dimensions, then cut into patches
            dw, dh = W - W % ps, H - H % ps
            w_inds = np.linspace(0, W - 1, dw, dtype=int)
            h_inds = np.linspace(0, H - 1, dh, dtype=int)
            packed = packed[:, h_inds][:, :, w_inds]
            packed = packed.reshape(V, dh // ps, ps, dw // ps, ps, 11)
            packed = packed.transpose(0, 1, 3, 2, 4, 5)
            self.train_packed = np.ascontiguousarray(
                packed.reshape(-1, ps * ps, 11)
            )
            self.batch_size = self.rays_per_batch // (ps * ps)
        else:
            self.train_packed = np.ascontiguousarray(
                packed.reshape(-1, 11)
            )
            self.batch_size = self.rays_per_batch

        self.train_rays = self.train_packed[..., :6]
        self.train_rgbs = self.train_packed[..., 6:9]
        self.train_alphas = self.train_packed[..., 9:10]

    def raster_camera(self, i):
        """(basis (4, 3) [pos fwd rgt up], intrin (4,)) for view i in the
        raster engines' affine camera model (raster.dataset_intrin),
        using the dataset's true principal point."""
        from radfoam_tpu.ops.raster import dataset_intrin

        c2w = self.c2ws[i]
        basis = np.stack(
            [c2w[:3, 3], c2w[:3, 2], c2w[:3, 0], c2w[:3, 1]]
        ).astype(np.float32)
        intrin = np.array(
            dataset_intrin(
                float(self.fx), float(self.fy), float(self.cx),
                float(self.cy),
            ),
            np.float32,
        )
        return basis, intrin

    def raster_dir_grid(self, tile=16):
        """Exact raster camera for this dataset's (shared) intrinsics.

        Returns (dir_grid, intrin, pad_px): ``dir_grid`` is the per-tile
        camera-frame direction grid (ops/dirgrid.make_dir_grid) or None
        when the affine model is already pixel-exact (undistorted
        pinholes — e.g. Blender), ``intrin`` the least-squares affine
        binning intrinsics and ``pad_px`` its conservative margin.
        Cached per reload; the grid is pose-independent, so one array
        serves every view of the split.
        """
        if self._dir_grid_cache is not None:
            return self._dir_grid_cache
        from radfoam_tpu.ops.dirgrid import (
            fit_affine_intrin,
            make_dir_grid,
        )

        w, h = self.img_wh
        if self.cam_dirs is None:
            basis0, intrin = self.raster_camera(0)
            self._dir_grid_cache = (None, intrin, 0.0)
            return self._dir_grid_cache
        intrin, pad_px = fit_affine_intrin(self.cam_dirs, w, h)
        if pad_px < 0.5:
            # affine is sub-pixel exact: skip the grid (in-kernel camera)
            self._dir_grid_cache = (None, intrin, 0.0)
        else:
            grid = make_dir_grid(self.cam_dirs, w, h, tile)
            self._dir_grid_cache = (grid, intrin, pad_px)
        return self._dir_grid_cache

    def get_iter(self):
        from radfoam_tpu.data.fetcher import BatchFetcher

        self.stop()
        self._fetcher = BatchFetcher(
            self.train_packed, self.batch_size, shuffle=True
        )
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
