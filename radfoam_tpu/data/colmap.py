"""COLMAP (mip-NeRF 360 style) dataset loader.

Follows the reference's split/ray conventions (data_loader/colmap.py:23-126)
— every 8th image by sorted name is test, the camera is rescaled to the
working resolution, and ray directions come from the camera model's
``cam_from_img`` (including lens undistortion, via colmap_io's Newton
inversion rather than pycolmap).
"""

import os

import numpy as np
from PIL import Image

from radfoam_tpu.data.colmap_io import read_reconstruction


def get_cam_ray_dirs(camera):
    """Unit ray directions for every pixel center of a COLMAP camera."""
    x = np.arange(camera.width, dtype=np.float32) + 0.5
    y = np.arange(camera.height, dtype=np.float32) + 0.5
    xx, yy = np.meshgrid(x, y)
    pix = np.stack([xx, yy], axis=-1).reshape(-1, 2)
    ip = camera.cam_from_img(pix)
    dirs = np.concatenate([ip, np.ones_like(ip[:, :1])], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs.astype(np.float32)


class COLMAPDataset:
    def __init__(self, datadir, split="train", downsample=1):
        assert downsample in [1, 2, 4, 8]
        self.root_dir = datadir
        self.split = split
        self.downsample = downsample

        if downsample == 1:
            images_dir = os.path.join(datadir, "images")
        else:
            images_dir = os.path.join(datadir, f"images_{downsample}")
        if not os.path.exists(images_dir):
            raise ValueError(f"Images directory {images_dir} not found")

        rec = read_reconstruction(os.path.join(datadir, "sparse/0"))
        if len(rec.cameras) > 1:
            raise ValueError("Multiple cameras are not supported")

        by_name = {im.name: im for im in rec.images.values()}
        names = sorted(by_name)
        indices = np.arange(len(names))
        if split == "train":
            names = [n for n, i in zip(names, indices) if i % 8 != 0]
        elif split == "test":
            names = [n for n, i in zip(names, indices) if i % 8 == 0]
        else:
            raise ValueError(f"Invalid split: {split}")

        with Image.open(os.path.join(images_dir, names[0])) as im:
            self.img_wh = im.size

        self.camera = next(iter(rec.cameras.values()))
        self.camera.rescale(self.img_wh[0], self.img_wh[1])
        self.fx, self.fy = self.camera.focal
        self.cx, self.cy = self.camera.principal_point

        cam_dirs = get_cam_ray_dirs(self.camera)
        # camera-frame unit directions (incl. lens undistortion), exposed
        # for the raster engines' exact direction-grid path (ops/dirgrid)
        self.cam_dirs = cam_dirs.reshape(
            self.img_wh[1], self.img_wh[0], 3
        )

        poses, all_rays, all_rgbs = [], [], []
        for name in names:
            image = by_name[name]
            c2w = image.world_from_cam().astype(np.float32)
            poses.append(c2w)
            dirs_w = cam_dirs @ c2w[:3, :3].T
            origins = np.broadcast_to(c2w[:3, 3], dirs_w.shape)
            rays = np.concatenate([origins, dirs_w], axis=-1)
            all_rays.append(
                rays.reshape(self.img_wh[1], self.img_wh[0], 6).astype(
                    np.float32
                )
            )
            with Image.open(os.path.join(images_dir, name)) as im:
                rgb = np.asarray(im.convert("RGB"), np.float32) / 255.0
            all_rgbs.append(rgb)

        self.poses = np.stack(poses)
        self.all_rays = np.stack(all_rays)
        self.all_rgbs = np.stack(all_rgbs)

        self.points3D = rec.points_xyz.astype(np.float32)
        self.points3D_color = rec.points_rgb.astype(np.float32) / 255.0

    def __len__(self):
        return self.all_rgbs.shape[0]
