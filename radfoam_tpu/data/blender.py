"""NeRF-synthetic (Blender) dataset loader.

Numpy re-implementation of the reference's torch loader
(data_loader/blender.py:30-125): reads ``transforms_{split}.json``,
converts Blender camera-to-world poses (x right, y up, z backward) to the
OpenCV convention, unprojects a pixel grid once per resolution, and
composites RGBA frames onto a white background, keeping the alpha channel
for the opacity loss.
"""

import json
import math
import os

import numpy as np
from PIL import Image

# Blender camera axes -> OpenCV camera axes (y down, z forward)
BLENDER2OPENCV = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]],
    np.float32,
)


def get_ray_directions(H, W, focal, center=None):
    """Unit ray directions through each pixel center, camera frame.

    Returns (H*W, 3) float32, row-major over (y, x) — matches the
    reference's pixel enumeration (data_loader/blender.py:10-27).
    """
    cx, cy = center if center is not None else (W / 2.0, H / 2.0)
    x = np.arange(W, dtype=np.float32) + 0.5
    y = np.arange(H, dtype=np.float32) + 0.5
    xx, yy = np.meshgrid(x, y)
    dirs = np.stack(
        [
            (xx - cx) / focal[0],
            (yy - cy) / focal[1],
            np.ones_like(xx),
        ],
        axis=-1,
    ).reshape(-1, 3)
    return dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)


class BlenderDataset:
    def __init__(self, datadir, split="train", downsample=1):
        self.root_dir = datadir
        self.split = split
        self.downsample = downsample
        self.points3D = None
        self.points3D_color = None

        with open(os.path.join(datadir, f"transforms_{split}.json")) as f:
            meta = json.load(f)
        if "w" in meta and "h" in meta:
            W, H = int(meta["w"]), int(meta["h"])
        else:
            W, H = 800, 800

        self.img_wh = (int(W / downsample), int(H / downsample))
        w, h = self.img_wh
        focal = 0.5 * w / math.tan(0.5 * meta["camera_angle_x"])
        self.fx = self.fy = focal
        self.cx, self.cy = w / 2.0, h / 2.0

        cam_dirs = get_ray_directions(h, w, [focal, focal])
        # camera-frame unit directions, exposed for the raster engines'
        # exact direction-grid path (ops/dirgrid)
        self.cam_dirs = cam_dirs.reshape(h, w, 3)

        poses, all_rays, all_rgbs, all_alphas = [], [], [], []
        for frame in meta["frames"]:
            c2w = (
                np.asarray(frame["transform_matrix"], np.float32)
                @ BLENDER2OPENCV
            )
            poses.append(c2w)
            dirs_w = cam_dirs @ c2w[:3, :3].T
            origins = np.broadcast_to(c2w[:3, 3], dirs_w.shape)
            rays = np.concatenate([origins, dirs_w], axis=-1)
            all_rays.append(rays.reshape(h, w, 6).astype(np.float32))

            img_path = os.path.join(datadir, f"{frame['file_path']}.png")
            with Image.open(img_path) as im:
                if downsample != 1:
                    im = im.resize(self.img_wh, Image.LANCZOS)
                rgba = np.asarray(im.convert("RGBA"), np.float32) / 255.0
            alpha = rgba[..., 3:4]
            all_rgbs.append(rgba[..., :3] * alpha + (1.0 - alpha))
            all_alphas.append(alpha)

        self.poses = np.stack(poses)
        self.all_rays = np.stack(all_rays)
        self.all_rgbs = np.stack(all_rgbs)
        self.all_alphas = np.stack(all_alphas)

    def __len__(self):
        return self.all_rgbs.shape[0]
