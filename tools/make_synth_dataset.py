"""Generate a full-resolution synthetic Blender-format dataset on the TPU.

The image ships no Mip-NeRF 360 / NeRF-synthetic data (zero egress), so the
reference-scale training run (VERDICT r2 task 2) trains against a
walk-traced ground-truth foam rendered at real resolution: exact images of
an actual Voronoi radiance field, i.e. the model family can represent the
target exactly and PSNR directly measures optimization quality, the same
role the Blender lego smoke config plays in BASELINE.json.

Writes transforms_{train,test}.json + PNGs in the loader's convention
(tests/test_cli_integration.py round-trips it).

Usage: python tools/make_synth_dataset.py --out /tmp/bigds --wh 800
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bigds")
    ap.add_argument("--points", type=int, default=8000)
    ap.add_argument("--sh", type=int, default=2)
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--train", type=int, default=36)
    ap.add_argument("--test", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image
    import jax.numpy as jnp

    from radfoam_tpu.data.synthetic import make_ground_truth_scene
    from radfoam_tpu.data.blender import get_ray_directions, BLENDER2OPENCV
    from radfoam_tpu.ops.trace import TraceConfig, trace

    pts, attrs, table, _ = make_ground_truth_scene(
        n_points=args.points, sh_degree=args.sh, seed=args.seed
    )
    pts_d = jnp.asarray(pts)
    attrs_d = jnp.asarray(attrs)
    table_d = jnp.asarray(table)
    cfg = TraceConfig(sh_degree=args.sh, num_quantiles=0)
    wh = args.wh
    fov_x = np.deg2rad(50)
    focal = 0.5 * wh / np.tan(0.5 * fov_x)
    cam_dirs = get_ray_directions(wh, wh, [focal, focal])

    root = os.path.join(args.out, "blob")
    os.makedirs(root, exist_ok=True)
    for split, n_views, phase in [("train", args.train, 0.0),
                                  ("test", args.test, 0.17)]:
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for v in range(n_views):
            ang = 2 * np.pi * v / n_views + phase
            # two-elevation orbit for parallax coverage
            zc = 1.2 if v % 2 == 0 else 2.2
            rad = 3.5 if v % 2 == 0 else 3.0
            eye = np.array(
                [rad * np.cos(ang), rad * np.sin(ang), zc], np.float32
            )
            fwd = -eye / np.linalg.norm(eye)
            up0 = np.array([0, 0, 1.0], np.float32)
            right = np.cross(fwd, up0)
            right /= np.linalg.norm(right)
            up = np.cross(right, fwd)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, 0] = right
            c2w[:3, 1] = up
            c2w[:3, 2] = -fwd
            c2w[:3, 3] = eye

            pose_cv = c2w @ BLENDER2OPENCV
            dirs_w = cam_dirs @ pose_cv[:3, :3].T
            origins = np.broadcast_to(pose_cv[:3, 3], dirs_w.shape)
            rays = np.concatenate([origins, dirs_w], -1).astype(np.float32)
            start = int(np.argmin(np.sum((pts - eye) ** 2, axis=1)))
            out = trace(
                pts_d, attrs_d, table_d,
                jnp.asarray(rays.reshape(-1, 6)),
                jnp.full((rays.size // 6,), start, jnp.int32), config=cfg,
            )
            rgba = np.asarray(out.rgba).reshape(wh, wh, 4)
            rgb = np.clip(rgba[..., :3] + (1 - rgba[..., 3:]), 0, 1)
            a = np.clip(rgba[..., 3:], 0, 1)
            img = np.concatenate([rgb, a], axis=-1)
            Image.fromarray(np.uint8(img * 255), "RGBA").save(
                os.path.join(root, split, f"r_{v}.png")
            )
            frames.append({
                "file_path": f"./{split}/r_{v}",
                "transform_matrix": c2w.tolist(),
            })
            print(f"{split} {v + 1}/{n_views}", flush=True)
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({
                "camera_angle_x": float(fov_x),
                "w": wh, "h": wh,
                "frames": frames,
            }, f)
    print(f"dataset at {root}")


if __name__ == "__main__":
    main()
