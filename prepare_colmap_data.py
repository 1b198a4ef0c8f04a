"""Dataset preprocessing CLI.

The reference runs full COLMAP SfM via pycolmap (feature extraction,
exhaustive matching, incremental mapping) and then builds Lanczos image
pyramids + a point_cloud.ply (prepare_colmap_data.py:10-92). pycolmap is
not available in this image, so:

  * If a COLMAP sparse reconstruction already exists (sparse/0), this
    script builds the images_{2,4,8} pyramids and exports point_cloud.ply
    from it — everything train.py needs.
  * If no reconstruction exists, it explains how to produce one (run
    COLMAP externally), instead of failing cryptically.
"""

import argparse
import os

import numpy as np
from PIL import Image


def build_image_pyramids(scene_dir):
    images_dir = os.path.join(scene_dir, "images")
    names = sorted(
        f for f in os.listdir(images_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    for factor in (2, 4, 8):
        out_dir = os.path.join(scene_dir, f"images_{factor}")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            dst = os.path.join(out_dir, name)
            if os.path.exists(dst):
                continue
            with Image.open(os.path.join(images_dir, name)) as im:
                w, h = im.size
                im.resize((w // factor, h // factor), Image.LANCZOS).save(
                    dst
                )
        print(f"wrote {len(names)} images at 1/{factor}")


def export_point_cloud(scene_dir):
    from radfoam_tpu.data.colmap_io import read_reconstruction
    from radfoam_tpu.utils.ply import write_ply

    rec = read_reconstruction(os.path.join(scene_dir, "sparse/0"))
    xyz = rec.points_xyz.astype(np.float32)
    rgb = rec.points_rgb.astype(np.uint8)
    vertex = np.empty(xyz.shape[0], dtype=[
        ("x", np.float32), ("y", np.float32), ("z", np.float32),
        ("red", np.uint8), ("green", np.uint8), ("blue", np.uint8),
    ])
    vertex["x"], vertex["y"], vertex["z"] = xyz.T
    vertex["red"], vertex["green"], vertex["blue"] = rgb.T
    write_ply(os.path.join(scene_dir, "point_cloud.ply"), [
        ("vertex", vertex)
    ])
    print(f"wrote point_cloud.ply with {xyz.shape[0]} points")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene_path", required=True,
                        help="scene dir containing images/ (and sparse/0)")
    args = parser.parse_args()

    scene_dir = args.scene_path
    sparse = os.path.join(scene_dir, "sparse/0")
    if not os.path.exists(sparse):
        raise SystemExit(
            f"No COLMAP reconstruction at {sparse}. Run COLMAP externally "
            "first, e.g.:\n"
            "  colmap feature_extractor --database_path db.db "
            "--image_path images\n"
            "  colmap exhaustive_matcher --database_path db.db\n"
            "  colmap mapper --database_path db.db --image_path images "
            "--output_path sparse\n"
            "then re-run this script to build image pyramids + "
            "point_cloud.ply."
        )
    build_image_pyramids(scene_dir)
    export_point_cloud(scene_dir)


if __name__ == "__main__":
    main()
