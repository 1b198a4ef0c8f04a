"""CLI integration: the four entry scripts against a tiny on-disk
Blender-format dataset, exercising the reference workflows end to end
(train -> config.yaml/model.pt/scene.ply -> test/benchmark/viewer)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def blender_dataset(tmp_path_factory):
    """Render a synthetic scene into transforms_{train,test}.json + PNGs."""
    from radfoam_tpu.data.synthetic import (
        make_ground_truth_scene,
    )
    from radfoam_tpu.ops.camera import look_at
    import jax.numpy as jnp
    from radfoam_tpu.ops.trace import TraceConfig, trace

    root = tmp_path_factory.mktemp("data") / "blob"
    os.makedirs(root, exist_ok=True)

    sh = 1
    pts, attrs, table, _ = make_ground_truth_scene(n_points=300, sh_degree=sh)
    cfg = TraceConfig(sh_degree=sh, num_quantiles=0)
    wh = 40
    fov_x = np.deg2rad(50)

    for split, n_views, phase in [("train", 6, 0.0), ("test", 2, 0.3)]:
        frames = []
        os.makedirs(root / split, exist_ok=True)
        for v in range(n_views):
            ang = 2 * np.pi * v / n_views + phase
            eye = np.array(
                [3.5 * np.cos(ang), 3.5 * np.sin(ang), 1.2], np.float32
            )
            # blender c2w: x right, y up, z backward (camera looks -z)
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

            # rays in the loader's opencv convention to render GT
            from radfoam_tpu.data.blender import (
                get_ray_directions, BLENDER2OPENCV,
            )

            focal = 0.5 * wh / np.tan(0.5 * fov_x)
            cam_dirs = get_ray_directions(wh, wh, [focal, focal])
            pose_cv = c2w @ BLENDER2OPENCV
            dirs_w = cam_dirs @ pose_cv[:3, :3].T
            origins = np.broadcast_to(pose_cv[:3, 3], dirs_w.shape)
            rays = np.concatenate([origins, dirs_w], -1).astype(np.float32)

            start = int(np.argmin(np.sum((pts - eye) ** 2, axis=1)))
            out = trace(
                jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
                jnp.asarray(rays),
                jnp.full((rays.shape[0],), start, jnp.int32), config=cfg,
            )
            rgba = np.asarray(out.rgba).reshape(wh, wh, 4)
            rgb = np.clip(rgba[..., :3] + (1 - rgba[..., 3:]), 0, 1)
            a = np.clip(rgba[..., 3:], 0, 1)
            img = np.concatenate([rgb, a], axis=-1)
            Image.fromarray(np.uint8(img * 255), "RGBA").save(
                root / split / f"r_{v}.png"
            )
            frames.append({
                "file_path": f"./{split}/r_{v}",
                "transform_matrix": c2w.tolist(),
            })
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({
                "camera_angle_x": float(fov_x),
                "w": wh, "h": wh,
                "frames": frames,
            }, f)
    return str(root.parent)


def _run(args, cwd, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{args} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}"
    )
    return proc


def _common_flags(blender_dataset):
    return [
        "--dataset", "blender",
        "--data_path", blender_dataset,
        "--scene", "blob",
        "--downsample", "1",
        "--downsample_iterations", "0",
        "--sh_degree", "1",
        "--init_points", "512",
        "--final_points", "1024",
        # single-view steps: the auto multi-view default (train_views 0)
        # would run G=6 full frames per step on these tiny images — 6x
        # the CPU smoke-run cost for no extra coverage of the CLI surface
        "--train_views", "1",
    ]


@pytest.fixture(scope="module")
def trained_output(blender_dataset, tmp_path_factory):
    """Run train.py once; the per-CLI tests below each consume its
    checkpoint independently (a train failure errors them all with the
    train traceback instead of masking their own assertions)."""
    workdir = str(tmp_path_factory.mktemp("cli_run"))
    _run(
        [os.path.join(REPO, "train.py"),
         "--iterations", "12",
         "--densify_from", "4", "--densify_until", "10",
         "--freeze_points", "11",
         "--experiment_name", "smoke",
         *_common_flags(blender_dataset)],
        cwd=workdir, timeout=900,
    )
    return workdir, os.path.join(workdir, "output", "smoke")


def test_cli_train_artifacts(trained_output):
    _, out_dir = trained_output
    for name in ("model.pt", "scene.ply", "config.yaml", "metrics.txt"):
        assert os.path.exists(os.path.join(out_dir, name)), name


def test_cli_test(trained_output, blender_dataset):
    workdir, out_dir = trained_output
    cfg = os.path.join(out_dir, "config.yaml")
    _run([os.path.join(REPO, "test.py"), "-c", cfg,
          *_common_flags(blender_dataset)], cwd=workdir)
    with open(os.path.join(out_dir, "metrics.txt")) as f:
        assert "Average PSNR" in f.read()


def test_cli_benchmark(trained_output, blender_dataset):
    workdir, out_dir = trained_output
    cfg = os.path.join(out_dir, "config.yaml")
    bench = _run(
        [os.path.join(REPO, "benchmark.py"), "-c", cfg,
         *_common_flags(blender_dataset)],
        cwd=workdir,
    )
    assert "FPS:" in bench.stdout


def test_cli_viewer_turntable(trained_output, blender_dataset):
    workdir, out_dir = trained_output
    cfg = os.path.join(out_dir, "config.yaml")
    _run(
        [os.path.join(REPO, "viewer.py"), "-c", cfg, "--turntable",
         "--frames", "2", *_common_flags(blender_dataset)],
        cwd=workdir,
    )
    assert os.path.exists(
        os.path.join(out_dir, "turntable", "turntable_000.png")
    )
