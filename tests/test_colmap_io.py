"""COLMAP binary/text parser roundtrip tests (the pycolmap replacement)."""

import os
import struct

import numpy as np
import pytest

from radfoam_tpu.data.colmap_io import (
    ColmapCamera,
    read_reconstruction,
    qvec_to_rotmat,
)


def _write_colmap_binary(d, cameras, images, points):
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cam_id, model_id, w, h, params in cameras:
            f.write(struct.pack("<iiQQ", cam_id, model_id, w, h))
            f.write(struct.pack(f"<{len(params)}d", *params))
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for img_id, qvec, tvec, cam_id, name, pts2d in images:
            f.write(struct.pack("<i", img_id))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *tvec))
            f.write(struct.pack("<i", cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(pts2d)))
            for x, y, p3d in pts2d:
                f.write(struct.pack("<ddq", x, y, p3d))
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pid, xyz, rgb, err, track in points:
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", *xyz))
            f.write(struct.pack("<3B", *rgb))
            f.write(struct.pack("<d", err))
            f.write(struct.pack("<Q", len(track)))
            for im, p2d in track:
                f.write(struct.pack("<ii", im, p2d))


@pytest.fixture
def colmap_dir(tmp_path, rng):
    d = str(tmp_path / "sparse0")
    os.makedirs(d)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    cameras = [(1, 1, 640, 480, [500.0, 510.0, 320.0, 240.0])]  # PINHOLE
    images = [
        (7, q.tolist(), [0.1, -0.2, 2.0], 1, "img_000.png",
         [(10.0, 20.0, 5), (30.0, 40.0, -1)]),
        (8, [1.0, 0, 0, 0], [0.0, 0.0, 1.0], 1, "img_001.png", []),
    ]
    points = [
        (5, [1.0, 2.0, 3.0], [255, 128, 0], 0.5, [(7, 0)]),
        (6, [-1.0, 0.5, 2.5], [0, 255, 64], 0.3, [(7, 1), (8, 0)]),
    ]
    _write_colmap_binary(d, cameras, images, points)
    return d, q


def test_binary_roundtrip(colmap_dir):
    d, q = colmap_dir
    rec = read_reconstruction(d)
    cam = rec.cameras[1]
    assert cam.model == "PINHOLE"
    assert cam.focal == (500.0, 510.0)
    assert cam.principal_point == (320.0, 240.0)

    im = rec.images[7]
    assert im.name == "img_000.png"
    np.testing.assert_allclose(im.qvec, q)
    np.testing.assert_allclose(im.tvec, [0.1, -0.2, 2.0])

    assert rec.points_xyz.shape == (2, 3)
    np.testing.assert_allclose(rec.points_xyz[0], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(rec.points_rgb[1], [0, 255, 64])


def test_world_from_cam_inverse(colmap_dir):
    d, q = colmap_dir
    rec = read_reconstruction(d)
    im = rec.images[7]
    c2w = im.world_from_cam()
    R = qvec_to_rotmat(im.qvec)
    # cam_from_world(c2w @ x) == x
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = im.tvec
    np.testing.assert_allclose(w2c @ c2w, np.eye(4), atol=1e-12)


def test_camera_rescale_and_unproject():
    cam = ColmapCamera(1, "PINHOLE", 640, 480,
                       np.array([500.0, 510.0, 320.0, 240.0]))
    cam.rescale(320, 240)
    assert cam.focal == (250.0, 255.0)
    assert cam.principal_point == (160.0, 120.0)
    # principal point unprojects to the optical axis
    ip = cam.cam_from_img(np.array([[160.0, 120.0]]))
    np.testing.assert_allclose(ip, [[0.0, 0.0]], atol=1e-12)


def test_undistortion_roundtrip():
    """cam_from_img must invert distortion (VERDICT r1 task 5): for every
    distorted model, img_from_cam(cam_from_img(pix)) == pix."""
    from radfoam_tpu.data.colmap_io import ColmapCamera

    rng = np.random.default_rng(3)
    w, h = 640, 480
    pix = np.stack([
        rng.uniform(w * 0.08, w * 0.92, 500),
        rng.uniform(h * 0.08, h * 0.92, 500),
    ], axis=-1)

    cams = [
        ("SIMPLE_RADIAL", [520.0, 320.0, 240.0, -0.08]),
        ("RADIAL", [520.0, 320.0, 240.0, -0.12, 0.03]),
        ("OPENCV", [520.0, 515.0, 320.0, 240.0, -0.15, 0.04, 1e-3, -8e-4]),
        ("OPENCV_FISHEYE",
         [420.0, 418.0, 320.0, 240.0, -0.02, 0.004, -0.001, 2e-4]),
        ("FULL_OPENCV",
         [520.0, 515.0, 320.0, 240.0, -0.15, 0.04, 1e-3, -8e-4,
          -0.006, 0.01, -0.002, 1e-3]),
        ("FOV", [520.0, 320.0, 240.0, 0.9]),
    ]
    for model, params in cams:
        cam = ColmapCamera(0, model, w, h, np.asarray(params, np.float64))
        und = cam.cam_from_img(pix)
        back = cam.img_from_cam(und)
        err = np.abs(back - pix).max()
        assert err < 1e-6, f"{model}: roundtrip err {err}"
        # distortion must actually matter for these synthetic params
        fx, fy = cam.focal
        cx, cy = cam.principal_point
        naive = np.stack(
            [(pix[:, 0] - cx) / fx, (pix[:, 1] - cy) / fy], axis=-1
        )
        assert np.abs(und - naive).max() > 1e-3, f"{model}: no-op distortion"


def test_undistortion_pinhole_passthrough():
    from radfoam_tpu.data.colmap_io import ColmapCamera

    cam = ColmapCamera(0, "PINHOLE", 64, 64,
                       np.array([60.0, 60.0, 32.0, 32.0]))
    pix = np.array([[10.0, 20.0], [40.0, 50.0]])
    und = cam.cam_from_img(pix)
    np.testing.assert_allclose(
        und, (pix - 32.0) / 60.0, rtol=0, atol=1e-12
    )
