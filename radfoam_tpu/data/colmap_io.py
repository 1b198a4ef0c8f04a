"""COLMAP reconstruction reader + camera models (pycolmap replacement).

The reference consumes COLMAP output through pycolmap
(data_loader/colmap.py:40-68): it reads a sparse reconstruction, rescales
the camera to the working resolution, and unprojects pixel grids with
``cam_from_img`` (which inverts the lens distortion).  pycolmap is not in
this image, so this module parses the binary/text reconstruction format
directly and implements the camera models with a vectorized Newton
inversion for the distortion — numerically equivalent to pycolmap's
IterativeUndistortion.
"""

import os
import struct

import numpy as np

# model_id -> (name, number of params) per COLMAP's camera_models.h
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}

# models whose params open with a single shared focal length f, cx, cy
_SINGLE_FOCAL = {
    "SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL",
    "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE",
}


def qvec_to_rotmat(qvec):
    """Rotation matrix from a COLMAP (w, x, y, z) quaternion."""
    w, x, y, z = np.asarray(qvec, np.float64)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class ColmapCamera:
    """One COLMAP camera: intrinsics + lens distortion.

    ``cam_from_img`` maps pixels to normalized image-plane coordinates,
    inverting the distortion (the reference relies on pycolmap for this,
    data_loader/colmap.py:10-20); ``img_from_cam`` is the forward model.
    """

    def __init__(self, camera_id, model, width, height, params):
        self.camera_id = int(camera_id)
        self.model = model if isinstance(model, str) else (
            CAMERA_MODELS[int(model)][0]
        )
        self.width = int(width)
        self.height = int(height)
        self.params = np.asarray(params, np.float64).copy()

    # -- intrinsics ------------------------------------------------------

    def _single_focal(self):
        if self.model in _SINGLE_FOCAL:
            return True
        if self.model == "FOV" and len(self.params) == 4:
            # tolerate the compact (f, cx, cy, omega) layout
            return True
        return False

    @property
    def focal(self):
        if self._single_focal():
            return (float(self.params[0]), float(self.params[0]))
        return (float(self.params[0]), float(self.params[1]))

    @property
    def principal_point(self):
        base = 1 if self._single_focal() else 2
        return (float(self.params[base]), float(self.params[base + 1]))

    @property
    def _extra(self):
        base = 3 if self._single_focal() else 4
        return self.params[base:]

    def rescale(self, new_width, new_height):
        """Scale intrinsics to a new resolution (pycolmap Camera.rescale)."""
        sx = new_width / self.width
        sy = new_height / self.height
        if self._single_focal():
            self.params[0] *= 0.5 * (sx + sy)
            self.params[1] *= sx
            self.params[2] *= sy
        else:
            self.params[0] *= sx
            self.params[1] *= sy
            self.params[2] *= sx
            self.params[3] *= sy
        self.width = int(new_width)
        self.height = int(new_height)

    # -- distortion ------------------------------------------------------

    def _distort(self, uv):
        """Normalized ideal coords -> distorted coords (COLMAP forward)."""
        e = self._extra
        m = self.model
        u, v = uv[..., 0], uv[..., 1]
        if m in ("SIMPLE_PINHOLE", "PINHOLE") or e.size == 0:
            return uv
        if m in ("SIMPLE_RADIAL", "RADIAL"):
            r2 = u * u + v * v
            f = 1.0 + e[0] * r2
            if m == "RADIAL":
                f = f + e[1] * r2 * r2
            return uv * f[..., None]
        if m in ("OPENCV", "FULL_OPENCV"):
            k1, k2, p1, p2 = e[0], e[1], e[2], e[3]
            r2 = u * u + v * v
            if m == "FULL_OPENCV":
                k3, k4, k5, k6 = e[4], e[5], e[6], e[7]
                rad = (1 + r2 * (k1 + r2 * (k2 + r2 * k3))) / (
                    1 + r2 * (k4 + r2 * (k5 + r2 * k6))
                )
            else:
                rad = 1 + r2 * (k1 + r2 * k2)
            du = 2 * p1 * u * v + p2 * (r2 + 2 * u * u)
            dv = p1 * (r2 + 2 * v * v) + 2 * p2 * u * v
            return np.stack([u * rad + du, v * rad + dv], axis=-1)
        if m in ("OPENCV_FISHEYE", "SIMPLE_RADIAL_FISHEYE",
                 "RADIAL_FISHEYE"):
            r = np.sqrt(u * u + v * v)
            theta = np.arctan(r)
            t2 = theta * theta
            if m == "OPENCV_FISHEYE":
                td = theta * (1 + t2 * (e[0] + t2 * (e[1] + t2 * (
                    e[2] + t2 * e[3]))))
            elif m == "SIMPLE_RADIAL_FISHEYE":
                td = theta * (1 + t2 * e[0])
            else:
                td = theta * (1 + t2 * (e[0] + t2 * e[1]))
            scale = np.where(r > 1e-12, td / np.maximum(r, 1e-12), 1.0)
            return uv * scale[..., None]
        if m == "FOV":
            omega = e[0]
            r = np.sqrt(u * u + v * v)
            lim = 2.0 * np.tan(omega / 2.0)
            factor = np.where(
                r > 1e-12,
                np.arctan(r * lim) / (np.maximum(r, 1e-12) * omega),
                lim / omega,
            )
            return uv * factor[..., None]
        if m == "THIN_PRISM_FISHEYE":
            k1, k2, p1, p2, k3, k4, sx1, sy1 = e
            r = np.sqrt(u * u + v * v)
            theta = np.arctan(r)
            t2 = theta * theta
            td = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
            scale = np.where(r > 1e-12, td / np.maximum(r, 1e-12), 1.0)
            ud, vd = u * scale, v * scale
            r2 = ud * ud + vd * vd
            du = 2 * p1 * ud * vd + p2 * (r2 + 2 * ud * ud) + sx1 * r2
            dv = p1 * (r2 + 2 * vd * vd) + 2 * p2 * ud * vd + sy1 * r2
            return np.stack([ud + du, vd + dv], axis=-1)
        raise ValueError(f"unsupported camera model {m}")

    def _undistort(self, dv):
        """Invert ``_distort`` with damped Newton (numeric 2x2 Jacobian)."""
        if self.model in ("SIMPLE_PINHOLE", "PINHOLE") or (
            self._extra.size == 0
        ):
            return dv
        uv = dv.astype(np.float64).copy()
        eps = 1e-7
        ex = np.array([eps, 0.0])
        ey = np.array([0.0, eps])
        for _ in range(40):
            f0 = self._distort(uv) - dv
            if np.abs(f0).max() < 1e-12:
                break
            jx = (self._distort(uv + ex) - f0 - dv) / eps
            jy = (self._distort(uv + ey) - f0 - dv) / eps
            a, c = jx[..., 0], jx[..., 1]
            b, d = jy[..., 0], jy[..., 1]
            det = a * d - b * c
            det = np.where(np.abs(det) < 1e-16, 1.0, det)
            du = (d * f0[..., 0] - b * f0[..., 1]) / det
            dvv = (a * f0[..., 1] - c * f0[..., 0]) / det
            uv[..., 0] -= du
            uv[..., 1] -= dvv
        return uv

    def cam_from_img(self, pix):
        """Pixels (N, 2) -> undistorted normalized image-plane coords."""
        pix = np.asarray(pix, np.float64)
        fx, fy = self.focal
        cx, cy = self.principal_point
        d = np.stack(
            [(pix[..., 0] - cx) / fx, (pix[..., 1] - cy) / fy], axis=-1
        )
        return self._undistort(d)

    def img_from_cam(self, uv):
        """Normalized image-plane coords -> pixels (forward projection)."""
        d = self._distort(np.asarray(uv, np.float64))
        fx, fy = self.focal
        cx, cy = self.principal_point
        return np.stack(
            [d[..., 0] * fx + cx, d[..., 1] * fy + cy], axis=-1
        )


class ColmapImage:
    """One registered image: pose (world->cam) + 2D-3D correspondences."""

    def __init__(self, image_id, qvec, tvec, camera_id, name, xys,
                 point3D_ids):
        self.image_id = int(image_id)
        self.qvec = np.asarray(qvec, np.float64)
        self.tvec = np.asarray(tvec, np.float64)
        self.camera_id = int(camera_id)
        self.name = name
        self.xys = np.asarray(xys, np.float64).reshape(-1, 2)
        self.point3D_ids = np.asarray(point3D_ids, np.int64)

    def world_from_cam(self):
        """4x4 camera-to-world transform (inverse of the stored pose)."""
        R = qvec_to_rotmat(self.qvec)
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ self.tvec
        return c2w


class Reconstruction:
    def __init__(self, cameras, images, points_xyz, points_rgb,
                 points_err=None):
        self.cameras = cameras
        self.images = images
        self.points_xyz = points_xyz
        self.points_rgb = points_rgb
        self.points_err = points_err


# -- binary readers (COLMAP's read_write_model format) ---------------------


def _read_cameras_bin(path):
    cameras = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            cam_id, model_id, w, h = struct.unpack("<iiQQ", f.read(24))
            name, n_params = CAMERA_MODELS[model_id]
            params = struct.unpack(f"<{n_params}d", f.read(8 * n_params))
            cameras[cam_id] = ColmapCamera(cam_id, name, w, h, params)
    return cameras


def _read_images_bin(path):
    images = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            (image_id,) = struct.unpack("<i", f.read(4))
            qvec = struct.unpack("<4d", f.read(32))
            tvec = struct.unpack("<3d", f.read(24))
            (camera_id,) = struct.unpack("<i", f.read(4))
            name = bytearray()
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = struct.unpack("<Q", f.read(8))
            raw = np.frombuffer(f.read(24 * n_pts), dtype=np.uint8)
            rec = raw.view([("x", "<f8"), ("y", "<f8"), ("id", "<i8")])
            xys = np.stack([rec["x"], rec["y"]], axis=-1)
            images[image_id] = ColmapImage(
                image_id, qvec, tvec, camera_id, name.decode("utf-8"),
                xys, rec["id"].copy(),
            )
    return images


def _read_points_bin(path):
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        xyz = np.empty((n, 3), np.float64)
        rgb = np.empty((n, 3), np.uint8)
        err = np.empty((n,), np.float64)
        for i in range(n):
            head = struct.unpack("<Q3d3Bd", f.read(8 + 24 + 3 + 8))
            xyz[i] = head[1:4]
            rgb[i] = head[4:7]
            err[i] = head[7]
            (track_len,) = struct.unpack("<Q", f.read(8))
            f.seek(8 * track_len, os.SEEK_CUR)
    return xyz, rgb, err


# -- text readers -----------------------------------------------------------


def _data_lines(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                yield line


def _read_cameras_txt(path):
    cameras = {}
    for line in _data_lines(path):
        parts = line.split()
        cam_id, model = int(parts[0]), parts[1]
        w, h = int(parts[2]), int(parts[3])
        params = [float(p) for p in parts[4:]]
        cameras[cam_id] = ColmapCamera(cam_id, model, w, h, params)
    return cameras


def _read_images_txt(path):
    images = {}
    lines = list(_data_lines(path))
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        image_id = int(parts[0])
        qvec = [float(p) for p in parts[1:5]]
        tvec = [float(p) for p in parts[5:8]]
        camera_id = int(parts[8])
        name = parts[9]
        obs = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = [[float(obs[j]), float(obs[j + 1])]
               for j in range(0, len(obs), 3)]
        ids = [int(obs[j + 2]) for j in range(0, len(obs), 3)]
        images[image_id] = ColmapImage(
            image_id, qvec, tvec, camera_id, name, xys, ids
        )
    return images


def _read_points_txt(path):
    xyz, rgb, err = [], [], []
    for line in _data_lines(path):
        parts = line.split()
        xyz.append([float(p) for p in parts[1:4]])
        rgb.append([int(p) for p in parts[4:7]])
        err.append(float(parts[7]))
    return (
        np.asarray(xyz, np.float64).reshape(-1, 3),
        np.asarray(rgb, np.uint8).reshape(-1, 3),
        np.asarray(err, np.float64),
    )


def read_reconstruction(path):
    """Read a COLMAP sparse reconstruction (binary preferred, text
    fallback) into a :class:`Reconstruction`."""
    if os.path.exists(os.path.join(path, "cameras.bin")):
        cameras = _read_cameras_bin(os.path.join(path, "cameras.bin"))
        images = _read_images_bin(os.path.join(path, "images.bin"))
        xyz, rgb, err = _read_points_bin(os.path.join(path, "points3D.bin"))
    elif os.path.exists(os.path.join(path, "cameras.txt")):
        cameras = _read_cameras_txt(os.path.join(path, "cameras.txt"))
        images = _read_images_txt(os.path.join(path, "images.txt"))
        xyz, rgb, err = _read_points_txt(os.path.join(path, "points3D.txt"))
    else:
        raise FileNotFoundError(
            f"no COLMAP reconstruction (cameras.bin/.txt) in {path}"
        )
    return Reconstruction(cameras, images, xyz, rgb, err)
