"""Camera models and ray generation.

Mirrors the reference camera (src/tracing/camera.h:7-85): pinhole and fisheye
models, `look_at` construction, and per-pixel ray casting. Unlike the CUDA
version (one `cast_ray` per thread), rays for a full image are generated as
one vectorized op so the benchmark/visualization path can fuse ray generation
into the trace kernel's input pipeline.

Rays are packed as (..., 6) = [origin, direction], matching the data-loader
convention (data_loader/__init__.py).
"""

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

PINHOLE = 0
FISHEYE = 1

_MODEL_NAMES = {"pinhole": PINHOLE, "fisheye": FISHEYE}


@dataclass
class Camera:
    """Host-side camera description (reference camera.h:17-33)."""

    position: np.ndarray  # (3,)
    forward: np.ndarray  # (3,)
    right: np.ndarray  # (3,)
    up: np.ndarray  # (3,)
    fov: float  # vertical field of view, radians
    width: int
    height: int
    model: int = PINHOLE

    @staticmethod
    def from_dict(d):
        model = d.get("model", PINHOLE)
        if isinstance(model, str):
            model = _MODEL_NAMES[model.lower()]
        return Camera(
            position=np.asarray(d["position"], dtype=np.float32),
            forward=np.asarray(d["forward"], dtype=np.float32),
            right=np.asarray(d["right"], dtype=np.float32),
            up=np.asarray(d["up"], dtype=np.float32),
            fov=float(d["fov"]),
            width=int(d["width"]),
            height=int(d["height"]),
            model=model,
        )


def look_at(position, target, up, fov, width, height, model=PINHOLE):
    """Construct a camera pointing from position to target (camera.h:36-53)."""
    position = np.asarray(position, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    forward = target - position
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    cup = np.cross(right, forward)
    cup /= np.linalg.norm(cup)
    return Camera(
        position=position.astype(np.float32),
        forward=forward.astype(np.float32),
        right=right.astype(np.float32),
        up=cup.astype(np.float32),
        fov=float(fov),
        width=int(width),
        height=int(height),
        model=model,
    )


def cast_rays(camera: Camera):
    """Generate the full (H, W, 6) ray grid for a camera.

    Pixel convention matches the reference exactly (camera.h:56-85):
    x = i/width (no half-pixel shift), u = (2x-1)*aspect, v = 1-2y, and for
    the pinhole model the ray is w*forward + u*right + v*up with
    w = 1/tan(fov/2) (vertical fov). Fisheye uses the equidistant model with
    a zeroed direction outside the phi >= pi circle (the trace treats
    |direction| < 0.1 as a masked ray, pipeline.cu:370-373).
    """
    w, h = camera.width, camera.height
    aspect = w / h

    i = jnp.arange(w, dtype=jnp.float32)
    j = jnp.arange(h, dtype=jnp.float32)
    x = i / w
    y = j / h
    u = (2.0 * x - 1.0) * aspect  # (W,)
    v = 1.0 - 2.0 * y  # (H,)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)

    fwd = jnp.asarray(camera.forward)
    rgt = jnp.asarray(camera.right)
    upv = jnp.asarray(camera.up)

    if camera.model == PINHOLE:
        depth = 1.0 / np.tan(camera.fov * 0.5)
        dirs = (
            depth * fwd[None, None, :]
            + uu[..., None] * rgt[None, None, :]
            + vv[..., None] * upv[None, None, :]
        )
        mask = jnp.ones_like(uu)
    elif camera.model == FISHEYE:
        theta = jnp.arctan2(vv, uu)
        phi = camera.fov * jnp.sqrt(uu * uu + vv * vv)
        mask = (phi < np.pi).astype(jnp.float32)
        phi = jnp.minimum(phi, np.pi - 1e-6)
        dirs = (
            (jnp.sin(phi) * jnp.cos(theta))[..., None] * rgt[None, None, :]
            + (jnp.sin(phi) * jnp.sin(theta))[..., None] * upv[None, None, :]
            + jnp.cos(phi)[..., None] * fwd[None, None, :]
        )
    else:
        raise ValueError(f"Unknown camera model {camera.model}")

    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs * mask[..., None]
    origins = jnp.broadcast_to(jnp.asarray(camera.position), dirs.shape)
    return jnp.concatenate([origins, dirs], axis=-1)


def cast_rays_device(position, forward, right, up, fov, width, height,
                     model=PINHOLE):
    """Jit-friendly ray-grid generation from traced camera vectors.

    Same pixel convention as cast_rays/`camera.h:56-85`, but taking the
    camera basis as (3,) arrays and fov as a traced scalar so frames can be
    rendered without shipping an (H*W, 6) ray buffer host->device — the ray
    grid materializes on device exactly like the reference's per-pixel
    cast_ray (pipeline.cu:493). width/height/model are static.

    Returns (H*W, 6).
    """
    aspect = width / height
    x = (jnp.arange(width, dtype=jnp.float32)) / width
    y = (jnp.arange(height, dtype=jnp.float32)) / height
    u = (2.0 * x - 1.0) * aspect
    v = 1.0 - 2.0 * y
    uu, vv = jnp.meshgrid(u, v)

    fwd = jnp.asarray(forward, jnp.float32)
    rgt = jnp.asarray(right, jnp.float32)
    upv = jnp.asarray(up, jnp.float32)

    if model == PINHOLE:
        depth = 1.0 / jnp.tan(fov * 0.5)
        dirs = (
            depth * fwd[None, None, :]
            + uu[..., None] * rgt[None, None, :]
            + vv[..., None] * upv[None, None, :]
        )
        mask = jnp.ones_like(uu)
    elif model == FISHEYE:
        theta = jnp.arctan2(vv, uu)
        phi = fov * jnp.sqrt(uu * uu + vv * vv)
        mask = (phi < np.pi).astype(jnp.float32)
        phi = jnp.minimum(phi, np.pi - 1e-6)
        dirs = (
            (jnp.sin(phi) * jnp.cos(theta))[..., None] * rgt[None, None, :]
            + (jnp.sin(phi) * jnp.sin(theta))[..., None] * upv[None, None, :]
            + jnp.cos(phi)[..., None] * fwd[None, None, :]
        )
    else:
        raise ValueError(f"Unknown camera model {model}")

    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs * mask[..., None]
    origins = jnp.broadcast_to(
        jnp.asarray(position, jnp.float32), dirs.shape
    )
    return jnp.concatenate([origins, dirs], axis=-1).reshape(-1, 6)
