"""Tests for the Pipeline compat shim and the viewer."""

import numpy as np
import jax.numpy as jnp
import pytest

from radfoam_tpu import create_pipeline
from radfoam_tpu.delaunay import Triangulation
from radfoam_tpu.models.scene import RadFoamScene


class Args:
    sh_degree = 1
    init_points = 128
    final_points = 512
    activation_scale = 1.0


@pytest.fixture(scope="module")
def small_scene():
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((150, 3)).astype(np.float32)
    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    D = 4  # sh degree 1
    attrs = (rng.standard_normal((150, 1 + 3 * D)) * 0.2).astype(np.float32)
    attrs[:, -1] = rng.uniform(0.3, 2.0, 150)
    return pts, attrs, tri


def test_pipeline_forward_dict(small_scene):
    pts, attrs, tri = small_scene
    pipe = create_pipeline(1, "float32")
    rays = np.concatenate([
        np.full((10, 3), 3.0, np.float32),
        np.full((10, 3), -1.0, np.float32),
    ], axis=-1)
    res = pipe.trace_forward(
        pts, attrs, tri.point_adjacency(), tri.point_adjacency_offsets(),
        rays, np.zeros(10, np.int32),
        depth_quantiles=np.full((10, 2), 0.5, np.float32),
        return_contribution=True,
    )
    assert set(res.keys()) >= {
        "rgba", "depth", "depth_indices", "contribution",
        "num_intersections",
    }
    assert res["rgba"].shape == (10, 4)
    assert res["depth"].shape == (10, 2)
    assert np.isfinite(np.asarray(res["rgba"])).all()


def test_pipeline_benchmark_image(small_scene):
    pts, attrs, tri = small_scene
    pipe = create_pipeline(1, "float16")
    camera = {
        "position": [3.0, 0.0, 0.0],
        "forward": [-1.0, 0.0, 0.0],
        "right": [0.0, 1.0, 0.0],
        "up": [0.0, 0.0, 1.0],
        "fov": np.deg2rad(60),
        "width": 32,
        "height": 24,
        "model": "pinhole",
    }
    img = pipe.trace_benchmark(
        pts, attrs, tri.point_adjacency(), tri.point_adjacency_offsets(),
        None, camera, start_point=0,
    )
    assert img.shape == (24, 32)
    assert img.dtype == jnp.uint32


def test_viewer_render_modes(small_scene):
    from radfoam_tpu.viewer import Viewer, ViewerOptions

    pts, attrs, tri = small_scene
    from radfoam_tpu.ops.adjacency import csr_to_padded

    table = csr_to_padded(
        tri.point_adjacency(), tri.point_adjacency_offsets()
    )
    opts = ViewerOptions(width=40, height=30)
    opts.camera_pos = np.array([3.0, 0, 0], np.float32)
    opts.camera_forward = np.array([-1.0, 0, 0], np.float32)
    opts.camera_up = np.array([0, 0, 1.0], np.float32)
    v = Viewer(sh_degree=1, options=opts)
    assert v.render_frame() is None  # no scene yet
    v.update_scene(jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table))
    for mode in Viewer.VIS_MODES:
        v.vis_mode = mode
        img = v.render_frame()
        assert img.shape == (30, 40, 3)
        assert img.dtype == np.uint8


def test_viewer_http_roundtrip(small_scene):
    import urllib.request

    from radfoam_tpu.viewer import Viewer, ViewerOptions
    from radfoam_tpu.viewer.viewer import serve_viewer
    from radfoam_tpu.ops.adjacency import csr_to_padded

    pts, attrs, tri = small_scene
    table = csr_to_padded(
        tri.point_adjacency(), tri.point_adjacency_offsets()
    )
    opts = ViewerOptions(width=32, height=24, port=18231)
    v = Viewer(sh_degree=1, options=opts)
    v.update_scene(jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table))
    server = serve_viewer(v)
    try:
        page = urllib.request.urlopen(
            "http://127.0.0.1:18231/", timeout=10
        ).read()
        assert b"radfoam-tpu viewer" in page
        png = urllib.request.urlopen(
            "http://127.0.0.1:18231/frame.png", timeout=30
        ).read()
        assert png[:4] == b"\x89PNG"
        urllib.request.urlopen(
            "http://127.0.0.1:18231/cmd?c=mode&v=alpha", timeout=10
        )
        assert v.vis_mode == "alpha"
    finally:
        server.shutdown()


def test_turntable_renderer(small_scene, tmp_path):
    from radfoam_tpu.viewer import TurntableRenderer

    pts, _, _ = small_scene
    model = RadFoamScene(Args(), points=pts, seed=6)
    paths = TurntableRenderer(model, width=32, height=24).render(
        str(tmp_path), n_frames=2
    )
    assert len(paths) == 2
    import os

    assert all(os.path.exists(p) for p in paths)


@pytest.mark.slow
def test_trace_benchmark_raster_engine_close_to_walk():
    """Pipeline.trace_benchmark engine='raster' must render the same image
    as the walk engine (up to hull-wedge and packing differences)."""
    import numpy as np
    import jax.numpy as jnp

    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.ops.pipeline import create_pipeline
    from radfoam_tpu.ops.camera import look_at

    rng = np.random.default_rng(9)
    n = 2000
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    D = 4
    attrs = (rng.standard_normal((n, 1 + 3 * D)) * 0.25).astype(np.float32)
    attrs[:, -1] = rng.uniform(4.0, 10.0, n)  # saturating

    pipe = create_pipeline(1, jnp.float32)
    cam = look_at((0.3, 0.2, 0.1), [0, 0, 0], [0, 0, 1], fov=1.1,
                  width=48, height=32)
    cam_dict = dict(position=cam.position, forward=cam.forward,
                    right=cam.right, up=cam.up, fov=cam.fov,
                    width=cam.width, height=cam.height)
    start = int(np.argmin(np.sum((pts - cam.position) ** 2, axis=1)))
    common = (pts, attrs, tri.point_adjacency(),
              tri.point_adjacency_offsets(), None, cam_dict, start)
    img_w = np.asarray(pipe.trace_benchmark(*common, engine="walk"))
    img_r = np.asarray(pipe.trace_benchmark(*common, engine="raster"))

    def unpack(u):
        return np.stack([(u >> s) & 0xFF for s in (0, 8, 16)], -1) / 255.0

    a, b = unpack(img_w), unpack(img_r)
    mse = float(np.mean((a - b) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 40.0, psnr


def test_pipeline_trace_backward_matches_autodiff(small_scene):
    """The facade backward (pipeline_bindings.cpp:267-497 surface) returns
    the same gradients JAX autodiff produces through trace()."""
    import jax

    from radfoam_tpu.ops.adjacency import csr_to_padded
    from radfoam_tpu.ops.trace import TraceConfig, trace

    pts, attrs, tri = small_scene
    pipe = create_pipeline(1, "float32")
    # rays through the middle of the cloud so gradients are non-trivial
    origins = np.array([[3.0, 0.0, 0.0]] * 6, np.float32)
    targets = pts[10:16]
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate([origins, dirs.astype(np.float32)], axis=-1)
    start = np.full(
        (6,), np.argmin(np.sum((pts - origins[0]) ** 2, axis=1)), np.int32
    )
    w = np.linspace(0.2, 1.0, 24).reshape(6, 4).astype(np.float32)

    table = csr_to_padded(
        tri.point_adjacency(), tri.point_adjacency_offsets()
    )
    cfg = TraceConfig(sh_degree=1, num_quantiles=0)

    def loss(p, a):
        out = trace(p, a, jnp.asarray(table), jnp.asarray(rays), start,
                    config=cfg)
        return jnp.sum(out.rgba * w)

    gp, ga = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(pts), jnp.asarray(attrs)
    )

    fwd = pipe.trace_forward(
        pts, attrs, tri.point_adjacency(), tri.point_adjacency_offsets(),
        rays, start,
    )
    res = pipe.trace_backward(
        pts, attrs, tri.point_adjacency(), tri.point_adjacency_offsets(),
        rays, start, rgba=fwd["rgba"], rgba_grad=w,
        ray_error=np.ones(6, np.float32),
    )
    assert set(res.keys()) == {
        "points_grad", "attr_grad", "ray_grad", "point_error"
    }
    np.testing.assert_allclose(
        np.asarray(res["points_grad"]), np.asarray(gp), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(res["attr_grad"]), np.asarray(ga), rtol=2e-4, atol=2e-5
    )
    pe = np.asarray(res["point_error"])
    assert pe.shape == (pts.shape[0],) and pe.sum() > 0


def test_pipeline_trace_visualization_modes(small_scene):
    pts, attrs, tri = small_scene
    pipe = create_pipeline(1, "float32")
    camera = {
        "position": [3.0, 0.0, 0.0],
        "forward": [-1.0, 0.0, 0.0],
        "right": [0.0, 1.0, 0.0],
        "up": [0.0, 0.0, 1.0],
        "fov": np.deg2rad(60),
        "width": 16,
        "height": 12,
        "model": "pinhole",
    }
    for mode in ("rgb", "depth", "alpha", "intersections"):
        img = pipe.trace_visualization(
            pts, attrs, tri.point_adjacency(),
            tri.point_adjacency_offsets(), camera, 0, vis_mode=mode,
        )
        assert img.shape == (12, 16, 3)
        assert img.dtype == np.float32
        assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1
    solid = pipe.trace_visualization(
        pts, attrs, tri.point_adjacency(), tri.point_adjacency_offsets(),
        camera, 0, vis_mode="rgb", background="solid",
    )
    assert solid.shape == (12, 16, 3)
