"""Tile rasterizer vs the walk tracer.

The rasterizer computes each (ray, cell) interval independently from the
cell's bisector planes; the walk derives the same intervals sequentially.
On scenes where rays terminate inside the foam (saturating density) the two
must agree almost exactly; on open scenes the only differences come from
hull-cell unbounded wedges and list-order inversions, bounded here by PSNR.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radfoam_tpu.delaunay import Triangulation
from radfoam_tpu.ops.adjacency import csr_to_padded
from radfoam_tpu.ops.camera import look_at, cast_rays
from radfoam_tpu.ops.cellbound import cell_bounds, cell_radii
from radfoam_tpu.ops.trace import TraceConfig, trace
from radfoam_tpu.ops import raster as R

pytestmark = pytest.mark.slow


def build_scene(n_points=3000, sh_degree=2, seed=7, saturate=True):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n_points, 3)).astype(np.float32) * 1.2
    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    table = csr_to_padded(tri.point_adjacency(), tri.point_adjacency_offsets())
    bb_min, bb_max, hull = cell_bounds(pts, tri.tets())

    D = (sh_degree + 1) ** 2
    attrs = (rng.standard_normal((n_points, 1 + 3 * D)) * 0.25).astype(
        np.float32
    )
    if saturate:
        # high density everywhere: every ray terminates well inside the
        # foam, so hull wedges are unreachable and raster == walk
        attrs[:, -1] = rng.uniform(4.0, 10.0, n_points)
    else:
        r = np.linalg.norm(pts, axis=1)
        attrs[:, -1] = np.where(r < 1.0, 5.0, 0.05)
    return pts, attrs, table, (bb_min, bb_max)


def cam_setup(pts, width, height, eye=(0.4, 0.3, 0.2), fov=1.1):
    eye = np.asarray(eye, np.float32)
    cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=fov,
                  width=width, height=height)
    start = int(np.argmin(np.sum((pts - eye) ** 2, axis=1)))
    return cam, start


def walk_image(pts, attrs, table, cam, start, wt):
    cfg = TraceConfig(sh_degree=int(np.sqrt((attrs.shape[1] - 1) // 3)) - 1,
                      num_quantiles=0, weight_threshold=wt)
    rays = np.asarray(cast_rays(cam)).reshape(-1, 6)
    out = trace(
        jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
        jnp.asarray(rays), jnp.full((rays.shape[0],), start, jnp.int32),
        config=cfg,
    )
    return np.asarray(out.rgba).reshape(cam.height, cam.width, 4)


def raster_image_reference(pts, attrs, table, bounds, cam, cfg):
    """bin_pairs + composite_reference path."""
    A = attrs.shape[1]
    K = table.shape[1]
    rpacked = np.asarray(
        R.pack_raster_planar(
            R.pack_raster_table(
                jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table)
            ),
            K, A,
        )
    )
    intrin = tuple(
        float(v) for v in R.fov_intrin(
            cam.fov, width=cam.width, height=cam.height
        )
    )
    cell_s, key_cell, starts, n_pairs = jax.jit(
        R.bin_pairs, static_argnames=("width", "height", "cfg")
    )(
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
        jnp.asarray(attrs[:, -1]),
        jnp.asarray(cam.position), jnp.asarray(cam.forward),
        jnp.asarray(cam.right), jnp.asarray(cam.up), intrin,
        width=cam.width, height=cam.height, cfg=cfg,
    )
    assert int(n_pairs) <= cfg.max_pairs, "pair capacity overflow"
    key_s = np.asarray(key_cell)[np.asarray(cell_s)]
    rows = rpacked[np.asarray(cell_s)]
    tiles, forced = R.composite_reference(
        rows, np.asarray(key_s), np.asarray(starts), cam.position,
        cam.forward, cam.right, cam.up, intrin,
        width=cam.width, height=cam.height, cfg=cfg, K=K, A=A,
    )
    img = R.tiles_to_image(
        jnp.asarray(tiles), width=cam.width, height=cam.height, tile=cfg.tile
    )
    return np.asarray(img), forced, np.asarray(starts)


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse == 0 else -10.0 * np.log10(mse)


def test_raster_matches_walk_saturating():
    pts, attrs, table, bounds = build_scene(saturate=True)
    W = H = 48
    cam, start = cam_setup(pts, W, H)
    wt = 0.001
    cfg = R.RasterConfig(sh_degree=2, weight_threshold=wt, tile=16,
                         max_pairs=1 << 18)
    walk = walk_image(pts, attrs, table, cam, start, wt)
    rast, forced, _ = raster_image_reference(
        pts, attrs, table, bounds, cam, cfg
    )
    # saturating scene: identical intervals, exact-order emission
    assert forced.sum() == 0, f"forced pops: {forced.sum()}"
    assert psnr(walk, rast) > 55.0, psnr(walk, rast)
    np.testing.assert_allclose(rast, walk, atol=5e-3)


def test_raster_matches_walk_open_scene():
    pts, attrs, table, bounds = build_scene(saturate=False)
    W = H = 48
    cam, start = cam_setup(pts, W, H, eye=(0.2, 0.1, 0.15))
    wt = 0.001
    cfg = R.RasterConfig(sh_degree=2, weight_threshold=wt, tile=16,
                         max_pairs=1 << 18)
    walk = walk_image(pts, attrs, table, cam, start, wt)
    rast, forced, _ = raster_image_reference(
        pts, attrs, table, bounds, cam, cfg
    )
    # open scene: hull-wedge drops allowed, order still exact
    assert psnr(walk, rast) > 35.0, psnr(walk, rast)


def test_pallas_kernel_matches_reference():
    pts, attrs, table, bounds = build_scene(n_points=1200, saturate=True)
    W = H = 32
    cam, start = cam_setup(pts, W, H)
    cfg = R.RasterConfig(sh_degree=2, weight_threshold=0.001, tile=16,
                         max_pairs=1 << 16, interpret=True,
                         table_k=int(table.shape[1]))
    ref_img, _, _ = raster_image_reference(
        pts, attrs, table, bounds, cam, cfg
    )
    rtable = R.build_row_table(
        R.pack_raster_table(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table)
        ),
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
    )
    img, n_pairs, forced = R.render_frame(
        rtable, jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
        jnp.asarray(attrs[:, -1]),
        jnp.asarray(cam.position), jnp.asarray(cam.forward),
        jnp.asarray(cam.right), jnp.asarray(cam.up), jnp.float32(cam.fov),
        width=W, height=H, cfg=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(img), ref_img, atol=2e-5, rtol=1e-5
    )


def test_alpha_cull_bounded_error():
    pts, attrs, table, bounds = build_scene(saturate=False)
    W = H = 32
    cam, start = cam_setup(pts, W, H)
    base = R.RasterConfig(sh_degree=2, weight_threshold=0.001, tile=16,
                          max_pairs=1 << 18)
    culled = base._replace(alpha_cull=1e-3)
    img0, _, _ = raster_image_reference(pts, attrs, table, bounds, cam, base)
    img1, _, _ = raster_image_reference(pts, attrs, table, bounds, cam,
                                        culled)
    assert psnr(img0, img1) > 40.0


def test_cell_radii_conservative():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    tets = tri.tets()
    radius, hull = cell_radii(pts, tets)
    from radfoam_tpu.ops.cellbound import tet_circumcenters

    cc, ok = tet_circumcenters(pts.astype(np.float64), tets)
    for k in range(4):
        d = np.linalg.norm(cc - pts[tets[:, k]], axis=1)
        # every finite Voronoi vertex of every cell is inside the radius
        assert np.all(d[ok] <= radius[tets[:, k]][ok] + 1e-6)
    # hull detection is validated against scipy's ConvexHull
    from scipy.spatial import ConvexHull

    ch = ConvexHull(pts.astype(np.float64))
    sci = np.zeros(pts.shape[0], bool)
    sci[ch.vertices] = True
    assert (hull == sci).all()


def test_cell_bounds_conservative():
    """Every finite Voronoi vertex (tet circumcenter) and the site itself
    lie inside the cell's AABB."""
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((400, 3)).astype(np.float32)
    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    tets = np.asarray(tri.tets())
    bb_min, bb_max, hull = cell_bounds(pts, tets)
    from radfoam_tpu.ops.cellbound import tet_circumcenters

    assert np.all(bb_min <= pts + 1e-6) and np.all(bb_max >= pts - 1e-6)
    cc, ok = tet_circumcenters(pts.astype(np.float64), tets)
    for k in range(4):
        i = tets[:, k][ok]
        c = cc[ok]
        assert np.all(c >= bb_min[i] - 1e-4)
        assert np.all(c <= bb_max[i] + 1e-4)


def test_f16_row_table_matches_f32():
    """2-byte rows (hi/lo position split) stay within half-precision attr
    rounding of the f32 path — the bench protocol's fp16 attribute mode.
    bfloat16 is the dtype that actually lowers through Mosaic on TPU
    (f16 scratch is rejected); both are held to the same bar here."""
    pts, attrs, table, bounds = build_scene(n_points=1200, saturate=True)
    W = H = 32
    cam, _ = cam_setup(pts, W, H)
    cfg = R.RasterConfig(sh_degree=2, weight_threshold=0.001, tile=16,
                         max_pairs=1 << 16, interpret=True,
                         table_k=int(table.shape[1]), entry_chunk=32)
    imgs = {}
    for dtype in (jnp.float32, jnp.float16, jnp.bfloat16):
        rtable = R.build_row_table(
            R.pack_raster_table(
                jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table)
            ),
            jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
            dtype=dtype,
        )
        img, n_pairs, forced = R.render_frame(
            rtable, jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
            jnp.asarray(attrs[:, -1]),
            jnp.asarray(cam.position), jnp.asarray(cam.forward),
            jnp.asarray(cam.right), jnp.asarray(cam.up),
            jnp.float32(cam.fov), width=W, height=H, cfg=cfg,
        )
        imgs[jnp.dtype(dtype).name] = np.asarray(img)
    assert psnr(imgs["float32"], imgs["float16"]) > 40.0
    assert psnr(imgs["float32"], imgs["bfloat16"]) > 40.0


def test_staged_renderer_matches_fused():
    pts, attrs, table, bounds = build_scene(n_points=1200, saturate=True)
    W = H = 32
    cam, _ = cam_setup(pts, W, H)
    cfg = R.RasterConfig(sh_degree=2, weight_threshold=0.001, tile=16,
                         max_pairs=1 << 16, interpret=True,
                         table_k=int(table.shape[1]))
    rtable = R.build_row_table(
        R.pack_raster_table(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table)
        ),
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
    )
    args = (rtable, jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
            jnp.asarray(attrs[:, -1]),
            jnp.asarray(cam.position), jnp.asarray(cam.forward),
            jnp.asarray(cam.right), jnp.asarray(cam.up),
            jnp.float32(cam.fov))
    img_f, np_f, _ = R.render_frame(*args, width=W, height=H, cfg=cfg)
    img_s, np_s, _ = R.render_frame_staged(*args, width=W, height=H,
                                           cfg=cfg)
    assert int(np_f) == int(np_s)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_f),
                               atol=1e-6)


def test_fused_scene_table_matches_two_step():
    pts, attrs, table, bounds = build_scene(n_points=900, saturate=False)
    for dtype in (jnp.float32, jnp.float16):
        two = R.build_row_table(
            R.pack_raster_table(
                jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table)
            ),
            jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
            dtype=dtype,
        )
        one = R.build_scene_table(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
            jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
            dtype=dtype,
        )
        np.testing.assert_array_equal(np.asarray(one), np.asarray(two))
        chunked = R.build_scene_table(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
            jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
            dtype=dtype, chunks=4,
        )
        np.testing.assert_array_equal(np.asarray(chunked), np.asarray(two))


def test_tile_list_cap():
    """tile_list_cap keeps each tile's nearest cells: a generous cap is
    bit-identical (early exit never reaches it), and the relayout's
    truncated gather equals manually truncating each tile's sorted list."""
    pts, attrs, table, bounds = build_scene(n_points=900, saturate=True)
    W = H = 32
    cam, _ = cam_setup(pts, W, H)
    K = int(table.shape[1])
    base = dict(sh_degree=2, weight_threshold=0.01, tile=16,
                max_pairs=1 << 16, interpret=True, table_k=K)
    rtable = R.build_row_table(
        R.pack_raster_table(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table)
        ),
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
    )
    args = (rtable, jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
            jnp.asarray(attrs[:, -1]),
            jnp.asarray(cam.position), jnp.asarray(cam.forward),
            jnp.asarray(cam.right), jnp.asarray(cam.up),
            jnp.float32(cam.fov))
    cfg0 = R.RasterConfig(**base)
    img0, n_pairs, _ = R.render_frame(*args, width=W, height=H, cfg=cfg0)
    # generous cap: saturated tiles exit long before 1024 entries
    cfg1 = R.RasterConfig(**base, tile_list_cap=1024)
    img1, _, _ = R.render_frame(*args, width=W, height=H, cfg=cfg1)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))

    # tight cap: relayout output equals manual per-tile prefix truncation
    cap = 32
    cfgc = R.RasterConfig(**base, tile_list_cap=cap)
    intrin = R.fov_intrin(jnp.float32(cam.fov), width=W, height=H)
    cell_s, _k, starts, _n = R.bin_pairs(
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
        jnp.asarray(attrs[:, -1]),
        jnp.asarray(cam.position), jnp.asarray(cam.forward),
        jnp.asarray(cam.right), jnp.asarray(cam.up), intrin,
        width=W, height=H, cfg=cfgc,
    )
    cell_p, nstarts, lens = R.relayout_pairs(
        cell_s, starts, width=W, height=H, cfg=cfgc
    )
    cell_p = np.asarray(cell_p)
    cs, st = np.asarray(cell_s), np.asarray(starts)
    for t in range(st.size - 1):
        want = cs[st[t] : min(st[t] + cap, st[t + 1])]
        got = cell_p[int(nstarts[t]) : int(nstarts[t]) + int(lens[t])]
        np.testing.assert_array_equal(got, want)
        assert int(lens[t]) == want.size


def test_ce32_submerge_matches_ce16():
    """entry_chunk=32 with merge_chunk=16 (the double-DMA sub-merge
    production config) renders the same image as the default chunking."""
    pts, attrs, table, bounds = build_scene(n_points=1200, saturate=True)
    W = H = 32
    cam, _ = cam_setup(pts, W, H)
    base = dict(sh_degree=2, weight_threshold=0.001, tile=16,
                max_pairs=1 << 16, interpret=True,
                table_k=int(table.shape[1]))
    rtable = R.build_row_table(
        R.pack_raster_table(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table)
        ),
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
    )
    args = (rtable, jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
            jnp.asarray(attrs[:, -1]),
            jnp.asarray(cam.position), jnp.asarray(cam.forward),
            jnp.asarray(cam.right), jnp.asarray(cam.up),
            jnp.float32(cam.fov))
    img16, _, _ = R.render_frame(
        *args, width=W, height=H, cfg=R.RasterConfig(**base),
    )
    img32, _, forced32 = R.render_frame(
        *args, width=W, height=H,
        cfg=R.RasterConfig(**base, entry_chunk=32, merge_chunk=16),
    )
    assert float(jnp.sum(forced32)) == 0.0
    np.testing.assert_allclose(
        np.asarray(img32), np.asarray(img16), atol=2e-5, rtol=1e-5
    )


def test_size_caps_derivation():
    """size_caps derives per-scene capacities from the stats sizing pass:
    max_pairs covers every pose with 30% headroom, tile_list_cap is 2x
    the deepest consumption, and the capped timed render is bit-identical
    to the uncapped one (the cap never truncates below the early exit)."""
    pts, attrs, table, bounds = build_scene(n_points=900, saturate=True)
    W = H = 32
    K = int(table.shape[1])
    base = dict(sh_degree=2, weight_threshold=0.01, tile=16,
                alpha_cull=1e-3, table_k=K, reorder_window=0,
                interpret=True)
    sizing = R.RasterConfig(max_pairs=1 << 16, tile_list_cap=0,
                            stats=True, **base)
    rtable = R.build_scene_table(
        jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
    )
    b0, b1 = jnp.asarray(bounds[0]), jnp.asarray(bounds[1])
    dens = jnp.asarray(attrs[:, -1])
    frames = []
    for eye in ((0.4, 0.3, 0.2), (-0.5, 0.1, 0.3)):
        cam, _ = cam_setup(pts, W, H, eye=eye)
        frames.append(tuple(
            jnp.asarray(np.asarray(x, np.float32))
            for x in (cam.position, cam.forward, cam.right, cam.up)
        ))
    fov = jnp.float32(1.1)
    rsz = lambda p, f, r, u: R.render_frame_staged(
        rtable, b0, b1, dens, p, f, r, u, fov,
        width=W, height=H, cfg=sizing)
    max_pairs, cap = R.size_caps(frames, rsz, sizing.entry_chunk)
    CE = sizing.entry_chunk
    assert max_pairs % CE == 0 and cap % CE == 0 and cap >= 2 * CE

    capped = R.RasterConfig(max_pairs=max_pairs, tile_list_cap=cap,
                            **base)
    uncapped = R.RasterConfig(max_pairs=1 << 16, tile_list_cap=0, **base)
    for f in frames:
        img_c, n_pairs, _ = R.render_frame_staged(
            rtable, b0, b1, dens, *f, fov, width=W, height=H, cfg=capped)
        img_u, _, _ = R.render_frame_staged(
            rtable, b0, b1, dens, *f, fov, width=W, height=H,
            cfg=uncapped)
        assert int(n_pairs) <= max_pairs
        np.testing.assert_array_equal(np.asarray(img_c), np.asarray(img_u))


def test_relayout_tile_caps_and_visibility_compact():
    """Per-tile gather caps (consumption-sized gather): relayout with a
    tile_caps vector equals manual per-tile prefix truncation at each
    tile's own cap; visibility_compact preserves the rendered image."""
    pts, attrs, table, bounds = build_scene(n_points=900, saturate=True)
    W = H = 32
    cam, _ = cam_setup(pts, W, H)
    K = int(table.shape[1])
    base = dict(sh_degree=2, weight_threshold=0.01, tile=16,
                max_pairs=1 << 16, interpret=True, table_k=K)
    cfg = R.RasterConfig(**base)
    intrin = R.fov_intrin(jnp.float32(cam.fov), width=W, height=H)
    cell_s, _k, starts, _n = R.bin_pairs(
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
        jnp.asarray(attrs[:, -1]),
        jnp.asarray(cam.position), jnp.asarray(cam.forward),
        jnp.asarray(cam.right), jnp.asarray(cam.up), intrin,
        width=W, height=H, cfg=cfg,
    )
    n_tiles = (W // 16) * (H // 16)
    rng = np.random.default_rng(3)
    CE = cfg.entry_chunk
    caps = (rng.integers(1, 5, n_tiles) * CE).astype(np.int32)
    mp_cap = int((-(-caps // CE) * CE).sum()) + CE
    cell_p, nstarts, lens = R.relayout_pairs(
        cell_s, starts, width=W, height=H, cfg=cfg,
        tile_caps=jnp.asarray(caps), mp_cap=mp_cap,
    )
    cell_p = np.asarray(cell_p)
    cs, st = np.asarray(cell_s), np.asarray(starts)
    assert int(nstarts[-1]) <= mp_cap
    for t in range(n_tiles):
        want = cs[st[t] : min(st[t] + int(caps[t]), st[t + 1])]
        got = cell_p[int(nstarts[t]) : int(nstarts[t]) + int(lens[t])]
        np.testing.assert_array_equal(got, want)
        assert int(lens[t]) == want.size

    # visibility compaction: same image through the full render
    args = (jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
            jnp.asarray(attrs[:, -1]),
            jnp.asarray(cam.position), jnp.asarray(cam.forward),
            jnp.asarray(cam.right), jnp.asarray(cam.up),
            jnp.float32(cam.fov))
    cull = 1e-3
    cfgc = R.RasterConfig(**base, alpha_cull=cull)
    rtable = R.build_row_table(
        R.pack_raster_table(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table)
        ),
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]), sh_degree=2,
    )
    img0, _, _ = R.render_frame(rtable, *args, width=W, height=H,
                                cfg=cfgc)
    cpts, cattrs, ctable, cbb0, cbb1, cdens, nvis = R.visibility_compact(
        pts, attrs, table, bounds[0], bounds[1], attrs[:, -1], cull
    )
    assert 0 < nvis <= len(pts)
    rtable_c = R.build_row_table(
        R.pack_raster_table(
            jnp.asarray(cpts), jnp.asarray(cattrs), jnp.asarray(ctable)
        ),
        jnp.asarray(cbb0), jnp.asarray(cbb1), sh_degree=2,
    )
    img1, _, _ = R.render_frame(
        rtable_c, jnp.asarray(cbb0[:nvis]), jnp.asarray(cbb1[:nvis]),
        jnp.asarray(cdens[:nvis]),
        *args[3:], width=W, height=H, cfg=cfgc,
    )
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               atol=1e-5)
