"""Scene model tests: init, checkpoint roundtrips, densify/prune
bookkeeping, permutation consistency."""

import numpy as np
import jax.numpy as jnp
import pytest

from radfoam_tpu.models.scene import (
    RadFoamScene,
    round_capacity,
    _multinomial_without_replacement,
)
from radfoam_tpu.utils.ply import read_ply


class Args:
    sh_degree = 2
    init_points = 256
    final_points = 1024
    activation_scale = 1.0


@pytest.fixture(scope="module")
def scene_model():
    rng = np.random.default_rng(11)
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    colors = rng.random((300, 3)).astype(np.float32)
    model = RadFoamScene(Args(), points=pts, points_colors=colors, seed=1)
    return model


def test_capacity_rounding():
    assert round_capacity(100) == 8192
    assert round_capacity(9000) == 12288
    assert round_capacity(12289) == 16384
    assert round_capacity(131072) == 131072


def test_init_from_pcd(scene_model):
    m = scene_model
    # 90% of 300 = 270 samples + 5000 random
    assert m.n_points == 270 + 5000
    assert m.capacity >= m.n_points
    assert m.nbr_idx.shape[0] == m.capacity
    # adjacency self-consistency: padded rows beyond n_points are all-self
    table = np.asarray(m.nbr_idx)
    rows = np.arange(m.capacity)
    assert (table[m.n_points:] == rows[m.n_points:, None]).all()


def test_density_activation(scene_model):
    d = np.asarray(scene_model.get_primal_density())
    assert d.shape == (scene_model.n_points, 1)
    assert (d > 0).all()


def test_starting_point(scene_model):
    m = scene_model
    pts = np.asarray(m.primal_points)
    q = pts[37:38] + 1e-4
    start = int(m.get_starting_point(jnp.asarray(q))[0])
    assert start == 37


def test_pt_roundtrip(scene_model, tmp_path):
    m = scene_model
    path = str(tmp_path / "model.pt")
    m.save_pt(path)

    m2 = RadFoamScene(Args(), seed=2)
    m2.load_pt(path)
    assert m2.n_points == m.n_points
    np.testing.assert_array_equal(
        np.asarray(m2.primal_points), np.asarray(m.primal_points)
    )
    np.testing.assert_array_equal(
        np.asarray(m2.density), np.asarray(m.density)
    )
    np.testing.assert_array_equal(
        m2.point_adjacency, m.point_adjacency
    )
    np.testing.assert_array_equal(np.asarray(m2.nbr_idx)[: m.n_points],
                                  np.asarray(m.nbr_idx)[: m.n_points])


def test_pt_reference_format(scene_model, tmp_path):
    """Checkpoint keys/dtypes must match the reference contract
    (scene.py:614-630)."""
    import torch

    path = str(tmp_path / "model.pt")
    scene_model.save_pt(path)
    data = torch.load(path, weights_only=True)
    # reference keys (scene.py:614-630) must all be present; the only
    # allowed extras are the optional raster cell bounds (scene.py save_pt)
    # — reference checkpoints WITHOUT them still load via rebuild fallback
    assert set(data.keys()) - {"cell_bb_min", "cell_bb_max"} == {
        "xyz", "density", "color_dc", "color_sh", "adjacency",
        "adjacency_offsets",
    }
    assert data["xyz"].dtype == torch.float32
    assert data["adjacency"].dtype == torch.int64
    assert data["color_sh"].shape[-1] == 3 * ((2 + 1) ** 2 - 1)


def test_ply_export(scene_model, tmp_path):
    path = str(tmp_path / "scene.ply")
    scene_model.save_ply(path)
    data = read_ply(path)
    assert data["vertex"].shape[0] == scene_model.n_points
    assert data["adjacency"].shape[0] == scene_model.point_adjacency.shape[0]
    np.testing.assert_allclose(
        data["vertex"]["x"], np.asarray(scene_model.primal_points)[:, 0]
    )
    np.testing.assert_array_equal(
        data["vertex"]["adjacency_offset"],
        scene_model.point_adjacency_offsets[1:],
    )


def test_update_triangulation_permutes_consistently():
    rng = np.random.default_rng(5)
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    model = RadFoamScene(Args(), points=pts, seed=3)

    class Opt:
        points_lr_init = 2e-4
        points_lr_final = 5e-6
        density_lr_init = 1e-1
        density_lr_final = 1e-2
        attributes_lr_init = 5e-3
        attributes_lr_final = 5e-4
        sh_factor = 0.1
        freeze_points = 100

    model.declare_optimizer(Opt(), warmup=10, max_iterations=100)

    before = np.asarray(model.primal_points).copy()
    # tag the optimizer state so we can see it permute with the points
    import optax
    import jax

    mu = jax.tree.map(jnp.zeros_like, model.params)
    mu["primal_points"] = model.params["primal_points"] * 1.0
    model.optimizer_state = optax.ScaleByAdamState(
        count=model.optimizer_state.count,
        mu=mu, nu=model.optimizer_state.nu,
    )

    model.update_triangulation(incremental=False)  # full rebuild resorts
    after = np.asarray(model.primal_points)
    mu_after = np.asarray(model.optimizer_state.mu["primal_points"])

    # same point set, possibly different order; moments follow their rows
    assert sorted(map(tuple, before.tolist())) == sorted(
        map(tuple, after.tolist())
    )
    np.testing.assert_allclose(mu_after[: model.n_points],
                               after[: model.n_points])


def test_prune_and_densify_bookkeeping():
    rng = np.random.default_rng(9)
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    model = RadFoamScene(Args(), points=pts, seed=4)

    class Opt:
        points_lr_init = 2e-4
        points_lr_final = 5e-6
        density_lr_init = 1e-1
        density_lr_final = 1e-2
        attributes_lr_init = 5e-3
        attributes_lr_final = 5e-4
        sh_factor = 0.1
        freeze_points = 100

    model.declare_optimizer(Opt(), warmup=10, max_iterations=100)
    n0 = model.n_points
    error = rng.random(n0).astype(np.float32) + 0.1
    contribution = rng.random(n0).astype(np.float32)

    model.prune_and_densify(error, contribution, upsample_factor=1.2)
    model.update_triangulation(incremental=False)

    # roughly 20% growth minus pruned
    assert model.n_points > n0
    assert model.n_points <= int(1.2 * n0) + 1
    assert model.capacity >= model.n_points
    # optimizer state rows track the params
    assert (
        np.asarray(model.optimizer_state.mu["primal_points"]).shape[0]
        == model.capacity
    )
    # forward still works on the new topology
    eye = np.array([4.0, 0.0, 0.0], np.float32)
    rays = np.concatenate([
        np.broadcast_to(eye, (16, 3)),
        np.broadcast_to(-eye / 4.0, (16, 3)),
    ], axis=-1).astype(np.float32)
    rgba, _, _, _ = model.forward(jnp.asarray(rays))
    assert np.isfinite(np.asarray(rgba)).all()


def test_multinomial_without_replacement_distribution():
    rng = np.random.default_rng(0)
    w = np.array([0.0, 1.0, 1.0, 5.0, 0.0])
    counts = np.zeros(5)
    for _ in range(200):
        idx = _multinomial_without_replacement(rng, w, 2)
        assert len(set(idx)) == 2
        counts[idx] += 1
    assert counts[0] == 0 and counts[4] == 0  # zero weight never drawn
    assert counts[3] > counts[1]  # heaviest drawn most
