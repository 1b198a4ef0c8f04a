"""Mid-training checkpoint/resume.

The reference has NO mid-training resume (SURVEY.md §5.4): it only writes
model.pt / scene.ply at the end of training. This module adds full resume —
parameters, Adam moments, iteration counter, triangulation CSR, schedule
counters, and RNG keys — as a framework extension, while train.py keeps
writing the reference-compatible model.pt/scene.ply at the end.
"""

import json
import os

import numpy as np
import jax
import optax


def save_checkpoint(path, model, iteration, extra=None):
    """Write a resumable snapshot to <path> (an .npz + a json sidecar)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    n = model.n_points
    for k, v in model.params.items():
        arrays[f"param/{k}"] = np.asarray(v)[:n]
    st = model.optimizer_state
    if st is not None:
        arrays["adam/count"] = np.asarray(st.count)
        for k in model.params:
            arrays[f"adam/mu/{k}"] = np.asarray(st.mu[k])[:n]
            arrays[f"adam/nu/{k}"] = np.asarray(st.nu[k])[:n]
    arrays["adjacency"] = np.asarray(model.point_adjacency)
    arrays["adjacency_offsets"] = np.asarray(model.point_adjacency_offsets)
    np.savez_compressed(path, **arrays)
    meta = {
        "iteration": int(iteration),
        "n_points": int(n),
        "sh_degree": model.sh_degree,
        "num_init_points": int(model.num_init_points),
        "extra": extra or {},
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path, model):
    """Restore a snapshot into a freshly constructed model; returns
    (iteration, extra)."""
    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.models.scene import round_capacity, round_degree
    from radfoam_tpu.ops.adjacency import csr_to_padded
    from radfoam_tpu.ops.nn import build_aabb_tree

    with open(path + ".json") as f:
        meta = json.load(f)
    data = np.load(path)
    n = meta["n_points"]

    model.n_points = n
    model.num_init_points = meta["num_init_points"]
    model.capacity = round_capacity(n)
    model.params = jax.device_put({
        k: model._pad_rows(data[f"param/{k}"])
        for k in ("primal_points", "density", "att_dc", "att_sh")
    })
    if "adam/count" in data:
        mu = {
            k: model._pad_rows(data[f"adam/mu/{k}"])
            for k in model.params
        }
        nu = {
            k: model._pad_rows(data[f"adam/nu/{k}"])
            for k in model.params
        }
        model.optimizer_state = optax.ScaleByAdamState(
            count=jax.device_put(data["adam/count"]),
            mu=jax.device_put(mu),
            nu=jax.device_put(nu),
        )

    adjacency = data["adjacency"].astype(np.uint32)
    offsets = data["adjacency_offsets"].astype(np.uint32)
    model.triangulation = Triangulation()
    model.triangulation._adjacency = adjacency
    model.triangulation._offsets = offsets
    model.triangulation._num_points = n
    model.pad_degree = round_degree(model.triangulation.max_degree())
    model.nbr_idx = jax.device_put(csr_to_padded(
        adjacency, offsets, num_points=model.capacity,
        pad_to=model.pad_degree,
    ))
    model.aabb_tree = build_aabb_tree(
        model.params["primal_points"], n_active=n
    )
    return meta["iteration"], meta.get("extra", {})
