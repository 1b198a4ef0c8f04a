"""Microbench: XLA scan/sort primitive costs on the real chip.

The raster frame spends ~42 ms on relayout INDEX work (cumsum/cummax over
the padded pair buffer) and ~55-70 ms in the one lax.sort — both scan-
shaped. This measures: jnp.cumsum, lax.cummax, a manual 2-level
Hillis-Steele cumsum (lane-axis shifts), and lax.sort at the bench sizes.

Usage: python tools/scan_model.py [--m 3145728]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    return (time.perf_counter() - t0) / reps


def blocked_cumsum(x, block=512):
    """2-level Hillis-Steele inclusive cumsum over a 1D i32 array whose
    length is a multiple of ``block``: lane-axis shifted adds within rows
    + a tiny carry scan across rows. Exact same result as jnp.cumsum."""
    n = x.shape[0]
    rows = n // block
    X = x.reshape(rows, block)
    s = 1
    while s < block:
        X = X + jnp.pad(X, ((0, 0), (s, 0)))[:, :block]
        s *= 2
    carry = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), jnp.cumsum(X[:-1, -1])]
    )
    return (X + carry[:, None]).reshape(n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=3 << 20)
    args = ap.parse_args()
    M = args.m
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 3, size=M).astype(np.int32))
    keys = jnp.asarray(rng.integers(0, 1 << 31, size=M).astype(np.uint32))
    payload = jnp.asarray(np.arange(M, dtype=np.int32))

    t = timeit(jax.jit(jnp.cumsum), x)
    print(f"jnp.cumsum     {M}: {t*1e3:7.2f} ms")
    t = timeit(jax.jit(jax.lax.cummax), x)
    print(f"lax.cummax     {M}: {t*1e3:7.2f} ms")
    t = timeit(jax.jit(blocked_cumsum), x)
    chk = np.array_equal(
        np.asarray(jax.jit(blocked_cumsum)(x)), np.cumsum(np.asarray(x))
    )
    print(f"blocked_cumsum {M}: {t*1e3:7.2f} ms  exact={chk}")
    t = timeit(
        jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)), keys, payload
    )
    print(f"lax.sort k+v   {M}: {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)), keys)
    print(f"lax.sort k     {M}: {t*1e3:7.2f} ms")
    # gather from a tiny table (tile-indexed takes in relayout)
    tbl = jnp.asarray(rng.random((8192,), np.float32))
    idx = jnp.asarray(rng.integers(0, 8192, size=M).astype(np.int32))
    t = timeit(jax.jit(lambda tb, i: jnp.take(tb, i)), tbl, idx)
    print(f"take 8k-table  {M}: {t*1e3:7.2f} ms")


def extra():
    """i64 cummax, unique-index scatter, M-row aux take — the remaining
    bin_pairs primitives."""
    M = 3 << 20
    N = 2 << 20
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.integers(0, 1 << 60, size=M).astype(np.int64))
    t = timeit(jax.jit(jax.lax.cummax), x64)
    print(f"lax.cummax i64 {M}: {t*1e3:7.2f} ms")
    offs = jnp.asarray(np.sort(rng.choice(M, size=N, replace=False)).astype(np.int32))
    vals = jnp.asarray(np.arange(N, dtype=np.int32))

    def seed_scatter(o, v):
        return jnp.full((M,), -1, jnp.int32).at[o].max(v, mode="drop")

    t = timeit(jax.jit(seed_scatter), offs, vals)
    print(f"seed scatter-max N={N} into {M}: {t*1e3:7.2f} ms")
    aux = jnp.asarray(rng.integers(0, 1 << 30, size=(N, 4)).astype(np.int32))
    cell = jnp.asarray(rng.integers(0, N, size=M).astype(np.int32))
    t = timeit(jax.jit(lambda a, c: jnp.take(a, c, axis=0)), aux, cell)
    print(f"take aux (N,4) M rows: {t*1e3:7.2f} ms")
    x = jnp.asarray(rng.integers(0, 3, size=M).astype(np.int32))
    t = timeit(jax.jit(lambda a: jnp.cumsum(a.astype(jnp.int64))), x)
    print(f"cumsum i64    {M}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
    extra()
