"""RadFoamScene: the trainable scene model.

TPU-native equivalent of the reference's RadFoamScene nn.Module
(radfoam_model/scene.py:13-656). State lives in a plain pytree of
capacity-padded device arrays + host-side metadata:

  * Learned: primal_points (C,3) f32, density (C,1), att_dc (C,3),
    att_sh (C, 3((d+1)^2-1)) — rows [n_points:C] are inactive padding so
    the point count can change (densify/prune) without re-jitting every
    time (SURVEY.md §7.1 item 5). Capacity and the neighbor-table degree
    only ratchet upward through growth buckets.
  * Derived: nbr_idx (C,K) padded adjacency (padding = self index), the
    host-side Triangulation, and the NN-query handle.
  * Optimizer: optax scale_by_adam state (eps=1e-15 matching torch Adam,
    scene.py:299), manipulated as a pytree on densify/prune/permute
    exactly as the reference manipulates exp_avg/exp_avg_sq
    (scene.py:127-158, 340-413).

The densify/prune/permute operations run on host (numpy): they always
coincide with a full host-side triangulation rebuild, so there is no extra
synchronization cost.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from radfoam_tpu.delaunay import Triangulation, TriangulationFailedError
from radfoam_tpu.ops.adjacency import (
    csr_to_padded,
    farthest_neighbor_padded,
)
from radfoam_tpu.ops.nn import build_aabb_tree, nn
from radfoam_tpu.ops.trace import TraceConfig, trace
from radfoam_tpu.utils.lr import get_cosine_lr_func
from radfoam_tpu.utils.ply import write_ply

PARAM_KEYS = ("primal_points", "density", "att_dc", "att_sh")


def round_capacity(n):
    """Growth bucket: next {1, 1.5} x power-of-two at or above n."""
    if n <= 8192:
        return 8192
    p = 1 << (int(n - 1).bit_length() - 1)
    for c in (p, p + p // 2, 2 * p):
        if c >= n:
            return c
    return 2 * p


def round_degree(k):
    return max(16, -(-k // 8) * 8)


def softplus_density(density, activation_scale):
    """activation_scale * softplus(x, beta=10) (reference scene.py:202-203)."""
    return activation_scale * jax.nn.softplus(10.0 * density) / 10.0


def activate_attributes(params, activation_scale, attr_dtype):
    """Concat [att_dc, att_sh, density_activated] -> (C, A) in attr_dtype
    (reference get_trace_data, scene.py:208-217)."""
    d = softplus_density(params["density"], activation_scale)
    return jnp.concatenate(
        [params["att_dc"], params["att_sh"], d], axis=-1
    ).astype(attr_dtype)


class RadFoamScene:
    def __init__(self, args, points=None, points_colors=None, cameras=None,
                 device=None, attr_dtype=jnp.float32, seed=42):
        self.sh_degree = int(args.sh_degree)
        self.num_init_points = int(args.init_points)
        self.num_final_points = int(args.final_points)
        self.activation_scale = float(args.activation_scale)
        self.attr_dtype = attr_dtype
        self.rng = np.random.default_rng(seed)
        self.cameras = cameras

        self.sh_dim = 3 * ((1 + self.sh_degree) ** 2 - 1)
        self.n_points = 0
        self.capacity = 0
        self.pad_degree = 16
        self.params = None
        self.nbr_idx = None
        self.triangulation = None
        self.aabb_tree = None
        self.optimizer_state = None
        self._last_built = None
        self._bounds_cache = None
        self._tri_future = None
        self._tri_snapshot = None
        self._tri_executor = None
        self._adam = optax.scale_by_adam(eps=1e-15)

        if points is not None:
            self.initialize_from_pcd(points, points_colors)
        else:
            self.random_initialize()

    # ------------------------------------------------------------------
    # initialization (reference scene.py:61-125)

    def _finish_init(self, pts, density):
        """Triangulate initial points, apply the sort, pad to capacity."""
        self.triangulation = Triangulation()
        self.triangulation.rebuild(pts, incremental=False)
        perm = self.triangulation.permutation()
        pts = pts[perm]
        density = density[perm]

        n = pts.shape[0]
        self.n_points = n
        self.capacity = round_capacity(n)
        self.num_init_points = n

        params = {
            "primal_points": self._pad_rows(pts.astype(np.float32)),
            "density": self._pad_rows(density.astype(np.float32)),
            "att_dc": np.zeros((self.capacity, 3), np.float32),
            "att_sh": np.zeros((self.capacity, self.sh_dim), np.float32),
        }
        self.params = jax.device_put(params)
        self._refresh_derived()

    def _pad_rows(self, arr):
        pad = self.capacity - arr.shape[0]
        if pad <= 0:
            return arr
        # inactive point rows get far-away placeholder positions so they
        # can never be a nearest-neighbor answer by accident (the NN query
        # also masks by n_active, this is belt and braces)
        fill = np.zeros((pad, *arr.shape[1:]), arr.dtype)
        return np.concatenate([arr, fill], axis=0)

    def random_initialize(self):
        """Gaussian cloud init (reference scene.py:61-86)."""
        pts = self.rng.standard_normal(
            (self.num_init_points, 3), dtype=np.float32
        ) * 25.0
        density = np.zeros((self.num_init_points, 1), np.float32)
        self._finish_init(pts, density)

    def initialize_from_pcd(self, points, points_colors=None):
        """COLMAP point-cloud init (reference scene.py:88-125): 90% subsample
        with 1e-2 jitter plus 5k far random points at density -0.5."""
        points = np.asarray(points, dtype=np.float32)
        num_random = 5_000
        random_pts = self.rng.standard_normal(
            (num_random, 3), dtype=np.float32
        ) * 10.0

        num_samples = int(0.9 * points.shape[0])
        print(
            f"Starting with {num_samples} points from {points.shape[0]} "
            "COLMAP points"
        )
        idx = self.rng.integers(0, points.shape[0], size=num_samples)
        samp = points[idx] + self.rng.standard_normal(
            (num_samples, 3), dtype=np.float32
        ) * 1e-2

        pts = np.concatenate([samp, random_pts], axis=0)
        density = np.concatenate(
            [
                self.rng.random((num_samples, 1), dtype=np.float32),
                -0.5 * np.ones((num_random, 1), np.float32),
            ],
            axis=0,
        )
        self._finish_init(pts, density)

    # ------------------------------------------------------------------
    # active views

    @property
    def primal_points(self):
        return self.params["primal_points"][: self.n_points]

    @property
    def density(self):
        return self.params["density"][: self.n_points]

    @property
    def att_dc(self):
        return self.params["att_dc"][: self.n_points]

    @property
    def att_sh(self):
        return self.params["att_sh"][: self.n_points]

    @property
    def point_adjacency(self):
        return self.triangulation.point_adjacency()

    @property
    def point_adjacency_offsets(self):
        return self.triangulation.point_adjacency_offsets()

    # ------------------------------------------------------------------
    # triangulation maintenance (reference scene.py:160-200)

    def update_triangulation(self, rebuild=True, incremental=False):
        pts_host = np.asarray(self.params["primal_points"][: self.n_points])
        if not np.isfinite(pts_host).all():
            raise RuntimeError("NaN in points")

        # skip identical rebuilds: after freeze_points the points stop
        # moving but the update cadence keeps firing (train.py:243-249); a
        # host-side equality check is ~1000x cheaper than a rebuild
        if (
            rebuild
            and incremental
            and self._last_built is not None
            and self._last_built.shape == pts_host.shape
            and np.array_equal(self._last_built, pts_host)
        ):
            return

        perturbation = 1e-6
        del_points = pts_host
        failures = 0
        needs_permute = False
        while rebuild:
            if failures > 25:
                raise RuntimeError("aborted triangulation after 25 attempts")
            try:
                needs_permute = self.triangulation.rebuild(
                    del_points, incremental=incremental
                )
                break
            except TriangulationFailedError as e:
                print("caught: ", e)
                perturbation *= 2
                failures += 1
                incremental = False
                del_points = pts_host + perturbation * self.rng.standard_normal(
                    pts_host.shape
                ).astype(np.float32)

        if failures > 5:
            # jittered coordinates become the real parameters
            # (reference scene.py:187-189)
            self.params["primal_points"] = (
                self.params["primal_points"].at[: self.n_points].set(
                    jnp.asarray(del_points)
                )
            )

        if needs_permute:
            self.permute_points(self.triangulation.permutation())

        self._refresh_derived()
        self._last_built = np.asarray(
            self.params["primal_points"][: self.n_points]
        )

    # -- asynchronous triangulation (VERDICT r1 task 4) --------------------
    #
    # The host-side rebuild/repair runs on a worker thread while the device
    # keeps stepping on the previous adjacency; the new table lands a few
    # steps stale, which the reference's own 1..100-step rebuild cadence
    # already tolerates. ctypes releases the GIL during the native build,
    # so this overlaps even on a single host core (the main thread is
    # blocked in device RPC most of the time anyway).

    @property
    def triangulation_in_flight(self):
        return self._tri_future is not None

    def update_triangulation_async(self):
        """Start rebuilding from a snapshot of the current points.

        Returns False if a build is already in flight or the points have
        not moved since the last build (freeze-phase skip). The retry
        ladder jitters the snapshot on failures but never writes the jitter
        back (the live points have moved on); persistent failures surface
        from poll_triangulation().
        """
        if self._tri_future is not None:
            return False
        snapshot = np.array(
            self.params["primal_points"][: self.n_points], copy=True
        )
        if not np.isfinite(snapshot).all():
            raise RuntimeError("NaN in points")
        if (
            self._last_built is not None
            and self._last_built.shape == snapshot.shape
            and np.array_equal(self._last_built, snapshot)
        ):
            return False

        if self._tri_executor is None:
            import concurrent.futures

            self._tri_executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="triangulation"
            )

        def work():
            perturbation = 1e-6
            del_points = snapshot
            failures = 0
            incremental = True
            while True:
                if failures > 25:
                    raise RuntimeError(
                        "aborted triangulation after 25 attempts"
                    )
                try:
                    needs_permute = self.triangulation.rebuild(
                        del_points, incremental=incremental
                    )
                    return needs_permute, del_points
                except TriangulationFailedError as e:
                    print("caught: ", e)
                    perturbation *= 2
                    failures += 1
                    incremental = False
                    del_points = (
                        snapshot
                        + perturbation
                        * self.rng.standard_normal(snapshot.shape)
                        .astype(np.float32)
                    )

        self._tri_snapshot = snapshot
        self._tri_future = self._tri_executor.submit(work)
        return True

    def poll_triangulation(self, wait=False):
        """Apply a finished async rebuild. Returns True if a new adjacency
        was installed this call."""
        fut = self._tri_future
        if fut is None:
            return False
        if not wait and not fut.done():
            return False
        needs_permute, built_points = fut.result()
        self._tri_future = None
        if needs_permute:
            self.permute_points(self.triangulation.permutation())
        self._refresh_derived()
        self._last_built = built_points
        return True

    def wait_triangulation(self):
        """Drain any in-flight async rebuild (needed before densification
        or any synchronous triangulation use)."""
        return self.poll_triangulation(wait=True)

    def _refresh_derived(self):
        """Rebuild the padded neighbor table + NN handle from the current
        triangulation (reference scene.py:195-200)."""
        adj = self.triangulation.point_adjacency()
        offsets = self.triangulation.point_adjacency_offsets()
        self.pad_degree = max(
            self.pad_degree, round_degree(self.triangulation.max_degree())
        )
        table = csr_to_padded(
            adj, offsets, num_points=self.capacity, pad_to=self.pad_degree
        )
        self.nbr_idx = jax.device_put(table)
        self.aabb_tree = build_aabb_tree(
            self.params["primal_points"], n_active=self.n_points
        )
        self._bounds_cache = None  # raster bounds follow the triangulation

    def raster_bounds(self):
        """Capacity-padded clamped cell AABBs for the raster engines.

        Computed lazily from the current triangulation (native O(T) pass +
        cellbound.clamp_bounds) and cached until the next triangulation
        install; padding rows collapse to zero extent so bin_pairs culls
        them. Returns (bb_min, bb_max) device arrays of shape
        (capacity, 3)."""
        if self._bounds_cache is None:
            from radfoam_tpu.ops.cellbound import clamp_bounds

            pts = np.asarray(self.params["primal_points"][: self.n_points])
            if getattr(self, "_loaded_bounds", None) is not None:
                # checkpoint carried its raw cell AABBs (save_pt extras)
                bb_min, bb_max = self._loaded_bounds
            else:
                try:
                    bb_min, bb_max, _ = self.triangulation.cell_bounds(pts)
                except Exception:
                    # CSR-only triangulation (reference-trained model.pt):
                    # build a throwaway triangulation for the geometry and
                    # map its sorted-order bounds back to checkpoint order
                    tri = Triangulation()
                    tri.rebuild(pts, incremental=False)
                    perm = np.asarray(tri.permutation(), np.int64)
                    bmin_s, bmax_s, _ = tri.cell_bounds(pts[perm])
                    bb_min = np.empty_like(bmin_s)
                    bb_max = np.empty_like(bmax_s)
                    bb_min[perm] = bmin_s
                    bb_max[perm] = bmax_s
            bb_min, bb_max, _ = clamp_bounds(pts, bb_min, bb_max)
            pad_min = np.zeros((self.capacity, 3), np.float32)
            pad_max = np.zeros((self.capacity, 3), np.float32)
            pad_min[: self.n_points] = bb_min
            pad_max[: self.n_points] = bb_max
            self._bounds_cache = (
                jax.device_put(pad_min), jax.device_put(pad_max)
            )
        return self._bounds_cache

    def permute_points(self, permutation):
        """Apply a sorting permutation to all per-point state including Adam
        moments (reference scene.py:127-158)."""
        full = np.concatenate(
            [
                np.asarray(permutation, dtype=np.int64),
                np.arange(self.n_points, self.capacity, dtype=np.int64),
            ]
        )
        perm_dev = jax.device_put(full)
        gather = lambda a: jnp.take(a, perm_dev, axis=0)
        self.params = jax.tree.map(gather, self.params)
        if self.optimizer_state is not None:
            self.optimizer_state = self._permute_adam(gather)

    def _permute_adam(self, gather):
        st = self.optimizer_state
        return optax.ScaleByAdamState(
            count=st.count,
            mu=jax.tree.map(gather, st.mu),
            nu=jax.tree.map(gather, st.nu),
        )

    # ------------------------------------------------------------------
    # tracing

    def get_primal_density(self):
        return softplus_density(self.density, self.activation_scale)

    def get_primal_attributes(self):
        return jnp.concatenate([self.att_dc, self.att_sh], axis=-1)

    def get_trace_data(self):
        """Full-capacity trace inputs: (points, attrs, nbr_idx)."""
        attrs = activate_attributes(
            self.params, self.activation_scale, self.attr_dtype
        )
        return self.params["primal_points"], attrs, self.nbr_idx

    def get_starting_point(self, ray_origins):
        """NN cell of each (unique) ray origin (reference scene.py:224-234).
        Callers pass one origin per camera; the query is exact.

        The NN handle is rebuilt from the live parameter buffer each call:
        the training step donates (and thus invalidates) the previous
        buffers every iteration, and the query must see current positions.
        """
        origins = jnp.asarray(ray_origins)[..., :3].reshape(-1, 3)
        tree = build_aabb_tree(
            self.params["primal_points"], n_active=self.n_points
        )
        self.aabb_tree = tree
        return nn(self.params["primal_points"], tree, origins)

    def trace_config(self, **kw):
        kw.setdefault("sh_degree", self.sh_degree)
        return TraceConfig(**kw)

    def forward(self, rays, start_point=None, depth_quantiles=None,
                return_contribution=False, weight_threshold=0.001):
        """Convenience eval-path forward over an (..., 6) ray array.

        Returns (rgba, depth, contribution, num_intersections) shaped like
        the input (reference forward, scene.py:236-261).
        """
        rays = jnp.asarray(rays)
        shape = rays.shape[:-1]
        flat = rays.reshape(-1, 6)
        if start_point is None:
            origins = np.asarray(flat[:, :3])
            uniq, inv = np.unique(origins, axis=0, return_inverse=True)
            starts = np.asarray(self.get_starting_point(jnp.asarray(uniq)))
            start = jnp.asarray(starts[inv], dtype=jnp.int32)
        else:
            start = jnp.broadcast_to(
                jnp.asarray(start_point, dtype=jnp.int32), shape
            ).reshape(-1)

        nq = 0 if depth_quantiles is None else depth_quantiles.shape[-1]
        cfg = self.trace_config(
            num_quantiles=nq,
            return_contribution=return_contribution,
            weight_threshold=weight_threshold,
        )
        points, attrs, nbr_idx = self.get_trace_data()
        quant = (
            None if depth_quantiles is None
            else jnp.asarray(depth_quantiles).reshape(-1, nq)
        )
        out = trace(points, attrs, nbr_idx, flat, start, quant, config=cfg)
        rgba = out.rgba.reshape(*shape, 4)
        depth = out.depth.reshape(*shape, nq) if nq else None
        contrib = out.contribution[: self.n_points] if return_contribution \
            else None
        return rgba, depth, contrib, out.num_intersections.reshape(shape)

    __call__ = forward

    # ------------------------------------------------------------------
    # optimizer (reference scene.py:275-338)

    def declare_optimizer(self, args, warmup, max_iterations):
        self.optimizer_state = self._adam.init(self.params)
        self.xyz_scheduler_args = get_cosine_lr_func(
            lr_init=args.points_lr_init,
            lr_final=args.points_lr_final,
            max_steps=args.freeze_points,
        )
        self.den_scheduler_args = get_cosine_lr_func(
            lr_init=args.density_lr_init,
            lr_final=args.density_lr_final,
            warmup_steps=warmup,
            max_steps=max_iterations,
        )
        self.attr_dc_scheduler_args = get_cosine_lr_func(
            lr_init=args.attributes_lr_init,
            lr_final=args.attributes_lr_final,
            max_steps=max_iterations,
        )
        self.attr_rest_scheduler_args = get_cosine_lr_func(
            lr_init=args.sh_factor * args.attributes_lr_init,
            lr_final=args.sh_factor * args.attributes_lr_final,
            warmup_steps=max_iterations // 5,
            max_steps=max_iterations,
        )

    def learning_rates(self, iteration):
        """Per-group LRs for this step, fed to the jitted train step as
        scalars (no recompile)."""
        return {
            "primal_points": self.xyz_scheduler_args(iteration),
            "density": self.den_scheduler_args(iteration),
            "att_dc": self.attr_dc_scheduler_args(iteration),
            "att_sh": self.attr_rest_scheduler_args(iteration),
        }

    # ------------------------------------------------------------------
    # densify / prune (reference scene.py:422-495)

    def prune_and_densify(self, point_error, point_contribution,
                          upsample_factor=1.2):
        n = self.n_points
        num_new = int((upsample_factor - 1) * n)

        error = np.asarray(point_error).reshape(-1)[:n].clip(min=0)
        contribution = np.asarray(point_contribution).reshape(-1)[:n]

        far, radius = farthest_neighbor_padded(
            self.params["primal_points"], self.nbr_idx, n_active=n
        )
        far = np.asarray(far)[:n].astype(np.int64)
        radius = np.asarray(radius)[:n]

        params = {
            k: np.asarray(v)[:n] for k, v in self.params.items()
        }
        points = params["primal_points"]

        # ---- pruning mask (scene.py:441-454): prune points that contribute
        # nothing, whose neighbors all contribute nothing, in small cells
        self_mask = contribution > 1e-2
        table = np.asarray(self.nbr_idx)[:n]
        valid = table != np.arange(n, dtype=table.dtype)[:, None]
        n_masked_adj = np.where(
            valid, self_mask[np.minimum(table, n - 1)], False
        ).sum(axis=1)
        contrib_mask = (n_masked_adj == 0) & ~self_mask
        prune_mask = contrib_mask & (radius < 1e-1)

        # ---- density reset (scene.py:456-459)
        kill = contribution < 1e-3
        params["density"] = params["density"].copy()
        params["density"][kill] = -1.0

        # ---- sample new points (scene.py:461-481): toward the farthest
        # neighbor with 10% radial noise, weighted by error * cell radius
        perturbation = 0.25 * (points[far] - points)
        delta = self.rng.standard_normal(points.shape).astype(np.float32)
        delta /= np.linalg.norm(delta, axis=-1, keepdims=True)
        perturbation += (
            0.1 * np.linalg.norm(perturbation, axis=-1, keepdims=True) * delta
        )

        weights = (error * radius).astype(np.float64)
        sampled = _multinomial_without_replacement(
            self.rng, weights, num_new
        )
        new_rows = {
            "primal_points": (points + perturbation)[sampled],
            "att_dc": params["att_dc"][sampled],
            "att_sh": params["att_sh"][sampled],
            "density": params["density"][sampled],
        }

        keep = ~np.concatenate([prune_mask, np.zeros(num_new, dtype=bool)])

        # ---- rebuild padded state (reference densification_postfix +
        # prune_points, preserving Adam moments: zeros for new rows)
        new_n = int(keep.sum())
        self.n_points = new_n
        self.capacity = max(self.capacity, round_capacity(new_n))

        def rebuild(old_active, new_vals):
            full = np.concatenate([old_active, new_vals], axis=0)[keep]
            pad = self.capacity - full.shape[0]
            if pad > 0:
                full = np.concatenate(
                    [full, np.zeros((pad, *full.shape[1:]), full.dtype)],
                    axis=0,
                )
            return full

        new_params = {
            k: rebuild(params[k], new_rows[k]) for k in PARAM_KEYS
        }
        self.params = jax.device_put(new_params)

        if self.optimizer_state is not None:
            st = self.optimizer_state
            mu = {
                k: rebuild(
                    np.asarray(st.mu[k])[:n], np.zeros_like(new_rows[k])
                )
                for k in PARAM_KEYS
            }
            nu = {
                k: rebuild(
                    np.asarray(st.nu[k])[:n], np.zeros_like(new_rows[k])
                )
                for k in PARAM_KEYS
            }
            self.optimizer_state = optax.ScaleByAdamState(
                count=st.count,
                mu=jax.device_put(mu),
                nu=jax.device_put(nu),
            )

    # ------------------------------------------------------------------
    # checkpoint I/O (reference scene.py:550-656)

    def save_ply(self, ply_path):
        n = self.n_points
        points = np.asarray(self.primal_points, dtype=np.float32)
        density = np.asarray(self.get_primal_density(), dtype=np.float32)
        color = np.asarray(self.get_primal_attributes(), dtype=np.float32)
        adjacency = np.asarray(self.point_adjacency, dtype=np.uint32)
        offsets = np.asarray(self.point_adjacency_offsets, dtype=np.uint32)

        C0 = 0.28209479177387814
        quant = lambda c: np.clip(
            255 * (0.5 + C0 * c), 0, 255
        ).astype(np.uint8)

        n_sh = color.shape[1] - 3
        dtype = [
            ("x", np.float32), ("y", np.float32), ("z", np.float32),
            ("red", np.uint8), ("green", np.uint8), ("blue", np.uint8),
            ("density", np.float32), ("adjacency_offset", np.uint32),
        ] + [(f"color_sh_{i}", np.float32) for i in range(n_sh)]

        vertex = np.empty(n, dtype=dtype)
        vertex["x"], vertex["y"], vertex["z"] = points.T
        vertex["red"] = quant(color[:, 0])
        vertex["green"] = quant(color[:, 1])
        vertex["blue"] = quant(color[:, 2])
        vertex["density"] = density[:, 0]
        vertex["adjacency_offset"] = offsets[1:]
        for i in range(n_sh):
            vertex[f"color_sh_{i}"] = color[:, 3 + i]

        adj = np.empty(adjacency.shape[0], dtype=[("adjacency", np.uint32)])
        adj["adjacency"] = adjacency
        write_ply(ply_path, [("vertex", vertex), ("adjacency", adj)])

    def save_pt(self, pt_path):
        """torch.save checkpoint, binary-compatible with the reference
        (scene.py:614-630) so reference-trained model.pt files load here
        and vice versa."""
        import torch

        scene_data = {
            "xyz": torch.from_numpy(
                np.asarray(self.primal_points, dtype=np.float32)
            ),
            "density": torch.from_numpy(
                np.asarray(self.density, dtype=np.float32)
            ),
            "color_dc": torch.from_numpy(
                np.asarray(self.att_dc, dtype=np.float32)
            ),
            "color_sh": torch.from_numpy(
                np.asarray(self.att_sh, dtype=np.float32)
            ),
            "adjacency": torch.from_numpy(
                np.asarray(self.point_adjacency, dtype=np.int64)
            ),
            "adjacency_offsets": torch.from_numpy(
                np.asarray(self.point_adjacency_offsets, dtype=np.int64)
            ),
        }
        # extra (non-reference) keys: raw per-cell Voronoi AABBs so the
        # raster engine can evaluate a loaded checkpoint without a full
        # re-triangulation. The reference load_pt reads its own keys only,
        # so the file stays binary-compatible both ways.
        try:
            pts = np.asarray(
                self.params["primal_points"][: self.n_points]
            )
            bb_min, bb_max, _ = self.triangulation.cell_bounds(pts)
            scene_data["cell_bb_min"] = torch.from_numpy(
                np.asarray(bb_min, np.float32)
            )
            scene_data["cell_bb_max"] = torch.from_numpy(
                np.asarray(bb_max, np.float32)
            )
        except Exception:
            pass  # CSR-only triangulation (e.g. loaded checkpoint)
        torch.save(scene_data, pt_path)

    def load_pt(self, pt_path):
        import torch

        scene_data = torch.load(pt_path, weights_only=True)
        xyz = scene_data["xyz"].float().numpy()
        n = xyz.shape[0]

        exp_sh = self.sh_dim
        got_sh = scene_data["color_sh"].shape[-1]
        assert exp_sh == got_sh, (
            f"Expected {exp_sh} SH coeffs per-point, got {got_sh}"
        )

        self.n_points = n
        self.capacity = round_capacity(n)
        self.params = jax.device_put({
            "primal_points": self._pad_rows(xyz),
            "density": self._pad_rows(
                scene_data["density"].float().numpy()
            ),
            "att_dc": self._pad_rows(scene_data["color_dc"].float().numpy()),
            "att_sh": self._pad_rows(scene_data["color_sh"].float().numpy()),
        })

        adjacency = scene_data["adjacency"].numpy().astype(np.uint32)
        offsets = scene_data["adjacency_offsets"].numpy().astype(np.uint32)
        # restore CSR without re-triangulating (reference load_pt,
        # scene.py:632-656)
        self.triangulation = Triangulation()
        self.triangulation._adjacency = adjacency
        self.triangulation._offsets = offsets
        self.triangulation._num_points = n
        self.pad_degree = round_degree(self.triangulation.max_degree())
        table = csr_to_padded(
            adjacency, offsets, num_points=self.capacity,
            pad_to=self.pad_degree,
        )
        self.nbr_idx = jax.device_put(table)
        self.aabb_tree = build_aabb_tree(
            self.params["primal_points"], n_active=n
        )

    def show(self, loop_fn=lambda v: None, iterations=None, **viewer_kwargs):
        from radfoam_tpu.viewer import run_with_viewer

        run_with_viewer(self, loop_fn, total_iterations=iterations,
                        **viewer_kwargs)


def _multinomial_without_replacement(rng, weights, k):
    """Gumbel top-k: distributionally identical to
    torch.multinomial(weights, k, replacement=False) (scene.py:469-473)."""
    w = np.asarray(weights, dtype=np.float64)
    logw = np.where(w > 0, np.log(np.maximum(w, 1e-300)), -np.inf)
    g = rng.gumbel(size=w.shape)
    keys = logw + g
    k = min(k, w.shape[0])
    return np.argpartition(-keys, k - 1)[:k]
