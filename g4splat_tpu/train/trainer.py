"""2DGS trainer.

Functional re-build of the reference training loop
(2d-gaussian-splatting/train_with_refine_depth.py:71-663): per-iteration —
render one (or a vmapped batch of) camera(s), assemble the photometric +
2DGS-regularization + chart-prior losses, Adam step with per-group LRs and the
Plenoxels-style exponential xyz schedule, accumulate screen-space gradient
stats, and periodically densify/prune, reset opacity, bump SH degree, and
recompute the mip filter.

The hot path (`train_step`) is one fused jit: render → 8 losses → backward →
optax update → stat accumulation. Densify runs as a second jit at interval
boundaries (static shapes; free-slot scatter — see densify.py). Host code only
shuffles view indices and decides interval boundaries.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from g4splat_tpu.core.cameras import Camera
from g4splat_tpu.models.gaussians import GaussianScene
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.ops.rasterize_common import RenderConfig
from g4splat_tpu.train import losses as L
from g4splat_tpu.train.densify import (
    DensifyState,
    accumulate_stats,
    densify_and_prune,
)

PARAM_FIELDS = (
    "xyz", "f_dc", "f_rest", "opacity_raw", "scaling_raw", "rotation_raw",
)


@struct.dataclass
class TrainConfig:
    # Schedule (configs/free_gaussians_refinement/default.yaml + arguments/__init__.py:73-95)
    iterations: int = struct.field(pytree_node=False, default=7000)
    position_lr_init: float = struct.field(pytree_node=False, default=1.6e-4)
    position_lr_final: float = struct.field(pytree_node=False, default=1.6e-6)
    position_lr_delay_mult: float = struct.field(pytree_node=False, default=0.01)
    # The reference never passes lr_delay_steps, so its warm-start delay is
    # inert by default (utils/general_utils.py:49-55); >0 enables it.
    position_lr_delay_steps: int = struct.field(pytree_node=False, default=0)
    position_lr_max_steps: int = struct.field(pytree_node=False, default=30_000)
    feature_lr: float = struct.field(pytree_node=False, default=2.5e-3)
    opacity_lr: float = struct.field(pytree_node=False, default=0.05)
    scaling_lr: float = struct.field(pytree_node=False, default=5e-3)
    rotation_lr: float = struct.field(pytree_node=False, default=1e-3)
    # Losses
    lambda_dssim: float = struct.field(pytree_node=False, default=0.2)
    lambda_normal: float = struct.field(pytree_node=False, default=0.05)
    lambda_dist: float = struct.field(pytree_node=False, default=0.0)
    normal_consistency_from: int = struct.field(pytree_node=False, default=3500)
    distortion_from: int = struct.field(pytree_node=False, default=1500)
    lambda_anisotropy: float = struct.field(pytree_node=False, default=0.1)
    anisotropy_max_ratio: float = struct.field(pytree_node=False, default=5.0)
    use_chart_priors: bool = struct.field(pytree_node=False, default=True)
    use_depth_order: bool = struct.field(pytree_node=False, default=True)
    # "per_pixel" = reference-parity independent shifts (gather-heavy);
    # "global" = TPU fast path (losses.depth_order_loss docstring).
    depth_order_sample: str = struct.field(pytree_node=False,
                                           default="per_pixel")
    initial_regularization_factor: float = struct.field(pytree_node=False, default=0.5)
    confidence_weighting: float = struct.field(pytree_node=False, default=0.5)
    depth_ratio: float = struct.field(pytree_node=False, default=0.5)
    # Densification
    percent_dense: float = struct.field(pytree_node=False, default=0.01)
    densification_interval: int = struct.field(pytree_node=False, default=100)
    opacity_reset_interval: int = struct.field(pytree_node=False, default=1000)
    densify_from_iter: int = struct.field(pytree_node=False, default=500)
    densify_until_iter: int = struct.field(pytree_node=False, default=3500)
    densify_grad_threshold: float = struct.field(pytree_node=False, default=2e-4)
    max_screen_size: float = struct.field(pytree_node=False, default=20.0)
    min_opacity: float = struct.field(pytree_node=False, default=0.05)
    use_mip_filter: bool = struct.field(pytree_node=False, default=True)
    # Misc
    spatial_lr_scale: float = struct.field(pytree_node=False, default=1.0)
    backend: str = struct.field(pytree_node=False, default="tiled")
    # Depth-rank binning for the training render (see
    # RenderConfig.depth_rank_binning): presort once, key-only binning sort.
    depth_rank_binning: bool = struct.field(pytree_node=False, default=False)
    # Rasterizer capacity knobs (RenderConfig passthrough). The pack gather,
    # the backward kernel's per-entry buffer, and the entry→splat reduction
    # all scale with buf_factor × capacity; at high splat-count/low-res
    # shapes (budget runs: 2.4M splats @ 512×384, ~0.6 real entries/splat)
    # buf_factor=2 halves that traffic twice over with huge headroom. The
    # step metrics report `n_dropped` so overflow is loud, never silent.
    raster_buf_factor: int = struct.field(pytree_node=False, default=4)
    # Absolute entry-buffer override (0 = factor). The Trainer auto-tunes
    # this at init from a measured per-view real-entry count unless
    # raster_buf_auto=False; overflow is surfaced via the n_dropped metric
    # and auto-bumps the buffer at the next synced step.
    raster_buf_size: int = struct.field(pytree_node=False, default=0)
    raster_buf_auto: bool = struct.field(pytree_node=False, default=True)
    raster_max_tiles_per_splat: int = struct.field(pytree_node=False,
                                                   default=16)
    raster_compact_width: int = struct.field(pytree_node=False, default=8)
    sh_increase_interval: int = struct.field(pytree_node=False, default=1000)
    # Capacity-growth ceiling when densification overflows the static buffer
    # (reference hard cap: train_with_refine_depth.py:147, 10M splats).
    max_capacity: int = struct.field(pytree_node=False, default=10_000_000)


class ViewData(NamedTuple):
    """Per-view supervision (stacked over views for the whole dataset)."""
    image: jnp.ndarray            # (V, H, W, 3)
    prior_depth: jnp.ndarray      # (V, H, W)
    prior_normal: jnp.ndarray     # (V, H, W, 3) world
    prior_curv: jnp.ndarray       # (V, H, W)
    confidence: jnp.ndarray       # (V, H, W)
    color_weight: jnp.ndarray     # (V,) 1.0 input views, 0.01 generated views
    scale_factor: jnp.ndarray     # () charts scale factor


def xyz_lr_schedule(cfg: TrainConfig):
    """Plenoxels log-linear decay with delayed warm start
    (utils/general_utils.py:30-66): when delay_steps > 0 the lr ramps from
    delay_mult·lr to lr over a half-sine; log-lerp init→final after."""
    init = cfg.position_lr_init * cfg.spatial_lr_scale
    final = cfg.position_lr_final * cfg.spatial_lr_scale

    def sched(step):
        t = jnp.clip(step / cfg.position_lr_max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(init) * (1 - t) + jnp.log(final) * t
        )
        if cfg.position_lr_delay_steps > 0:
            u = jnp.clip(step / cfg.position_lr_delay_steps, 0.0, 1.0)
            delay = cfg.position_lr_delay_mult + (
                1 - cfg.position_lr_delay_mult
            ) * jnp.sin(0.5 * jnp.pi * u)
            log_lerp = delay * log_lerp
        return log_lerp

    return sched


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    label_fn = lambda params: {k: k for k in params}
    return optax.multi_transform(
        {
            "xyz": optax.chain(
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15),
                optax.scale_by_schedule(lambda s: -1.0 * xyz_lr_schedule(cfg)(s)),
            ),
            "f_dc": optax.adam(cfg.feature_lr, eps=1e-15),
            "f_rest": optax.adam(cfg.feature_lr / 20.0, eps=1e-15),
            "opacity_raw": optax.adam(cfg.opacity_lr, eps=1e-15),
            "scaling_raw": optax.adam(cfg.scaling_lr, eps=1e-15),
            "rotation_raw": optax.adam(cfg.rotation_lr, eps=1e-15),
        },
        label_fn,
    )


def scene_params(scene: GaussianScene) -> Dict[str, jnp.ndarray]:
    return {k: getattr(scene, k) for k in PARAM_FIELDS}


def with_params(scene: GaussianScene, params: Dict[str, jnp.ndarray]) -> GaussianScene:
    return scene.replace(**params)


def compute_losses(
    scene: GaussianScene,
    camera: Camera,
    view: Dict[str, jnp.ndarray],
    cfg: TrainConfig,
    iteration: jnp.ndarray,
    key: jax.Array,
    center_offset: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    out = render(
        camera,
        scene,
        # λ_dist = 0.0 is the reference's production default
        # (arguments/__init__.py:86): statically skip the distortion-moment
        # machinery in the kernels then — rend_dist comes back as zeros and
        # dist_loss is exactly 0 either way.
        config=RenderConfig(bg=jnp.zeros(3), depth_ratio=cfg.depth_ratio,
                            depth_rank_binning=cfg.depth_rank_binning,
                            compute_distortion=cfg.lambda_dist != 0.0,
                            buf_factor=cfg.raster_buf_factor,
                            buf_size=cfg.raster_buf_size,
                            max_tiles_per_splat=cfg.raster_max_tiles_per_splat,
                            binning_compact_width=cfg.raster_compact_width),
        center_offset=center_offset,
        backend=cfg.backend,
    )
    return losses_from_render(scene, out, view, cfg, iteration, key)


def losses_from_render(
    scene: GaussianScene,
    out: Dict[str, jnp.ndarray],
    view: Dict[str, jnp.ndarray],
    cfg: TrainConfig,
    iteration: jnp.ndarray,
    key: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Loss assembly given a render() output dict — shared by the fused
    single-device step and the splat-sharded step (which produces `out`
    by composing per-slab maps, parallel/gaussian_shard.py)."""
    img = out["render"]
    gt = view["image"]

    color = L.dssim_color_loss(img, gt, cfg.lambda_dssim) * view["color_weight"]

    lam_n = jnp.where(iteration > cfg.normal_consistency_from, cfg.lambda_normal, 0.0)
    lam_d = jnp.where(iteration > cfg.distortion_from, cfg.lambda_dist, 0.0)
    normal_loss = lam_n * L.normal_consistency_loss(
        out["rend_normal"], out["surf_normal"]
    )
    dist_loss = lam_d * L.distortion_loss(out["rend_dist"])

    total = color + normal_loss + dist_loss
    aux = {
        "l1": L.l1_loss(img, gt),
        "psnr": L.psnr(img, gt),
        "color": color,
        "normal": normal_loss,
        "dist": dist_loss,
        "radii": out["radii"],
        "visibility": out["visibility_filter"],
        "n_dropped": out["n_dropped"],
        "n_overflow": out["n_overflow"],
    }

    if cfg.use_chart_priors:
        rf = L.schedule_regularization_factor(
            iteration, cfg.initial_regularization_factor
        )
        surf_depth = out["surf_depth"]
        dp = rf * 0.75 * L.depth_prior_loss(
            surf_depth, view["prior_depth"], view["scale_factor"],
            cfg.confidence_weighting,
        )
        dd = rf * 0.5 * L.depth_derivative_prior_loss(
            out["surf_normal"], view["prior_normal"]
        )
        npl = rf * 0.5 * L.normal_prior_loss(
            out["rend_normal"], view["prior_normal"]
        )
        cp = rf * 0.25 * L.curvature_prior_loss(
            out["rend_normal"], view["prior_curv"]
        )
        prior_total = dp + dd + npl + cp
        if cfg.use_depth_order:
            lam_do = L.schedule_depth_order_lambda(iteration)
            prior_total = prior_total + lam_do * L.depth_order_loss(
                key, surf_depth, view["prior_depth"],
                scene_extent=cfg.spatial_lr_scale,
                sample=cfg.depth_order_sample,
            )
        total = total + prior_total
        aux["priors"] = prior_total

    if cfg.lambda_anisotropy > 0:
        total = total + cfg.lambda_anisotropy * L.anisotropy_loss(
            scene.scaling(), scene.alive.astype(jnp.float32),
            cfg.anisotropy_max_ratio,
        )
    return total, aux


@partial(jax.jit, static_argnames=("cfg", "optimizer"), donate_argnums=(0, 1, 2))
def train_step(
    scene: GaussianScene,
    opt_state,
    dstate: DensifyState,
    camera: Camera,
    view: Dict[str, jnp.ndarray],
    iteration: jnp.ndarray,
    key: jax.Array,
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
):
    params = scene_params(scene)
    offset = jnp.zeros((scene.capacity, 2))

    def loss_fn(params, offset):
        s = with_params(scene, params)
        return compute_losses(s, camera, view, cfg, iteration, key, offset)

    (loss, aux), (gparams, goffset) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, offset)

    updates, opt_state = optimizer.update(gparams, opt_state, params)
    params = optax.apply_updates(params, updates)
    scene = with_params(scene, params)

    densify_window = (iteration >= cfg.densify_from_iter) & (
        iteration < cfg.densify_until_iter
    )
    dstate = jax.lax.cond(
        densify_window,
        lambda d: accumulate_stats(d, goffset, aux["radii"], aux["visibility"]),
        lambda d: d,
        dstate,
    )
    metrics = {
        "loss": loss,
        "l1": aux["l1"],
        "psnr": aux["psnr"],
        "n_alive": scene.num_alive,
        "n_dropped": aux["n_dropped"],
        "n_overflow": aux["n_overflow"],
    }
    return scene, opt_state, dstate, metrics


def make_dp_train_step(mesh, cfg: TrainConfig, optimizer):
    """Data-parallel training step over a device mesh.

    Each device renders its shard of the view batch (B = V_step / n_data
    views), gradients are `pmean`-averaged AND the densification statistics
    are `psum`-summed over the `data` axis, so the accumulated screen-grad
    stats are bit-identical to processing the same views on one device.
    The optax update and the DensifyState accumulation then run replicated.
    This is the reference's per-iteration semantics
    (train_with_refine_depth.py:362-632 + gaussian_model.py:649-651) lifted
    onto the mesh — classic DP with XLA collectives instead of NCCL DDP.
    """
    from jax.sharding import PartitionSpec as P

    def step(scene, opt_state, dstate, cameras, views, iteration, key):
        params = scene_params(scene)
        N = scene.capacity

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P(), P()),
            out_specs=(P(), P(), P(), P(), P(), P(), P()),
        )
        def shard_grads(params, cams, views_shard, iteration, key):
            B = views_shard["image"].shape[0]
            dev = jax.lax.axis_index("data")

            def loss_fn(params, offsets):
                s = with_params(scene, params)

                def one(i, acc):
                    cam = jax.tree.map(lambda x: x[i], cams)
                    view = jax.tree.map(
                        lambda x: x[i] if x.ndim else x, views_shard)
                    # Key folded on the GLOBAL view index so results are
                    # invariant to the mesh size.
                    l, aux = compute_losses(
                        s, cam, view, cfg, iteration,
                        jax.random.fold_in(key, dev * B + i), offsets[i],
                    )
                    loss, radii, vis, l1, psnr = acc
                    av = aux["visibility"].astype(jnp.float32)
                    return (
                        loss + l,
                        jnp.maximum(radii, aux["radii"] * av),
                        vis + av,
                        l1 + aux["l1"],
                        psnr + aux["psnr"],
                    )

                # Varying-zero init so the carry matches the body's
                # device-varying type under shard_map.
                z = jnp.sum(views_shard["image"][..., :1]) * 0.0
                acc0 = (z, jnp.zeros(N) + z, jnp.zeros(N) + z, z, z)
                loss, radii, vis, l1, psnr = jax.lax.fori_loop(0, B, one, acc0)
                return loss / B, (radii, vis, l1 / B, psnr / B)

            offsets = jnp.zeros((B, N, 2))
            (loss, (radii, vis, l1, psnr)), (gparams, goffsets) = (
                jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                    params, offsets)
            )
            gparams = jax.lax.pmean(gparams, "data")
            loss = jax.lax.pmean(loss, "data")
            l1 = jax.lax.pmean(l1, "data")
            psnr = jax.lax.pmean(psnr, "data")
            # Stat deltas: SUMS over all views of the step (psum), except the
            # running per-splat screen-radius maximum (pmax).
            # Per-view screen grads are scaled back up by B: loss_fn divides
            # by B, so ∂/∂offsets picked up a 1/B the reference's per-view
            # accumulation does not have.
            d_grad = jax.lax.psum(
                jnp.linalg.norm(goffsets, axis=-1).sum(0) * B, "data")
            d_denom = jax.lax.psum(vis, "data")
            d_radii = jax.lax.pmax(radii, "data")
            return loss, gparams, d_grad, d_denom, d_radii, l1, psnr

        loss, gparams, d_grad, d_denom, d_radii, l1, psnr = shard_grads(
            params, cameras, views, iteration, key)
        updates, opt_state = optimizer.update(gparams, opt_state, params)
        params = optax.apply_updates(params, updates)
        scene = with_params(scene, params)

        densify_window = (iteration >= cfg.densify_from_iter) & (
            iteration < cfg.densify_until_iter
        )
        dstate = jax.lax.cond(
            densify_window,
            lambda d: DensifyState(
                grad_accum=d.grad_accum + d_grad,
                denom=d.denom + d_denom,
                max_radii2d=jnp.maximum(d.max_radii2d, d_radii),
            ),
            lambda d: d,
            dstate,
        )
        metrics = {
            "loss": loss, "l1": l1, "psnr": psnr, "n_alive": scene.num_alive,
        }
        return scene, opt_state, dstate, metrics

    return jax.jit(step, donate_argnums=(0, 1, 2))


def zero_moments_at(opt_state, changed: jnp.ndarray):
    """Zero Adam moments on changed slots (reference resets optimizer state
    for replaced tensors, gaussian_model.py:500-560)."""

    def zero_leaf(x):
        if isinstance(x, jnp.ndarray) and x.ndim >= 1 and x.shape[0] == changed.shape[0]:
            mask = changed.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(mask, 0.0, x)
        return x

    return jax.tree.map(
        zero_leaf, opt_state,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )


class Trainer:
    """Host-side loop orchestrating the jitted steps."""

    def __init__(
        self,
        scene: GaussianScene,
        cameras: Camera,            # batched pytree (V, …)
        views: ViewData,
        cfg: TrainConfig,
        seed: int = 0,
        mesh=None,                  # jax.sharding.Mesh → data-parallel steps
    ):
        if (cfg.raster_buf_auto and cfg.raster_buf_size == 0
                and cfg.backend in ("pallas", "tiled")):
            cfg = cfg.replace(
                raster_buf_size=self._autotune_buf(scene, cameras, cfg))
        self.cfg = cfg
        self.scene = scene
        self.cameras = cameras
        self.views = views
        self.optimizer = make_optimizer(cfg)
        self.opt_state = self.optimizer.init(scene_params(scene))
        self.dstate = DensifyState.zero(scene.capacity)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.scene_extent = cfg.spatial_lr_scale
        self.iteration = 0
        self._stack: list = []
        # Jitted maintenance ops (eager dispatch of these dominates the loop
        # on a remote-tunneled TPU otherwise).
        self._densify = jax.jit(
            densify_and_prune,
            static_argnames=("max_screen_size",),
        )
        self._mip = jax.jit(lambda s, c: s.compute_mip_filter(c))
        self._zero_moments = jax.jit(zero_moments_at)
        self._reset_opacity = jax.jit(lambda s: s.reset_opacity())
        # Mesh modes (inferred from the mesh's named axes):
        #  model > 1 → SLAB-SHARDED: the splat buffer depth-slabs over
        #    `model`, one view per step — single-device quality preserved
        #    (parallel/gaussian_shard.py::make_slab_sharded_train_step; the
        #    DP alternative measured −11 dB, logs/ab_dp_r05.json).
        #  data > 1 → DATA-PARALLEL: replicate the scene, one view per
        #    device per step, grads pmean'd (opt-in only — see orchestrator).
        # Maintenance ops (densify, mip, opacity reset) run replicated
        # either way — same program, same RNG key on every device.
        self.mesh = mesh if (mesh is not None
                             and int(np.prod(list(mesh.shape.values()))) > 1
                             ) else None
        self.slab_mode = (self.mesh is not None
                          and self.mesh.shape.get("model", 1) > 1)
        if self.slab_mode:
            from g4splat_tpu.parallel.gaussian_shard import (
                make_slab_sharded_train_step,
            )
            from g4splat_tpu.parallel.mesh import replicate

            self._slab_step = make_slab_sharded_train_step(
                self.mesh, self.cfg, self.optimizer)
            self.scene = replicate(self.mesh, self.scene)
            self.opt_state = replicate(self.mesh, self.opt_state)
            self.dstate = replicate(self.mesh, self.dstate)
            self.cameras = replicate(self.mesh, self.cameras)
            self.views = replicate(self.mesh, self.views)
            self._refresh_partitions()
        elif self.mesh is not None:
            from g4splat_tpu.parallel.mesh import replicate

            n_data = self.mesh.shape["data"]
            n_views = jax.tree.leaves(cameras)[0].shape[0]
            if n_views % n_data:
                raise ValueError(
                    f"views ({n_views}) must divide over the data axis "
                    f"({n_data}) for data-parallel training")
            self.views_per_step = n_data
            self._dp_step = make_dp_train_step(self.mesh, cfg, self.optimizer)
            self.scene = replicate(self.mesh, self.scene)
            self.opt_state = replicate(self.mesh, self.opt_state)
            self.dstate = replicate(self.mesh, self.dstate)
            self.cameras = replicate(self.mesh, self.cameras)
            self.views = replicate(self.mesh, self.views)
        if cfg.use_mip_filter:
            self.scene = self.scene.replace(use_mip_filter=True)
            self.scene = self._mip(self.scene, self.cameras)

    @staticmethod
    def _autotune_buf(scene: GaussianScene, cameras: Camera,
                      cfg: TrainConfig) -> int:
        """Measure the real sorted-entry count per view once and size the
        entry buffer to it (×1.3 headroom, scaled to full capacity).

        The factor-4 default is calibrated for bench-scene densities
        (~3.2 entries/splat at 200k splats); production scenes at
        high-splat/low-res shapes run ~0.6 entries/splat, so the pack
        gather and the backward entry→splat scatter would otherwise move
        ~6× more HBM than needed (measured: scatter 1216 → 299 ms at the
        r05 budget shape). Overflow stays loud: n_dropped is a step metric
        and Trainer.step auto-bumps on any drop."""
        from g4splat_tpu.ops.rasterize_common import TILE, preprocess
        from g4splat_tpu.ops.rasterize_tiled import bin_splats

        V = jax.tree.leaves(cameras)[0].shape[0]
        cam0 = jax.tree.map(lambda x: x[0], cameras)
        W, H = int(cam0.width), int(cam0.height)
        n_tiles = ((W + TILE - 1) // TILE) * ((H + TILE - 1) // TILE)

        @jax.jit
        def count(cam, s):
            prep = preprocess(
                cam, xyz=s.xyz, scaling=s.scaling(),
                rotation_raw=s.rotation_raw, opacity=s.opacity(),
                features=s.features(), sh_degree=s.active_sh_degree,
                config=RenderConfig())
            b = bin_splats(prep, W, H,
                           max_tiles_per_splat=cfg.raster_max_tiles_per_splat,
                           compact_width=cfg.raster_compact_width)
            return jnp.sum(b.tile_id < n_tiles)

        mx = 0
        for v in range(V):
            cam = jax.tree.map(lambda x: x[v], cameras)
            mx = max(mx, int(count(cam, scene)))
        alive = max(int(scene.num_alive), 1)
        est_full = mx * scene.capacity / alive           # at full capacity
        buf = int(est_full * 1.3) // 128 * 128 + 128
        cap_total = scene.capacity * cfg.raster_max_tiles_per_splat
        return int(min(max(buf, 8192), cap_total))

    def _bump_buf(self):
        """Entry-buffer overflow (n_dropped > 0): grow 1.5× and re-jit."""
        old = self.cfg.raster_buf_size
        new = int(old * 3 // 2) // 128 * 128 + 128
        print(f"[trainer] entry buffer overflow: bumping buf_size "
              f"{old} -> {new} (recompiles the step)", flush=True)
        self.cfg = self.cfg.replace(raster_buf_size=new)
        if self.slab_mode:
            from g4splat_tpu.parallel.gaussian_shard import (
                make_slab_sharded_train_step,
            )

            self._slab_step = make_slab_sharded_train_step(
                self.mesh, self.cfg, self.optimizer)
        elif self.mesh is not None:
            self._dp_step = make_dp_train_step(
                self.mesh, self.cfg, self.optimizer)

    def _refresh_partitions(self):
        """Recompute the per-view depth permutations for slab sharding —
        at init and after any op that moves/re-populates splats
        (densify/prune, capacity growth)."""
        from g4splat_tpu.parallel.gaussian_shard import (
            view_depth_permutations,
        )

        if not hasattr(self, "_perm_fn"):
            self._perm_fn = jax.jit(view_depth_permutations)
            self._inv_fn = jax.jit(
                lambda p: jnp.argsort(p, axis=1).astype(jnp.int32))
        self._perms = self._perm_fn(self.scene, self.cameras)
        self._invs = self._inv_fn(self._perms)

    def _next_view(self) -> int:
        if not self._stack:
            n = self.views.image.shape[0]
            self._stack = list(self.rng.permutation(n))
        return int(self._stack.pop())

    def _view_slice(self, v: int):
        # Cache per-view slices: per-step device slicing costs ~10 dispatch
        # round-trips, which dominates on a remote-tunneled chip.
        if not hasattr(self, "_view_cache"):
            self._view_cache = {}
        if v not in self._view_cache:
            cam = jax.tree.map(lambda x: x[v], self.cameras)
            view = {
                "image": self.views.image[v],
                "prior_depth": self.views.prior_depth[v],
                "prior_normal": self.views.prior_normal[v],
                "prior_curv": self.views.prior_curv[v],
                "confidence": self.views.confidence[v],
                "color_weight": self.views.color_weight[v],
                "scale_factor": self.views.scale_factor,
            }
            self._view_cache[v] = (cam, view)
        return self._view_cache[v]

    def _dp_batch(self):
        """Stack one view per device and shard over the `data` axis."""
        from g4splat_tpu.parallel.mesh import shard_batch

        idx = jnp.asarray(
            [self._next_view() for _ in range(self.views_per_step)])
        cams = jax.tree.map(lambda x: x[idx], self.cameras)
        view = {
            "image": self.views.image[idx],
            "prior_depth": self.views.prior_depth[idx],
            "prior_normal": self.views.prior_normal[idx],
            "prior_curv": self.views.prior_curv[idx],
            "confidence": self.views.confidence[idx],
            "color_weight": self.views.color_weight[idx],
            "scale_factor": jnp.broadcast_to(
                self.views.scale_factor, (self.views_per_step,)),
        }
        return shard_batch(self.mesh, cams), shard_batch(self.mesh, view)

    def _grow_capacity(self, new_capacity: int):
        """Overflow path: recompact alive splats into a larger buffer and
        carry the Adam moments over slot-for-slot (the static-capacity
        answer to the reference's tensor reallocation,
        gaussian_model.py:500-560)."""
        from g4splat_tpu.train.densify import compact_and_grow

        old = self.scene
        old_cap = old.capacity
        alive_idx = np.flatnonzero(np.asarray(old.alive))
        n = len(alive_idx)
        print(f"[trainer] densify overflow: growing capacity "
              f"{old_cap} -> {new_capacity} ({n} alive; recompiles every "
              f"capacity-shaped jit)", flush=True)
        self.scene = compact_and_grow(old, new_capacity)
        if self.cfg.raster_buf_size > 0:
            # Entry count scales with the splat population; keep the
            # measured per-splat density as capacity grows.
            grown = int(self.cfg.raster_buf_size * new_capacity
                        / old_cap) // 128 * 128 + 128
            self.cfg = self.cfg.replace(raster_buf_size=grown)
            if self.mesh is not None:
                self._dp_step = make_dp_train_step(
                    self.mesh, self.cfg, self.optimizer)

        def remap(x):
            if (isinstance(x, jnp.ndarray) and x.ndim >= 1
                    and x.shape[0] == old_cap):
                out = jnp.zeros((new_capacity,) + x.shape[1:], x.dtype)
                return out.at[:n].set(jnp.asarray(np.asarray(x)[alive_idx]))
            return x

        self.opt_state = jax.tree.map(
            remap, self.opt_state,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        self.dstate = DensifyState.zero(new_capacity)
        if self.mesh is not None:
            from g4splat_tpu.parallel.mesh import replicate

            self.scene = replicate(self.mesh, self.scene)
            self.opt_state = replicate(self.mesh, self.opt_state)
            self.dstate = replicate(self.mesh, self.dstate)
        if self.slab_mode:
            self._refresh_partitions()
        if self.cfg.use_mip_filter:
            self.scene = self._mip(self.scene, self.cameras)

    def step(self, sync_metrics: bool = True) -> Dict[str, float]:
        self.iteration += 1
        it = self.iteration
        cfg = self.cfg

        if it % cfg.sh_increase_interval == 0:
            self.scene = self.scene.one_up_sh_degree()

        self.key, sub = jax.random.split(self.key)
        if self.slab_mode:
            v = self._next_view()
            cam, view = self._view_slice(v)
            self.scene, self.opt_state, self.dstate, metrics = (
                self._slab_step(
                    self.scene, self.opt_state, self.dstate, cam, view,
                    jnp.asarray(it), sub, self._perms[v], self._invs[v],
                )
            )
        elif self.mesh is not None:
            cams, view = self._dp_batch()
            self.scene, self.opt_state, self.dstate, metrics = self._dp_step(
                self.scene, self.opt_state, self.dstate, cams, view,
                jnp.asarray(it), sub,
            )
        else:
            v = self._next_view()
            cam, view = self._view_slice(v)
            self.scene, self.opt_state, self.dstate, metrics = train_step(
                self.scene, self.opt_state, self.dstate, cam, view,
                jnp.asarray(it), sub, cfg, self.optimizer,
            )

        if cfg.densify_from_iter <= it < cfg.densify_until_iter:
            if it % cfg.densification_interval == 0:
                self.key, sub = jax.random.split(self.key)
                max_screen = (
                    cfg.max_screen_size if it > cfg.opacity_reset_interval else 0.0
                )
                self.scene, self.dstate, changed, report = self._densify(
                    sub, self.scene, self.dstate, self.scene_extent,
                    cfg.densify_grad_threshold, cfg.min_opacity, max_screen,
                    cfg.percent_dense,
                )
                self.opt_state = self._zero_moments(self.opt_state, changed)
                if self.slab_mode:
                    self._refresh_partitions()
                # Overflow → grow the static buffer on the host (capacity
                # doubles, bounded by cfg.max_capacity; the sync costs one
                # round-trip per densify interval).
                if (int(report.n_dropped) > 0
                        and self.scene.capacity < cfg.max_capacity):
                    new_cap = min(
                        cfg.max_capacity,
                        max(2 * self.scene.capacity,
                            self.scene.capacity + 4096),
                    )
                    self._grow_capacity(new_cap)
                    self._view_cache = {}
                elif cfg.use_mip_filter:
                    self.scene = self._mip(self.scene, self.cameras)
            if it % cfg.opacity_reset_interval == 0:
                self.scene = self._reset_opacity(self.scene)

        if sync_metrics:
            m = {k: float(v) for k, v in metrics.items()}
            if m.get("n_overflow", 0) > 0 and self.cfg.raster_buf_size > 0:
                self._bump_buf()
            return m
        return metrics

    def train(self, num_iters: Optional[int] = None, log_every: int = 0):
        """Run the loop; metrics are synced to host only at log points (per-
        step float() conversion blocks on the device — expensive over a
        remote tunnel)."""
        num_iters = num_iters or self.cfg.iterations
        history = []
        for i in range(num_iters):
            sync = bool(log_every) and (self.iteration + 1) % log_every == 0
            m = self.step(sync_metrics=sync)
            if sync:
                history.append({"iter": self.iteration, **m})
        return history
