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
    sh_increase_interval: int = struct.field(pytree_node=False, default=1000)


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
    (utils/general_utils.py:30-66)."""
    init = cfg.position_lr_init * cfg.spatial_lr_scale
    final = cfg.position_lr_final * cfg.spatial_lr_scale
    delay_steps = 0

    def sched(step):
        t = jnp.clip(step / cfg.position_lr_max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(init) * (1 - t) + jnp.log(final) * t
        )
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
        config=RenderConfig(bg=jnp.zeros(3), depth_ratio=cfg.depth_ratio),
        center_offset=center_offset,
        backend=cfg.backend,
    )
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
    }
    return scene, opt_state, dstate, metrics


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
    ):
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
        if cfg.use_mip_filter:
            self.scene = self.scene.replace(use_mip_filter=True)
            self.scene = self._mip(self.scene, self.cameras)

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

    def step(self, sync_metrics: bool = True) -> Dict[str, float]:
        self.iteration += 1
        it = self.iteration
        cfg = self.cfg

        if it % cfg.sh_increase_interval == 0:
            self.scene = self.scene.one_up_sh_degree()

        v = self._next_view()
        cam, view = self._view_slice(v)
        self.key, sub = jax.random.split(self.key)
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
                if cfg.use_mip_filter:
                    self.scene = self._mip(self.scene, self.cameras)
            if it % cfg.opacity_reset_interval == 0:
                self.scene = self._reset_opacity(self.scene)

        if sync_metrics:
            return {k: float(v) for k, v in metrics.items()}
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
