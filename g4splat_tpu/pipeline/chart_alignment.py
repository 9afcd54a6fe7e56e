"""Chart alignment: joint refinement of per-view monocular depth maps.

JAX re-build of matcha's ParallelAligner stack (matcha/dm_scene/
parallel_aligner.py, dm_deformation/{encodings,multi_mlp}.py,
dm_modules/matcher_3d.py, driven by dm_trainers/charts_alignment.py:18-231):

Each view ("chart") gets a learned deformation field: a multi-resolution 2D
code grid (4 resolutions × 8 channels, parallel_aligner.py:40-51) plus a
1-D binned depth encoding (:53-62) feed a small per-chart MLP (3×64,
:65-77) whose scalar output, scaled to a deformation radius
(deformation_radius_factor × camera extent, :210-228), moves each chart
vertex along its camera ray (:385-399). 1000 Adam iterations minimize:

- confidence-weighted |deformed depth − SfM reference depth| with a learned
  per-pixel confidence c = 1+exp(θ), penalty c·|Δ| − 0.2·log c (:422-458),
- normal consistency to the initial chart normals (weight 4),
- curvature consistency (weight 1),
- Matcher3D cross-chart 3D matching (weight 5): points matched across charts
  at init (depth agreement < extent/20, matcher_3d.py:59-137) must keep
  agreeing with the deformed depth maps (:790-797).

The reference batches charts through bespoke `MultiLinear` bmm heads; here a
chart axis + vmap/einsum gives the same thing natively, and the whole
optimization step is one jit.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from g4splat_tpu.core.cameras import Camera
from g4splat_tpu.core.geometry import depth_to_normal

from g4splat_tpu.train.losses import normal_to_curvature

# Steady-state per-iteration seconds of the last align_charts call
# (compile-free: the clock starts after step 0). Profiling aid consumed by
# scripts/probe_scaling.py for BUDGET.md's iteration-scaling extrapolation
# only — a single-run debug hook, not reentrant; pipeline results never
# read it.
LAST_STATS: Dict[str, float] = {}


@dataclass(frozen=True)
class ChartAlignConfig:
    # Architecture (parallel_aligner.py:28-77 defaults)
    encoding_dim_per_res: int = 8
    resolutions: tuple = (0.05, 0.1, 0.2, 0.4)
    init_range: float = 1e-4
    depth_bins: int = 30
    mlp_layers: int = 3
    mlp_width: int = 64
    deformation_radius_factor: float = 1.0
    confidence_weighting: float = 0.2
    # Optimization (charts_alignment.py:36-66 defaults)
    n_iterations: int = 1000
    # Iterations fused per device dispatch (lax.scan length). 50 amortizes
    # the remote-tunnel round-trip ~50× while keeping loss logging usable;
    # 1 restores the step-by-step loop.
    scan_chunk: int = 50
    normal_loss_weight: float = 4.0
    curvature_loss_weight: float = 1.0
    matching_loss_weight: float = 5.0
    use_matching_loss: bool = True
    matching_thr_factor: float = 1.0 / 20.0
    encodings_lr: float = 1e-2
    mlp_lr: float = 1e-3
    confidence_lr: float = 1e-3
    # LR decay steps (charts_alignment yaml lr_update_iters/[factor]; with the
    # default n_iterations=1000 and boundary 1000 the decay never fires, as in
    # the reference run).
    lr_update_iters: tuple = (1000,)
    lr_update_factor: float = 0.1
    # "Strong" regularizations (configs/charts_alignment/strong.yaml;
    # parallel_aligner.py:632-635,811-819,348-355)
    regularize_chart_encodings_norms: bool = False
    chart_encodings_norm_loss_weight: float = 2.0
    use_total_variation_on_depth_encodings: bool = False
    total_variation_on_depth_encodings_weight: float = 5.0
    weight_encodings_with_confidence: bool = False


def grid_sample_bilinear(grid: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample (h, w, C) at uv ∈ [-1,1]² (align_corners=False, border pad).
    uv shape (..., 2) with uv[...,0]=x (width axis)."""
    h, w = grid.shape[0], grid.shape[1]
    x = ((uv[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((uv[..., 1] + 1.0) * h - 1.0) / 2.0
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    v00 = grid[y0, x0]
    v01 = grid[y0, x0 + 1]
    v10 = grid[y0 + 1, x0]
    v11 = grid[y0 + 1, x0 + 1]
    return (
        v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy + v11 * wx * wy
    )


def init_params(key, n_charts: int, H: int, W: int, cfg: ChartAlignConfig):
    ks = jax.random.split(key, 8)
    enc = []
    for i, r in enumerate(cfg.resolutions):
        hr, wr = max(2, int(r * H)), max(2, int(r * W))
        enc.append(
            cfg.init_range
            * jax.random.uniform(
                ks[i], (n_charts, hr, wr, cfg.encoding_dim_per_res),
                minval=-1.0, maxval=1.0,
            )
        )
    D = cfg.encoding_dim_per_res * len(cfg.resolutions)
    denc = cfg.init_range * jax.random.uniform(
        ks[4], (n_charts, cfg.depth_bins, D), minval=-1.0, maxval=1.0
    )

    # Batched per-chart MLP (kaiming-uniform like the reference MultiLinear).
    def linear_init(k, fan_in, fan_out):
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(
                kw, (n_charts, fan_in, fan_out), minval=-bound, maxval=bound
            ),
            "b": jax.random.uniform(
                kb, (n_charts, fan_out), minval=-bound, maxval=bound
            ),
        }

    dims = [D] + [cfg.mlp_width] * (cfg.mlp_layers - 1) + [1]
    mlp = [
        linear_init(jax.random.fold_in(ks[5], i), dims[i], dims[i + 1])
        for i in range(len(dims) - 1)
    ]
    conf_raw = jnp.zeros((n_charts, H, W))
    return {"enc": enc, "denc": denc, "mlp": mlp, "conf_raw": conf_raw}


class ChartAlignState(NamedTuple):
    verts0: jnp.ndarray       # (V, H, W, 3) initial chart points (world)
    ray_dirs: jnp.ndarray     # (V, H, W, 3) unit rays from camera centers
    uv: jnp.ndarray           # (V, H, W, 2) encoding coords in [-1,1]
    depth_coord: jnp.ndarray  # (V, H, W) normalized depth in [-1,1]
    deformation_radius: float


def build_state(cameras: Camera, depths: jnp.ndarray, extent: float,
                cfg: ChartAlignConfig) -> ChartAlignState:
    V, H, W = depths.shape

    def per_view(cam, depth):
        pts = cam.backproject(depth)
        rays = pts - cam.center
        rays = rays / (jnp.linalg.norm(rays, axis=-1, keepdims=True) + 1e-12)
        return pts, rays

    pts, rays = jax.vmap(per_view)(cameras, depths)
    xs = (jnp.arange(W) + 0.5) / W * 2.0 - 1.0
    ys = (jnp.arange(H) + 0.5) / H * 2.0 - 1.0
    uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    uv = jnp.broadcast_to(uv, (V, H, W, 2))
    dmin = depths.min(axis=(1, 2), keepdims=True)
    dmax = depths.max(axis=(1, 2), keepdims=True)
    dcoord = (depths - dmin) / jnp.maximum(dmax - dmin, 1e-8) * 2.0 - 1.0
    return ChartAlignState(
        pts, rays, uv, dcoord, cfg.deformation_radius_factor * extent
    )


def sample_encodings(params_enc, H: int, W: int):
    """Chart code planes sampled at the canonical half-pixel pixel lattice.

    build_state's uv grid is exactly the half-pixel mapping
    x = (i+0.5)·w/W − 0.5, i.e. a bilinear RESIZE of each (V, r, r, C)
    plane to (V, H, W, C) — jax.image.resize's separable two-matmul path
    on the MXU, replacing ~16M random bilinear gathers per iteration
    (TPU gathers are element-serial: the aligner measured 0.7 s/iter
    gather-bound, logs/budget_probes_r04.json / budget_r05). Identical to
    grid_sample_bilinear(state.uv) up to float rounding (same coordinate
    model, border clamping); pinned by TestEncodingResize.
    """
    feats = []
    for g in params_enc:
        V, _, _, C = g.shape
        feats.append(jax.image.resize(g, (V, H, W, C), method="linear"))
    return jnp.concatenate(feats, axis=-1)


def forward_deformation(params, state: ChartAlignState, cfg: ChartAlignConfig):
    """→ deformed verts (V, H, W, 3)."""
    Vh, Hh, Wh = state.depth_coord.shape
    enc = sample_encodings(params["enc"], Hh, Wh)     # (V, H, W, D)

    if cfg.weight_encodings_with_confidence:
        # parallel_aligner.py:348-355: detached conf, w = 1 - exp(-(c-1)²/2).
        conf = 1.0 + jnp.exp(jax.lax.stop_gradient(params["conf_raw"]))
        cw = conf - 1.0
        enc = enc * (1.0 - jnp.exp(-0.5 * cw * cw))[..., None]

    # Depth encoding: linear interp into the per-chart bin table. Linear
    # interpolation == the hat-function basis, so it rides ONE
    # (V·H·W, nb)@(nb, C) matmul instead of 2·V·H·W random gathers
    # (element-serial on TPU; same rationale as sample_encodings).
    nb = params["denc"].shape[1]
    t = (state.depth_coord + 1.0) / 2.0 * (nb - 1)
    t = jnp.clip(t, 0.0, nb - 1.0)
    hat = jnp.maximum(
        0.0, 1.0 - jnp.abs(t[..., None] - jnp.arange(nb, dtype=t.dtype)))
    denc = jnp.einsum("vhwn,vnc->vhwc", hat, params["denc"])
    x = enc + denc

    for li, layer in enumerate(params["mlp"]):
        x = jnp.einsum("vhwi,vio->vhwo", x, layer["w"]) + layer["b"][:, None, None]
        if li < len(params["mlp"]) - 1:
            x = jax.nn.relu(x)
    # Output scaled to ±deformation_radius (multi_mlp.py:232-243 rescaling).
    deform = x * state.deformation_radius
    return state.verts0 + deform * state.ray_dirs


def view_depths(cameras: Camera, verts: jnp.ndarray) -> jnp.ndarray:
    """(V, H, W, 3) world verts → per-view z depths (V, H, W)."""
    def per_view(cam, v):
        R, t = cam.w2c[:3, :3], cam.w2c[:3, 3]
        return v @ R[2] + t[2]
    return jax.vmap(per_view)(cameras, verts)


def sample_depth_at_points(cam, depth, pts):
    """Project points into cam and bilinearly sample `depth` (zeros padding);
    returns (sampled, in_fov)."""
    from g4splat_tpu.core.geometry import bilinear_sample

    xy, z = cam.project(pts)
    H, W = depth.shape
    # Half-pixel slack: border pixel centers float-project to W-1±ε and must
    # still count as in view (sampling clamps to the border anyway).
    in_fov = (
        (xy[:, 0] >= -0.5) & (xy[:, 0] <= W - 0.5)
        & (xy[:, 1] >= -0.5) & (xy[:, 1] <= H - 0.5) & (z > 1e-6)
    )
    vals = bilinear_sample(depth[..., None], xy)[..., 0]
    return jnp.where(in_fov, vals, 0.0), in_fov, z


def build_matches(cameras: Camera, reference_depths: jnp.ndarray,
                  matching_thr: float):
    """Matcher3D.match (matcher_3d.py:104-137): cross-chart mutual 3D matches.
    Returns (matches (V, V·H·W) bool, ref_pts (V·H·W, 3), true_depth (V, V·H·W))."""
    V, H, W = reference_depths.shape

    def backproj(cam, d):
        return cam.backproject(d).reshape(-1, 3)

    ref_pts = jax.vmap(backproj)(cameras, reference_depths).reshape(-1, 3)

    def per_cam(cam, depth):
        sampled, fov, z = sample_depth_at_points(cam, depth, ref_pts)
        err = jnp.abs(z - sampled)
        err = jnp.where(fov, err, 1e8)
        return err, z

    errs, true_depth = jax.vmap(per_cam)(cameras, reference_depths)
    matches = errs < matching_thr
    return matches, ref_pts, true_depth


class ChartAlignResult(NamedTuple):
    depths: np.ndarray        # (V, H, W) refined depths
    prior_depths: np.ndarray  # (V, H, W) input depths
    pts: np.ndarray           # (V, H, W, 3) refined chart points
    confs: np.ndarray         # (V, H, W) learned confidence
    losses: List[float]


def align_charts(
    cameras: Camera,                 # batched (V,)
    depths: jnp.ndarray,             # (V, H, W) initial (DA2-aligned) depths
    reference_depths: jnp.ndarray,   # (V, H, W) SfM reference depths
    reference_masks: Optional[jnp.ndarray] = None,   # (V, H, W) valid ref px
    extent: float = 1.0,
    cfg: ChartAlignConfig = ChartAlignConfig(),
    seed: int = 0,
) -> ChartAlignResult:
    V, H, W = depths.shape
    state = build_state(cameras, depths, extent, cfg)
    params = init_params(jax.random.PRNGKey(seed), V, H, W, cfg)
    if reference_masks is None:
        reference_masks = (reference_depths > 0).astype(jnp.float32)
    else:
        reference_masks = reference_masks.astype(jnp.float32)

    # Initial normals / curvatures (optimize(), parallel_aligner.py:713-722).
    def nrm(cam, d):
        return depth_to_normal(cam, d)

    normals0 = jax.vmap(nrm)(cameras, depths)
    curv0 = jax.vmap(normal_to_curvature)(normals0)

    if cfg.use_matching_loss:
        matching_thr = cfg.matching_thr_factor * extent
        matches, ref_pts, true_depth = build_matches(
            cameras, reference_depths, matching_thr
        )
    else:
        matches = ref_pts = true_depth = None

    label_of = {"enc": "enc", "denc": "enc", "mlp": "mlp", "conf_raw": "conf"}

    def lr_sched(base):
        # Piecewise-constant ×lr_update_factor at each boundary
        # (charts_alignment yaml lr_update_iters / lr_update_factor).
        if not cfg.lr_update_iters:
            return base
        return optax.piecewise_constant_schedule(
            base, {int(b): cfg.lr_update_factor for b in cfg.lr_update_iters}
        )

    optimizer = optax.multi_transform(
        {
            "enc": optax.adam(lr_sched(cfg.encodings_lr)),
            "mlp": optax.adam(lr_sched(cfg.mlp_lr)),
            "conf": optax.adam(lr_sched(cfg.confidence_lr)),
        },
        lambda params: {k: label_of[k] for k in params},
    )
    opt_state = optimizer.init(params)

    def loss_fn(params):
        verts = forward_deformation(params, state, cfg)
        dd = view_depths(cameras, verts)
        conf = 1.0 + jnp.exp(params["conf_raw"])
        diff = jnp.abs(dd - reference_depths)
        depth_loss = jnp.sum(
            reference_masks
            * (conf * diff - cfg.confidence_weighting * jnp.log(conf))
        ) / jnp.maximum(jnp.sum(reference_masks), 1.0)

        dnormals = jax.vmap(nrm)(cameras, dd)
        normal_loss = jnp.mean(1.0 - jnp.sum(normals0 * dnormals, axis=-1))
        dcurv = jax.vmap(normal_to_curvature)(dnormals)
        curv_loss = jnp.mean(jnp.abs(curv0 - dcurv))

        total = (
            depth_loss
            + cfg.normal_loss_weight * normal_loss
            + cfg.curvature_loss_weight * curv_loss
        )
        if cfg.use_matching_loss:
            def per_cam(cam, d):
                sampled, fov, z = sample_depth_at_points(cam, d, ref_pts)
                return jnp.abs(z - sampled), fov

            errs, fovs = jax.vmap(per_cam)(cameras, dd)
            m = matches & fovs
            match_loss = jnp.sum(jnp.where(m, errs, 0.0)) / jnp.maximum(
                jnp.sum(m), 1.0
            )
            total = total + cfg.matching_loss_weight * match_loss
        if cfg.regularize_chart_encodings_norms:
            # parallel_aligner.py:811-814: mean L2 norm of the sampled
            # multi-res chart encodings at the chart uv grid.
            Vh, Hh, Wh = state.depth_coord.shape
            enc_norm = jnp.linalg.norm(
                sample_encodings(params["enc"], Hh, Wh), axis=-1).mean()
            total = total + cfg.chart_encodings_norm_loss_weight * enc_norm
        if cfg.use_total_variation_on_depth_encodings:
            # parallel_aligner.py:816-819: TV over adjacent depth bins.
            tv = jnp.abs(
                params["denc"][:, 1:] - params["denc"][:, :-1]).mean()
            total = total + cfg.total_variation_on_depth_encodings_weight * tv
        return total

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # Iterations ride a fused lax.scan in chunks: per-iteration host
    # dispatch dominated this stage at budget scale (0.785 s/iter measured
    # over the remote-tunneled chip for a 3×64-MLP deformation field —
    # dispatch, not compute; reference parallel_aligner.py:602-890 runs its
    # 1000 iters in minutes on GPU). The step carries no per-iteration host
    # state (the LR boundaries live in the optax schedule's own counter),
    # so scanning K steps per dispatch is semantics-identical to the
    # step-by-step loop.
    def scan_body(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    chunk = max(1, min(cfg.scan_chunk, cfg.n_iterations))

    @jax.jit
    def run_chunk(params, opt_state):
        (params, opt_state), ls = jax.lax.scan(
            scan_body, (params, opt_state), None, length=chunk)
        return params, opt_state, ls

    losses = []
    LAST_STATS.clear()
    t_ss = None
    done = 0
    log_every = max(1, cfg.n_iterations // 20)
    next_log = 0
    while done + chunk <= cfg.n_iterations:
        params, opt_state, ls = run_chunk(params, opt_state)
        if done == 0:
            # Steady-state clock starts after the compile-carrying first
            # chunk (consumed by scripts/probe_scaling.py for BUDGET.md).
            jax.block_until_ready(ls)
            t_ss = time.perf_counter()
        while next_log < done + chunk:
            losses.append(float(ls[next_log - done]))
            next_log += log_every
        done += chunk
    for _ in range(cfg.n_iterations - done):   # remainder (< chunk steps)
        params, opt_state, loss = step(params, opt_state)
        if done == next_log:
            losses.append(float(loss))
            next_log += log_every
        done += 1
    if cfg.n_iterations > chunk and t_ss is not None:
        jax.block_until_ready((params, opt_state))
        LAST_STATS["s_per_iter"] = (
            time.perf_counter() - t_ss) / (cfg.n_iterations - chunk)
        LAST_STATS["iters"] = cfg.n_iterations

    verts = forward_deformation(params, state, cfg)
    dd = view_depths(cameras, verts)
    conf = 1.0 + jnp.exp(params["conf_raw"])
    return ChartAlignResult(
        depths=np.asarray(dd),
        prior_depths=np.asarray(depths),
        pts=np.asarray(verts),
        confs=np.asarray(conf),
        losses=losses,
    )


def save_charts_data(path: str, result: ChartAlignResult, scale_factor: float):
    """charts_data.npz with the reference's schema
    (charts_alignment.py:200-218)."""
    np.savez(
        path,
        prior_depths=result.prior_depths,
        depths=result.depths,
        pts=result.pts,
        confs=result.confs,
        scale_factor=np.float32(scale_factor),
    )


def load_charts_data(path: str) -> Dict[str, np.ndarray]:
    return dict(np.load(path))
