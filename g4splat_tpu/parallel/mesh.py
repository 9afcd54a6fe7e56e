"""Device-mesh parallelism.

The reference pipeline is strictly single-GPU (SURVEY §2.5); its only
distributed code is vendored NCCL DDP in unused trainer stacks. Here
parallelism is first-class and TPU-native: a named `jax.sharding.Mesh` with

- ``data``  — cameras/views/pairs (the embarrassingly-parallel axis of every
  stage: GS training batches, prior-model inference over views, MASt3R pairs,
  TSDF view integration),
- ``model`` — optional second axis for sharding large prior models or the
  splat buffer itself.

Collectives are XLA-compiled (psum over ICI) via shard_map; a single device is
the degenerate 1×1 mesh, so every code path is identical on one chip and on a
v5e-8 slice. Multi-host extends the same mesh over DCN via
`jax.distributed.initialize` (no code change here).
"""

from __future__ import annotations

import functools as _functools
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n_data = n_data or (len(devices) // n_model)
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Shard leading axis of every leaf over the `data` axis."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def data_parallel_train_step(mesh: Mesh, cfg, optimizer):
    """Build a pjit'd data-parallel 2DGS training step.

    The camera/view batch is sharded over `data`; the Gaussian scene and
    optimizer state are replicated; per-device gradients are `psum`-averaged
    over ICI before the (identical) optax update — classic DP, expressed as
    shard_map + XLA collectives instead of the reference's NCCL DDP
    (dust3r/training.py:152, croco/utils/misc.py:222-243).
    """
    from g4splat_tpu.train.trainer import (
        compute_losses,
        scene_params,
        with_params,
    )
    import optax

    def step(scene, opt_state, cameras, views, iteration, key):
        params = scene_params(scene)

        @partial(
            jax.shard_map,
            mesh=mesh,
            check_vma=False,  # pallas_call outputs carry no vma under shard_map
            in_specs=(P(), P("data"), P("data"), P(), P()),
            out_specs=(P(), P()),
        )
        def grads_of_shard(params, cams, views_shard, iteration, key):
            def loss_fn(params):
                s = with_params(scene, params)
                B = views_shard["image"].shape[0]
                offset = jnp.zeros((s.capacity, 2))

                def one(i, acc):
                    cam = jax.tree.map(lambda x: x[i], cams)
                    view = jax.tree.map(lambda x: x[i] if x.ndim else x,
                                        views_shard)
                    l, _ = compute_losses(
                        s, cam, view, cfg, iteration,
                        jax.random.fold_in(key, i), offset,
                    )
                    return acc + l

                # Varying-zero init so the scan carry matches the body's
                # device-varying type under shard_map.
                acc0 = jnp.sum(views_shard["image"][..., :1]) * 0.0
                total = jax.lax.fori_loop(0, B, one, acc0) / B
                return total

            loss, g = jax.value_and_grad(loss_fn)(params)
            g = jax.lax.pmean(g, "data")
            loss = jax.lax.pmean(loss, "data")
            return loss, g

        loss, grads = grads_of_shard(params, cameras, views, iteration, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return with_params(scene, params), opt_state, loss

    return jax.jit(step)


def view_parallel_render(
    mesh: Mesh,
    scene,
    cameras,
    backend: str = "pallas",
    keys: Sequence[str] = ("render", "rend_alpha", "rend_normal",
                           "surf_depth"),
    depth_ratio: float = 0.0,
):
    """Render a batch of views with each device rendering its view shard.

    Rendering many views (eval sweeps, TSDF integration over all train +
    See3D cameras, dense-view mode) is embarrassingly parallel over the
    `data` axis: the scene is replicated, the stacked camera pytree is
    sharded on its leading axis, and every device runs the full single-view
    rasterizer locally — no collectives at all, so throughput scales
    linearly over ICI. (A vmapped batch on ONE device does NOT amortize:
    the batched binning sort and the Mosaic grid both scale worse than
    linearly, measured 48 ms/view at batch 4 vs 33 ms single.)

    The number of views must be divisible by the mesh's `data` size; pad
    with a repeated camera and drop the tail if needed. Returns a dict of
    stacked (V, H, W[, C]) maps, sharded over `data`.
    """
    n_views = jax.tree.leaves(cameras)[0].shape[0]
    n_data = mesh.shape["data"]
    if n_views % n_data:
        raise ValueError(
            f"views ({n_views}) must divide over the data axis ({n_data})"
        )

    outs = _view_parallel_fn(mesh, backend, tuple(keys),
                             float(depth_ratio))(scene, cameras)
    return dict(zip(keys, outs))


def tile_parallel_render(
    mesh: Mesh,
    scene,
    camera,
    backend: str = "pallas",
    keys: Sequence[str] = ("render", "rend_alpha", "surf_depth"),
):
    """Render ONE (megapixel) image with its tile rows sharded over `data`.

    The "long context" axis of this workload (SURVEY §5.7) is image size: a
    single 4k render's tile grid exceeds one chip's comfortable working set.
    Each device renders a horizontal strip of tile rows through an exactly
    equivalent *cropped camera* (cy shifted by the strip's pixel offset,
    static strip height): preprocess culling is radius-rect-vs-grid, so a
    splat overlapping a strip from outside is kept by that strip's crop and
    compositing is bit-identical to the full-frame render. Per-splat work
    (preprocess + binning sort) is replicated; per-tile work (entry gather +
    rasterization kernel — the dominant cost at megapixel sizes) scales
    1/n_data. No collectives; the strips concatenate on the host axis.

    `surf_normal`/`surf_normal_cam` are recomputed globally from the
    assembled `surf_depth` (depth_to_normal reads neighbor pixels, so the
    per-strip values would differ along seam rows).
    """
    from g4splat_tpu.core.geometry import depth_to_normal
    from g4splat_tpu.ops.rasterize_common import TILE

    H, W = camera.height, camera.width
    n_data = mesh.shape["data"]
    rows = (H + TILE - 1) // TILE
    rows_per = (rows + n_data - 1) // n_data
    strip_h = rows_per * TILE

    want_surf = [k for k in keys if k in ("surf_normal", "surf_normal_cam")]
    strip_keys = tuple(
        k for k in keys if k not in ("surf_normal", "surf_normal_cam")
    )
    if want_surf and "surf_depth" not in strip_keys:
        strip_keys = strip_keys + ("surf_depth",)

    outs = _tile_parallel_fn(
        mesh, backend, strip_keys, strip_h, camera.width, camera.height
    )(scene, camera)
    result = {
        k: v.reshape((n_data * strip_h,) + v.shape[2:])[:H]
        for k, v in zip(strip_keys, outs)
    }
    if want_surf:
        sn_world = depth_to_normal(camera, result["surf_depth"])
        sn_world = sn_world * (result["rend_alpha"][..., None]
                               if "rend_alpha" in result else 1.0)
        if "surf_normal" in want_surf:
            result["surf_normal"] = sn_world
        if "surf_normal_cam" in want_surf:
            result["surf_normal_cam"] = sn_world @ camera.c2w[:3, :3]
    return {k: result[k] for k in keys}


@_functools.lru_cache(maxsize=32)
def _tile_parallel_fn(mesh: Mesh, backend: str, keys: tuple, strip_h: int,
                      width: int, height: int):
    """Compiled strip-sharded render (cache rationale: _view_parallel_fn)."""
    del width, height  # cache keys only: a new camera size must re-trace
    from g4splat_tpu.ops.rasterize import render

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,  # pallas_call outputs carry no vma under shard_map
        in_specs=(P(), P()),
        out_specs=P("data"),
    )
    def go(scene, cam):
        d = jax.lax.axis_index("data")
        y0 = (d * strip_h).astype(cam.cy.dtype)
        crop = cam.replace(cy=cam.cy - y0, height=strip_h)
        # Slim inference kernel unless a distortion/contrib map is requested
        # (those channels are zeros under need_aux=False on pallas).
        na = any(k in ("rend_dist", "n_contrib", "dist_m1", "dist_m2")
                 for k in keys)
        out = render(crop, scene, backend=backend, need_aux=na)
        return tuple(out[k][None] for k in keys)

    return go


@_functools.lru_cache(maxsize=32)
def _view_parallel_fn(mesh: Mesh, backend: str, keys: tuple,
                      depth_ratio: float = 0.0):
    """Compiled sharded render, cached on (mesh, backend, keys, depth_ratio):
    jit caches on function identity, so rebuilding the closure per call would
    re-trace and recompile the whole sharded render at every render_all/TSDF
    sweep."""
    from g4splat_tpu.ops.rasterize import render
    from g4splat_tpu.ops.rasterize_common import RenderConfig

    # Distortion-moment scans cost ~2x forward at multi-million-splat
    # shapes (scripts/profile_budget_step.py); compute them only when the
    # caller actually asked for the channel.
    cfg = RenderConfig(
        depth_ratio=depth_ratio,
        # Any distortion-moment output (not just rend_dist) needs the scans —
        # mirrors _tile_parallel_fn's need_aux gate.
        compute_distortion=bool(
            {"rend_dist", "dist_m1", "dist_m2"} & set(keys)),
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,  # pallas_call outputs carry no vma under shard_map
        in_specs=(P(), P("data")),
        out_specs=P("data"),
    )
    def go(scene, cams):
        b = jax.tree.leaves(cams)[0].shape[0]

        def one(i):
            cam = jax.tree.map(lambda x: x[i], cams)
            out = render(cam, scene, config=cfg, backend=backend)
            return tuple(out[k] for k in keys)

        return jax.lax.map(one, jnp.arange(b))

    return go
