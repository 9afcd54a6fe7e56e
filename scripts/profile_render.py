"""Component-level timing of the render/train hot path on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, ".")

from bench import build_scene
from g4splat_tpu.core.cameras import lookat_camera
from g4splat_tpu.models.gaussians import GaussianScene
from g4splat_tpu.ops.rasterize import render
from g4splat_tpu.ops.rasterize_common import RenderConfig, preprocess
from g4splat_tpu.ops.rasterize_tiled import bin_splats
from g4splat_tpu.ops.rasterize_pallas import (
    _pack_entries, _rasterize_tiles_pallas, CHUNK,
)


def timeit(name, f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:8.2f} ms")
    return out


def main():
    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)

    cfg = RenderConfig()

    prep_fn = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))
    prep = timeit("preprocess", prep_fn, scene)

    bin_fn = jax.jit(lambda p: bin_splats(p, W, H))
    binning = timeit("bin_splats", bin_fn, prep)

    pack_fn = jax.jit(lambda p, b: _pack_entries(
        p, b.gauss_id, b.tile_id < ((W+15)//16)*((H+15)//16)))
    comb = timeit("pack_entries", pack_fn, prep, binning)

    pad = (-comb.shape[1]) % CHUNK
    if pad:
        comb = jnp.pad(comb, ((0, 0), (0, pad)))
    n_chunks_max = comb.shape[1] // CHUNK
    print(f"entries: {comb.shape[1]}  n_chunks_max: {n_chunks_max}  "
          f"mean tile count: {float(jnp.mean(binning.tile_count)):.0f}  "
          f"max: {int(jnp.max(binning.tile_count))}")
    bg = jnp.zeros(3)
    kern_fn = jax.jit(lambda g, ts, tc: _rasterize_tiles_pallas(
        g, ts, tc, bg, W, H, cfg.near, cfg.far, n_chunks_max))
    timeit("pallas kernel", kern_fn, comb,
           binning.tile_start, binning.tile_count)

    full_fn = jax.jit(lambda s: render(cam, s, backend="pallas")["render"])
    timeit("full forward (pallas)", full_fn, scene)

    # train-step-ish: forward+backward of a simple loss via pallas
    def loss(s):
        out = render(cam, s, backend="pallas")
        return jnp.mean(out["render"]) + jnp.mean(out["rend_dist"]) \
            + jnp.mean(out["surf_depth"]) + jnp.mean(out["rend_normal"])
    grad_fn = jax.jit(jax.grad(lambda xyz: loss(scene.replace(xyz=xyz))))
    timeit("fwd+bwd (pallas)", grad_fn, scene.xyz, n=10)


def pack_variants():
    """Compare pack_entries strategies."""
    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)
    cfg = RenderConfig()
    prep = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))(scene)
    binning = jax.jit(lambda p: bin_splats(p, W, H))(prep)
    n_tiles = ((W+15)//16)*((H+15)//16)

    GEOM_F, VAL_F = 16, 8

    def fused(p, gid, ev):
        opa = jnp.where(p.valid, p.opacity, 0.0)
        table = jnp.concatenate([
            p.T.reshape(-1, 9), p.center, opa[:, None],
            jnp.zeros((p.depth.shape[0], GEOM_F - 12)),
            p.rgb, p.normal, jnp.zeros((p.depth.shape[0], VAL_F - 6)),
        ], axis=1)                           # (P, 24)
        rows = jnp.where(ev, 1.0, 0.0)[:, None] * table[gid]  # zero pad rows' opa
        # NB: zeroing whole row also zeroes rgb/T of invalid entries; alpha=0
        # means they never contribute, matching semantics.
        out = rows.T
        return out[:GEOM_F], out[GEOM_F:]

    f1 = jax.jit(lambda p, b: fused(p, b.gauss_id, b.tile_id < n_tiles))
    timeit("pack fused", f1, prep, binning)

    def fused_notrans(p, gid, ev):
        opa = jnp.where(p.valid, p.opacity, 0.0)
        table = jnp.concatenate([
            p.T.reshape(-1, 9), p.center, opa[:, None],
            jnp.zeros((p.depth.shape[0], GEOM_F - 12)),
            p.rgb, p.normal, jnp.zeros((p.depth.shape[0], VAL_F - 6)),
        ], axis=1)
        rows = jnp.where(ev, 1.0, 0.0)[:, None] * table[gid]
        return rows                           # (E, 24) no transpose

    f2 = jax.jit(lambda p, b: fused_notrans(p, b.gauss_id, b.tile_id < n_tiles))
    timeit("pack fused no-transpose", f2, prep, binning)



def pack_variants2():
    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)
    cfg = RenderConfig()
    prep = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))(scene)
    binning = jax.jit(lambda p: bin_splats(p, W, H))(prep)
    n_tiles = ((W+15)//16)*((H+15)//16)

    def colgather(p, gid, ev):
        P = p.depth.shape[0]
        opa = jnp.where(p.valid, p.opacity, 0.0)
        table = jnp.concatenate([
            p.T.reshape(P, 9), p.center, opa[:, None], p.rgb, p.normal,
        ], axis=1)                    # (P, 17)
        tT = table.T                  # (17, P) small transpose
        out = jnp.take(tT, gid, axis=1)   # (17, E)
        return out * jnp.where(ev, 1.0, 0.0)[None, :]

    f = jax.jit(lambda p, b: colgather(p, b.gauss_id, b.tile_id < n_tiles))
    timeit("pack col-gather", f, prep, binning)

    def rowgather_t(p, gid, ev):
        P = p.depth.shape[0]
        opa = jnp.where(p.valid, p.opacity, 0.0)
        table = jnp.concatenate([
            p.T.reshape(P, 9), p.center, opa[:, None], p.rgb, p.normal,
            jnp.zeros((P, 7)),
        ], axis=1)                    # (P, 24) padded to lane-friendly 24
        rows = table[gid]             # (E, 24)
        out = rows.T                  # (24, E)
        return out * jnp.where(ev, 1.0, 0.0)[None, :]

    f2 = jax.jit(lambda p, b: rowgather_t(p, b.gauss_id, b.tile_id < n_tiles))
    timeit("pack row-gather+T 24", f2, prep, binning)




def quick():
    """Kernel-focused timings on a host-built scene: binning, pack, and the
    forward kernel in both want_aux modes — one process, comparable numbers."""
    W, H = 768, 576
    scene = build_scene()  # bench's scene is host-built (numpy)
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)
    cfg = RenderConfig()
    n_tiles = ((W + 15) // 16) * ((H + 15) // 16)

    prep_fn = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))
    prep = timeit("preprocess", prep_fn, scene)
    binning = timeit("bin_splats", jax.jit(lambda p: bin_splats(p, W, H)),
                     prep)
    for slim in (False, True):
        comb = timeit(
            f"pack_entries slim={slim}",
            jax.jit(lambda p, b, s=slim: _pack_entries(
                p, b.gauss_id, b.tile_id < n_tiles)),
            prep, binning)
        pad = (-comb.shape[1]) % CHUNK
        if pad:
            comb = jnp.pad(comb, ((0, 0), (0, pad)))
        n_chunks_max = comb.shape[1] // CHUNK
        bg = jnp.zeros(3)
        kern = jax.jit(lambda g, ts, tc, s=slim, m=n_chunks_max:
                       _rasterize_tiles_pallas(
                           g, ts, tc, bg, W, H, cfg.near, cfg.far, m,
                           want_aux=not s))
        timeit(f"pallas kernel want_aux={not slim}", kern, comb,
               binning.tile_start, binning.tile_count)


def dorder_profile():
    """Per-pixel (reference) vs global-shift (TPU) depth-order loss cost at
    768×576 — fwd and fwd+grad."""
    from g4splat_tpu.train import losses as L

    H, W = 576, 768
    rng = np.random.RandomState(0)
    d = jnp.asarray(rng.rand(H, W) + 1.0, jnp.float32)
    pd = jnp.asarray(rng.rand(H, W) + 1.0, jnp.float32)
    key = jax.random.PRNGKey(0)
    for sample in ("per_pixel", "global"):
        f = jax.jit(lambda dd, s=sample: L.depth_order_loss(key, dd, pd,
                                                            sample=s))
        timeit(f"depth_order fwd {sample}", f, d)
        g = jax.jit(jax.grad(lambda dd, s=sample: L.depth_order_loss(
            key, dd, pd, sample=s)))
        timeit(f"depth_order grad {sample}", g, d)


def bwd_profile():
    W, H = 768, 576
    scene = build_scene()
    cam = lookat_camera([0.0, 0.0, -6.5], [0, 0, 0], [0, -1, 0],
                        fx=600.0, fy=600.0, width=W, height=H)
    cfg = RenderConfig()
    from g4splat_tpu.ops.rasterize_pallas import _render_pallas_impl, COMB_F
    from g4splat_tpu.ops.rasterize_pallas_bwd import rasterize_backward_pallas

    prep = jax.jit(lambda s: preprocess(
        cam, xyz=s.xyz, scaling=s.scaling(), rotation_raw=s.rotation_raw,
        opacity=s.opacity(), features=s.features(),
        sh_degree=s.active_sh_degree, config=cfg))(scene)
    binning = jax.jit(lambda p: bin_splats(p, W, H))(prep)
    n_tiles_x, n_tiles_y = (W+15)//16, (H+15)//16
    n_tiles = n_tiles_x * n_tiles_y
    comb = jax.jit(lambda p, b: _pack_entries(
        p, b.gauss_id, b.tile_id < n_tiles))(prep, binning)
    pad = (-comb.shape[1]) % CHUNK
    if pad:
        comb = jnp.pad(comb, ((0, 0), (0, pad)))
    import numpy as _np
    cot = jnp.asarray(_np.random.RandomState(0).rand(n_tiles, 256, 16),
                      jnp.float32) * 1e-3
    # aux tail: final_T, n_contrib, M1, M2 — take real ones from the forward
    from g4splat_tpu.ops.rasterize_pallas import _rasterize_tiles_pallas
    n_chunks_max = comb.shape[1] // CHUNK
    _, out_aux = jax.jit(lambda c, ts, tc: _rasterize_tiles_pallas(
        c, ts, tc, jnp.zeros(3), W, H, cfg.near, cfg.far, n_chunks_max))(
        comb, binning.tile_start, binning.tile_count)
    aux_tail = out_aux[..., 4:8]
    bg = jnp.zeros(3)
    f = jax.jit(lambda c, ts, tc, co, at: rasterize_backward_pallas(
        c, ts, tc, co, at, bg, W, H, cfg.near, cfg.far))
    timeit("bwd kernel", f, comb, binning.tile_start, binning.tile_count,
           cot, aux_tail, n=10)

    # scatter-add cost
    E = comb.shape[1]
    gid = binning.gauss_id
    dcomb = comb  # same shape stand-in
    def scat(dcomb, gid):
        P = prep.depth.shape[0]
        d_all = dcomb[:18, :gid.shape[0]].T
        return jnp.zeros((P, 18), jnp.float32).at[gid].add(d_all, mode="drop")
    timeit("scatter-add", jax.jit(scat), dcomb, gid)


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "pack":
        pack_variants(); pack_variants2()
    elif len(_s.argv) > 1 and _s.argv[1] == "bwd":
        bwd_profile()
    elif len(_s.argv) > 1 and _s.argv[1] == "quick":
        quick()
    elif len(_s.argv) > 1 and _s.argv[1] == "dorder":
        dorder_profile()
    else:
        main()
