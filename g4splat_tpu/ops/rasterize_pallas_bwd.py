"""Pallas TPU backward kernel for the surfel rasterizer.

TPU re-design of the reference's BACKWARD::render
(diff-surfel-rasterization/cuda_rasterizer/backward.cu:144-585). CUDA replays
tiles back-to-front with per-Gaussian atomicAdd; atomics don't exist on TPU,
so the accumulation is inverted:

- The TPU pallas grid is *sequential*, and the sorted entry list assigns each
  entry to exactly one tile, so per-entry gradients are written race-free to
  a (COMB_F, E) buffer; only each tile's first (floor-aligned) DMA window can
  touch the previous tile's entries, handled by a masked read-modify-write.
- ONE back-to-front sweep, exactly like the CUDA kernel: transmittance is
  unwound from the saved per-pixel final_T by dividing alphas back out
  (T_k = T_out·exp(−Σ_{j≥k} log(1−α_j)) per chunk), and the distortion
  prefix moments M1_k/M2_k are recovered from the saved per-pixel *totals*
  minus the suffix sums the sweep is already carrying. The early-stop set is
  reconstructed from the saved n_contrib (entries past the last contributor
  have zero effective alpha) — no forward replay pass is needed at all.
- Within-chunk suffix sums (Σw·u, Σw, Σm·w, Σw·m²·T) are strictly-lower
  triangular matmuls on the MXU.
- Chunk reads are double-buffered: chunk c−1's DMA is issued before chunk
  c's compute, hiding HBM latency behind the VPU/MXU work.
- The α/z → (Tu, Tv, Tw, center, opacity) chain comes from `jax.vjp` over the
  same intersection math the forward kernel uses, traced inline — only the
  compositing calculus is hand-derived:
    u_k      = c_k·gC + n_k·gN + z_k·gD
               + g_dist·(m_k²A_k + M2_k − 2m_kM1_k + m_k²S_w − 2m_kS_mw)
    ∂L/∂α_k  = T_k·u_k + (−S_wu − gT_end·T_end + g_dist·S_wm2T)/(1−α_k)
    ∂L/∂m_k  = g_dist·w_k·(2m_kA_k − 2M1_k + 2m_kS_w − 2S_mw)
    ∂L/∂z_k  = w_k·gD + ∂L/∂m_k·∂m/∂z  (+ g_med at the median contributor)
  with S_* = Σ_{j>k} and gT_end = bg·gC − gA.
- Per-entry gradients are segment-summed to per-splat gradients outside the
  kernel (batched scatter-add — the moral equivalent of CUDA's atomicAdd).
- The sweep starts at the chunk holding the tile's last contributor
  (derived from max n_contrib); later chunks carry zero gradient and their
  output windows stay at the aliased zero init.

Median depth: T is monotone, so entries with incoming T > 0.5 form a prefix;
the median contributor is that prefix's last entry — the first medmask hit of
the reverse sweep (an "assigned" flag keeps it unique across chunks).

Entry layout (COMB_F=24 rows): 0-8 Tu/Tv/Tw, 9-10 center, 11 opacity,
12-14 rgb, 15-17 normal, 18-23 pad — shared with the forward kernel
(rasterize_pallas._pack_entries). Saved forward tail (per tile, per pixel,
4ch): final_T, n_contrib, M1_total, M2_total — out_aux[..., 4:8].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from g4splat_tpu.ops.rasterize_common import (
    ALPHA_CLAMP,
    ALPHA_EPS,
    FILTER_INV_SQUARE,
    T_EPS,
    TILE,
)
from g4splat_tpu.ops.rasterize_pallas import CHUNK, COMB_F, NPIX

MAX_CHUNKS_PER_TILE = 64   # gradient support cap: 8192 depth-sorted entries


def _chunk_alpha_z(g, px, py, near):
    """Differentiable per-chunk intersection math (mirrors the forward
    kernel). g: (COMB_F, CHUNK); px, py: (NPIX, 1) → alpha, z, live."""
    def row(i):
        return g[i, :][None, :]

    Tu0, Tu1, Tu2 = row(0), row(1), row(2)
    Tv0, Tv1, Tv2 = row(3), row(4), row(5)
    Tw0, Tw1, Tw2 = row(6), row(7), row(8)
    cx, cy, opa = row(9), row(10), row(11)
    # Bilinear-in-(x, y) form of the ray-splat planes (see forward kernel):
    # per-entry coefficient vectors, two FMAs per pixel-entry pair. jax.vjp
    # over this form also backpropagates through ~1/3 the pairwise ops.
    A0 = Tw2 * Tv1 - Tw1 * Tv2
    B0 = Tu2 * Tw1 - Tu1 * Tw2
    C0 = Tu1 * Tv2 - Tu2 * Tv1
    A1 = Tw0 * Tv2 - Tw2 * Tv0
    B1 = Tu0 * Tw2 - Tu2 * Tw0
    C1 = Tu2 * Tv0 - Tu0 * Tv2
    A2 = Tw1 * Tv0 - Tw0 * Tv1
    B2 = Tu1 * Tw0 - Tu0 * Tw1
    C2 = Tu0 * Tv1 - Tu1 * Tv0
    p0 = px * A0 + py * B0 + C0
    p1 = px * A1 + py * B1 + C1
    p2 = px * A2 + py * B2 + C2
    pz_ok = jnp.abs(p2) >= 1e-20
    safe = jnp.where(pz_ok, p2, 1.0)
    su = jnp.clip(p0 / safe, -3e4, 3e4)
    sv = jnp.clip(p1 / safe, -3e4, 3e4)
    rho3d = su * su + sv * sv
    dx = cx - px
    dy = cy - py
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    z = jnp.where(use3d, su * Tw0 + sv * Tw1 + Tw2, Tw2)
    alpha = jnp.minimum(ALPHA_CLAMP, opa * jnp.exp(-0.5 * rho))
    live = pz_ok & (z >= near) & (alpha >= ALPHA_EPS)
    return alpha, z, live


def _bwd_kernel(
    # scalar prefetch
    tile_start_ref, tile_count_ref, tile_xy_ref,
    # inputs (dinit_hbm is a zeros buffer aliased to the output so windows
    # of chunks skipped by the early exit read back as zero gradients)
    comb_hbm, cot_ref, aux_ref, bg_ref, dinit_hbm,
    # outputs (per-entry gradients in the sorted layout)
    dcomb_hbm,
    # scratch
    comb_vmem, dcomb_vmem, old_d, state_ref, copy_sem, wr_sem,
    *, near: float, far: float,
):
    del dinit_hbm
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    tile_x0 = tile_xy_ref[2 * t]
    tile_y0 = tile_xy_ref[2 * t + 1]

    lin = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = (tile_x0 + lin % TILE).astype(jnp.float32)
    py = (tile_y0 + lin // TILE).astype(jnp.float32)

    rowe = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    cole = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    ge_incl = (rowe >= cole).astype(jnp.float32)    # X @ ge → suffix incl (j≥k)
    lt_strict = (rowe > cole).astype(jnp.float32)   # X @ lt → suffix (j>k)
    eidx = jax.lax.broadcasted_iota(jnp.int32, (NPIX, CHUNK), 1)
    HI = jax.lax.Precision.HIGHEST

    cot = cot_ref[0]                           # (NPIX, 16)
    gC = cot[:, 0:3]
    gN = cot[:, 3:6]
    gD = cot[:, 6:7]
    gA = cot[:, 7:8]
    gdist = cot[:, 8:9]
    gMed = cot[:, 9:10]
    aux = aux_ref[0]                           # (NPIX, 4)
    T_end = aux[:, 0:1]
    ncont = aux[:, 1:2]                        # 1-based last contributor
    M1_tot = aux[:, 2:3]
    M2_tot = aux[:, 3:4]
    bg = bg_ref[0:1, :]
    gT_end = jnp.sum(bg[:, 0:3] * gC, axis=1, keepdims=True) - gA

    abase0 = (start // CHUNK) * CHUNK
    # Sweep only down from the chunk holding the tile's last contributor —
    # the same span the forward kernel's early exit actually composited.
    last_pos = start + jnp.max(ncont).astype(jnp.int32) - 1   # global entry
    n_chunks = jnp.where(
        (count > 0) & (jnp.max(ncont) > 0),
        jnp.minimum((last_pos - abase0) // CHUNK + 1, MAX_CHUNKS_PER_TILE),
        0,
    )

    def start_read(c):
        base = pl.multiple_of(abase0 + c * CHUNK, CHUNK)
        slot = jax.lax.rem(c, 2)
        pltpu.make_async_copy(
            comb_hbm.at[:, pl.ds(base, CHUNK)],
            comb_vmem.at[slot], copy_sem.at[slot],
        ).start()

    def wait_read(c):
        base = pl.multiple_of(abase0 + c * CHUNK, CHUNK)
        slot = jax.lax.rem(c, 2)
        pltpu.make_async_copy(
            comb_hbm.at[:, pl.ds(base, CHUNK)],
            comb_vmem.at[slot], copy_sem.at[slot],
        ).wait()

    # state rows: 0 S_wu, 1 S_w, 2 S_mw, 3 S_wm2T, 4 med_assigned, 5 T_out
    state_ref[:] = jnp.zeros_like(state_ref)
    state_ref[5, :] = T_end[:, 0]

    @pl.when(n_chunks > 0)
    def _():
        start_read(n_chunks - 1)

    def bwd_body(i, _):
        c = n_chunks - 1 - i

        @pl.when(c >= 0)
        def _():
            wait_read(c)

            @pl.when(c - 1 >= 0)
            def _():
                start_read(c - 1)

            g = comb_vmem[jax.lax.rem(c, 2)]
            alpha, z, live = _chunk_alpha_z(g, px, py, near)
            gpos = abase0 + c * CHUNK + eidx
            # Effective alpha: in the tile's range AND at-or-before each
            # pixel's last contributor (the forward early-stop set is exactly
            # {index > n_contrib}).
            keep = (
                live
                & (gpos >= start)
                & (gpos < start + count)
                & ((gpos - start + 1).astype(jnp.float32) <= ncont)
            )
            alpha_eff = jnp.where(keep, alpha, 0.0)

            # Unwind transmittance from the back (the CUDA replay): incoming
            # T at entry k = T_out_of_chunk / Π_{j≥k}(1−α_j).
            log_om = jnp.log1p(-alpha_eff)
            S_log = jnp.dot(log_om, ge_incl,
                            preferred_element_type=jnp.float32, precision=HI)
            T_out = state_ref[5, :][:, None]
            T_k = T_out * jnp.exp(-S_log)
            w = alpha_eff * T_k
            m = far / (far - near) * (1.0 - near / jnp.maximum(z, 1e-8))
            mw = m * w
            m2w = m * m * w

            # Suffix sums across chunks (strict within chunk + carried).
            S_w_in = state_ref[1, :][:, None]
            S_mw_in = state_ref[2, :][:, None]
            S_w = S_w_in + jnp.dot(w, lt_strict,
                                   preferred_element_type=jnp.float32,
                                   precision=HI)
            S_mw = S_mw_in + jnp.dot(mw, lt_strict,
                                     preferred_element_type=jnp.float32,
                                     precision=HI)

            # Prefix moments from the saved totals minus inclusive suffixes.
            S_m2w_in = state_ref[6, :][:, None]
            S_m2w = S_m2w_in + jnp.dot(m2w, lt_strict,
                                       preferred_element_type=jnp.float32,
                                       precision=HI)
            M1_k = M1_tot - (S_mw + mw)
            M2_k = M2_tot - (S_m2w + m2w)
            A_k = 1.0 - T_k

            c_rgb = g[12:15, :]
            n_vec = g[15:18, :]
            cgC = jnp.dot(gC, c_rgb, preferred_element_type=jnp.float32,
                          precision=HI)
            ngN = jnp.dot(gN, n_vec, preferred_element_type=jnp.float32,
                          precision=HI)

            P_k = m * m * A_k + M2_k - 2.0 * m * M1_k
            u = cgC + ngN + z * gD + gdist * (
                P_k + m * m * S_w - 2.0 * m * S_mw
            )
            wu = w * u
            wm2T = w * m * m * T_k
            S_wu_in = state_ref[0, :][:, None]
            S_wm2T_in = state_ref[3, :][:, None]
            S_wu = S_wu_in + jnp.dot(wu, lt_strict,
                                     preferred_element_type=jnp.float32,
                                     precision=HI)
            S_wm2T = S_wm2T_in + jnp.dot(wm2T, lt_strict,
                                         preferred_element_type=jnp.float32,
                                         precision=HI)

            one_m_a = jnp.maximum(1.0 - alpha_eff, 1e-3)
            dL_da = T_k * u + (
                -S_wu - gT_end * T_end + gdist * S_wm2T
            ) / one_m_a
            dL_dm = gdist * w * (
                2.0 * m * A_k - 2.0 * M1_k + 2.0 * m * S_w - 2.0 * S_mw
            )
            dm_dz = far * near / ((far - near) * jnp.maximum(z, 1e-8) ** 2)
            dL_dz = w * gD + dL_dm * dm_dz

            # Median-depth gradient to the last T>0.5 contributor.
            contrib = alpha_eff > 0.0
            med_mask = (T_k > 0.5) & contrib
            best = jnp.max(jnp.where(med_mask, eidx, -1), axis=1,
                           keepdims=True)
            not_assigned = state_ref[4, :][:, None] < 0.5
            is_med = (eidx == best) & (best >= 0) & not_assigned
            dL_dz = dL_dz + jnp.where(is_med, gMed, 0.0)
            state_ref[4, :] = jnp.maximum(
                state_ref[4, :],
                jnp.max(med_mask.astype(jnp.float32), axis=1),
            )

            dL_da = jnp.where(contrib, dL_da, 0.0)
            dL_dz = jnp.where(contrib, dL_dz, 0.0)

            # Geometry chain via AD of the intersection math; the masks are
            # folded into the cotangents (alpha post-masking is where()s whose
            # backward is exactly this masking).
            _, vjp_fn = jax.vjp(
                lambda gg: _chunk_alpha_z(gg, px, py, near)[:2], g
            )
            (dg,) = vjp_fn((dL_da, dL_dz))

            d_rgb = jax.lax.dot_general(
                gC, w, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )
            d_nrm = jax.lax.dot_general(
                gN, w, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )
            dcomb = jnp.concatenate(
                [dg[0:12], d_rgb, d_nrm,
                 jnp.zeros((COMB_F - 18, CHUNK), jnp.float32)], axis=0
            )

            # First chunk may share its window with the previous tile's tail:
            # read-modify-write with an in-range column mask. (Sequential
            # grid ⇒ no races.)
            col_in_range = (
                (abase0 + c * CHUNK
                 + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1))
                >= start
            )
            base = pl.multiple_of(abase0 + c * CHUNK, CHUNK)

            @pl.when(c == 0)
            def _():
                cp_od = pltpu.make_async_copy(
                    dcomb_hbm.at[:, pl.ds(base, CHUNK)], old_d, wr_sem
                )
                cp_od.start()
                cp_od.wait()
                dcomb_vmem[:] = jnp.where(col_in_range, dcomb, old_d[:])

            @pl.when(c != 0)
            def _():
                dcomb_vmem[:] = jnp.where(col_in_range, dcomb, 0.0)

            cp_dc = pltpu.make_async_copy(
                dcomb_vmem, dcomb_hbm.at[:, pl.ds(base, CHUNK)], wr_sem
            )
            cp_dc.start()
            cp_dc.wait()

            # Carries for the next (earlier) chunk.
            state_ref[0, :] = S_wu_in[:, 0] + jnp.sum(wu, axis=1)
            state_ref[1, :] = S_w_in[:, 0] + jnp.sum(w, axis=1)
            state_ref[2, :] = S_mw_in[:, 0] + jnp.sum(mw, axis=1)
            state_ref[3, :] = S_wm2T_in[:, 0] + jnp.sum(wm2T, axis=1)
            state_ref[6, :] = S_m2w_in[:, 0] + jnp.sum(m2w, axis=1)
            state_ref[5, :] = (
                T_out * jnp.exp(-jnp.sum(log_om, axis=1, keepdims=True))
            )[:, 0]

        return 0

    jax.lax.fori_loop(0, MAX_CHUNKS_PER_TILE, bwd_body, 0)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "near", "far")
)
def rasterize_backward_pallas(
    comb: jnp.ndarray,         # (COMB_F, E) sorted entry layout (fwd's)
    tile_start: jnp.ndarray,   # (n_tiles,)
    tile_count: jnp.ndarray,   # (n_tiles,)
    cotangents: jnp.ndarray,   # (n_tiles, NPIX, 16): gC gN gD gA gdist gMed …
    aux_tail: jnp.ndarray,     # (n_tiles, NPIX, 4): final_T n_contrib M1 M2
    bg: jnp.ndarray,           # (3,)
    width: int,
    height: int,
    near: float,
    far: float,
) -> jnp.ndarray:
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    n_tiles = gx * gy
    tx = (jnp.arange(n_tiles, dtype=jnp.int32) % gx) * TILE
    ty = (jnp.arange(n_tiles, dtype=jnp.int32) // gx) * TILE
    tile_xy = jnp.stack([tx, ty], axis=1).reshape(-1)
    bg_pad = jnp.zeros((1, 8), jnp.float32).at[0, :3].set(bg)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, NPIX, 16), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, COMB_F, CHUNK), jnp.float32),   # read double buffer
            pltpu.VMEM((COMB_F, CHUNK), jnp.float32),      # dcomb staging
            pltpu.VMEM((COMB_F, CHUNK), jnp.float32),      # RMW old window
            pltpu.VMEM((7, NPIX), jnp.float32),            # suffix carries
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dinit = jnp.zeros(comb.shape, jnp.float32)
    dcomb = pl.pallas_call(
        functools.partial(_bwd_kernel, near=near, far=far),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(comb.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={7: 0},   # dinit (operand index incl. 3 prefetch args)
    )(tile_start, tile_count, tile_xy, comb, cotangents, aux_tail, bg_pad,
      dinit)
    return dcomb
