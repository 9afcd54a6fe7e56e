"""Pallas TPU backward kernel for the surfel rasterizer.

TPU re-design of the reference's BACKWARD::render
(diff-surfel-rasterization/cuda_rasterizer/backward.cu:144-585). CUDA replays
tiles back-to-front with per-Gaussian atomicAdd; atomics don't exist on TPU,
so the accumulation is inverted:

- The TPU pallas grid is *sequential*, and the sorted entry list assigns each
  entry to exactly one tile, so per-entry gradients are written race-free to
  a (COMB_F, E) buffer; only each tile's first (floor-aligned) DMA window can
  touch the previous tile's entries, handled by a masked read-modify-write.
- Pass 1 walks chunks front-to-back recomputing the per-chunk carries
  (T_in, M1_in, M2_in) into VMEM scratch (the CUDA kernel instead saves
  final_T and divides transmittance back out).
- Pass 2 walks chunks back-to-front carrying per-pixel suffix sums
  (Σw·u, Σw, Σm·w, Σw·m²·T); within-chunk suffix scans are strictly-lower
  triangular matmuls on the MXU, stacked four-high into one dispatch.
- Transmittance needs ONE scan per chunk: the early-stop set {T_incl < eps}
  is a suffix (T monotone), so the exclusive prefix over effective alphas is
  T_incl/(1−α) on the kept prefix (same identity as the forward kernel).
- Chunk reads are double-buffered: chunk c±1's DMA is issued before chunk c's
  compute, hiding HBM latency behind the VPU/MXU work.
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

Median depth: T is monotone, so entries with incoming T > 0.5 form a prefix;
the median contributor is that prefix's last entry — the first medmask hit of
the reverse sweep (an "assigned" flag keeps it unique across chunks).

Entry layout (COMB_F=24 rows): 0-8 Tu/Tv/Tw, 9-10 center, 11 opacity,
12-14 rgb, 15-17 normal, 18-23 pad — shared with the forward kernel
(rasterize_pallas._pack_entries).
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
    k0 = px * Tw0 - Tu0
    k1 = px * Tw1 - Tu1
    k2 = px * Tw2 - Tu2
    l0 = py * Tw0 - Tv0
    l1 = py * Tw1 - Tv1
    l2 = py * Tw2 - Tv2
    p0 = k1 * l2 - k2 * l1
    p1 = k2 * l0 - k0 * l2
    p2 = k0 * l1 - k1 * l0
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
    comb_hbm, cot_ref, finT_ref, bg_ref, dinit_hbm,
    # outputs (per-entry gradients in the sorted layout)
    dcomb_hbm,
    # scratch
    comb_vmem, dcomb_vmem, old_d,
    tcarry_ref, m1carry_ref, m2carry_ref, suffix_ref, nproc_ref,
    copy_sem, wr_sem,
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
    ut_incl = (rowe <= cole).astype(jnp.float32)
    ut_excl = (rowe < cole).astype(jnp.float32)
    lt_strict = (rowe > cole).astype(jnp.float32)   # X @ lt → suffix (j>k)
    eidx = jax.lax.broadcasted_iota(jnp.int32, (NPIX, CHUNK), 1)

    abase0 = (start // CHUNK) * CHUNK
    n_chunks = jnp.where(
        count > 0,
        jnp.minimum(pl.cdiv(start + count - abase0, CHUNK),
                    MAX_CHUNKS_PER_TILE),
        0,
    )
    HI = jax.lax.Precision.DEFAULT

    def in_range_mask(c):
        gpos = abase0 + c * CHUNK + eidx
        return (gpos >= start) & (gpos < start + count)

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

    def chunk_quantities(c, g):
        alpha, z, live = _chunk_alpha_z(g, px, py, near)
        alpha = jnp.where(live & in_range_mask(c), alpha, 0.0)
        T_in = tcarry_ref[pl.ds(c, 1), :][0][:, None]
        log_om = jnp.log1p(-alpha)
        cum_incl = jnp.dot(log_om, ut_incl, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        T_incl = T_in * jnp.exp(cum_incl)
        skip = T_incl < T_EPS
        T_k = T_in * jnp.exp(cum_incl - log_om)     # exclusive on kept prefix
        alpha_eff = jnp.where(skip, 0.0, alpha)
        w = alpha_eff * T_k
        m = far / (far - near) * (1.0 - near / jnp.maximum(z, 1e-8))
        T_out = jnp.minimum(
            T_in,
            jnp.min(jnp.where(skip, jnp.inf, T_incl), axis=1, keepdims=True),
        )[:, 0]
        return alpha_eff, w, T_k, z, m, T_out

    # ---------------- pass 1: forward carries into scratch -----------------
    # nproc = number of chunks actually composited before every pixel's
    # transmittance died (the forward kernel's early exit); chunks past it
    # carry zero weight — both passes skip them and their gradient windows
    # stay at the aliased zero init.
    tcarry_ref[0:1, :] = jnp.ones((1, NPIX), jnp.float32)
    m1carry_ref[0:1, :] = jnp.zeros((1, NPIX), jnp.float32)
    m2carry_ref[0:1, :] = jnp.zeros((1, NPIX), jnp.float32)
    nproc_ref[0] = n_chunks
    nproc_ref[1] = jnp.minimum(1, n_chunks)   # chunks whose read was started

    @pl.when(n_chunks > 0)
    def _():
        start_read(0)

    def fwd_body(c, _):
        @pl.when(c < nproc_ref[0])
        def _():
            wait_read(c)

            # Optimistic prefetch (before compute, so DMA overlaps the math);
            # if this chunk kills the tile the drain below absorbs the copy.
            @pl.when(c + 1 < n_chunks)
            def _():
                start_read(c + 1)
                nproc_ref[1] = c + 2

            g = comb_vmem[jax.lax.rem(c, 2)]
            alpha_eff, w, T_k, z, m, T_out = chunk_quantities(c, g)
            nxt = jnp.minimum(c + 1, MAX_CHUNKS_PER_TILE - 1)
            tcarry_ref[pl.ds(nxt, 1), :] = T_out[None]
            m1carry_ref[pl.ds(nxt, 1), :] = (
                m1carry_ref[pl.ds(c, 1), :] + jnp.sum(m * w, axis=1)[None]
            )
            m2carry_ref[pl.ds(nxt, 1), :] = (
                m2carry_ref[pl.ds(c, 1), :] + jnp.sum(m * m * w, axis=1)[None]
            )

            @pl.when(jnp.max(T_out) < T_EPS)
            def _():
                nproc_ref[0] = c + 1
        return 0

    jax.lax.fori_loop(0, MAX_CHUNKS_PER_TILE, fwd_body, 0)
    n_proc = nproc_ref[0]

    # Drain the (at most one) prefetched-but-unprocessed read.
    @pl.when(nproc_ref[1] > n_proc)
    def _():
        wait_read(n_proc)

    # ------------- pass 2: reverse sweep with suffix accumulators ----------
    cot = cot_ref[0]                           # (NPIX, 16)
    gC = cot[:, 0:3]
    gN = cot[:, 3:6]
    gD = cot[:, 6:7]
    gA = cot[:, 7:8]
    gdist = cot[:, 8:9]
    gMed = cot[:, 9:10]
    T_end = finT_ref[0]                        # (NPIX, 1)
    bg = bg_ref[0:1, :]
    gT_end = jnp.sum(bg[:, 0:3] * gC, axis=1, keepdims=True) - gA

    # suffix rows: 0 S_wu, 1 S_w, 2 S_mw, 3 S_wm2T, 4 med_assigned
    suffix_ref[:] = jnp.zeros_like(suffix_ref)

    @pl.when(n_proc > 0)
    def _():
        start_read(n_proc - 1)

    def bwd_body(i, _):
        c = n_proc - 1 - i

        @pl.when(c >= 0)
        def _():
            wait_read(c)

            @pl.when(c - 1 >= 0)
            def _():
                start_read(c - 1)

            g = comb_vmem[jax.lax.rem(c, 2)]
            alpha_eff, w, T_k, z, m, _ = chunk_quantities(c, g)
            M1_in = m1carry_ref[pl.ds(c, 1), :][0][:, None]
            M2_in = m2carry_ref[pl.ds(c, 1), :][0][:, None]
            mw = m * w
            m2w = m * m * w
            M1_k = M1_in + jnp.dot(mw, ut_excl,
                                   preferred_element_type=jnp.float32,
                                   precision=HI)
            M2_k = M2_in + jnp.dot(m2w, ut_excl,
                                   preferred_element_type=jnp.float32,
                                   precision=HI)
            A_k = 1.0 - T_k

            c_rgb = g[12:15, :]
            n_vec = g[15:18, :]
            cgC = jnp.dot(gC, c_rgb, preferred_element_type=jnp.float32,
                          precision=HI)
            ngN = jnp.dot(gN, n_vec, preferred_element_type=jnp.float32,
                          precision=HI)

            S_w_in = suffix_ref[1, :][:, None]
            S_mw_in = suffix_ref[2, :][:, None]
            S_w = S_w_in + jnp.dot(w, lt_strict,
                                   preferred_element_type=jnp.float32,
                                   precision=HI)
            S_mw = S_mw_in + jnp.dot(mw, lt_strict,
                                     preferred_element_type=jnp.float32,
                                     precision=HI)

            P_k = m * m * A_k + M2_k - 2.0 * m * M1_k
            u = cgC + ngN + z * gD + gdist * (
                P_k + m * m * S_w - 2.0 * m * S_mw
            )
            wu = w * u
            wm2T = w * m * m * T_k
            S_wu_in = suffix_ref[0, :][:, None]
            S_wm2T_in = suffix_ref[3, :][:, None]
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
            not_assigned = suffix_ref[4, :][:, None] < 0.5
            is_med = (eidx == best) & (best >= 0) & not_assigned
            dL_dz = dL_dz + jnp.where(is_med, gMed, 0.0)
            suffix_ref[4, :] = jnp.maximum(
                suffix_ref[4, :],
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

            suffix_ref[0, :] = S_wu_in[:, 0] + jnp.sum(wu, axis=1)
            suffix_ref[1, :] = S_w_in[:, 0] + jnp.sum(w, axis=1)
            suffix_ref[2, :] = S_mw_in[:, 0] + jnp.sum(mw, axis=1)
            suffix_ref[3, :] = S_wm2T_in[:, 0] + jnp.sum(wm2T, axis=1)

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
    final_T: jnp.ndarray,      # (n_tiles, NPIX, 1)
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
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, COMB_F, CHUNK), jnp.float32),   # read double buffer
            pltpu.VMEM((COMB_F, CHUNK), jnp.float32),      # dcomb staging
            pltpu.VMEM((COMB_F, CHUNK), jnp.float32),      # RMW old window
            pltpu.VMEM((MAX_CHUNKS_PER_TILE, NPIX), jnp.float32),
            pltpu.VMEM((MAX_CHUNKS_PER_TILE, NPIX), jnp.float32),
            pltpu.VMEM((MAX_CHUNKS_PER_TILE, NPIX), jnp.float32),
            pltpu.VMEM((5, NPIX), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
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
        input_output_aliases={7: 0},   # dinit (4th tensor op + 3 prefetch)
    )(tile_start, tile_count, tile_xy, comb, cotangents, final_T, bg_pad,
      dinit)
    return dcomb
