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
- The α/z → (Tu, Tv, Tw, center, opacity) chain is hand-derived
  (`_chunk_geom_bwd`), reusing the forward sweep's saved intermediates — an
  inline `jax.vjp` retraces the intersection math and emits a ~2× heavier
  VPU chain. The compositing calculus:
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

Entry table (SLIM_F=16 rows, shared with the forward kernel,
rasterize_pallas._pack_entries): 0-8 Tu/Tv/Tw, 9 opacity, 10-12 rgb,
13-15 normal; the low-pass center is recomputed from the T rows in-kernel.
Output gradient layout (COMB_F=24 rows): 0-8 dT, 9-10 d_center,
11 d_opacity, 12-14 d_rgb, 15-17 d_normal, 18-23 pad. Saved forward tail
(per tile, per pixel, 4ch): final_T, n_contrib, M1_total, M2_total —
out_aux[..., 4:8].
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
from g4splat_tpu.ops import rasterize_pallas as _fwd
from g4splat_tpu.ops.rasterize_pallas import CHUNK, COMB_F, NPIX, SLIM_F


def _suffix_incl(x):
    """Inclusive suffix sum along lanes (Σ_{j≥k}); scan-mode switched like
    the forward kernel (rasterize_pallas.SCAN_MODE)."""
    return _fwd._scan_incl_rev(x)

MAX_CHUNKS_PER_TILE = 64   # gradient support cap: 8192 depth-sorted entries
WSLOTS = 8                 # write-pipeline depth (see _bwd_kernel notes)


def _rows(g):
    def row(i):
        return g[i, :][None, :]

    return [row(i) for i in range(10)]


def _center_from_T(g):
    """Low-pass center from the T rows (preprocess dual-conic math; same
    recompute as the forward kernel). Returns ((1, CHUNK) cx, cy)."""
    Tu0, Tu1, Tu2, Tv0, Tv1, Tv2, Tw0, Tw1, Tw2, _ = _rows(g)
    C2c = 9.0  # CUTOFF²
    cdist = C2c * (Tw0 * Tw0 + Tw1 * Tw1) - Tw2 * Tw2
    cok = jnp.abs(cdist) > 1e-12
    cinv = 1.0 / jnp.where(cok, cdist, 1.0)
    cx = jnp.where(cok, (C2c * (Tu0 * Tw0 + Tu1 * Tw1) - Tu2 * Tw2) * cinv,
                   0.0)
    cy = jnp.where(cok, (C2c * (Tv0 * Tw0 + Tv1 * Tw1) - Tv2 * Tw2) * cinv,
                   0.0)
    return cx, cy


def _chunk_geom_fwd(g, px, py, near, center=None):
    """Per-chunk intersection math (mirrors the forward kernel).

    g: (SLIM_F, CHUNK); px, py: (NPIX, 1) → alpha, z, live, saved
    where `saved` holds the intermediates the hand-derived backward
    (`_chunk_geom_bwd`) reuses — running jax.vjp over this math instead
    retraces the whole forward and emits a ~2× heavier AD chain on the VPU,
    which was the single biggest cost of the backward kernel.

    The low-pass center is recomputed from T by default (the slim entry
    table carries no center rows); its T-gradient flows through the
    d_center output rows via the outer preprocess AD chain, so
    `_chunk_geom_bwd` treats it as an independent input. Tests inject an
    explicit `center=(cx, cy)` to check exactly that decomposition.
    """
    Tu0, Tu1, Tu2, Tv0, Tv1, Tv2, Tw0, Tw1, Tw2, opa = _rows(g)
    cx, cy = _center_from_T(g) if center is None else center
    # Bilinear-in-(x, y) form of the ray-splat planes (see forward kernel):
    # per-entry coefficient vectors, two FMAs per pixel-entry pair.
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
    inv_safe = 1.0 / jnp.where(pz_ok, p2, 1.0)
    su_raw = p0 * inv_safe
    sv_raw = p1 * inv_safe
    cu_ok = jnp.abs(su_raw) <= 3e4
    cv_ok = jnp.abs(sv_raw) <= 3e4
    su = jnp.clip(su_raw, -3e4, 3e4)
    sv = jnp.clip(sv_raw, -3e4, 3e4)
    rho3d = su * su + sv * sv
    dx = cx - px
    dy = cy - py
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    eterm = jnp.exp(-0.5 * rho)
    a_raw = opa * eterm
    alpha = jnp.minimum(ALPHA_CLAMP, a_raw)
    z = jnp.where(use3d, su * Tw0 + sv * Tw1 + Tw2, Tw2)
    live = pz_ok & (z >= near) & (alpha >= ALPHA_EPS)
    saved = (su, sv, inv_safe, pz_ok, use3d, cu_ok, cv_ok, eterm, a_raw,
             dx, dy)
    return alpha, z, live, saved


def _chunk_geom_bwd(g, saved, pxh, dA, dZ):
    """Hand-derived VJP of `_chunk_geom_fwd` w.r.t. g rows 0-11.

    Mirrors the reference CUDA backward's analytic chain
    (diff-surfel-rasterization/cuda_rasterizer/backward.cu:350-520) in the
    bilinear-plane form: the (NPIX, CHUNK) work is ~25 elementwise ops; the
    p→(A,B,C) coefficient chain AND all six pixel-axis reductions ride one
    (3, NPIX)@(NPIX, 9·CHUNK) matmul against pxh = [px; py; 1] (the ones row
    doubles as the reducer), and the coefficient→T chain is 36 FMAs on
    (1, CHUNK) vectors.

    dA, dZ are the alpha/z cotangents (already masked to the contributor
    set by the caller). Returns (12, CHUNK): dTu(3), dTv(3), dTw(3),
    d_center(2), d_opacity(1).
    """
    (su, sv, inv_safe, pz_ok, use3d, cu_ok, cv_ok, eterm, a_raw,
     dx, dy) = saved
    Tu0, Tu1, Tu2, Tv0, Tv1, Tv2, Tw0, Tw1, Tw2, _ = _rows(g)

    # z chain: z = use3d ? su·Tw0 + sv·Tw1 + Tw2 : Tw2
    dZ3 = jnp.where(use3d, dZ, 0.0)
    d_su = dZ3 * Tw0
    d_sv = dZ3 * Tw1
    # alpha chain: alpha = min(CLAMP, opa·exp(−ρ/2))
    gE = jnp.where(a_raw <= ALPHA_CLAMP, dA, 0.0)
    d_rho = -0.5 * gE * a_raw
    d_rho3d = jnp.where(use3d, d_rho, 0.0)
    d_rho2d = d_rho - d_rho3d
    # 2D low-pass branch: ρ2d = FIS·(dx²+dy²), dx = cx − px
    c2 = (2.0 * FILTER_INV_SQUARE) * d_rho2d
    # 3D branch: ρ3d = su² + sv², su = clip(p0/p2)
    d_su = jnp.where(cu_ok, d_su + 2.0 * su * d_rho3d, 0.0)
    d_sv = jnp.where(cv_ok, d_sv + 2.0 * sv * d_rho3d, 0.0)
    d_p0 = d_su * inv_safe
    d_p1 = d_sv * inv_safe
    d_p2 = jnp.where(pz_ok, -inv_safe * (d_su * su + d_sv * sv), 0.0)
    # p_i = px·A_i + py·B_i + C_i  ⇒  [dA_i; dB_i; dC_i] = pxh @ d_p_i — ONE
    # stacked (3, NPIX)@(NPIX, 9·CHUNK) dispatch for all nine rows AND the
    # six pixel-axis reductions (dTw0-2, d_opa, d_cx, d_cy): pxh's third row
    # is all-ones, so colsum(x) = (pxh @ x)[2] rides the same matmul — no
    # separate reduction dispatches (a bf16 single-pass variant with
    # tile-local coords measured only 0.5 ms faster — not worth the rounding).
    K = d_p0.shape[1]
    dABC = jnp.dot(
        pxh,
        jnp.concatenate(
            [d_p0, d_p1, d_p2,
             dZ3 * su, dZ3 * sv, dZ, gE * eterm, c2 * dx, c2 * dy],
            axis=1,
        ),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dA0, dB0, dC0 = dABC[0:1, :K], dABC[1:2, :K], dABC[2:3, :K]
    dA1, dB1, dC1 = (dABC[0:1, K:2 * K], dABC[1:2, K:2 * K],
                     dABC[2:3, K:2 * K])
    dA2, dB2, dC2 = (dABC[0:1, 2 * K:3 * K], dABC[1:2, 2 * K:3 * K],
                     dABC[2:3, 2 * K:3 * K])
    dTw0 = dABC[2:3, 3 * K:4 * K]
    dTw1 = dABC[2:3, 4 * K:5 * K]
    dTw2 = dABC[2:3, 5 * K:6 * K]
    d_opa = dABC[2:3, 6 * K:7 * K]
    d_cx = dABC[2:3, 7 * K:8 * K]
    d_cy = dABC[2:3, 8 * K:9 * K]
    # Coefficient → T chain (each A/B/C is a 2-term cross-product minor).
    dTu0 = Tw2 * dB1 - Tv2 * dC1 - Tw1 * dB2 + Tv1 * dC2
    dTu1 = -Tw2 * dB0 + Tv2 * dC0 + Tw0 * dB2 - Tv0 * dC2
    dTu2 = Tw1 * dB0 - Tv1 * dC0 - Tw0 * dB1 + Tv0 * dC1
    dTv0 = -Tw2 * dA1 + Tu2 * dC1 + Tw1 * dA2 - Tu1 * dC2
    dTv1 = Tw2 * dA0 - Tu2 * dC0 - Tw0 * dA2 + Tu0 * dC2
    dTv2 = -Tw1 * dA0 + Tu1 * dC0 + Tw0 * dA1 - Tu0 * dC1
    dTw0 = dTw0 + Tv2 * dA1 - Tu2 * dB1 - Tv1 * dA2 + Tu1 * dB2
    dTw1 = dTw1 - Tv2 * dA0 + Tu2 * dB0 + Tv0 * dA2 - Tu0 * dB2
    dTw2 = dTw2 + Tv1 * dA0 - Tu1 * dB0 - Tv0 * dA1 + Tu0 * dB1
    return jnp.concatenate(
        [dTu0, dTu1, dTu2, dTv0, dTv1, dTv2, dTw0, dTw1, dTw2,
         d_cx, d_cy, d_opa],
        axis=0,
    )


def _bwd_kernel(
    # scalar prefetch
    tile_start_ref, tile_count_ref, tile_xy_ref,
    # inputs (dinit_hbm is a zeros buffer aliased to the output so windows
    # of chunks skipped by the early exit read back as zero gradients)
    comb_hbm, cot_ref, aux_ref, bg_ref, dinit_hbm,
    # outputs (per-entry gradients in the sorted layout)
    dcomb_hbm,
    # scratch
    comb_vmem, dcomb_vmem, old_d, state_ref, copy_sem, wr_sem, rmw_sem,
    *, near: float, far: float, group: int = 1, want_dist: bool = True,
):
    del dinit_hbm
    # `group` tiles per grid step (same rationale as the forward kernel: the
    # per-step fixed cost measured ~5 µs/tile). Each sub-tile fully drains
    # its read/write/RMW DMAs before the next starts, so the sequential
    # invariants the RMW prefetch relies on are preserved.
    gidx = pl.program_id(0)

    lin = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    rowe = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    cole = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    ge_incl = (rowe >= cole).astype(jnp.float32)    # X @ ge → suffix incl (j≥k)
    lt_bf16 = (rowe > cole).astype(jnp.bfloat16)    # X @ lt → suffix (j>k)
    eidx = jax.lax.broadcasted_iota(jnp.int32, (NPIX, CHUNK), 1)

    for j in range(group):
        _bwd_one_tile(
            gidx * group + j, j,
            tile_start_ref, tile_count_ref, tile_xy_ref,
            comb_hbm, cot_ref, aux_ref, bg_ref, dcomb_hbm,
            comb_vmem, dcomb_vmem, old_d, state_ref, copy_sem, wr_sem,
            rmw_sem, lin, ge_incl, lt_bf16, eidx,
            near=near, far=far, want_dist=want_dist,
        )


def _bwd_one_tile(
    t, j,
    tile_start_ref, tile_count_ref, tile_xy_ref,
    comb_hbm, cot_ref, aux_ref, bg_ref, dcomb_hbm,
    comb_vmem, dcomb_vmem, old_d, state_ref, copy_sem, wr_sem, rmw_sem,
    lin, ge_incl, lt_bf16, eidx,
    *, near: float, far: float, want_dist: bool = True,
):
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    tile_x0 = tile_xy_ref[2 * t]
    tile_y0 = tile_xy_ref[2 * t + 1]

    px = (tile_x0 + lin % TILE).astype(jnp.float32)
    py = (tile_y0 + lin // TILE).astype(jnp.float32)
    pxh = jnp.concatenate([px, py, jnp.ones_like(px)], axis=1).T  # (3, NPIX)

    cot = cot_ref[j]                           # (NPIX, 16)
    gC = cot[:, 0:3]
    gN = cot[:, 3:6]
    gD = cot[:, 6:7]
    gA = cot[:, 7:8]
    gdist = cot[:, 8:9]
    gMed = cot[:, 9:10]
    aux = aux_ref[j]                           # (NPIX, 4)
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

    # Carry state lives in the same (pixels-on-sublanes, channels-on-lanes)
    # layout as all chunk compute — a (channels, NPIX) layout forces a
    # lane↔sublane relayout on every read/write, which measured 15 ms/frame.
    # cols: 0 S_wu, 1 S_w, 2 S_mw, 3 S_wm2T, 4 med_assigned, 5 T_out, 6 S_m2w
    state_ref[:] = jnp.zeros_like(state_ref)
    state_ref[:, 5:6] = T_end

    base0 = pl.multiple_of(abase0, CHUNK)

    @pl.when(n_chunks > 0)
    def _():
        start_read(n_chunks - 1)
        # Prefetch the tile's first (floor-aligned) output window now — its
        # read-modify-write merge only happens at the sweep's last step, so
        # the read latency hides behind the whole tile. The previous grid
        # step drained all its output DMAs, so this can't race its writes.
        pltpu.make_async_copy(
            dcomb_hbm.at[:, pl.ds(base0, CHUNK)], old_d, rmw_sem
        ).start()

    def bwd_body(i, _):
        c = n_chunks - 1 - i

        wait_read(c)

        @pl.when(c - 1 >= 0)
        def _():
            start_read(c - 1)

        g = comb_vmem[jax.lax.rem(c, 2)]
        alpha, z, live, saved = _chunk_geom_fwd(g, px, py, near)
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
        if _fwd.SCAN_MODE == "cumsum":
            S_log = _suffix_incl(log_om)
        else:
            S_log = jnp.dot(log_om, ge_incl,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        T_out = state_ref[:, 5:6]
        T_k = T_out * jnp.exp(-S_log)
        w = alpha_eff * T_k

        # u's color+normal term cgC + ngN is a single stacked
        # (NPIX, 6)@(6, CHUNK) bf16 matmul — the two are summed anyway.
        cgn = jnp.dot(
            jnp.concatenate([gC, gN], axis=1).astype(jnp.bfloat16),
            g[10:16, :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

        if want_dist:
            m = far / (far - near) * (1.0 - near / jnp.maximum(z, 1e-8))
            mw = m * w
            m2w = m * m * w
            wm2T = w * m * m * T_k

            # Suffix sums across chunks (strict within chunk + carried).
            # Every u-independent scan rides ONE tall stacked matmul — the
            # MXU prefers (4·NPIX, CHUNK)@(CHUNK, CHUNK) over four
            # dispatches. bf16 operands + f32 accumulation: the 0/1
            # triangle is exact in bf16 and the suffix-sum operands only
            # feed gradients (≤0.4% input rounding, well under the 2e-2
            # parity gate), so the MXU runs single-pass instead of
            # HIGHEST's 3-pass f32 emulation.
            if _fwd.SCAN_MODE == "cumsum":
                stk = jnp.concatenate([w, mw, m2w, wm2T], axis=0)
                S4 = _suffix_incl(stk) - stk           # strict (j>k)
            else:
                S4 = jnp.dot(
                    jnp.concatenate([w, mw, m2w, wm2T], axis=0)
                    .astype(jnp.bfloat16),
                    lt_bf16,
                    preferred_element_type=jnp.float32,
                )
            S_w_in = state_ref[:, 1:2]
            S_mw_in = state_ref[:, 2:3]
            S_m2w_in = state_ref[:, 6:7]
            S_wm2T_in = state_ref[:, 3:4]
            S_w = S_w_in + S4[0 * NPIX:1 * NPIX]
            S_mw = S_mw_in + S4[1 * NPIX:2 * NPIX]
            S_m2w = S_m2w_in + S4[2 * NPIX:3 * NPIX]
            S_wm2T = S_wm2T_in + S4[3 * NPIX:4 * NPIX]

            # Prefix moments from saved totals minus inclusive suffixes.
            M1_k = M1_tot - (S_mw + mw)
            M2_k = M2_tot - (S_m2w + m2w)
            A_k = 1.0 - T_k

            P_k = m * m * A_k + M2_k - 2.0 * m * M1_k
            u = cgn + z * gD + gdist * (
                P_k + m * m * S_w - 2.0 * m * S_mw
            )
        else:
            # λ_dist = 0 statically ⇒ the gdist cotangent is numerically
            # zero: every distortion suffix/moment term vanishes, and the
            # only suffix scans left are S_log (above) and S_wu (below).
            u = cgn + z * gD
        wu = w * u
        S_wu_in = state_ref[:, 0:1]
        if _fwd.SCAN_MODE == "cumsum":
            S_wu = S_wu_in + (_suffix_incl(wu) - wu)
        else:
            S_wu = S_wu_in + jnp.dot(wu.astype(jnp.bfloat16), lt_bf16,
                                     preferred_element_type=jnp.float32)

        one_m_a = jnp.maximum(1.0 - alpha_eff, 1e-3)
        if want_dist:
            dL_da = T_k * u + (
                -S_wu - gT_end * T_end + gdist * S_wm2T
            ) / one_m_a
            dL_dm = gdist * w * (
                2.0 * m * A_k - 2.0 * M1_k + 2.0 * m * S_w - 2.0 * S_mw
            )
            dm_dz = far * near / ((far - near) * jnp.maximum(z, 1e-8) ** 2)
            dL_dz = w * gD + dL_dm * dm_dz
        else:
            dL_da = T_k * u + (-S_wu - gT_end * T_end) / one_m_a
            dL_dz = w * gD

        # Median-depth gradient to the last T>0.5 contributor.
        contrib = alpha_eff > 0.0
        med_mask = (T_k > 0.5) & contrib
        best = jnp.max(jnp.where(med_mask, eidx, -1), axis=1,
                       keepdims=True)
        not_assigned = state_ref[:, 4:5] < 0.5
        is_med = (eidx == best) & (best >= 0) & not_assigned
        dL_dz = dL_dz + jnp.where(is_med, gMed, 0.0)
        state_ref[:, 4:5] = jnp.maximum(
            state_ref[:, 4:5],
            jnp.max(med_mask.astype(jnp.float32), axis=1, keepdims=True),
        )

        dL_da = jnp.where(contrib, dL_da, 0.0)
        dL_dz = jnp.where(contrib, dL_dz, 0.0)

        # Geometry chain: hand-derived VJP reusing the forward's saved
        # intermediates; the masks are folded into the cotangents (alpha
        # post-masking is where()s whose backward is exactly this
        # masking).
        dg = _chunk_geom_bwd(g, saved, pxh, dL_da, dL_dz)

        # d_rgb/d_nrm share the (·,NPIX)@(NPIX,CHUNK) contraction with w:
        # one stacked (6, NPIX)@(NPIX, CHUNK) single-pass bf16 matmul.
        d_rgbn = jax.lax.dot_general(
            jnp.concatenate([gC, gN], axis=1).astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dcomb = jnp.concatenate(
            [dg[0:12], d_rgbn,
             jnp.zeros((COMB_F - 18, CHUNK), jnp.float32)], axis=0
        )

        # Output writes are pipelined WSLOTS deep: stage into rotating
        # slots, start the DMA, and only wait when a slot is about to be
        # reused (WSLOTS issues later). Ablation on-chip showed write-DMA
        # latency (~7 µs) cannot hide behind only two chunks of compute —
        # the 2-slot version stalled ~3.5 µs/chunk on these waits; eight
        # slots give the write ~8 chunk-times to land. j is the issue
        # order (the sweep runs c high→low).
        j = n_chunks - 1 - c
        wslot = jax.lax.rem(j, WSLOTS)
        base = pl.multiple_of(abase0 + c * CHUNK, CHUNK)

        @pl.when(j >= WSLOTS)
        def _():
            # Drain the DMA issued WSLOTS steps ago on this slot. The sweep
            # runs c descending, so that DMA targeted chunk c + WSLOTS —
            # rebuild its true window so the wait descriptor matches the
            # start descriptor exactly (not just by byte count).
            issued = pl.multiple_of(abase0 + (c + WSLOTS) * CHUNK, CHUNK)
            pltpu.make_async_copy(
                dcomb_vmem.at[wslot],
                dcomb_hbm.at[:, pl.ds(issued, CHUNK)],
                wr_sem.at[wslot],
            ).wait()

        # First chunk may share its window with the previous tile's
        # tail: read-modify-write with an in-range column mask.
        # (Sequential grid + end-of-tile drain ⇒ no races.)
        col_in_range = (
            (abase0 + c * CHUNK
             + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1))
            >= start
        )

        @pl.when(c == 0)
        def _():
            pltpu.make_async_copy(
                dcomb_hbm.at[:, pl.ds(base0, CHUNK)], old_d, rmw_sem
            ).wait()
            dcomb_vmem[wslot] = jnp.where(col_in_range, dcomb, old_d[:])

        @pl.when(c != 0)
        def _():
            dcomb_vmem[wslot] = jnp.where(col_in_range, dcomb, 0.0)

        pltpu.make_async_copy(
            dcomb_vmem.at[wslot],
            dcomb_hbm.at[:, pl.ds(base, CHUNK)],
            wr_sem.at[wslot],
        ).start()

        # Carries for the next (earlier) chunk: the chunk totals are the
        # strict-suffix scans' first column plus element 0 (and S_log's
        # inclusive column 0 directly) — no extra lane reductions.
        # Carries: totals = strict-suffix col 0 + element 0, all sliced in
        # the native compute layout (no relayouts).
        state_ref[:, 0:1] = S_wu[:, 0:1] + wu[:, 0:1]
        if want_dist:
            state_ref[:, 1:2] = S_w[:, 0:1] + w[:, 0:1]
            state_ref[:, 2:3] = S_mw[:, 0:1] + mw[:, 0:1]
            state_ref[:, 3:4] = S_wm2T[:, 0:1] + wm2T[:, 0:1]
            state_ref[:, 6:7] = S_m2w[:, 0:1] + m2w[:, 0:1]
        state_ref[:, 5:6] = T_out * jnp.exp(-S_log[:, 0:1])

        return 0

    # Traced per-tile bound (mirrors the forward kernel): each tile sweeps
    # only its own chunks; MAX_CHUNKS_PER_TILE is just the support ceiling.
    jax.lax.fori_loop(0, n_chunks, bwd_body, 0)

    # Drain the (up to WSLOTS) outstanding output DMAs so the next grid
    # step's RMW prefetch and staging-slot reuse cannot race this tile's
    # writes. With j < WSLOTS never waited in-loop, slot k is outstanding
    # exactly when the tile issued more than k writes.
    for k in range(WSLOTS):
        @pl.when(n_chunks >= k + 1)
        def _(k=k):
            # Slot s's outstanding DMA was issued at sweep step j_issue,
            # i.e. for chunk n_chunks−1−j_issue; rebuild that window so the
            # wait descriptor matches the start descriptor exactly.
            j_issue = jnp.maximum(n_chunks - WSLOTS, 0) + k
            s = jax.lax.rem(j_issue, WSLOTS)
            c_issue = n_chunks - 1 - j_issue
            issued = pl.multiple_of(abase0 + c_issue * CHUNK, CHUNK)
            pltpu.make_async_copy(
                dcomb_vmem.at[s], dcomb_hbm.at[:, pl.ds(issued, CHUNK)],
                wr_sem.at[s],
            ).wait()


@functools.partial(
    jax.jit, static_argnames=("width", "height", "near", "far", "want_dist")
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
    want_dist: bool = True,
) -> jnp.ndarray:
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    n_tiles = gx * gy
    from g4splat_tpu.ops.rasterize_pallas import RASTER_GROUP

    group = RASTER_GROUP
    n_pad = ((n_tiles + group - 1) // group) * group
    tidx = jnp.arange(n_pad, dtype=jnp.int32)
    tx = (tidx % gx) * TILE
    ty = (jnp.minimum(tidx, n_tiles - 1) // gx) * TILE
    tile_xy = jnp.stack([tx, ty], axis=1).reshape(-1)
    pad_t = n_pad - n_tiles
    if pad_t:
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros(pad_t, tile_start.dtype)])
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros(pad_t, tile_count.dtype)])
        cotangents = jnp.concatenate(
            [cotangents, jnp.zeros((pad_t,) + cotangents.shape[1:],
                                   cotangents.dtype)])
        aux_tail = jnp.concatenate(
            [aux_tail, jnp.zeros((pad_t,) + aux_tail.shape[1:],
                                 aux_tail.dtype)])
    bg_pad = jnp.zeros((1, 8), jnp.float32).at[0, :3].set(bg)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((group, NPIX, 16), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, NPIX, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, SLIM_F, CHUNK), jnp.float32),   # read double buffer
            pltpu.VMEM((WSLOTS, COMB_F, CHUNK), jnp.float32),  # write slots
            pltpu.VMEM((COMB_F, CHUNK), jnp.float32),      # RMW old window
            pltpu.VMEM((NPIX, 8), jnp.float32),            # suffix carries
            pltpu.SemaphoreType.DMA((2,)),   # read dbuf
            pltpu.SemaphoreType.DMA((WSLOTS,)),  # write slots
            pltpu.SemaphoreType.DMA,         # RMW prefetch
        ],
    )
    dinit = jnp.zeros((COMB_F, comb.shape[1]), jnp.float32)
    from g4splat_tpu.ops.rasterize_pallas import _interpret

    dcomb = pl.pallas_call(
        functools.partial(_bwd_kernel, near=near, far=far, group=group,
                          want_dist=want_dist),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((COMB_F, comb.shape[1]),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases={7: 0},   # dinit (operand index incl. 3 prefetch args)
        interpret=_interpret(),
    )(tile_start, tile_count, tile_xy, comb, cotangents, aux_tail, bg_pad,
      dinit)
    return dcomb
