"""Pallas TPU surfel rasterizer.

Production forward path replacing the reference's renderCUDA
(diff-surfel-rasterization/cuda_rasterizer/forward.cu:258-443). Same binning
as the pure-JAX tiled backend (rasterize_tiled.bin_splats); this kernel walks
each 16×16 tile's depth-sorted splat range in VMEM-resident chunks.

TPU-shaped design decisions (vs the CUDA kernel's one-thread-per-pixel loop):
- Entry features are pre-gathered into *transposed* (feature, entry) arrays so
  every chunk is a contiguous, lane-aligned HBM→VMEM DMA (dim -1 = 128
  entries), replacing CUDA's random-access global loads.
- The per-tile working set is a (256 pixels × 128 entries) alpha matrix;
  pixels live on sublanes, entries on lanes.
- Transmittance prefix products and the distortion-moment prefix sums are
  log-space *triangular matmuls* on the MXU (no cumsum primitive needed, and
  faster than a sequential scan).
- Color/normal accumulation is one (256×128)@(128×8) MXU matmul per chunk.
- Early exit: a whole chunk is skipped once every pixel's transmittance is
  below 1e-4 — the TPU analogue of the CUDA per-pixel `done` ballot.

Compositing semantics match rasterize_dense.composite exactly (1/255 alpha
cutoff, 0.99 clamp, inclusive-T early-stop, median depth at T>0.5, 2DGS
depth-distortion moments).

Gradients: custom_vjp into the dedicated back-to-front Pallas backward
kernel (rasterize_pallas_bwd.py), which replays compositing CUDA-style from
the saved per-pixel final_T / n_contrib / distortion-moment totals in a
single reverse sweep.
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
    FAR_N,
    FILTER_INV_SQUARE,
    NEAR_N,
    T_EPS,
    TILE,
    Preprocessed,
)
from g4splat_tpu.ops.rasterize_tiled import Binning, bin_splats

NPIX = TILE * TILE          # 256 pixels per tile
CHUNK = 128                 # splat entries per inner step (lane width)
RASTER_GROUP = 4            # tiles per grid step (amortizes step overhead)
EARLY_BREAK = True          # break the chunk walk once the tile saturates
                            # (exact; False = legacy full walk, kept as an
                            # ablation/fallback switch)
SLIM_F = 16                 # entry-table rows: 0-8 Tu/Tv/Tw, 9 opacity,
                            # 10-12 rgb, 13-15 normal (2×8 sublanes; the
                            # low-pass center is recomputed from T in-kernel)
COMB_F = 24                 # BWD per-entry gradient rows: 0-8 dT, 9-10
                            # d_center, 11 d_opacity, 12-14 d_rgb,
                            # 15-17 d_normal, 18-23 pad (3×8 sublanes)
GEOM_F = 16                 # legacy geometry row budget (bwd kernel scratch)
VAL_F = 8                   # r g b nx ny nz (pad to 8) — output channel count
# Prefix/suffix scan implementation inside the kernels: "matmul" = triangular
# (CHUNK, CHUNK) matmul on the MXU at HIGHEST, "cumsum" = log-step lane-shift
# scan on the VPU (jnp.cumsum itself has no Pallas TPU lowering). Module-level
# so sweep scripts can A/B with a fresh jit; the production default is
# whichever measured faster on-chip.
# Measured on-chip (scripts/sweep_scan.py, 200k splats / 768×576): the
# lane-shift scan LOSES — fwd aux 26.0 ms vs 16.0, bwd 36.2 vs 22.3 (each
# shifted add's lane-concatenate is a relayout, not a cheap permute); slim
# (single-scan) is a wash (11.3 vs 11.5). Keep "matmul".
SCAN_MODE = "matmul"


def _scan_incl(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along lanes (axis 1) via log₂(n) shifted adds."""
    n = x.shape[1]
    s = 1
    while s < n:
        x = x + jnp.concatenate(
            [jnp.zeros_like(x[:, :s]), x[:, :-s]], axis=1)
        s *= 2
    return x


def _scan_incl_rev(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive suffix sum along lanes (Σ_{j≥k}) via shifted adds."""
    n = x.shape[1]
    s = 1
    while s < n:
        x = x + jnp.concatenate(
            [x[:, s:], jnp.zeros_like(x[:, :s])], axis=1)
        s *= 2
    return x


def _pack_entries(prep: Preprocessed, gid: jnp.ndarray,
                  entry_valid: jnp.ndarray = None):
    """Gather per-entry features into one lane-major (SLIM_F, E) table.

    One column-gather from a pre-concatenated per-splat feature table — a
    single fused HBM pass (separate per-field gathers + a big (E, F)→(F, E)
    transpose cost 5× more). Culled splats (prep.valid=False) carry zero
    opacity; sorted-buffer padding entries (entry_valid=False) sit past every
    tile's [start, start+count) range, so the kernel's in_count mask already
    excludes them — no per-entry masking needed here.

    16 rows [T(9), opa, rgb(3), normal(3)]: two f32 sublane tiles instead of
    the previous 24-row table's three (gather cost and per-chunk kernel DMA
    both scale with ⌈rows/8⌉); the low-pass center is recomputed from the T
    rows inside BOTH kernels (preprocess dual-conic math) — ~12 (1, CHUNK)
    row ops per chunk versus a whole extra sublane tile of HBM traffic.
    """
    del entry_valid
    P = prep.depth.shape[0]
    opa = jnp.where(prep.valid, prep.opacity, 0.0)
    fields = [prep.T.reshape(P, 9), opa[:, None], prep.rgb, prep.normal]
    table = jnp.concatenate(fields, axis=1)
    return jnp.take(table.T.astype(jnp.float32), gid, axis=1)


def _interpret() -> bool:
    """Pallas interpret mode on CPU (tests drive the production kernels).

    Keyed on the CPU backend specifically — real TPU platforms report
    different names ("tpu", "axon", …) and must all compile natively.
    """
    return jax.default_backend() == "cpu"


def _render_kernel(
    # scalar prefetch
    tile_start_ref, tile_count_ref, tile_xy_ref,
    # inputs
    comb_hbm, bg_ref,
    # outputs
    out_vals_ref, out_aux_ref,
    # scratch
    comb_vmem, acc_ref, aux_ref, copy_sem,
    *, near: float, far: float, n_chunks_max: int, want_aux: bool = True,
    want_dist: bool = True, group: int = 1,
):
    # `group` tiles share one grid step: the per-step fixed cost (window
    # bookkeeping + output swap) measured 4.8 µs/tile — 8.4 ms/frame at
    # 768×576 with the 1-tile grid, by far the largest single overhead.
    gidx = pl.program_id(0)

    # Chunk-invariant constants, hoisted out of the tile loop.
    lin = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    # Triangular scan matrices (entry j contributes to prefix at entry i).
    rowe = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    cole = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    ut_incl = (rowe <= cole).astype(jnp.float32)   # X @ ut_incl = inclusive
    # Measured on-chip: HIGHEST f32 matmuls are NOT the cost here — dispatch
    # count and VPU lane reductions are. bf16 hi/lo two-pass splits and
    # DEFAULT's cast passes both time *slower* than one HIGHEST dot; the wins
    # are fewer dispatches (stacking) and fewer lane reductions (chunk totals
    # read off the scan matmul's last column).
    HI = jax.lax.Precision.HIGHEST
    eidx = jax.lax.broadcasted_iota(jnp.int32, (NPIX, CHUNK), 1)

    for j in range(group):
        _render_one_tile(
            gidx * group + j, j,
            tile_start_ref, tile_count_ref, tile_xy_ref, comb_hbm, bg_ref,
            out_vals_ref, out_aux_ref, comb_vmem, acc_ref, aux_ref, copy_sem,
            lin, rowe, cole, ut_incl, eidx, HI,
            near=near, far=far, n_chunks_max=n_chunks_max, want_aux=want_aux,
            want_dist=want_dist,
        )


def _render_one_tile(
    t, j,
    tile_start_ref, tile_count_ref, tile_xy_ref, comb_hbm, bg_ref,
    out_vals_ref, out_aux_ref, comb_vmem, acc_ref, aux_ref, copy_sem,
    lin, rowe, cole, ut_incl, eidx, HI,
    *, near: float, far: float, n_chunks_max: int, want_aux: bool,
    want_dist: bool = True,
):
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    tile_x0 = tile_xy_ref[2 * t]
    tile_y0 = tile_xy_ref[2 * t + 1]

    # Pixel coordinates as (NPIX, 1) columns (pixels on sublanes).
    px = (tile_x0 + lin % TILE).astype(jnp.float32)
    py = (tile_y0 + lin // TILE).astype(jnp.float32)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    aux_ref[:] = jnp.zeros_like(aux_ref)
    # col 0: RAW transmittance carry (product of every live alpha — drives
    # the oracle's early-stop test, which is a *global* suffix of the raw
    # cumprod; dense oracle composite(), rasterize_dense.py:53-56).
    # col 7: log of the EFFECTIVE transmittance (Σ log(1−α) over kept
    # entries; exp'd once at tile end) — accumulating in log space lets the
    # chunk contribution ride the stacked scan matmul instead of a lane-min.
    aux_ref[:, 0:1] = jnp.ones((NPIX, 1), jnp.float32)

    # Tile ranges are arbitrary offsets into the sorted entry list; DMA from
    # the 128-aligned floor and mask the overhanging lanes (their alpha is
    # forced to 0, so the transmittance scans are unaffected).
    abase0 = (start // CHUNK) * CHUNK
    n_chunks = jnp.minimum(pl.cdiv(start + count - abase0, CHUNK),
                           n_chunks_max)

    def start_copy(c):
        base = pl.multiple_of(abase0 + c * CHUNK, CHUNK)
        slot = jax.lax.rem(c, 2)
        pltpu.make_async_copy(
            comb_hbm.at[:, pl.ds(base, CHUNK)],
            comb_vmem.at[slot], copy_sem.at[slot],
        ).start()

    def wait_copy(c):
        slot = jax.lax.rem(c, 2)
        base = pl.multiple_of(abase0 + c * CHUNK, CHUNK)
        pltpu.make_async_copy(
            comb_hbm.at[:, pl.ds(base, CHUNK)],
            comb_vmem.at[slot], copy_sem.at[slot],
        ).wait()

    # Double-buffered pipeline, fully drained: every started copy is waited
    # (starts/waits are NOT gated on tile liveness, only the compute is), so
    # no in-flight DMA can survive into the next tile of this grid step and
    # alias a rotating slot. A dead tile's tail chunks cost one issue+wait
    # each. Working order per chunk (measured): wait(c) → start(c+1) →
    # compute — issuing the next start before the wait serialized the loop.
    @pl.when(n_chunks > 0)
    def _():
        start_copy(0)

    def chunk_body(carry):
        c, _ = carry

        wait_copy(c)

        @pl.when(c + 1 < n_chunks)
        def _():
            start_copy(c + 1)

        T_col = aux_ref[:, 0:1]                 # (NPIX, 1)
        g = comb_vmem[jax.lax.rem(c, 2)]        # (COMB_F, CHUNK)

        def row(i):
            return g[i, :][None, :]             # (1, CHUNK)

        Tu0, Tu1, Tu2 = row(0), row(1), row(2)
        Tv0, Tv1, Tv2 = row(3), row(4), row(5)
        Tw0, Tw1, Tw2 = row(6), row(7), row(8)
        opa = row(9)
        # Slim 16-row table: recompute the low-pass center from the
        # T rows (preprocess dual-conic math, forward.cu:119-147) on
        # (1, CHUNK) vectors — ~12 row ops versus a whole extra
        # sublane tile in the entry gather.
        C2 = 9.0  # CUTOFF²
        dist = C2 * (Tw0 * Tw0 + Tw1 * Tw1) - Tw2 * Tw2
        cok = jnp.abs(dist) > 1e-12
        cinv = 1.0 / jnp.where(cok, dist, 1.0)
        cx = jnp.where(
            cok,
            (C2 * (Tu0 * Tw0 + Tu1 * Tw1) - Tu2 * Tw2) * cinv, 0.0,
        )
        cy = jnp.where(
            cok,
            (C2 * (Tv0 * Tw0 + Tv1 * Tw1) - Tv2 * Tw2) * cinv, 0.0,
        )
        # In-range test depends only on the lane (entry), not the pixel:
        # evaluate it on a (1, CHUNK) row and fold it into the opacity so
        # the big (NPIX, CHUNK) mask passes below stay untouched.
        erow = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        gpos_row = abase0 + c * CHUNK + erow
        in_row = (gpos_row >= start) & (gpos_row < start + count)
        opa = jnp.where(in_row, opa, 0.0)

        # The homogeneous ray-splat planes p = (x·Tw−Tu)×(y·Tw−Tv) are
        # *bilinear* in (x, y) — the x·y terms cancel — so hoist the 9
        # coefficients to per-entry (1, CHUNK) vectors and each p_i is
        # two FMAs per pixel-entry pair instead of the full cross
        # product (the kernel is VPU-bound on exactly this math).
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
        # One reciprocal shared by su and sv (a second divide pass costs
        # a full VPU sweep). No ±3e4 clips: overflow drives rho3d→inf,
        # which loses the min() against rho2d, and the NaN-able z3d
        # (inf·0) is only ever selected when use3d is true (rho3d
        # finite) — verified against the dense oracle.
        inv = 1.0 / jnp.where(pz_ok, p2, 1.0)
        su = p0 * inv
        sv = p1 * inv
        rho3d = su * su + sv * sv
        dx = cx - px
        dy = cy - py
        rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
        use3d = rho3d <= rho2d
        rho = jnp.minimum(rho3d, rho2d)
        z = jnp.where(use3d, su * Tw0 + sv * Tw1 + Tw2, Tw2)
        alpha = jnp.minimum(ALPHA_CLAMP, opa * jnp.exp(-0.5 * rho))
        live = pz_ok & (z >= near) & (alpha >= ALPHA_EPS)
        alpha = jnp.where(live, alpha, 0.0)

        # ONE log-space inclusive prefix scan gives the cumprod of the RAW
        # alphas; the oracle's early-stop set {T_raw_incl < eps} is a
        # *global* suffix of that raw cumprod, so on the kept prefix
        # raw == effective and the exclusive prefix is T_incl/(1−α) —
        # no second scan needed, and the contributor set is a prefix
        # (which the backward kernel reconstructs from n_contrib).
        log_om = jnp.log1p(-alpha)
        if SCAN_MODE == "cumsum":
            cum_incl = _scan_incl(log_om)
        else:
            cum_incl = jnp.dot(log_om, ut_incl,
                               preferred_element_type=jnp.float32,
                               precision=HI)
        T_incl = T_col * jnp.exp(cum_incl)
        skip = T_incl < T_EPS
        # exp(cum_incl − log_om) would be a second transcendental pass;
        # T_excl = T_incl/(1−α) is one divide (α ≤ 0.99 keeps it safe).
        T_excl = T_incl / (1.0 - alpha)
        alpha_eff = jnp.where(skip, 0.0, alpha)
        w = alpha_eff * T_excl                   # (NPIX, CHUNK)

        wz = w * z
        lea = jnp.where(skip, 0.0, log_om)     # log(1−α_eff)

        # Median depth: last entry with incoming T > 0.5 (T monotone ⇒
        # the pick row zb has one hot lane per pixel).
        contrib = alpha_eff > 0.0
        med_mask = (T_excl > 0.5) & contrib
        best = jnp.max(jnp.where(med_mask, eidx, -1), axis=1, keepdims=True)
        zb = jnp.where(eidx == best, z, 0.0)

        # Distortion moments (2DGS appendix; forward.cu:392-400): the two
        # exclusive scans ride one stacked (2·NPIX, CHUNK)@(CHUNK, CHUNK)
        # matmul, and the ΣMw/ΣM²w chunk totals fall out of the scan's
        # last column + last element. Micro-variants measured on-chip and
        # rejected: replacing this scan with a closed form over chunk
        # totals (+2 lane reductions) was +8 ms/frame; riding the other
        # totals as extra scan rows was +7 ms (HIGHEST cost scales with
        # row-tiles); bf16 casts of the big operands were +4 ms.
        acc_ref[:, 0:6] += jax.lax.dot_general(
            w, g[10:16],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        if want_aux and want_dist:
            # Per-entry distortion rows (2DGS appendix;
            # forward.cu:392-400).
            m = far / (far - near) * (1.0 - near / jnp.maximum(z, 1e-8))
            mw = m * w
            m2w = m * m * w
            if SCAN_MODE == "cumsum":
                both = jnp.concatenate([mw, m2w], axis=0)
                cs2 = _scan_incl(both) - both           # exclusive
            else:
                ut_excl = (rowe < cole).astype(jnp.float32)
                cs2 = jnp.dot(jnp.concatenate([mw, m2w], axis=0), ut_excl,
                              preferred_element_type=jnp.float32,
                              precision=HI)
            cs_mw = cs2[:NPIX]
            cs_m2w = cs2[NPIX:]
            M1_col = aux_ref[:, 2:3]
            M2_col = aux_ref[:, 3:4]
            A = 1.0 - T_excl
            dist_add = jnp.sum(
                (m * m * A + (M2_col + cs_m2w)
                 - 2.0 * m * (M1_col + cs_mw)) * w,
                axis=1, keepdims=True,
            )
            aux_ref[:, 4:5] += dist_add
            aux_ref[:, 2:3] += (cs_mw[:, CHUNK - 1 : CHUNK]
                                + mw[:, CHUNK - 1 : CHUNK])
            aux_ref[:, 3:4] += (cs_m2w[:, CHUNK - 1 : CHUNK]
                                + m2w[:, CHUNK - 1 : CHUNK])
        if want_aux:
            # n_contrib (1-based global index of last contributor).
            lastc = jnp.max(
                jnp.where(contrib, gpos_row - start + 1, 0),
                axis=1, keepdims=True,
            ).astype(jnp.float32)
            aux_ref[:, 6:7] = jnp.maximum(aux_ref[:, 6:7], lastc)
        aux_ref[:, 1:2] += jnp.sum(wz, axis=1, keepdims=True)
        aux_ref[:, 5:6] = jnp.where(
            best >= 0,
            jnp.sum(zb, axis=1, keepdims=True),
            aux_ref[:, 5:6],
        )

        # Carries: col 0 = raw cumprod (skip test, decays forever);
        # col 7 = log effective T (Σ kept log(1−α) — identical to the
        # frozen-at-last-kept T because the raw cumprod is monotone).
        T_last = T_incl[:, CHUNK - 1 : CHUNK]
        aux_ref[:, 0:1] = T_last
        aux_ref[:, 7:8] += jnp.sum(lea, axis=1, keepdims=True)

        return c + 1, jnp.max(T_last) >= T_EPS

    # Traced per-tile bound: a tile only walks its own chunks (the CUDA
    # kernel's `rounds`); n_chunks_max is just the padding-safe ceiling.
    if EARLY_BREAK:
        # Early BREAK (the CUDA block-level `done` ballot): once every
        # pixel's raw transmittance is under T_EPS, later chunks are all
        # skipped by the oracle too, so exiting the loop is exact — and it
        # drops their DMA issue+wait and loop overhead, which dominate on
        # saturated tiles (opaque scenes saturate within 1-2 chunks of a
        # 10+-chunk tile).
        c_end, _ = jax.lax.while_loop(
            lambda carry: (carry[0] < n_chunks) & carry[1],
            chunk_body,
            (0, True),
        )

        # Drain: on early exit (or a liveness-dead tile that never entered
        # the body) exactly one copy — chunk c_end — was started but not
        # waited; no in-flight DMA may survive into the next tile of this
        # grid step.
        @pl.when(c_end < n_chunks)
        def _():
            wait_copy(c_end)
    else:
        # Fallback full walk (computing a saturated chunk is semantically a
        # no-op: every entry lands in the skip set).
        jax.lax.fori_loop(
            0, n_chunks, lambda c, live: chunk_body((c, live))[1], True
        )

    T_fin = jnp.exp(aux_ref[:, 7:8])                  # effective final T
    bg = bg_ref[0:1, :]                               # (1, VAL_F)
    out_vals_ref[j] = acc_ref[:] + T_fin * bg
    out_aux_ref[j] = jnp.concatenate(
        [
            aux_ref[:, 1:2],            # 0: depth accum
            1.0 - T_fin,                # 1: alpha
            aux_ref[:, 4:5],            # 2: distortion
            aux_ref[:, 5:6],            # 3: median depth
            T_fin,                      # 4: final T
            aux_ref[:, 6:7],            # 5: n_contrib
            aux_ref[:, 2:3],            # 6: M1
            aux_ref[:, 3:4],            # 7: M2
        ],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "near", "far", "n_chunks_max",
                     "want_aux", "want_dist"),
)
def _rasterize_tiles_pallas(
    comb: jnp.ndarray,        # (COMB_F, E) sorted, E multiple of CHUNK
    tile_start: jnp.ndarray,  # (n_tiles,)
    tile_count: jnp.ndarray,  # (n_tiles,)
    bg: jnp.ndarray,          # (3,)
    width: int,
    height: int,
    near: float,
    far: float,
    n_chunks_max: int,
    want_aux: bool = True,
    want_dist: bool = True,
):
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    n_tiles = gx * gy
    # `RASTER_GROUP` tiles per grid step (zero-count padding tiles at the
    # tail); the grid-step fixed cost measured 4.8 µs — grouping cuts the
    # per-frame floor from 8.4 ms to ~2 ms at 768×576.
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
    bg_pad = jnp.zeros((1, VAL_F), jnp.float32).at[0, :3].set(bg)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((group, NPIX, VAL_F), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, NPIX, 8), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, comb.shape[0], CHUNK), jnp.float32),  # double buffer
            pltpu.VMEM((NPIX, VAL_F), jnp.float32),
            pltpu.VMEM((NPIX, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_vals, out_aux = pl.pallas_call(
        functools.partial(
            _render_kernel, near=near, far=far, n_chunks_max=n_chunks_max,
            want_aux=want_aux, want_dist=want_dist, group=group,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, NPIX, VAL_F), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, NPIX, 8), jnp.float32),
        ],
        interpret=_interpret(),
    )(tile_start, tile_count, tile_xy, comb, bg_pad)
    return out_vals[:n_tiles], out_aux[:n_tiles]


def _assemble(flat: jnp.ndarray, gx: int, gy: int, width: int, height: int):
    """(n_tiles, NPIX[, C]) → (H, W[, C])."""
    ch = flat.shape[2:] if flat.ndim > 2 else ()
    img = flat.reshape((gy, gx, TILE, TILE) + ch)
    img = jnp.moveaxis(img, 2, 1).reshape((gy * TILE, gx * TILE) + ch)
    return img[:height, :width]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _render_pallas_diff(static, prep: Preprocessed, bg: jnp.ndarray):
    """Differentiable wrapper: Pallas kernels forward, dedicated
    back-to-front Pallas backward kernel (rasterize_pallas_bwd)."""
    (width, height, near, far, rank_mode, cap, eprune, buf_size,
     compact_w, want_dist) = static
    return _render_pallas_impl(width, height, prep, bg, near, far,
                               buf_size=buf_size,
                               rows_are_depth_ranks=rank_mode,
                               max_tiles_per_splat=cap,
                               ellipse_prune=eprune,
                               compact_width=compact_w,
                               want_dist=want_dist)


def _render_pallas_fwd(static, prep, bg):
    (width, height, near, far, rank_mode, cap, eprune, buf_size,
     compact_w, want_dist) = static
    outputs, residuals = _render_pallas_impl(
        width, height, prep, bg, near, far, return_residuals=True,
        buf_size=buf_size,
        rows_are_depth_ranks=rank_mode, max_tiles_per_splat=cap,
        ellipse_prune=eprune, compact_width=compact_w, want_dist=want_dist,
    )
    return outputs, (prep, bg, residuals)


def _disassemble(img: jnp.ndarray, gx: int, gy: int, width: int, height: int):
    """(H, W[, C]) → (n_tiles, NPIX[, C]) — inverse of _assemble."""
    ch = img.shape[2:] if img.ndim > 2 else ()
    pad_h = gy * TILE - height
    pad_w = gx * TILE - width
    img = jnp.pad(img, ((0, pad_h), (0, pad_w)) + ((0, 0),) * len(ch))
    img = img.reshape((gy, TILE, gx, TILE) + ch)
    img = jnp.moveaxis(img, 1, 2).reshape((gy * gx, NPIX) + ch)
    return img


# Entry→splat gradient reduction strategy. "segsum" (default) is the
# scatter-free sort-based path; "scatter" is the legacy XLA scatter-add
# (kept for A/B and as the rank-mode fallback). Measured at the budget
# shape (2.43M splats / 2.43M-entry buffer, scripts/profile_reduce.py):
# scatter-add 296 ms (~123 ns/row, an XLA serial loop) vs the segsum
# pieces pair-sort 6.1 + row-gather 43.5 + log-passes 10 + head checks
# ~60 ⇒ ~2.5× faster, and searchsorted/unique-scatter alternatives all
# measured ≥300 ms (TPU random gathers are ~18 ns/row, scatters ~123).
SCATTER_MODE = "segsum"


def _entry_to_splat(dcomb: jnp.ndarray, binning: Binning, ok: jnp.ndarray,
                    P: int, cap: int) -> jnp.ndarray:
    """(COMB_F, E) masked per-entry gradients → (P, 18) per-splat sums —
    the batched equivalent of CUDA's per-entry atomicAdd
    (backward.cu:144-739's dL accumulation).

    segsum path: ONE (pid, iota) pair sort groups each splat's entries
    contiguously ((gauss_id, slot_id) is unique per entry, ≤cap per splat);
    log₂(cap) shifted compare-add passes leave each run's TOTAL on its head
    row (all sequential-bandwidth); and the head positions come from an
    exclusive cumsum of the binning's per-splat candidate counts — valid
    exactly when n_dropped == 0 (the trainer auto-sizes the entry buffer
    and bumps on any drop). A per-splat `gid2[head] == g` check zeroes the
    affected splats' gradients on the overflow step instead of
    mis-attributing them (conservative, loud — never silent corruption).
    """
    E = dcomb.shape[1]
    gid = binning.gauss_id
    if (SCATTER_MODE != "segsum" or binning.slot_id is None
            or binning.counts_valid is None):
        safe_gid = jnp.where(ok, gid, 0)
        d_all = dcomb[:18].T                             # (E, 18)
        return jnp.zeros((P, 18), jnp.float32).at[safe_gid].add(
            d_all, mode="drop")

    slot_bits = max(1, (cap - 1).bit_length())
    BIG = jnp.int32(jnp.iinfo(jnp.int32).max)
    pid = (gid << slot_bits) | binning.slot_id
    pidm = jnp.where(ok, pid, BIG)
    pid2, pos2 = jax.lax.sort(
        (pidm, jnp.arange(E, dtype=jnp.int32)), num_keys=1)
    d = dcomb[:18].T[pos2]                               # (E, 18) row gather
    gid2 = pid2 >> slot_bits                             # BIG → huge id
    s = 1
    while s < cap:
        take = gid2 == jnp.concatenate(
            [gid2[s:], jnp.full((s,), -1, jnp.int32)])
        d = d + jnp.where(
            take[:, None],
            jnp.concatenate([d[s:], jnp.zeros((s, 18), jnp.float32)]),
            0.0)
        s *= 2
    counts = binning.counts_valid
    headpos = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(counts, dtype=jnp.int32)[:-1]])
    hp = jnp.minimum(headpos, E - 1)
    has = (counts > 0) & (gid2[hp] == jnp.arange(P, dtype=jnp.int32))

    # Placement is exact iff EVERY candidate made it into the buffer AND
    # into the backward's per-tile gradient support (set equality ⇔ count
    # equality, since present ⊆ candidates). On the rare misaligned step
    # (buffer overflow before the auto-bump lands, or a >8192-entry tile
    # hitting MAX_CHUNKS_PER_TILE) fall back to the exact scatter-add.
    aligned = jnp.sum(ok, dtype=jnp.int32) == jnp.sum(counts,
                                                      dtype=jnp.int32)

    def from_heads(_):
        return jnp.where(has[:, None], d[hp], 0.0)

    def from_scatter(_):
        safe_gid = jnp.where(ok, gid, 0)
        return jnp.zeros((P, 18), jnp.float32).at[safe_gid].add(
            dcomb[:18].T, mode="drop")

    return jax.lax.cond(aligned, from_heads, from_scatter, None)


def _render_pallas_bwd(static, res, cts):
    """Backward via the dedicated back-to-front Pallas kernel
    (rasterize_pallas_bwd.py); per-entry gradients are scatter-added to
    per-splat gradients of the preprocessed tensors. XLA AD continues the
    chain from there to the raw scene parameters."""
    from g4splat_tpu.ops.rasterize_pallas_bwd import (
        MAX_CHUNKS_PER_TILE,
        rasterize_backward_pallas,
    )

    (width, height, near, far, _rank_mode, _cap, _eprune, _buf,
     _compact_w, want_dist) = static
    prep, bg, residuals = res
    binning, comb, entry_valid, aux_tail = residuals
    gid = binning.gauss_id
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    n_tiles = gx * gy

    # m1/m2 moment totals are exposed for slab composition only — their
    # cotangents are not propagated (stop-gradient semantics, like
    # n_contrib).
    (g_color, g_alpha, g_normal, g_depth_acc, g_med, g_dist, g_finT,
     _g_ncontrib, _g_m1, _g_m2, _g_ndrop, _g_novf) = cts

    def f32(x):
        return jnp.asarray(x, jnp.float32)

    # ONE (H, W, 16) channel concat + ONE tile relayout: the previous
    # per-map _disassemble + .at[].set chain rewrote the 28 MB cot buffer
    # once per map (~11 ms/frame of the backward path at 768×576).
    cot_img = jnp.concatenate(
        [
            f32(g_color),                                   # 0:3
            f32(g_normal),                                  # 3:6
            f32(g_depth_acc)[..., None],                    # 6
            # final_T output cotangent folds into the alpha channel's
            # gT_end with opposite sign: gT_end = bg·gC − gA + gFinT ⇒
            # pass gA − gFinT.
            (f32(g_alpha) - f32(g_finT))[..., None],        # 7
            f32(g_dist)[..., None],                         # 8
            f32(g_med)[..., None],                          # 9
            jnp.zeros(g_dist.shape + (6,), jnp.float32),    # 10:16 pad
        ],
        axis=-1,
    )
    cot = _disassemble(cot_img, gx, gy, width, height)

    dcomb = rasterize_backward_pallas(
        comb, binning.tile_start, binning.tile_count, cot, aux_tail,
        jnp.asarray(bg, jnp.float32)[:3], width, height, near, far,
        want_dist=want_dist,
    )

    # Entries past the per-tile gradient-support cap never got written.
    E = gid.shape[0]
    pos = jnp.arange(E, dtype=jnp.int32)
    tile_of = jnp.clip(binning.tile_id, 0, n_tiles - 1)
    start_of = binning.tile_start[tile_of]
    abase_of = (start_of // CHUNK) * CHUNK
    in_support = (pos - abase_of) < MAX_CHUNKS_PER_TILE * CHUNK
    ok = entry_valid & in_support
    dcomb = jnp.where(ok[None, :], dcomb[:, :E], 0.0)

    P = prep.depth.shape[0]
    acc = _entry_to_splat(dcomb, binning, ok, P, _cap)
    # The packed opacity was where(prep.valid, opacity, 0); gate the SUMMED
    # opacity gradient per splat (identical to gating per entry, P ops
    # instead of an (E,)-gather of prep.valid).
    acc = acc.at[:, 11].multiply(prep.valid.astype(jnp.float32))

    import numpy as np

    d_prep = Preprocessed(
        T=acc[:, 0:9].reshape(P, 3, 3),
        center=acc[:, 9:11],
        radius=jnp.zeros_like(prep.radius),
        depth=jnp.zeros_like(prep.depth),
        normal=acc[:, 15:18],
        opacity=acc[:, 11],
        rgb=acc[:, 12:15],
        valid=np.zeros(prep.valid.shape, dtype=jax.dtypes.float0),
    )
    d_bg = jnp.zeros_like(bg)  # bg is a constant in training; cheap to skip
    return d_prep, d_bg


_render_pallas_diff.defvjp(_render_pallas_fwd, _render_pallas_bwd)


def render_pallas(
    camera,
    prep: Preprocessed,
    bg: jnp.ndarray,
    near: float = NEAR_N,
    far: float = FAR_N,
    buf_size: int | None = None,
    need_aux: bool = True,
    rows_are_depth_ranks: bool = False,
    max_tiles_per_splat: int = 16,
    ellipse_prune: bool = True,
    compact_width: int = 8,
    want_dist: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    if not need_aux:
        # Inference path (render_all / eval / TSDF sweeps / bench): skips the
        # distortion-moment scan and n_contrib bookkeeping inside the kernel
        # (those channels return zeros) and has no VJP — callers that need
        # gradients or rend_dist use the default path.
        return _render_pallas_impl(
            camera.width, camera.height, prep, bg, near, far,
            buf_size=buf_size,
            want_aux=False, rows_are_depth_ranks=rows_are_depth_ranks,
            max_tiles_per_splat=max_tiles_per_splat,
            ellipse_prune=ellipse_prune, compact_width=compact_width,
        )
    return _render_pallas_diff(
        (camera.width, camera.height, near, far, rows_are_depth_ranks,
         max_tiles_per_splat, ellipse_prune, buf_size, compact_width,
         want_dist),
        prep, bg,
    )


def _render_pallas_impl(
    width: int,
    height: int,
    prep: Preprocessed,
    bg: jnp.ndarray,
    near: float = NEAR_N,
    far: float = FAR_N,
    buf_size: int | None = None,
    return_residuals: bool = False,
    want_aux: bool = True,
    rows_are_depth_ranks: bool = False,
    max_tiles_per_splat: int = 16,
    ellipse_prune: bool = True,
    compact_width: int = 8,
    want_dist: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    binning = bin_splats(prep, width, height, buf_size=buf_size,
                         max_tiles_per_splat=max_tiles_per_splat,
                         rows_are_depth_ranks=rows_are_depth_ranks,
                         ellipse_prune=ellipse_prune,
                         compact_width=compact_width)
    n_tiles = gx * gy
    entry_valid = binning.tile_id < n_tiles
    comb = _pack_entries(prep, binning.gauss_id, entry_valid)
    pad = (-comb.shape[1]) % CHUNK
    if pad:
        comb = jnp.pad(comb, ((0, 0), (0, pad)))
    n_chunks_max = comb.shape[1] // CHUNK
    out_vals, out_aux = _rasterize_tiles_pallas(
        comb, binning.tile_start, binning.tile_count, bg,
        width, height, near, far, n_chunks_max, want_aux, want_dist,
    )
    # ONE fused tile→image relayout for all 14 channels (separate _assemble
    # transposes re-walk the same HBM once per channel group). Channels the
    # selected kernel mode leaves at zero (dist/M1/M2 without want_dist;
    # additionally n_contrib on the slim kernel) are not relaid out.
    zero = jnp.zeros((height, width), jnp.float32)
    if want_aux and want_dist:
        both = jnp.concatenate([out_vals[..., 0:6], out_aux], axis=-1)
    elif want_aux:
        both = jnp.concatenate(
            [out_vals[..., 0:6], out_aux[..., 0:2], out_aux[..., 3:6]],
            axis=-1)
    else:
        both = jnp.concatenate(
            [out_vals[..., 0:6], out_aux[..., 0:2], out_aux[..., 3:5]],
            axis=-1)
    img = _assemble(both, gx, gy, width, height)
    color = img[..., 0:3]
    normal = img[..., 3:6]
    depth_acc = img[..., 6]
    alpha = img[..., 7]
    if want_aux and want_dist:
        dist = img[..., 8]
        med = img[..., 9]
        final_T = img[..., 10]
        n_contrib = img[..., 11].astype(jnp.int32)
        m1_tot = img[..., 12]
        m2_tot = img[..., 13]
    elif want_aux:
        dist = zero
        med = img[..., 8]
        final_T = img[..., 9]
        n_contrib = img[..., 10].astype(jnp.int32)
        m1_tot = zero
        m2_tot = zero
    else:
        dist = zero
        med = img[..., 8]
        final_T = img[..., 9]
        n_contrib = zero.astype(jnp.int32)
        m1_tot = zero
        m2_tot = zero
    outputs = (color, alpha, normal, depth_acc, med, dist, final_T, n_contrib,
               m1_tot, m2_tot, binning.n_dropped, binning.n_overflow)
    if return_residuals:
        return outputs, (binning, comb, entry_valid, out_aux[..., 4:8])
    return outputs
