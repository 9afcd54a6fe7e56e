"""Tile-binned differentiable rasterizer in pure JAX.

TPU-native re-design of the reference's CUDA binning pipeline
(rasterizer_impl.cu:198-342): per-splat tile counts → prefix scan → key
duplication → radix sort → per-tile ranges → per-tile compositing. The CUDA
version uses CUB scans/sorts and dynamic allocations; here everything is
static-shape: a fixed entry buffer, a per-splat tile cap, and a per-tile depth
cap. On entry-buffer overflow the kept prefix of the (tile, depth)-sorted
keys survives — the largest keys (highest tile ids, then farthest depths)
are dropped and counted in ``n_dropped``; size ``buf_size`` for zero drops
in normal operation (default 4 entries per splat vs a ~3.2 mean).

This backend is pure jax.numpy — XLA AD differentiates it — and doubles as the
CPU/test fallback for the Pallas kernels, which consume the same binning.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from g4splat_tpu.ops.rasterize_common import (
    FAR_N,
    NEAR_N,
    TILE,
    Preprocessed,
)
from g4splat_tpu.ops.rasterize_dense import composite

# Static capacity knobs (overridable per call).
MAX_TILES_PER_SPLAT = 16   # splats covering more tiles are truncated
                           # (a 20px-radius splat can touch up to 4×4 tiles)
TILE_K = 1024              # max splats composited per tile (front-most kept)
BUF_FACTOR = 4             # kept sorted-entry prefix = BUF_FACTOR * P
COMPACT_W = 8              # row-compaction width (see _compact_candidates)


class Binning(NamedTuple):
    gauss_id: jnp.ndarray     # (BUF,) int32, sorted by (tile, depth)
    tile_id: jnp.ndarray      # (BUF,) int32 (== n_tiles for padding)
    tile_start: jnp.ndarray   # (n_tiles,) int32
    tile_count: jnp.ndarray   # (n_tiles,) int32
    n_dropped: jnp.ndarray    # () int32 — entries lost to caps
    # (gauss_id, slot_id) is UNIQUE per valid entry — the backward's
    # sort-based entry→splat reduction groups on it. Under compaction,
    # slot_id is the entry's column in the ROW-SORTED candidate grid, not
    # its original rect slot. None in rank mode (key-only sort carries no
    # payload; the backward falls back to scatter-add there).
    slot_id: Optional[jnp.ndarray] = None
    # (P,) post-prune candidate count per splat (None in rank mode).
    # With n_overflow == 0 every post-prune candidate is present in the
    # buffer, so exclusive-cumsum(counts_valid) gives each splat's
    # contiguous run start in (gauss_id, slot_id)-sorted entry order — the
    # scatter-free gradient reduction's placement rule (rasterize_pallas).
    counts_valid: Optional[jnp.ndarray] = None
    # () int32 — the BUFFER-CAPACITY component of n_dropped (sorted-buffer
    # overflow + compaction-block exhaustion). Unlike the per-splat
    # rect-cap truncation term (a static semantic cap, also counted in
    # n_dropped), this component is fixable by growing the entry buffer —
    # it is what the trainer's auto-bump keys on.
    n_overflow: Optional[jnp.ndarray] = None


def _ellipse_keep(prep: Preprocessed, tx: jnp.ndarray, ty: jnp.ndarray):
    """Exact tile-level contribution test for candidate (splat, tile) pairs.

    The rect binning duplicates a splat into every tile of its dual-conic
    AABB (getRect, rasterizer_impl.cu); corner tiles often cannot produce a
    single pixel with alpha ≥ 1/255, yet they cost kernel chunks in every
    tile they land in. This test keeps a candidate iff some point of the
    tile's pixel rect can reach alpha ≥ ALPHA_EPS through either path the
    kernel evaluates:

    - 2D low-pass: rho2d = FILTER_INV_SQUARE · d², min over the rect via
      center clamping.
    - 3D ray-splat: rho3d = (p0² + p1²)/p2² with p_i AFFINE in pixel coords
      (the ray-splat planes' x·y terms cancel — see the kernel), so
      {rho3d ≤ τ} is the quadratic q = p0² + p1² − τ·p2² ≤ 0. min(q) over a
      rect is attained at a corner, an edge stationary point, or the
      interior stationary point (PD Hessian only) — nine closed-form
      evaluations.

    τ = 2·ln(opacity/ALPHA_EPS) (+0.05 f32-rounding margin); the continuous
    rect contains the pixel lattice, so keeping is conservative and pruning
    is EXACT against the dense oracle (pruned tiles contribute nothing
    there either — the 1/255 cutoff kills every pixel).

    Returns a bool (P, cap) keep mask.
    """
    from g4splat_tpu.ops.rasterize_common import (
        ALPHA_EPS as _EPS,
        FILTER_INV_SQUARE as _FINV,
    )

    T = prep.T
    Tu0, Tu1, Tu2 = T[:, 0, 0], T[:, 0, 1], T[:, 0, 2]
    Tv0, Tv1, Tv2 = T[:, 1, 0], T[:, 1, 1], T[:, 1, 2]
    Tw0, Tw1, Tw2 = T[:, 2, 0], T[:, 2, 1], T[:, 2, 2]
    A0 = Tw2 * Tv1 - Tw1 * Tv2
    B0 = Tu2 * Tw1 - Tu1 * Tw2
    C0 = Tu1 * Tv2 - Tu2 * Tv1
    A1 = Tw0 * Tv2 - Tw2 * Tv0
    B1 = Tu0 * Tw2 - Tu2 * Tw0
    C1 = Tu2 * Tv0 - Tu0 * Tv2
    A2 = Tw1 * Tv0 - Tw0 * Tv1
    B2 = Tu1 * Tw0 - Tu0 * Tw1
    C2 = Tu0 * Tv1 - Tu1 * Tv0
    # Per-splat normalization keeps q's 4th-power-of-T terms in f32 range
    # (q is a ratio test — uniform scaling of all nine coefficients
    # preserves its sign).
    m = jnp.maximum(
        jnp.max(jnp.abs(jnp.stack(
            [A0, B0, C0, A1, B1, C1, A2, B2, C2], axis=1)), axis=1),
        1e-30,
    )
    A0, B0, C0 = A0 / m, B0 / m, C0 / m
    A1, B1, C1 = A1 / m, B1 / m, C1 / m
    A2, B2, C2 = A2 / m, B2 / m, C2 / m

    opa = jnp.maximum(prep.opacity, 1e-12)
    tau = 2.0 * jnp.log(opa / _EPS) + 0.05        # (P,)
    t_ = tau[:, None]

    Hxx = (A0 * A0 + A1 * A1)[:, None] - t_ * (A2 * A2)[:, None]
    Hxy = (A0 * B0 + A1 * B1)[:, None] - t_ * (A2 * B2)[:, None]
    Hyy = (B0 * B0 + B1 * B1)[:, None] - t_ * (B2 * B2)[:, None]
    Gx = (A0 * C0 + A1 * C1)[:, None] - t_ * (A2 * C2)[:, None]
    Gy = (B0 * C0 + B1 * C1)[:, None] - t_ * (B2 * C2)[:, None]
    K = (C0 * C0 + C1 * C1)[:, None] - t_ * (C2 * C2)[:, None]

    x0 = (tx * TILE).astype(jnp.float32)
    x1 = x0 + (TILE - 1)
    y0 = (ty * TILE).astype(jnp.float32)
    y1 = y0 + (TILE - 1)

    def q(x, y):
        return (Hxx * x * x + 2.0 * (Hxy * x * y + Gx * x + Gy * y)
                + Hyy * y * y + K)

    qmin = jnp.minimum(jnp.minimum(q(x0, y0), q(x0, y1)),
                       jnp.minimum(q(x1, y0), q(x1, y1)))
    # Edge stationary points (clamped into the edge; when the 1D leading
    # coefficient is ≤ 0 the edge min sits at a corner already covered).
    sHyy = jnp.where(Hyy > 0, Hyy, 1.0)
    for xe in (x0, x1):
        ye = jnp.clip(-(Hxy * xe + Gy) / sHyy, y0, y1)
        qmin = jnp.minimum(qmin, jnp.where(Hyy > 0, q(xe, ye), jnp.inf))
    sHxx = jnp.where(Hxx > 0, Hxx, 1.0)
    for ye in (y0, y1):
        xe = jnp.clip(-(Hxy * ye + Gx) / sHxx, x0, x1)
        qmin = jnp.minimum(qmin, jnp.where(Hxx > 0, q(xe, ye), jnp.inf))
    # Interior stationary point — a minimum only for a PD Hessian.
    det = Hxx * Hyy - Hxy * Hxy
    pd = (Hxx > 0) & (det > 0)
    sdet = jnp.where(pd, det, 1.0)
    xi = jnp.clip((Hxy * Gy - Hyy * Gx) / sdet, x0, x1)
    yi = jnp.clip((Hxy * Gx - Hxx * Gy) / sdet, y0, y1)
    qmin = jnp.minimum(qmin, jnp.where(pd, q(xi, yi), jnp.inf))
    keep3d = qmin <= 0.0

    cx = prep.center[:, 0:1]
    cy = prep.center[:, 1:2]
    dx = jnp.clip(cx, x0, x1) - cx
    dy = jnp.clip(cy, y0, y1) - cy
    keep2d = _FINV * (dx * dx + dy * dy) <= t_

    return (keep3d | keep2d) & (prep.opacity >= _EPS)[:, None]


def _compact_candidates(keys, counts_valid, compact_w: int, k_rows: int,
                        slot_bits: int):
    """Shrink the global binning sort: per-splat row compaction + overflow.

    The (P, cap) candidate grid is ~75-80% sentinels (mean real
    entries/splat ≈ 2.5-3.3 vs cap 16), yet the global sort pays for every
    slot. Sorting each ROW first (16-wide lane sort — cheap) packs a row's
    real keys into its leading columns, so rows with ≤ compact_w real
    candidates are fully represented by their first compact_w columns. The
    few rows with more (big splats) go — whole, all cap columns — into a
    static overflow block of k_rows rows, selected by a (P,)-sized sort.
    The global sort then runs on P·compact_w + k_rows·cap keys instead of
    P·cap — at compact_w = cap/2 that's ~2× fewer keys, and the XLA bitonic
    sort is the single largest cost of the binning.

    EXACT whenever the overflow block fits: the surviving key multiset is
    identical to the uncompacted one. Overflow rows past the block degrade
    gracefully — they keep their first compact_w row-sorted columns (an
    effective per-splat cap of compact_w, never a whole-splat loss) and the
    excess count is returned for exact n_dropped accounting (same
    graceful-degradation contract as the entry buffer).

    keys: (P, cap) int32, SENTINEL padding. counts_valid: (P,) real counts.
    Returns (keys_flat, pids_flat, extra_dropped) with
    len = P·compact_w + k_rows·cap; pids_flat packs each slot's splat row
    and its column in the row-sorted candidate grid as
    (row << slot_bits | col) — the payload for the quantized-key pair sort
    (unique per entry; rank-mode keys already carry the row and take no
    payload). slot_bits = ceil(log2 cap) so any cap works.
    """
    P, cap = keys.shape
    SENTINEL = jnp.int32(jnp.iinfo(jnp.int32).max)
    keys_row = jnp.sort(keys, axis=1)                    # sentinels last
    ovf = counts_valid > compact_w                       # (P,)
    # Rows selected into the static overflow block: the first k_rows
    # overflowing rows by row id (rank via cumsum). Later overflow rows stay
    # in `main` with their first compact_w columns — a reduced effective cap
    # rather than a whole-splat drop.
    ovf_rank = jnp.cumsum(ovf.astype(jnp.int32)) - 1
    in_block = ovf & (ovf_rank < k_rows)
    main = jnp.where(in_block[:, None], SENTINEL, keys_row[:, :compact_w])
    rid = jax.lax.broadcasted_iota(jnp.int32, (P,), 0)
    prio = jnp.where(in_block, rid, jnp.int32(P))
    prio_sorted = jax.lax.sort(prio)
    sel = prio_sorted[:k_rows]
    sel_ok = sel < P
    sel_safe = jnp.minimum(sel, P - 1)
    ovf_keys = jnp.where(sel_ok[:, None], keys_row[sel_safe], SENTINEL)
    # Exact count of candidates lost to block exhaustion (cols past
    # compact_w of overflow rows not in the block).
    extra_dropped = jnp.sum(
        jnp.where(ovf & ~in_block, counts_valid - compact_w, 0))
    keys_flat = jnp.concatenate([main.reshape(-1), ovf_keys.reshape(-1)])
    col_main = jax.lax.broadcasted_iota(jnp.int32, (P, compact_w), 1)
    pid_main = (rid[:, None] << slot_bits) | col_main
    col_ovf = jax.lax.broadcasted_iota(jnp.int32, (k_rows, cap), 1)
    pid_ovf = (sel_safe[:, None] << slot_bits) | col_ovf
    pids_flat = jnp.concatenate([pid_main.reshape(-1), pid_ovf.reshape(-1)])
    return keys_flat, pids_flat, extra_dropped


def _overflow_rows_default(P: int) -> int:
    """Static overflow-block rows: 1/16 of the splat count (≥512, ≤P).

    At the bench scene (200k splats, 768×576) ~3-6k rows exceed 8 real
    candidates — 12.5k rows is a 2-4× margin for ~6% extra sort keys."""
    return min(max(512, P // 16), P)


def bin_splats(
    prep: Preprocessed,
    width: int,
    height: int,
    buf_size: int | None = None,
    max_tiles_per_splat: int = MAX_TILES_PER_SPLAT,
    rows_are_depth_ranks: bool = False,
    ellipse_prune: bool = True,
    compact_width: int = COMPACT_W,
    compact_overflow_rows: int | None = None,
) -> Binning:
    """Duplicate each splat into its touched tiles and sort by (tile, depth).

    TPU-shaped replacement for CUDA duplicateWithKeys + CUB radix sort
    (rasterizer_impl.cu:70-138). XLA scatter is serial on TPU, so compaction
    happens *inside the sort*: every (splat, slot) candidate gets a packed
    int32 key — tile id in the high bits, quantized depth below, sentinel max
    for unused slots — and one single-key sort both orders entries
    (tile-major, near-to-far) and pushes padding to the back. Depth carries
    ~19 bits of relative precision (ties beyond that are compositing-order
    noise well under float rounding).

    ``rows_are_depth_ranks=True``: the caller has ALREADY permuted ``prep``
    front-to-back (row index == global depth rank), so the key's low bits
    hold the row index instead of a quantized depth — within a tile, row
    order IS exact depth order, and the gauss id is recovered from the key
    itself. The (key, gid) pair sort collapses to a key-only sort moving
    half the data, and depth ordering becomes exact instead of 19-bit
    quantized. Requires tile_bits + ceil_log2(P) <= 31 (checked; use
    `depth_rank_bits_fit`).
    """
    P = prep.depth.shape[0]
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    n_tiles = gx * gy
    cap = max_tiles_per_splat
    buf_size = buf_size or BUF_FACTOR * P
    buf_size = min(buf_size, P * cap)
    if rows_are_depth_ranks:
        return _bin_splats_rank(prep, gx, gy, n_tiles, cap, buf_size,
                                ellipse_prune, compact_width,
                                compact_overflow_rows)

    center, radius = prep.center, prep.radius
    rmin_x = jnp.clip(((center[:, 0] - radius) / TILE).astype(jnp.int32), 0, gx)
    rmin_y = jnp.clip(((center[:, 1] - radius) / TILE).astype(jnp.int32), 0, gy)
    rmax_x = jnp.clip(
        ((center[:, 0] + radius + TILE - 1) / TILE).astype(jnp.int32), 0, gx
    )
    rmax_y = jnp.clip(
        ((center[:, 1] + radius + TILE - 1) / TILE).astype(jnp.int32), 0, gy
    )
    rw = rmax_x - rmin_x
    rh = rmax_y - rmin_y
    counts = jnp.where(prep.valid, rw * rh, 0)
    counts_cap = jnp.minimum(counts, cap)

    # Depth → high-resolution integer rank below the tile bits.
    tile_bits = max(1, (n_tiles).bit_length())
    depth_bits = 31 - tile_bits
    assert depth_bits >= 12, f"too many tiles ({n_tiles}) for packed keys"
    d = prep.depth
    dmin = jnp.min(jnp.where(prep.valid, d, jnp.inf))
    dmax = jnp.max(jnp.where(prep.valid, d, -jnp.inf))
    drange = jnp.maximum(dmax - dmin, 1e-12)
    q = jnp.clip(
        ((d - dmin) / drange * ((1 << depth_bits) - 1)).astype(jnp.int32),
        0, (1 << depth_bits) - 1,
    )

    # Candidate (splat, slot) → tile id.
    slots = jnp.arange(cap, dtype=jnp.int32)[None, :]
    safe_rw = jnp.maximum(rw, 1)[:, None]
    tx = rmin_x[:, None] + slots % safe_rw
    ty = rmin_y[:, None] + slots // safe_rw
    tid = ty * gx + tx                              # (P, cap)
    slot_valid = slots < counts_cap[:, None]
    if ellipse_prune:
        slot_valid = slot_valid & _ellipse_keep(prep, tx, ty)
    SENTINEL = jnp.int32(jnp.iinfo(jnp.int32).max)
    keys_pc = jnp.where(slot_valid, (tid << depth_bits) | q[:, None], SENTINEL)
    extra_dropped = jnp.int32(0)
    # Sort payload packs (splat row << slot_bits | slot) — unique per entry;
    # slot_bits sized from the cap so any max_tiles_per_splat works (the CUDA
    # path duplicates unboundedly, rasterizer_impl.cu:70-111). Row bits must
    # still fit: P ≤ 2^(31 - slot_bits) (e.g. cap 64 → P ≤ 33.5M, above the
    # reference's 10M hard cap).
    slot_bits = max(1, (cap - 1).bit_length())
    assert (P - 1).bit_length() + slot_bits <= 31, (
        f"P={P} with cap={cap} overflows the int32 sort payload"
    )
    counts_valid = jnp.sum(slot_valid, axis=1, dtype=jnp.int32)
    if compact_width and cap > compact_width:
        k_rows = (compact_overflow_rows if compact_overflow_rows is not None
                  else _overflow_rows_default(P))
        keys, pids, extra_dropped = _compact_candidates(
            keys_pc, counts_valid, compact_width, k_rows, slot_bits)
    else:
        keys = keys_pc.reshape(-1)
        rid = jax.lax.broadcasted_iota(jnp.int32, tid.shape, 0)
        sid = jax.lax.broadcasted_iota(jnp.int32, tid.shape, 1)
        pids = ((rid << slot_bits) | sid).reshape(-1)

    keys_sorted, pid_sorted = jax.lax.sort((keys, pids), num_keys=1)
    keys_sorted = keys_sorted[:buf_size]
    pid_sorted = pid_sorted[:buf_size]
    gid_sorted = pid_sorted >> slot_bits
    slot_sorted = pid_sorted & ((1 << slot_bits) - 1)
    tile_sorted = jnp.where(
        keys_sorted == SENTINEL, n_tiles, keys_sorted >> depth_bits
    ).astype(jnp.int32)

    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    bounds = tile_range << depth_bits
    tile_start = jnp.searchsorted(keys_sorted, bounds, side="left").astype(
        jnp.int32
    )
    upper = (bounds | ((1 << depth_bits) - 1)).astype(jnp.int32)
    tile_end = jnp.searchsorted(keys_sorted, upper, side="right").astype(
        jnp.int32
    )
    # Buffer-overflow term counts entries actually competing for the buffer
    # (post-prune, post-compaction); the cap-truncation term stays rect-based
    # (a truncated slot's prune verdict is never computed — conservative
    # overcount); compaction-overflow rows drop whole (exact count).
    total = jnp.sum(slot_valid) - extra_dropped
    overflow = jnp.maximum(total - buf_size, 0) + extra_dropped
    dropped = overflow + jnp.sum(counts - counts_cap)
    return Binning(
        gauss_id=gid_sorted,
        tile_id=tile_sorted,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        n_dropped=dropped.astype(jnp.int32),
        slot_id=slot_sorted,
        counts_valid=counts_valid,
        n_overflow=overflow.astype(jnp.int32),
    )


def depth_rank_bits_fit(n_splats: int, width: int, height: int) -> bool:
    """True when (tile_bits + rank_bits) packs into a 31-bit key."""
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    tile_bits = max(1, (gx * gy).bit_length())
    rank_bits = max(1, (n_splats - 1).bit_length())
    return tile_bits + rank_bits <= 31


def presort_splats_by_depth(prep: Preprocessed) -> Preprocessed:
    """Permute every per-splat field front-to-back (invalid splats last).

    After this, row index == global depth rank, enabling
    ``bin_splats(..., rows_are_depth_ranks=True)``. The permutation is a
    row gather inside the differentiable graph, so gradients flow back to
    the original order through the gather's VJP automatically.
    """
    import jax

    dkey = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(dkey)  # stable: ties keep original splat order
    return jax.tree.map(lambda x: x[order], prep)


def _bin_splats_rank(prep: Preprocessed, gx: int, gy: int, n_tiles: int,
                     cap: int, buf_size: int,
                     ellipse_prune: bool = True,
                     compact_width: int = COMPACT_W,
                     compact_overflow_rows: int | None = None) -> Binning:
    """Key-only binning sort for depth-rank-ordered rows (see bin_splats)."""
    P = prep.depth.shape[0]
    tile_bits = max(1, n_tiles.bit_length())
    rank_bits = max(1, (P - 1).bit_length())
    assert tile_bits + rank_bits <= 31, (
        f"rank keys need {tile_bits}+{rank_bits} bits; use the quantized path"
    )

    center, radius = prep.center, prep.radius
    rmin_x = jnp.clip(((center[:, 0] - radius) / TILE).astype(jnp.int32), 0, gx)
    rmin_y = jnp.clip(((center[:, 1] - radius) / TILE).astype(jnp.int32), 0, gy)
    rmax_x = jnp.clip(
        ((center[:, 0] + radius + TILE - 1) / TILE).astype(jnp.int32), 0, gx
    )
    rmax_y = jnp.clip(
        ((center[:, 1] + radius + TILE - 1) / TILE).astype(jnp.int32), 0, gy
    )
    rw = rmax_x - rmin_x
    rh = rmax_y - rmin_y
    counts = jnp.where(prep.valid, rw * rh, 0)
    counts_cap = jnp.minimum(counts, cap)

    slots = jnp.arange(cap, dtype=jnp.int32)[None, :]
    safe_rw = jnp.maximum(rw, 1)[:, None]
    tx = rmin_x[:, None] + slots % safe_rw
    ty = rmin_y[:, None] + slots // safe_rw
    tid = ty * gx + tx                              # (P, cap)
    slot_valid = slots < counts_cap[:, None]
    if ellipse_prune:
        slot_valid = slot_valid & _ellipse_keep(prep, tx, ty)
    SENTINEL = jnp.int32(jnp.iinfo(jnp.int32).max)
    rank = jnp.arange(P, dtype=jnp.int32)[:, None]
    keys_pc = jnp.where(slot_valid, (tid << rank_bits) | rank, SENTINEL)
    extra_dropped = jnp.int32(0)
    if compact_width and cap > compact_width:
        counts_valid = jnp.sum(slot_valid, axis=1, dtype=jnp.int32)
        k_rows = (compact_overflow_rows if compact_overflow_rows is not None
                  else _overflow_rows_default(P))
        keys, _, extra_dropped = _compact_candidates(
            keys_pc, counts_valid, compact_width, k_rows,
            max(1, (cap - 1).bit_length()))
    else:
        keys = keys_pc.reshape(-1)

    keys_sorted = jax.lax.sort(keys)[:buf_size]
    rank_mask = (1 << rank_bits) - 1
    # Sentinel keys decode to an out-of-range id; clamp so downstream
    # feature gathers stay in bounds (their entries are masked by tile
    # ranges anyway).
    gid_sorted = jnp.minimum(keys_sorted & rank_mask, P - 1)
    tile_sorted = jnp.where(
        keys_sorted == SENTINEL, n_tiles, keys_sorted >> rank_bits
    ).astype(jnp.int32)

    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    bounds = tile_range << rank_bits
    tile_start = jnp.searchsorted(keys_sorted, bounds, side="left").astype(
        jnp.int32
    )
    upper = (bounds | rank_mask).astype(jnp.int32)
    tile_end = jnp.searchsorted(keys_sorted, upper, side="right").astype(
        jnp.int32
    )
    total = jnp.sum(slot_valid) - extra_dropped
    overflow = jnp.maximum(total - buf_size, 0) + extra_dropped
    dropped = overflow + jnp.sum(counts - counts_cap)
    return Binning(
        gauss_id=gid_sorted,
        tile_id=tile_sorted,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        n_dropped=dropped.astype(jnp.int32),
        n_overflow=overflow.astype(jnp.int32),
    )


def _gather_prep(prep: Preprocessed, idx: jnp.ndarray) -> Preprocessed:
    return Preprocessed(
        T=prep.T[idx],
        center=prep.center[idx],
        radius=prep.radius[idx],
        depth=prep.depth[idx],
        normal=prep.normal[idx],
        opacity=prep.opacity[idx],
        rgb=prep.rgb[idx],
        valid=prep.valid[idx],
    )


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "near", "far", "tile_k", "tile_batch"),
)
def _render_tiles(
    prep: Preprocessed,
    binning: Binning,
    bg: jnp.ndarray,
    width: int,
    height: int,
    near: float,
    far: float,
    tile_k: int,
    tile_batch: int,
):
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    n_tiles = gx * gy

    # Per-tile pixel coordinates (relative; absolute = tile origin + local).
    ly, lx = jnp.meshgrid(
        jnp.arange(TILE, dtype=jnp.float32),
        jnp.arange(TILE, dtype=jnp.float32),
        indexing="ij",
    )
    lx = lx.reshape(-1)
    ly = ly.reshape(-1)

    def one_tile(t):
        start = binning.tile_start[t]
        count = jnp.minimum(binning.tile_count[t], tile_k)
        entry = start + jnp.arange(tile_k)
        in_range = jnp.arange(tile_k) < count
        gid = binning.gauss_id[jnp.clip(entry, 0, binning.gauss_id.shape[0] - 1)]
        sub = _gather_prep(prep, gid)
        # Mask out padding entries via validity.
        sub = sub.replace(valid=sub.valid & in_range)
        tile_x0 = (t % gx) * TILE
        tile_y0 = (t // gx) * TILE
        px = lx + tile_x0
        py = ly + tile_y0
        from g4splat_tpu.ops.rasterize_common import splat_alpha_depth

        alpha, depth = splat_alpha_depth(sub, px, py, near=near)
        out = composite(alpha, depth, sub.rgb, sub.normal, bg, near=near, far=far)
        return (
            out.color,
            out.depth_acc,
            out.alpha,
            out.normal,
            out.median_depth,
            out.distortion,
            out.final_T,
            out.n_contrib,
            out.m1_tot,
            out.m2_tot,
        )

    # Batch tiles through vmap under lax.map to bound memory. Remat the tile
    # computation: without it, AD saves every batch's (tile_k × 256) alpha
    # intermediates across the whole map — tens of GB at real scene scale —
    # while recomputing them in the backward pass is cheap.
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    pad_tiles = (-n_tiles) % tile_batch
    tids = jnp.concatenate([tids, jnp.zeros(pad_tiles, jnp.int32)])
    tiles_batched = tids.reshape(-1, tile_batch)
    results = jax.lax.map(jax.checkpoint(jax.vmap(one_tile)), tiles_batched)
    # Each result leaf: (nb, tile_batch, 256, …) → (n_tiles_padded, 256, …)
    results = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), results)
    results = jax.tree.map(lambda x: x[:n_tiles], results)

    def assemble(flat, channels=None):
        # (n_tiles, 256[, C]) → (H, W[, C])
        shape = (gy, gx, TILE, TILE) + ((channels,) if channels else ())
        img = flat.reshape(shape)
        img = jnp.moveaxis(img, 2, 1).reshape(
            (gy * TILE, gx * TILE) + ((channels,) if channels else ())
        )
        return img[:height, :width]

    (color, depth_acc, alpha, normal, med, dist, final_T, n_contrib,
     m1_tot, m2_tot) = results
    return (
        assemble(color, 3),
        assemble(alpha),
        assemble(normal, 3),
        assemble(depth_acc),
        assemble(med),
        assemble(dist),
        assemble(final_T),
        assemble(n_contrib),
        assemble(m1_tot),
        assemble(m2_tot),
    )


def render_tiled_wh(
    width: int,
    height: int,
    prep: Preprocessed,
    bg: jnp.ndarray,
    near: float = NEAR_N,
    far: float = FAR_N,
    tile_k: int = TILE_K,
    tile_batch: int = 16,
    buf_size: int | None = None,
    rows_are_depth_ranks: bool = False,
    max_tiles_per_splat: int = MAX_TILES_PER_SPLAT,
    ellipse_prune: bool = True,
    compact_width: int = COMPACT_W,
) -> Tuple[jnp.ndarray, ...]:
    binning = bin_splats(prep, width, height, buf_size=buf_size,
                         max_tiles_per_splat=max_tiles_per_splat,
                         rows_are_depth_ranks=rows_are_depth_ranks,
                         ellipse_prune=ellipse_prune,
                         compact_width=compact_width)
    return _render_tiles(
        prep, binning, bg, width, height, near, far, tile_k, tile_batch,
    ) + (binning.n_dropped, binning.n_overflow)


def render_tiled(
    camera,
    prep: Preprocessed,
    bg: jnp.ndarray,
    near: float = NEAR_N,
    far: float = FAR_N,
    tile_k: int = TILE_K,
    tile_batch: int = 16,
    buf_size: int | None = None,
    rows_are_depth_ranks: bool = False,
    max_tiles_per_splat: int = MAX_TILES_PER_SPLAT,
    ellipse_prune: bool = True,
    compact_width: int = COMPACT_W,
) -> Tuple[jnp.ndarray, ...]:
    return render_tiled_wh(
        camera.width, camera.height, prep, bg, near, far, tile_k, tile_batch,
        buf_size, rows_are_depth_ranks, max_tiles_per_splat, ellipse_prune,
        compact_width,
    )
