"""MASt3R-SfM: sparse global alignment of two-view pointmaps.

JAX re-build of the reference's sparse_global_alignment
(mast3r/mast3r/cloud_opt/sparse_ga.py:119-520 + run_mast3r.py wiring):

1. Per pair, symmetric MASt3R inference + reciprocal-NN correspondences
   (priors/mast3r.py).
2. Canonical per-image depthmaps: confidence-weighted average of each image's
   self-pointmaps across its pairs; focal estimated from the pointmap
   (dust3r post_process.estimate_focal semantics: weiszfeld-style median of
   pixel-ray ratios).
3. Pose graph init: maximum-spanning-tree over pair confidence scores
   (sparse_ga.py:150-180), relative poses from Umeyama alignment of the
   shared pointmaps, composed root-out.
4. Two Adam phases over per-image parameters (unit quaternion, translation,
   log-focal, log-depth-scale): a confidence-weighted gamma(1.5) 3D matching
   loss (loss_3d, :404-432), then a gamma(0.5) 2D reprojection refinement
   (loss_2d, :434-448), cosine LR schedule, quats renormalized each step
   (:450-481). Calibrated ("posed") mode freezes intrinsics and aligns the
   result to known camera locations by a similarity transform
   (run_mast3r.py:696-745).

Parameterization matches the reference: poses are a *kinematic chain* along
the MST (per-image quaternion/translation relative to the tree parent,
composed root-out inside the loss — sparse_ga.py:307-317), and canonical
depths carry **per-anchor log offsets** on a stride-8 grid (the reference's
core_depth anchor offsets, sparse_ga.py:211-…) bilinearly upsampled at
correspondence lookups, on top of one global log-scale per image. Optional
shared intrinsics (log-mean focal, sparse_ga.py:269-277) and per-image
freezing of the relative pose parameters (sparse_ga.py:489-508) round out
the reference's option surface.

Everything inside `fit` is two jitted Adam loops over static-shape padded
correspondence tensors; pair inference batches shard over the device mesh.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from g4splat_tpu.core.transforms import quat_to_rotmat, rotmat_to_quat

# Steady-state per-iteration seconds of the last sparse_global_alignment
# call, per optimization phase (compile-free: the clock starts after step 0).
# Profiling aid consumed by scripts/probe_scaling.py for BUDGET.md's
# iteration-scaling extrapolation; cleared at the start of every call.
LAST_STATS: Dict[str, float] = {}


# ---------------------------------------------------------------- primitives
def estimate_focal_from_pointmap(pts3d: np.ndarray) -> float:
    """Focal (pixels) from a self-pointmap (dust3r estimate_focal: median of
    principal-ray-relative pixel/tangent ratios)."""
    H, W, _ = pts3d.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys, xs = np.mgrid[:H, :W]
    u = xs - cx
    v = ys - cy
    z = np.maximum(pts3d[..., 2], 1e-8)
    x = pts3d[..., 0]
    y = pts3d[..., 1]
    fx = u * z / np.where(np.abs(x) < 1e-8, 1e-8, x)
    fy = v * z / np.where(np.abs(y) < 1e-8, 1e-8, y)
    f = np.concatenate([fx[np.abs(x) > 1e-3], fy[np.abs(y) > 1e-3]])
    f = f[f > 0]
    return float(np.median(f)) if len(f) else float(max(H, W))


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Similarity transform aligning src → dst: returns (s, R, t)."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def maximum_spanning_tree(n: int, edges: Dict[Tuple[int, int], float]):
    """Prim's algorithm on pair scores → list of (parent, child) rooted at the
    best-connected node (sparse_ga.py:150-180 intent)."""
    if n == 1:
        return 0, []
    score = np.zeros(n)
    for (i, j), w in edges.items():
        score[i] += w
        score[j] += w
    root = int(np.argmax(score))
    in_tree = {root}
    out = []
    while len(in_tree) < n:
        best = None
        for (i, j), w in edges.items():
            if (i in in_tree) == (j in in_tree):
                continue
            if best is None or w > best[0]:
                parent, child = (i, j) if i in in_tree else (j, i)
                best = (w, parent, child)
        if best is None:  # disconnected graph: attach arbitrarily
            rest = set(range(n)) - in_tree
            child = rest.pop()
            out.append((root, child))
            in_tree.add(child)
            continue
        out.append((best[1], best[2]))
        in_tree.add(best[2])
    return root, out


def build_kinematic_tree(
    n: int, edges: Dict[Tuple[int, int], float], linkage: str = "ward"
) -> Tuple[int, List[Tuple[int, int]]]:
    """Shallow kinematic tree via ward hierarchical clustering — the
    reference's default kinematic_mode='hclust-ward' (sparse_ga.py:150-180):
    each merge connects the two clusters' *representatives* (the node with
    the larger total affinity), so hub nodes form and the tree depth stays
    ~log n instead of Prim's worst-case path. Returns (root, [(parent,
    child)…]) in parent-before-child order.
    """
    if n == 1:
        return 0, []
    pws = np.zeros((n, n))
    smax = max(edges.values()) if edges else 1.0
    for (i, j), w in edges.items():
        pws[i, j] = pws[j, i] = min(w / max(smax, 1e-12), 1.0)
    np.fill_diagonal(pws, 1.0)
    dist = np.where(pws > 0, 1.0 - pws, 2.0)
    np.fill_diagonal(dist, 0.0)

    import scipy.cluster.hierarchy as sch

    Z = sch.linkage(sch.distance.squareform(dist, checks=False),
                    method=linkage)
    tree_edges = []
    new_to_old = {i: i for i in range(n)}
    pws_run = pws.copy()
    for k, (a, b) in enumerate(Z[:, :2].astype(int)):
        a = new_to_old[a]
        b = new_to_old[b]
        tree_edges.append((a, b))
        best = a if pws_run[a].sum() > pws_run[b].sum() else b
        new_to_old[n + k] = best
        pws_run[best] = np.maximum(pws_run[a], pws_run[b])

    root = int(np.argmax(pws.sum(axis=1)))
    # Orient the undirected merge edges away from the root (BFS).
    adj = [[] for _ in range(n)]
    for a, b in tree_edges:
        adj[a].append(b)
        adj[b].append(a)
    seen = {root}
    order = [root]
    out = []
    qi = 0
    while qi < len(order):
        u = order[qi]
        qi += 1
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                order.append(v)
                out.append((u, v))
    # Disconnected safety: attach leftovers to the root.
    for v in range(n):
        if v not in seen:
            seen.add(v)
            out.append((root, v))
    return root, out


def _parent_array(n: int, root: int, tree) -> np.ndarray:
    parent = np.full(n, -1, np.int64)
    for par, child in tree:
        parent[child] = par
    return parent


def _topo_order(root: int, tree) -> List[int]:
    """Root-out order (Prim's output is already parent-before-child)."""
    return [root] + [child for _, child in tree]


def gamma_loss(x: jnp.ndarray, gamma: float, eps: float = 1e-8) -> jnp.ndarray:
    """|x|^gamma with safe gradient (reference gamma losses,
    mast3r/utils/losses.py semantics)."""
    return (x + eps) ** gamma


# ------------------------------------------------------------------ problem
class PairData(NamedTuple):
    i: int
    j: int
    xy_i: np.ndarray       # (M, 2) pixel coords in image i
    xy_j: np.ndarray       # (M, 2)
    conf: np.ndarray       # (M,)
    score: float           # pair strength (Σ conf)
    T_ji: Optional[np.ndarray] = None  # (4, 4) cam-j→cam-i rigid estimate
    # DUSt3R regression fallback targets (sparse_ga.py:390-402): image-i
    # pixels and their predicted 3D in camera-j's frame (X12), used when the
    # pair has no reliable correspondences (max conf ≤ matching_conf_thr).
    xy_reg: Optional[np.ndarray] = None    # (K, 2) pixels in image i
    pts_reg: Optional[np.ndarray] = None   # (K, 3) cam-j-frame points
    conf_reg: Optional[np.ndarray] = None  # (K,)


@dataclass
class SfMConfig:
    niter1: int = 500            # coarse 3D phase (reference 1000 @ lr .07)
    niter2: int = 500            # 2D refine phase (reference 1000 @ lr .01)
    lr1: float = 0.07
    lr2: float = 0.014
    gamma1: float = 1.5
    gamma2: float = 0.5
    max_corres_per_pair: int = 2048
    optimize_intrinsics: bool = True
    fix_poses: bool = False      # posed mode: keep provided poses frozen
    anchor_stride: int = 8       # per-anchor depth-offset grid (subsample=8)
    optimize_depth_offsets: bool = True
    depth_offset_lr_mult: float = 0.1   # offsets refine, poses explain
    shared_intrinsics: bool = False     # one focal for all views
                                        # (sparse_ga.py:269-277)
    optimize_pp: bool = False           # principal point, ±10 px
                                        # (sparse_ga.py make_K_cam_depth)
    matching_conf_thr: float = 5.0      # pairs below fall back to DUSt3R
    loss_dust3r_w: float = 0.01         # regression fallback weight
    gamma_d: float = 1.1                # fallback gamma (sparse_ga.py:200)
    max_reg_points: int = 1024


class SfMResult(NamedTuple):
    w2c: np.ndarray          # (V, 4, 4)
    focals: np.ndarray       # (V,)
    depthmaps: np.ndarray    # (V, h, w) optimized (scaled) canonical depths
    losses: List[float]


def _backproject_param(depth, focal, H, W):
    """(h, w) depth + focal → camera-space points on the pixel grid."""
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    x = (xs - cx) / focal * depth
    y = (ys - cy) / focal * depth
    return jnp.stack([x, y, depth], axis=-1)


def sparse_global_alignment(
    canonical_depths: np.ndarray,    # (V, h, w) canonical per-image depths
    init_focals: np.ndarray,         # (V,)
    pairs: Sequence[PairData],
    cfg: SfMConfig = SfMConfig(),
    init_w2c: Optional[np.ndarray] = None,   # (V, 4, 4) calibrated init
    freeze: Optional[np.ndarray] = None,     # (V,) bool — per-image freeze
                                             # (sparse_ga.py:395,489-508)
) -> SfMResult:
    V, H, W = canonical_depths.shape
    freeze_mask = (
        jnp.asarray(freeze, bool) if freeze is not None
        else jnp.zeros(V, bool)
    )

    # ---- kinematic tree over pair scores (hclust-ward, the reference
    # default; shared by pose init + chain parameterization) ----
    edges = {(p.i, p.j): p.score for p in pairs}
    root, tree = build_kinematic_tree(V, edges)

    # ---- pose init: Umeyama relative poses composed along the tree ----
    if init_w2c is None:
        rel = {(p.i, p.j): p.T_ji for p in pairs if p.T_ji is not None}
        c2w = [None] * V
        c2w[root] = np.eye(4)
        for par, child in tree:
            T = None
            if (par, child) in rel:
                T = rel[(par, child)]             # child cam → parent cam
            elif (child, par) in rel:
                T = np.linalg.inv(rel[(child, par)])
            if T is None:
                T = np.eye(4)
            c2w[child] = c2w[par] @ T
        w2c0 = np.stack([np.linalg.inv(m) for m in c2w])
    else:
        w2c0 = np.asarray(init_w2c, np.float64).copy()

    # ---- kinematic chain along the MST (sparse_ga.py:307-317) ----
    # w2c_v = T_rel(v) @ w2c_parent(v); the root holds its absolute pose.
    # Prim's output is parent-before-child, so one root-out pass composes it.
    T_rel0 = np.zeros((V, 4, 4))
    T_rel0[root] = w2c0[root]
    for par, child in tree:
        T_rel0[child] = w2c0[child] @ np.linalg.inv(w2c0[par])

    quats0 = np.stack(
        [rotmat_to_quat(jnp.asarray(m[:3, :3])) for m in T_rel0]
    )
    trans0 = T_rel0[:, :3, 3]

    # ---- padded correspondence tensors ----
    P = len(pairs)
    M = cfg.max_corres_per_pair
    xi = np.zeros((P, M, 2), np.float32)
    xj = np.zeros((P, M, 2), np.float32)
    cw = np.zeros((P, M), np.float32)
    pij = np.zeros((P, 2), np.int32)
    for k, p in enumerate(pairs):
        m = min(M, len(p.conf))
        order = np.argsort(p.conf)[::-1][:m]
        xi[k, :m] = p.xy_i[order]
        xj[k, :m] = p.xy_j[order]
        cw[k, :m] = p.conf[order]
        pij[k] = (p.i, p.j)
    cw = cw / max(cw.sum(), 1e-8) * (cw > 0).sum()   # normalize weights

    # Per-anchor depth-offset grid (the reference's core_depth offsets at
    # subsample=8) — log-multiplicative, bilinearly upsampled at lookups.
    stride = max(1, int(cfg.anchor_stride))
    Gh = (H - 1) // stride + 2
    Gw = (W - 1) // stride + 2

    params = {
        "quat": jnp.asarray(quats0, jnp.float32),
        "trans": jnp.asarray(trans0, jnp.float32),
        "log_focal": jnp.log(jnp.asarray(init_focals, jnp.float32)),
        "log_scale": jnp.zeros(V),
        "log_doff": jnp.zeros((V, Gh, Gw)),
        "pp": jnp.zeros((V, 2)),   # principal-point offset from center, px
    }
    depths0 = jnp.asarray(canonical_depths, jnp.float32)
    xi_j = jnp.asarray(xi)
    xj_j = jnp.asarray(xj)
    cw_j = jnp.asarray(cw)
    pij_j = jnp.asarray(pij)
    parent_j = tuple(int(parent_of) for parent_of in _parent_array(V, root, tree))
    topo_j = tuple(_topo_order(root, tree))

    def compose_chain(params):
        """Relative (quat, trans) along the MST → absolute w2c (R, t) arrays.
        V ≤ ~20, so the root-out composition unrolls inside jit."""
        R_rel = quat_to_rotmat(params["quat"])       # (V, 3, 3)
        t_rel = params["trans"]                      # (V, 3)
        R_abs = [None] * V
        t_abs = [None] * V
        for v in topo_j:
            p = parent_j[v]
            if p < 0:
                R_abs[v] = R_rel[v]
                t_abs[v] = t_rel[v]
            else:
                # w2c_v = T_rel @ w2c_p:  R = R_rel R_p,  t = R_rel t_p + t_rel
                R_abs[v] = R_rel[v] @ R_abs[p]
                t_abs[v] = R_rel[v] @ t_abs[p] + t_rel[v]
        return jnp.stack(R_abs), jnp.stack(t_abs)

    def depth_offset_at(params, view_idx, xy):
        """Bilinear per-anchor log offset at pixel coords xy (P, M, 2)."""
        gx = jnp.clip(xy[..., 0], 0, W - 1) / stride
        gy = jnp.clip(xy[..., 1], 0, H - 1) / stride
        x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, Gw - 2)
        y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, Gh - 2)
        wx = gx - x0
        wy = gy - y0
        g = params["log_doff"]
        g = g - jnp.mean(g, axis=(1, 2), keepdims=True)
        vi = view_idx[:, None]
        return (
            g[vi, y0, x0] * (1 - wx) * (1 - wy)
            + g[vi, y0, x0 + 1] * wx * (1 - wy)
            + g[vi, y0 + 1, x0] * (1 - wx) * wy
            + g[vi, y0 + 1, x0 + 1] * wx * wy
        )

    def pp_of(params, view_idx):
        """Principal point: image center plus a clipped learnable offset
        (the reference clips pp to ±10 px around the center)."""
        base = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0])
        off = jnp.clip(params["pp"][view_idx], -10.0, 10.0)
        return base[None, :] + off

    def focal_of(params, view_idx):
        """Per-view focal, or the shared confidence-weighted aggregate
        (log-mean) when cfg.shared_intrinsics."""
        if cfg.shared_intrinsics:
            return jnp.exp(
                jnp.broadcast_to(jnp.mean(params["log_focal"]),
                                 view_idx.shape)
            )
        return jnp.exp(params["log_focal"][view_idx])

    def world_points(params, R_abs, t_abs, view_idx, xy):
        """Lift pixels of `view_idx` (per pair) to world points. xy (P, M, 2)."""
        R = R_abs[view_idx]                          # (P, 3, 3) w2c
        t = t_abs[view_idx]                          # (P, 3)
        f = focal_of(params, view_idx)               # (P,)
        # Global scale is gauge for the matching losses (shrinking the whole
        # scene shrinks every distance, so the gamma loss would collapse it):
        # pin it like the reference's 1/min(sizes) normalization
        # (sparse_ga.py:298-300) by anchoring the smallest per-image scale
        # at 1. The offset grid is likewise centered per image so scale
        # lives only in log_scale.
        ls = params["log_scale"] - jnp.min(params["log_scale"])
        s = jnp.exp(ls[view_idx])
        # bilinear depth lookup at xy
        x = jnp.clip(xy[..., 0], 0, W - 1)
        y = jnp.clip(xy[..., 1], 0, H - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        wx = x - x0
        wy = y - y0
        d = depths0[view_idx[:, None], y0, x0] * (1 - wx) * (1 - wy) \
            + depths0[view_idx[:, None], y0, x0 + 1] * wx * (1 - wy) \
            + depths0[view_idx[:, None], y0 + 1, x0] * (1 - wx) * wy \
            + depths0[view_idx[:, None], y0 + 1, x0 + 1] * wx * wy
        d = d * s[:, None] * jnp.exp(depth_offset_at(params, view_idx, xy))
        pp = pp_of(params, view_idx)                 # (P, 2)
        pc = jnp.stack(
            [
                (xy[..., 0] - pp[:, None, 0]) / f[:, None] * d,
                (xy[..., 1] - pp[:, None, 1]) / f[:, None] * d,
                d,
            ],
            axis=-1,
        )  # camera-space (P, M, 3)
        # world = R⁻¹ (pc − t)
        Rt = jnp.swapaxes(R, -1, -2)
        return jnp.einsum("pab,pmb->pma", Rt, pc - t[:, None, :])

    def project(params, R_abs, t_abs, view_idx, pts_world):
        R = R_abs[view_idx]
        t = t_abs[view_idx]
        f = focal_of(params, view_idx)
        pc = jnp.einsum("pab,pmb->pma", R, pts_world) + t[:, None, :]
        z = jnp.maximum(pc[..., 2], 1e-6)
        pp = pp_of(params, view_idx)
        return jnp.stack(
            [pc[..., 0] / z * f[:, None] + pp[:, None, 0],
             pc[..., 1] / z * f[:, None] + pp[:, None, 1]],
            axis=-1,
        ), pc[..., 2]

    # ---- DUSt3R regression fallback for correspondence-starved pairs
    # (loss_dust3r, sparse_ga.py:390-402): pull image-i anchor points toward
    # image-j's cross prediction of them, expressed in world via j's pose.
    weak = [
        p for p in pairs
        if p.xy_reg is not None
        and (len(p.conf) == 0 or p.conf.max() <= cfg.matching_conf_thr)
    ]
    if weak:
        K = cfg.max_reg_points
        Pw = len(weak)
        rxy = np.zeros((Pw, K, 2), np.float32)
        rpts = np.zeros((Pw, K, 3), np.float32)
        rcw = np.zeros((Pw, K), np.float32)
        rij = np.zeros((Pw, 2), np.int32)
        for k, p in enumerate(weak):
            m = min(K, len(p.conf_reg))
            sel = np.argsort(p.conf_reg)[::-1][:m]
            rxy[k, :m] = p.xy_reg[sel]
            rpts[k, :m] = p.pts_reg[sel]
            rcw[k, :m] = p.conf_reg[sel]
            both_frozen = bool(freeze_mask[p.i]) and bool(freeze_mask[p.j])
            if both_frozen:
                rcw[k] = 0.0
            rij[k] = (p.i, p.j)
        rxy_j = jnp.asarray(rxy)
        rpts_j = jnp.asarray(rpts)
        rcw_j = jnp.asarray(rcw)
        rij_j = jnp.asarray(rij)

        def loss_reg(params, R_abs, t_abs):
            wi = world_points(params, R_abs, t_abs, rij_j[:, 0], rxy_j)
            Rj = R_abs[rij_j[:, 1]]
            tj = t_abs[rij_j[:, 1]]
            # cam-j → world: Rᵀ (p − t)
            tgt = jnp.einsum(
                "pba,pmb->pma", Rj, rpts_j - tj[:, None, :]
            )
            d = jnp.linalg.norm(wi - tgt, axis=-1)
            num = jnp.sum(rcw_j * gamma_loss(d, cfg.gamma_d))
            den = jnp.maximum(jnp.sum(rcw_j), 1e-8)
            return num / den
    else:

        def loss_reg(params, R_abs, t_abs):
            return 0.0

    def loss_3d(params):
        R_abs, t_abs = compose_chain(params)
        wi = world_points(params, R_abs, t_abs, pij_j[:, 0], xi_j)
        wj = world_points(params, R_abs, t_abs, pij_j[:, 1], xj_j)
        d = jnp.linalg.norm(wi - wj, axis=-1)
        main = jnp.sum(cw_j * gamma_loss(d, cfg.gamma1)) / jnp.maximum(
            (cw_j > 0).sum(), 1)
        return main + cfg.loss_dust3r_w * loss_reg(params, R_abs, t_abs)

    def loss_2d(params):
        R_abs, t_abs = compose_chain(params)
        wi = world_points(params, R_abs, t_abs, pij_j[:, 0], xi_j)
        wj = world_points(params, R_abs, t_abs, pij_j[:, 1], xj_j)
        pj, zj = project(params, R_abs, t_abs, pij_j[:, 1], wi)
        pi, zi = project(params, R_abs, t_abs, pij_j[:, 0], wj)
        res = float(max(H, W))
        e1 = jnp.linalg.norm(pj - xj_j, axis=-1) / res
        e2 = jnp.linalg.norm(pi - xi_j, axis=-1) / res
        valid1 = (zj > 1e-3).astype(jnp.float32)
        valid2 = (zi > 1e-3).astype(jnp.float32)
        total = jnp.sum(cw_j * (gamma_loss(e1, cfg.gamma2) * valid1
                                + gamma_loss(e2, cfg.gamma2) * valid2))
        main = total / jnp.maximum(2 * (cw_j > 0).sum(), 1)
        return main + cfg.loss_dust3r_w * loss_reg(params, R_abs, t_abs)

    losses = []
    LAST_STATS.clear()
    for phase, (loss_fn, lr, niter) in enumerate(
        [(loss_3d, cfg.lr1, cfg.niter1), (loss_2d, cfg.lr2, cfg.niter2)]
    ):
        if niter == 0:
            continue
        sched = optax.cosine_decay_schedule(lr, niter)
        opt = optax.adam(sched, b1=0.9, b2=0.9)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            l, g = jax.value_and_grad(loss_fn)(params)
            g = dict(g)
            if cfg.fix_poses:
                g["quat"] = jnp.zeros_like(g["quat"])
                g["trans"] = jnp.zeros_like(g["trans"])
            else:
                # Per-image freezing (calibrated subset): a frozen image's
                # *relative* pose moves it whenever an ancestor moves, so
                # only sensible with freeze sets that are tree-prefixes
                # (the calibrated-init case: root + calibrated neighbors).
                fm = freeze_mask[:, None].astype(jnp.float32)
                g["quat"] = g["quat"] * (1.0 - fm)
                g["trans"] = g["trans"] * (1.0 - fm)
                g["log_scale"] = g["log_scale"] * (1.0 - fm[:, 0])
            if not cfg.optimize_intrinsics:
                g["log_focal"] = jnp.zeros_like(g["log_focal"])
            if not (cfg.optimize_pp and cfg.optimize_intrinsics):
                g["pp"] = jnp.zeros_like(g["pp"])
            mult = (cfg.depth_offset_lr_mult
                    if cfg.optimize_depth_offsets else 0.0)
            g["log_doff"] = g["log_doff"] * mult
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            # Renormalize quaternions in place (:450-481).
            params["quat"] = params["quat"] / jnp.linalg.norm(
                params["quat"], axis=-1, keepdims=True
            )
            return params, opt_state, l

        t_ss = None
        for it in range(niter):
            params, opt_state, l = step(params, opt_state)
            if it == 0:
                # Steady-state clock starts after the compile-carrying first
                # step (BUDGET.md's iteration-scaling extrapolation input).
                jax.block_until_ready(l)
                t_ss = time.perf_counter()
            if it % max(1, niter // 10) == 0:
                losses.append(float(l))
        if niter > 1:
            jax.block_until_ready(l)
            LAST_STATS[f"phase{phase + 1}_s_per_iter"] = (
                time.perf_counter() - t_ss) / (niter - 1)
            LAST_STATS[f"phase{phase + 1}_iters"] = niter

    R_abs, t_abs = jax.jit(compose_chain)(params)
    if cfg.shared_intrinsics:
        focals = np.full(V, float(np.exp(np.asarray(
            params["log_focal"]).mean())), np.float32)
    else:
        focals = np.exp(np.asarray(params["log_focal"]))
    ls = np.asarray(params["log_scale"])
    scales = np.exp(ls - ls.min())
    w2c = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    w2c[:, :3, :3] = np.asarray(R_abs)
    w2c[:, :3, 3] = np.asarray(t_abs)

    # Full-resolution per-anchor offsets applied to the returned depths (the
    # same bilinear grid the optimizer saw).
    ys, xs = np.mgrid[:H, :W].astype(np.float32)
    gx = xs / stride
    gy = ys / stride
    x0 = np.clip(np.floor(gx).astype(np.int64), 0, Gw - 2)
    y0 = np.clip(np.floor(gy).astype(np.int64), 0, Gh - 2)
    wx = gx - x0
    wy = gy - y0
    g = np.asarray(params["log_doff"])
    g = g - g.mean(axis=(1, 2), keepdims=True)
    off = (
        g[:, y0, x0] * (1 - wx) * (1 - wy)
        + g[:, y0, x0 + 1] * wx * (1 - wy)
        + g[:, y0 + 1, x0] * (1 - wx) * wy
        + g[:, y0 + 1, x0 + 1] * wx * wy
    )
    depthmaps = canonical_depths * scales[:, None, None] * np.exp(off)
    return SfMResult(w2c, focals, depthmaps.astype(np.float32), losses)


def align_to_calibrated_locations(
    result: SfMResult, target_centers: np.ndarray
) -> SfMResult:
    """Similarity-align estimated camera centers to calibrated ones
    (run_mast3r.py:696-745 camera-location alignment). Depth scales follow."""
    V = result.w2c.shape[0]
    centers = np.stack([np.linalg.inv(m)[:3, 3] for m in result.w2c])
    s, R, t = umeyama(centers, target_centers, with_scale=True)
    new_w2c = []
    for m in result.w2c:
        c2w = np.linalg.inv(m)
        c2w_new = np.eye(4)
        c2w_new[:3, :3] = R @ c2w[:3, :3]
        c2w_new[:3, 3] = s * R @ c2w[:3, 3] + t
        new_w2c.append(np.linalg.inv(c2w_new))
    return SfMResult(
        np.stack(new_w2c).astype(np.float32),
        result.focals,
        result.depthmaps * s,
        result.losses,
    )


# ------------------------------------------------------- pipeline assembly
def build_pairs_exhaustive(n: int) -> List[Tuple[int, int]]:
    """All view pairs — the ≤20-view regime this pipeline targets (the
    reference's ASMK retrieval graph only matters for large collections;
    scene_graph='retrieval' falls back to this below its shortlist size)."""
    return [(i, j) for i in range(n) for j in range(i + 1, n)]


def _avg_angle_depth(preds, subsample: int = 8) -> np.ndarray:
    """Reference canonical_view(mode='avg-angle') (sparse_ga.py:875-913).

    Per prediction, express every pixel's depth as the ELEVATION ANGLE
    relative to its subsample-block's center point (radius from the xy
    pointmap); average angles with conf weights; reconstruct depth as
    block-center canon depth + mean_radius·tan(avg_angle). A constant
    per-prediction depth bias shifts z and z_center equally, so the angle —
    unlike the plain z-average — cancels it within each block; absolute
    scale comes from the canonical block centers only.

    preds: list of (pts3d (H, W, 3), conf (H, W)) predictions of ONE view.
    Returns the (H, W) canonical depth.
    """
    H, W = preds[0][0].shape[:2]
    s = subsample
    while s > 1 and (H % s or W % s):
        s //= 2
    pts = np.stack([p for p, _ in preds])                 # (K, H, W, 3)
    w = np.maximum(np.stack([c for _, c in preds]) - 0.999, 1e-8)
    canon_z = (w * pts[..., 2]).sum(0) / w.sum(0)
    if s <= 1:
        return canon_z
    Hb, Wb = H // s, W // s

    def blockify(x):                                       # (K,H,W)→(K,Hb,s,Wb,s)
        return x.reshape(x.shape[0], Hb, s, Wb, s)

    cyx = (slice(s // 2, None, s), slice(s // 2, None, s))
    xy = pts[..., :2]
    xy_c = xy[:, cyx[0], cyx[1]]                           # (K, Hb, Wb, 2)
    z_c = pts[:, cyx[0], cyx[1], 2]                        # (K, Hb, Wb)
    dxy = (blockify(xy[..., 0]) - xy_c[..., 0][:, :, None, :, None],
           blockify(xy[..., 1]) - xy_c[..., 1][:, :, None, :, None])
    radius = np.maximum(np.sqrt(dxy[0] ** 2 + dxy[1] ** 2), 1e-8)
    dz = blockify(pts[..., 2]) - z_c[:, :, None, :, None]
    angle = np.arctan(dz / radius)
    wb = blockify(w)
    avg_angle = (wb * angle).sum(0) / wb.sum(0)
    rel = radius.mean(0) * np.tan(avg_angle)               # (Hb, s, Wb, s)
    out = canon_z[cyx][:, None, :, None] + rel
    return out.reshape(H, W)


def canonical_views_from_pairs(
    V: int,
    pair_outputs: Dict[Tuple[int, int], Tuple],
    mode: str = "avg-z",
    return_confs: bool = False,
):
    """Confidence-weighted canonical depths + focal init per image
    (prepare_canonical_data, sparse_ga.py:692-…): average the z of every
    self-pointmap prediction (X11 when the image is first, X22 when second).

    mode="avg-angle" uses the reference's block-angle canonicalization
    (canonical_view mode='avg-angle', sparse_ga.py:895-908) instead of the
    plain z-average — robust to per-prediction depth bias (ablation:
    scripts/ablate_canonical.py; numbers in PARITY.md)."""
    if mode == "avg-angle":
        per_view = {}
        for (i, j), (out11, out21, out22, out12) in pair_outputs.items():
            for v, out in ((i, out11), (j, out22)):
                per_view.setdefault(v, []).append(
                    (np.asarray(out["pts3d"][0]), np.asarray(out["conf"][0])))
        depths_aa = np.stack(
            [np.maximum(_avg_angle_depth(per_view[v]), 1e-3)
             for v in range(V)])
        # Focals (and confs) follow the same path as avg-z below.
        rest = canonical_views_from_pairs(V, pair_outputs, mode="avg-z",
                                          return_confs=return_confs)
        if return_confs:
            return depths_aa.astype(np.float32), rest[1], rest[2]
        return depths_aa.astype(np.float32), rest[1]
    depth_acc = {}
    conf_acc = {}
    count = {}
    example = None
    for (i, j), (out11, out21, out22, out12) in pair_outputs.items():
        for v, out in ((i, out11), (j, out22)):
            z = np.asarray(out["pts3d"][0, ..., 2])
            c = np.asarray(out["conf"][0])
            if example is None:
                example = z
            depth_acc.setdefault(v, np.zeros_like(z))
            conf_acc.setdefault(v, np.zeros_like(c))
            depth_acc[v] += z * c
            conf_acc[v] += c
            count[v] = count.get(v, 0) + 1
    H, W = example.shape
    depths = np.zeros((V, H, W), np.float32)
    focals = np.zeros(V, np.float32)
    for v in range(V):
        d = depth_acc[v] / np.maximum(conf_acc[v], 1e-8)
        # Predicted pointmaps should be in front of the camera; clamp guards
        # downstream geometry against untrained/degenerate outputs.
        depths[v] = np.maximum(d, 1e-3)
        pts = None
        # focal from the canonical pointmap of any pair where v was first.
        for (i, j), (out11, _, out22, _) in pair_outputs.items():
            if i == v:
                pts = np.asarray(out11["pts3d"][0])
                break
            if j == v:
                pts = np.asarray(out22["pts3d"][0])
                break
        focals[v] = estimate_focal_from_pointmap(pts)
    if return_confs:
        confs = np.stack([conf_acc[v] / max(count[v], 1) for v in range(V)])
        return depths, focals, confs.astype(np.float32)
    return depths, focals


def clean_depth_confidences(
    w2c: np.ndarray,          # (V, 4, 4)
    focals: np.ndarray,       # (V,)
    depthmaps: np.ndarray,    # (V, H, W) optimized depths
    confs: np.ndarray,        # (V, H, W) canonical confidences
    tol: float = 0.001,
    bad_conf: float = 0.0,
) -> np.ndarray:
    """Cross-view depth-consistency cleanup — the reference's
    ``clean_depth=True`` path (clean_pointcloud,
    dust3r/dust3r/cloud_opt/base_opt.py:370-405, applied inside
    get_dense_pts3d at sparse_ga.py:91-92 and always on in production,
    run_mast3r.py:253).

    A pixel whose 3D point lands strictly IN FRONT of another view's depth
    surface (by more than ``tol`` relative) while being LESS confident than
    that view's pixel is a floater: its confidence is clipped to
    ``bad_conf`` so the COLMAP writeout's ``output_conf_thr`` filter drops
    it (run_mast3r.py:803-805). Vectorized per view pair; cameras are the
    writeout convention (centered principal point, fx == fy).
    """
    V, H, W = depthmaps.shape
    res = np.asarray(confs, np.float32).copy()
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    pts_w = np.empty((V, H * W, 3), np.float32)
    for i in range(V):
        z = depthmaps[i]
        pc = np.stack([(xs - cx) / focals[i] * z,
                       (ys - cy) / focals[i] * z, z], -1).reshape(-1, 3)
        c2w = np.linalg.inv(w2c[i])
        pts_w[i] = pc @ c2w[:3, :3].T + c2w[:3, 3]
    for i in range(V):
        for j in range(V):
            if i == j:
                continue
            pj = pts_w[i] @ np.asarray(w2c[j][:3, :3]).T + w2c[j][:3, 3]
            zj = pj[:, 2]
            safe = np.where(zj > 1e-9, zj, 1.0)
            u = np.round(pj[:, 0] / safe * focals[j] + cx).astype(np.int64)
            v = np.round(pj[:, 1] / safe * focals[j] + cy).astype(np.int64)
            msk = (zj > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            idx = np.where(msk)[0]
            ui, vi = u[idx], v[idx]
            ri = res[i].reshape(-1)
            # Same progressive-update semantics as the reference (res is
            # compared, not the original confs).
            bad = ((zj[idx] < (1.0 - tol) * depthmaps[j][vi, ui])
                   & (ri[idx] < res[j][vi, ui]))
            ri[idx[bad]] = np.minimum(ri[idx[bad]], bad_conf)
            res[i] = ri.reshape(H, W)
    return res


def relative_pose_from_pair(out11, out22, out12, conf_thresh: float = 1.5):
    """cam-j→cam-i rigid estimate: Umeyama-align j's self points (frame j) to
    j's points expressed in frame i (X12)."""
    pj = np.asarray(out22["pts3d"][0]).reshape(-1, 3)
    pj_in_i = np.asarray(out12["pts3d"][0]).reshape(-1, 3)
    c = np.minimum(
        np.asarray(out22["conf"][0]).reshape(-1),
        np.asarray(out12["conf"][0]).reshape(-1),
    )
    keep = c > conf_thresh
    if keep.sum() < 10:
        keep = np.argsort(c)[-100:]
    s, R, t = umeyama(pj[keep], pj_in_i[keep], with_scale=False)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


# -------------------------------------------------- posed-mode rectification
def rectify_to_center_pp(images: np.ndarray, cameras):
    """Resample calibrated images so the principal point is centered and
    fx == fy, keeping the original (H, W) (run_mast3r.py:441-600).

    The reference crops each image symmetrically around the principal point
    (tar_pp = min(pp, size - pp)), averages the focals, and remaps with
    cv2.initUndistortRectifyMap (zero distortion). Here the symmetric crop is
    additionally trimmed to the original aspect ratio so one bilinear remap
    lands directly on (H, W) with a single shared focal — same pp=center /
    fx=fy contract, no second resize.

    Returns (images', cameras') where cameras' have cx=(W-1)/2, cy=(H-1)/2,
    fx=fy. Views already in that form pass through untouched.
    """
    from g4splat_tpu.core.cameras import make_camera, stack_cameras

    images = np.asarray(images, np.float32)
    V, H, W = images.shape[:3]
    out_imgs = np.empty_like(images)
    out_cams = []
    vt, ut = np.mgrid[:H, :W].astype(np.float32)
    for v in range(V):
        fx = float(cameras.fx[v])
        fy = float(cameras.fy[v])
        cx = float(cameras.cx[v])
        cy = float(cameras.cy[v])
        centered = (abs(cx - (W - 1) / 2) < 1e-3
                    and abs(cy - (H - 1) / 2) < 1e-3 and abs(fx - fy) < 1e-6)
        if centered:
            out_imgs[v] = images[v]
            out_cams.append(make_camera(
                jnp.asarray(cameras.w2c[v]), fx, fy, cx, cy, W, H))
            continue
        # Symmetric half-extents around the pp, trimmed to the W:H aspect.
        hx = min(cx, W - 1 - cx)
        hy = min(cy, H - 1 - cy)
        if hx / max(hy, 1e-6) > W / H:
            hx = hy * W / H
        else:
            hy = hx * H / W
        f = 0.5 * (fx + fy)
        f_t = f * (W - 1) / (2.0 * hx)      # == f * (H-1) / (2*hy)
        # Target pixel (u,v) → ray via K_t⁻¹ → source pixel via K_s.
        x = (ut - (W - 1) / 2) / f_t
        y = (vt - (H - 1) / 2) / f_t
        su = fx * x + cx
        sv = fy * y + cy
        out_imgs[v] = _bilinear_remap(images[v], su, sv)
        out_cams.append(make_camera(
            jnp.asarray(cameras.w2c[v]), f_t, f_t,
            (W - 1) / 2, (H - 1) / 2, W, H))
    return out_imgs, stack_cameras(out_cams)


def _bilinear_remap(img: np.ndarray, su: np.ndarray, sv: np.ndarray):
    """Sample img at float source coords (cv2.remap INTER_LINEAR, border
    clamp)."""
    H, W = img.shape[:2]
    u0 = np.clip(np.floor(su).astype(np.int64), 0, W - 1)
    v0 = np.clip(np.floor(sv).astype(np.int64), 0, H - 1)
    u1 = np.minimum(u0 + 1, W - 1)
    v1 = np.minimum(v0 + 1, H - 1)
    au = np.clip(su - u0, 0.0, 1.0)[..., None]
    av = np.clip(sv - v0, 0.0, 1.0)[..., None]
    top = img[v0, u0] * (1 - au) + img[v0, u1] * au
    bot = img[v1, u0] * (1 - au) + img[v1, u1] * au
    return top * (1 - av) + bot * av
