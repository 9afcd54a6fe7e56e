"""Plane priors: per-view plane segmentation, global 3D plane merging, and
plane-refined depth.

Host-side classical CV re-build of the reference's planes package
(2d-gaussian-splatting/planes/): these stages are inherently sequential,
data-dependent, and tiny next to the render/train work, so they stay
numpy/sklearn/scipy (as the reference keeps them on sklearn/cv2); only depth
rendering feeding them runs on TPU.

Components:
- `normals_cluster`            KMeans normal clustering + connected components
                               (plane_excavator.py:23-69)
- `merge_normal_clusters`      cos>0.95 center merging (tools.py:86-115)
- `PlaneExcavator`             intersect segmentation masks (SAM or any
                               pluggable generator) with normal clusters,
                               smallest-mask-first, area-filtered instance map
                               (plane_excavator.py:150-280)
- `merge_global_planes`        greedy covisibility merging of per-view plane
                               masks on shared chart point indices
                               (merge_global_3Dplane.py:100-212)
- `fit_plane_ransac`           RANSAC plane fit with optional prior-normal
                               regularization (refine_depth_with_planes.py:
                               27-119,419-470)
- `compute_plane_aligned_depth` analytic ray-plane intersection depth
                               (refine_depth_with_planes.py:247-330)
- `refine_depths_with_planes`  per-global-plane depth overwrite driver
                               (refine_depth_with_planes.py:472-656)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


# ------------------------------------------------------------- normal cluster
def merge_normal_clusters(pred, sorted_topk, centers, cos_thresh=0.95):
    """Merge clusters whose (normalized) centers agree within cos>0.95."""
    new_pred = pred.copy()
    centers = centers / np.maximum(
        np.linalg.norm(centers, axis=1, keepdims=True), 1e-12)
    num = len(sorted_topk)
    dead = np.zeros(num, bool)
    n_left = num
    for i in range(num):
        if dead[i]:
            continue
        for j in range(i + 1, num):
            if dead[j]:
                continue
            if np.dot(centers[sorted_topk[i]], centers[sorted_topk[j]]) > cos_thresh:
                new_pred[pred == sorted_topk[j]] = sorted_topk[i]
                dead[j] = True
                n_left -= 1
    if n_left != num:
        counts = np.bincount(new_pred)
        topk = np.argpartition(counts, -n_left)[-n_left:]
        sorted_topk = topk[np.argsort(counts[topk])][::-1]
    return new_pred, sorted_topk, n_left


def remove_small_components(mask: np.ndarray, min_size: float) -> np.ndarray:
    """Strip connected components below min_size (scipy.ndimage; replaces the
    cv2 morphology pipeline of tools.py:39-60 with the same intent)."""
    from scipy import ndimage

    cleaned = ndimage.binary_opening(mask, structure=np.ones((3, 3), bool))
    labels, n = ndimage.label(cleaned)
    if n == 0:
        return np.zeros_like(mask)
    sizes = np.bincount(labels.reshape(-1))
    keep = np.zeros(n + 1, bool)
    keep[1:] = sizes[1:] >= min_size
    return keep[labels]


def normals_cluster(
    normals: np.ndarray,
    img_shape: Tuple[int, int],
    n_init_clusters: int = 8,
    n_clusters: int = 6,
    min_size_ratio: float = 0.004,
    seed: int = 0,
) -> List[np.ndarray]:
    """KMeans-cluster pixel normals, merge near-parallel clusters, split into
    connected components; returns a list of (H, W) boolean masks."""
    from scipy import ndimage
    from sklearn.cluster import KMeans

    flat = normals.reshape(-1, 3)
    km = KMeans(n_clusters=n_init_clusters, random_state=seed, n_init=1).fit(flat)
    pred, centers = km.labels_, km.cluster_centers_
    # Merge near-parallel clusters over ALL init clusters first, then keep the
    # top-k (the reference selects top-k before merging, which can drop
    # fragments of a region KMeans split evenly; merging first is strictly
    # more robust and otherwise equivalent).
    counts = np.bincount(pred)
    all_sorted = np.argsort(counts)[::-1]
    pred, sorted_topk, num = merge_normal_clusters(pred, all_sorted, centers)
    num = min(num, n_clusters)

    min_size = img_shape[0] * img_shape[1] * min_size_ratio
    masks = []
    for c in range(num):
        m = (pred == sorted_topk[c]).reshape(img_shape)
        m = m & remove_small_components(m, min_size)
        labels, n = ndimage.label(m)
        for k in range(1, n + 1):
            masks.append(labels == k)
    return masks


def normals_cluster_1d(valid_normals, n_init_clusters=8, n_clusters=6,
                       min_size_ratio=0.004, seed=0):
    """1-D variant over an arbitrary point set
    (refine_depth_with_planes.py:201-245). Returns (masks, centers)."""
    from sklearn.cluster import KMeans

    n = valid_normals.shape[0]
    if n < n_init_clusters:
        return [np.ones(n, bool)], (
            valid_normals.mean(0, keepdims=True)
            / np.linalg.norm(valid_normals.mean(0) + 1e-12)
        )
    km = KMeans(n_clusters=n_init_clusters, random_state=seed, n_init=1).fit(
        valid_normals
    )
    counts = np.bincount(km.labels_)
    topk = np.argpartition(counts, -min(n_clusters, len(counts)))[-n_clusters:]
    sorted_topk = topk[np.argsort(counts[topk])][::-1]
    masks, centers = [], []
    for cid in sorted_topk:
        m = km.labels_ == cid
        if m.sum() < n * min_size_ratio:
            continue
        masks.append(m)
        c = km.cluster_centers_[cid]
        centers.append(c / max(np.linalg.norm(c), 1e-12))
    return masks, np.array(centers)


# --------------------------------------------------------------- plane masks
@dataclass
class PlaneExcavatorConfig:
    min_size_ratio: float = 0.004
    n_init_normal_clusters: int = 8
    n_normal_clusters: int = 6
    num_prompts: int = 256
    max_instances: int = 100


class PlaneExcavator:
    """Per-view plane instance segmentation.

    `mask_generator(image) -> list of (H, W) bool masks` supplies
    over-segmentation proposals (the reference prompts SAM with 256 random
    points and keeps the smallest mask per prompt, mask_generator.py:30-43;
    our SAM port plugs in here). With `mask_generator=None`, normal clusters
    alone become the proposals — the degenerate but dependency-free mode.
    """

    def __init__(self, config: PlaneExcavatorConfig = PlaneExcavatorConfig(),
                 mask_generator: Optional[Callable] = None):
        self.config = config
        self.mask_generator = mask_generator

    def __call__(self, image: np.ndarray, normals: np.ndarray,
                 seg_masks=None):
        """``seg_masks``: optional precomputed SAM proposals for this view
        (the orchestrator batch-encodes the whole view stack through the
        generator's ``.batch`` and passes each view's masks here)."""
        H, W = normals.shape[:2]
        cfg = self.config
        min_size = H * W * cfg.min_size_ratio
        normal_clusters = normals_cluster(
            normals, (H, W), cfg.n_init_normal_clusters,
            cfg.n_normal_clusters, cfg.min_size_ratio,
        )

        if seg_masks is None and self.mask_generator is not None:
            seg_masks = self.mask_generator(image)
        if seg_masks is not None:
            seg_masks = sorted(seg_masks, key=lambda m: m.sum())
        else:
            seg_masks = [np.ones((H, W), bool)]

        # Intersect proposals with normal clusters, smallest proposals first
        # so larger ones overwrite (plane_excavator.py:160-175).
        seg = np.zeros((H, W), np.int32)
        count = 0
        for m in seg_masks:
            for nm in normal_clusters:
                inter = m & nm
                if inter.sum() < min_size:
                    continue
                count += 1
                seg[inter] = count

        # Renumber + area filter + per-instance mean normals (:176-211).
        out_seg = np.zeros_like(seg)
        avg_normals, areas = [], []
        new_count = 0
        for i in range(min(cfg.max_instances, count)):
            m = seg == i + 1
            area = int(m.sum())
            if area < min_size:
                continue
            new_count += 1
            out_seg[m] = new_count
            areas.append(area)
            nrm = normals[m].mean(0)
            # Opposed normals can average to ~0; keep a unit placeholder
            # instead of emitting NaNs downstream.
            nn = np.linalg.norm(nrm)
            avg_normals.append(nrm / nn if nn > 1e-8
                               else np.array([0.0, 0.0, 1.0], nrm.dtype))
        return {
            "seg_mask": out_seg,
            "normal": np.array(avg_normals) if avg_normals else None,
            "areas": np.array(areas) if areas else None,
        }


# ------------------------------------------------------- global plane merging
def covisibility_rate(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True)
    if len(a) == 0 or len(b) == 0:
        return 0.0
    return max(len(inter) / len(a), len(inter) / len(b))


def merge_global_planes(
    pixel_point_ids: Sequence[np.ndarray],   # per view (H, W) int32 ids into a
                                             # shared point cloud; 0 = none
    plane_masks: Sequence[np.ndarray],       # per view (H, W) int32 instances
    covisible_ratio_thresh: float = 0.5,
) -> Tuple[List[np.ndarray], Dict[int, List[Tuple[int, int]]]]:
    """Greedy cross-view merge on shared point indices
    (merge_global_3Dplane.py:115-212). Returns (per-global-plane point-id
    arrays, {globalID: [(view, planeID), …]})."""
    plane_pts: List[np.ndarray] = []
    plane_dict: Dict[int, List[Tuple[int, int]]] = {}

    for view_id, (pid_map, pmask) in enumerate(zip(pixel_point_ids, plane_masks)):
        for plane_id in np.unique(pmask):
            if plane_id == 0:
                continue
            ids = np.unique(pid_map[pmask == plane_id])
            ids = ids[ids != 0]
            if len(ids) == 0:
                continue
            merged = False
            for gi in range(len(plane_pts)):
                if covisibility_rate(plane_pts[gi], ids) > covisible_ratio_thresh:
                    plane_pts[gi] = np.union1d(plane_pts[gi], ids)
                    plane_dict[gi].append((view_id, int(plane_id)))
                    merged = True
                    break
            if not merged:
                plane_dict[len(plane_pts)] = [(view_id, int(plane_id))]
                plane_pts.append(ids)

    # Final cross-merge pass (:171-212).
    out_pts: List[np.ndarray] = []
    out_dict: Dict[int, List[Tuple[int, int]]] = {}
    dead = [False] * len(plane_pts)
    for i in range(len(plane_pts)):
        if dead[i]:
            continue
        cur = plane_pts[i]
        ids = list(plane_dict[i])
        for j in range(i + 1, len(plane_pts)):
            if dead[j]:
                continue
            if covisibility_rate(cur, plane_pts[j]) > covisible_ratio_thresh:
                cur = np.union1d(cur, plane_pts[j])
                ids.extend(plane_dict[j])
                dead[j] = True
        out_dict[len(out_pts)] = ids
        out_pts.append(cur)
        dead[i] = True
    return out_pts, out_dict


# ------------------------------------------------------------ plane fitting
def fit_plane_svd(points: np.ndarray) -> Tuple[np.ndarray, float]:
    """Plane normal + offset via PCA (GeneralPlaneRegressor._fit_with_svd)."""
    centroid = points.mean(0)
    _, _, Vt = np.linalg.svd(points - centroid, full_matrices=False)
    normal = Vt[-1]
    d = -float(normal @ centroid)
    return normal, d


def _fit_plane_prior(points: np.ndarray, prior_normal: np.ndarray,
                     alpha: float = 1.0) -> Tuple[np.ndarray, float]:
    """Closed-form-ish regularized fit: blend the SVD normal toward the prior
    when they disagree, then refit offset by least squares (replaces the
    reference's scipy.optimize loop, :120-170, with the same intent — the
    regularizer only pulls the normal toward the prior direction)."""
    n_svd, _ = fit_plane_svd(points)
    if np.dot(n_svd, prior_normal) < 0:
        n_svd = -n_svd
    w = alpha / (1.0 + alpha)
    normal = (1 - w) * n_svd + w * prior_normal
    normal = normal / max(np.linalg.norm(normal), 1e-12)
    d = -float(normal @ points.mean(0))
    return normal, d


def fit_plane_ransac(
    points: np.ndarray,
    threshold: float = 0.01,
    min_samples: int = 3,
    max_trials: int = 1000,
    alpha: float = 1.0,
    prior_normal: Optional[np.ndarray] = None,
    seed: int = 42,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RANSAC plane fit → (normal, point-on-plane, inlier mask)
    (refine_depth_with_planes.py:419-470)."""
    n = points.shape[0]
    if prior_normal is not None:
        prior_normal = np.asarray(prior_normal, np.float64)
        pn = np.linalg.norm(prior_normal)
        prior_normal = prior_normal / pn if pn > 1e-12 else None

    rng = np.random.default_rng(seed)
    best_inliers = None
    best_count = -1
    trials = min(max_trials, 200)
    for _ in range(trials):
        idx = rng.choice(n, min(min_samples, n), replace=False)
        if len(idx) < 3:
            break
        try:
            normal, d = fit_plane_svd(points[idx])
        except np.linalg.LinAlgError:
            continue
        dist = np.abs(points @ normal + d)
        inl = dist < threshold
        c = int(inl.sum())
        if c > best_count:
            best_count = c
            best_inliers = inl
    if best_inliers is None or best_count < 3:
        best_inliers = np.ones(n, bool)

    # Refit on inliers (with prior regularization if given).
    if prior_normal is not None:
        normal, d = _fit_plane_prior(points[best_inliers], prior_normal, alpha)
    else:
        normal, d = fit_plane_svd(points[best_inliers])
    # A point on the plane (reference get_plane_params: axis intercept; we use
    # the inlier centroid projected onto the plane — same plane).
    centroid = points[best_inliers].mean(0)
    center = centroid - (normal @ centroid + d) * normal
    return normal, center, best_inliers


def compute_plane_aligned_depth(plane_normal, plane_center, camera,
                                img_shape: Tuple[int, int]) -> np.ndarray:
    """Analytic depth of the ray-plane intersection per pixel
    (refine_depth_with_planes.py:247-330). `camera` is a framework Camera.
    Returns view-z depth (H, W); non-intersecting rays get 0."""
    import jax
    import jax.numpy as jnp

    H, W = img_shape
    origin, dirs = camera.pixel_rays()  # dirs have unit view-z
    n = jnp.asarray(plane_normal, jnp.float32)
    p0 = jnp.asarray(plane_center, jnp.float32)
    denom = dirs @ n
    denom = jnp.where(jnp.abs(denom) < 1e-8,
                      jnp.sign(denom) * 1e-8 + (denom == 0) * 1e-8, denom)
    t = ((p0 - origin) @ n) / denom
    depth = jnp.where(t > 0, t, 0.0)  # t is view-z since dirs have unit z
    return np.asarray(depth)


# -------------------------------------------------------------- refine driver
@dataclass
class PlaneRefineConfig:
    ransac_threshold: float = 0.01
    normal_cluster_min_ratio: float = 0.3   # dominant normal cluster only
    min_member_points: int = 50
    prior_alpha: float = 1.0


def refine_depths_with_planes(
    cameras,                        # batched framework Camera (V,)
    depths: np.ndarray,             # (V, H, W) current depths
    plane_masks: Sequence[np.ndarray],      # per view (H, W) int32 instances
    global_plane_dict: Dict[int, List[Tuple[int, int]]],
    points: np.ndarray,             # (N, 3) shared chart point cloud
    global_plane_points: Sequence[np.ndarray],  # per global plane: ids into points
    rend_normals: Optional[np.ndarray] = None,  # (V, H, W, 3) for prior normals
    config: PlaneRefineConfig = PlaneRefineConfig(),
):
    """For every global plane: gather member 3D points, RANSAC a plane (with
    the dominant rendered-normal cluster as prior), then overwrite the depth
    of every member pixel in every member view with the analytic plane depth
    (refine_depth_with_planes.py:472-656). Returns (refined depths, fitted
    plane list)."""
    import jax

    V = depths.shape[0]
    refined = depths.copy()
    planes = []
    for gid, members in global_plane_dict.items():
        ids = global_plane_points[gid]
        ids = ids[(ids > 0) & (ids < len(points))]
        if len(ids) < config.min_member_points:
            continue
        pts = points[ids]

        prior = None
        if rend_normals is not None:
            nrms = []
            for view_id, plane_id in members:
                m = plane_masks[view_id] == plane_id
                if m.sum():
                    nrms.append(rend_normals[view_id][m])
            if nrms:
                nrms = np.concatenate(nrms, 0)
                cl_masks, cl_centers = normals_cluster_1d(nrms)
                if len(cl_masks):
                    sizes = [m.sum() for m in cl_masks]
                    best = int(np.argmax(sizes))
                    if sizes[best] >= config.normal_cluster_min_ratio * len(nrms):
                        prior = cl_centers[best]

        normal, center, inliers = fit_plane_ransac(
            pts, threshold=config.ransac_threshold,
            prior_normal=prior, alpha=config.prior_alpha,
        )
        planes.append({"id": gid, "normal": normal, "center": center,
                       "n_inliers": int(inliers.sum()), "n_points": len(pts)})

        for view_id, plane_id in members:
            cam = jax.tree.map(lambda x: x[view_id], cameras)
            plane_depth = compute_plane_aligned_depth(
                normal, center, cam, depths.shape[1:3]
            )
            m = (plane_masks[view_id] == plane_id) & (plane_depth > 0)
            refined[view_id][m] = plane_depth[m]
    return refined, planes
