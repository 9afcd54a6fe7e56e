"""Rotation / quaternion / projective transform utilities.

Conventions (shared across the whole framework):

- Quaternions are ``(w, x, y, z)``, matching the reference PLY schema
  (reference: 2d-gaussian-splatting/utils/general_utils.py build_rotation).
- All matrices are **column-vector** convention: ``p' = M @ p``. The reference
  stores torch matrices transposed for row-vector multiplication; our IO layer
  transposes at the boundary so on-disk artifacts stay byte-compatible.
- Functions are written for single items and are `vmap`-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis`, gradient-safe at zero.

    `jnp.linalg.norm` has a NaN gradient at exactly 0 (d‖v‖/dv = v/‖v‖);
    rsqrt(Σv² + eps²) is smooth everywhere and identical to machine precision
    for non-tiny vectors."""
    import jax

    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=axis, keepdims=True) + eps * eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) wxyz quaternion → (…, 3, 3) rotation matrix.

    The quaternion is normalized internally, so raw (unconstrained) network
    outputs can be passed directly.
    """
    q = normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    rot = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return rot.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) rotation matrix → (…, 4) wxyz unit quaternion.

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select by the largest diagonal combination (stable under
    vmap/jit; no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidates, each scaled by 4*component^2 (all non-negative).
    qw2 = jnp.maximum(0.0, 1 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1 - m00 - m11 + m22)

    # Candidate quaternions (unnormalized), one per dominant component.
    cand = jnp.stack(
        [
            jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4 comps)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)  # (..., 4)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)
    q = q.squeeze(-2)
    q = normalize(q)
    # Canonical sign: w >= 0.
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions (broadcasting)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def homogenize(p: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) → (…, 4) with trailing 1."""
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def transform_points(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 column-vector transform to (…, 3) points (affine part)."""
    return p @ m[:3, :3].T + m[:3, 3]


def project_points(m: jnp.ndarray, p: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Apply a 4x4 projective transform to (…, 3) points with w-divide."""
    ph = homogenize(p) @ m.T
    return ph[..., :3] / (ph[..., 3:4] + eps)
