"""Closed-form batched 3x3 linear algebra for pose solving.

Replaces the reference's CustomSVD/CustomSVDu/CustomSVDv/CustomDet ops
(Pose_Estimation_Model/utils/model_utils.py:469-526; C++ Eigen BDCSVD in
ov_pointnet2_op/custom_svd.cpp:103-180; OpenCL 3x3 eigendecomposition in
custom_svd_u.cl:33-50).  The reference had to pin these subgraphs to CPU
("sub2/sub4") because its GPU plugin could not host them; here they are
branch-free vectorized jnp so the whole pose solve stays in one jitted
TPU program and batches to B*6000 hypotheses on the VPU.

Algorithm: cyclic-Jacobi eigendecomposition of the symmetric Gram matrix
H^T H (fixed unrolled sweep schedule -> no data-dependent control flow,
quadratic convergence, backward-stable in f32 even for the clustered
spectra produced by near-collinear 3-point hypothesis sets), then U
columns recovered as H v_i / s_i with a right-handed cross-product
completion for rank-deficient H (the coarse stage solves from 3-point
correspondences, so rank(H) <= 2 by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12
_JACOBI_SWEEPS = 6


def det3x3(m: jax.Array) -> jax.Array:
    """Batched 3x3 determinant. m: (..., 3, 3) -> (...)."""
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def _cross(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def _normalize(v: jax.Array, eps: float = _EPS) -> jax.Array:
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def _any_orthonormal(v: jax.Array) -> jax.Array:
    """A unit vector orthogonal to unit vector v (branch-free)."""
    ax = jnp.argmin(jnp.abs(v), axis=-1)
    e = jax.nn.one_hot(ax, 3, dtype=v.dtype)
    return _normalize(_cross(v, e))


def _jacobi_rotation(A: jax.Array, V: jax.Array, p: int, q: int):
    """One batched Jacobi rotation zeroing A[p, q]; updates A and V."""
    app = A[..., p, p]
    aqq = A[..., q, q]
    apq = A[..., p, q]

    # Rotation angle: tan(2*theta) = 2*apq / (app - aqq).
    safe = jnp.abs(apq) > _EPS
    tau = (aqq - app) / (2.0 * jnp.where(safe, apq, 1.0))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.sign(tau) == 0, 1.0 / (tau + jnp.sqrt(1.0 + tau * tau)), t)
    t = jnp.where(safe, t, 0.0)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    # G differs from identity only in the (p, q) plane.
    G = jnp.zeros(A.shape[:-2] + (3, 3), A.dtype) + jnp.eye(3, dtype=A.dtype)
    G = G.at[..., p, p].set(c)
    G = G.at[..., q, q].set(c)
    G = G.at[..., p, q].set(s)
    G = G.at[..., q, p].set(-s)

    A = jnp.einsum("...ji,...jk,...kl->...il", G, A, G)
    V = jnp.einsum("...ij,...jk->...ik", V, G)
    return A, V


def eigh3x3(A: jax.Array):
    """Eigendecomposition of batched symmetric 3x3 matrices (cyclic Jacobi).

    Args:
      A: (..., 3, 3) symmetric.

    Returns:
      (w, V): eigenvalues (..., 3) in DESCENDING order and eigenvectors
      (..., 3, 3) with V[..., :, i] the i-th eigenvector; det(V) = +1.
    """
    A = A.astype(jnp.float32)
    V = jnp.zeros_like(A) + jnp.eye(3, dtype=A.dtype)
    for _ in range(_JACOBI_SWEEPS):
        for p, q in ((0, 1), (0, 2), (1, 2)):
            A, V = _jacobi_rotation(A, V, p, q)

    w = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    order = jnp.argsort(-w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)

    # Make right-handed: flip the third column if det < 0.
    d = jnp.sign(det3x3(V))
    d = jnp.where(d == 0, 1.0, d)
    V = V.at[..., :, 2].multiply(d[..., None])
    return w, V


def svd3x3(H: jax.Array):
    """Batched SVD of general 3x3 matrices: H = U @ diag(s) @ V^T.

    Args:
      H: (..., 3, 3).

    Returns:
      (U, s, V): U,V (..., 3, 3) orthonormal, s (..., 3) descending >= 0.
      For rank-deficient H the null columns of U are completed by a
      right-handed cross product.
    """
    H = H.astype(jnp.float32)
    A = jnp.einsum("...ji,...jk->...ik", H, H)  # H^T H
    w, V = eigh3x3(A)
    s = jnp.sqrt(jnp.maximum(w, 0.0))

    v1, v2, v3 = V[..., :, 0], V[..., :, 1], V[..., :, 2]
    s1, s2, s3 = s[..., 0:1], s[..., 1:2], s[..., 2:3]

    scale = jnp.maximum(s1, _EPS)
    Hv1 = jnp.einsum("...ij,...j->...i", H, v1)
    Hv2 = jnp.einsum("...ij,...j->...i", H, v2)
    Hv3 = jnp.einsum("...ij,...j->...i", H, v3)

    u1 = jnp.where(
        s1 > 1e-6 * scale,
        Hv1 / jnp.maximum(s1, _EPS),
        jnp.zeros_like(Hv1).at[..., 0].set(1.0),
    )
    u1 = _normalize(u1)
    u2_raw = jnp.where(
        s2 > 1e-6 * scale, Hv2 / jnp.maximum(s2, _EPS), _any_orthonormal(u1)
    )
    u2 = u2_raw - jnp.sum(u2_raw * u1, axis=-1, keepdims=True) * u1
    n2 = jnp.sum(u2 * u2, axis=-1, keepdims=True)
    u2 = jnp.where(n2 > 1e-12, _normalize(u2), _any_orthonormal(u1))
    u3_cross = _cross(u1, u2)
    u3_raw = Hv3 / jnp.maximum(s3, _EPS)
    u3 = jnp.where(s3 > 1e-4 * scale, _normalize(u3_raw), u3_cross)
    # Re-orthogonalize u3 for numerical hygiene.
    u3 = u3 - jnp.sum(u3 * u1, axis=-1, keepdims=True) * u1
    u3 = u3 - jnp.sum(u3 * u2, axis=-1, keepdims=True) * u2
    nn3 = jnp.sum(u3 * u3, axis=-1, keepdims=True)
    u3 = jnp.where(nn3 > 1e-12, _normalize(u3), u3_cross)

    U = jnp.stack([u1, u2, u3], axis=-1)
    return U, s, V
