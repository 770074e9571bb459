"""Closed-form batched 3x3 linear algebra for pose solving.

Replaces the reference's CustomSVD/CustomSVDu/CustomSVDv/CustomDet ops
(Pose_Estimation_Model/utils/model_utils.py:469-526; C++ Eigen BDCSVD in
ov_pointnet2_op/custom_svd.cpp:103-180; OpenCL 3x3 eigendecomposition in
custom_svd_u.cl:33-50).  The reference had to pin these subgraphs to CPU
("sub2/sub4") because its GPU plugin could not host them; here they are
branch-free vectorized jnp so the whole pose solve stays in one jitted
TPU program and batches to B*6000 hypotheses on the VPU.

TPU layout note: all internal math is STRUCT-OF-ARRAYS — the (..., 3, 3)
matrices are unpacked into component vectors and every Jacobi rotation /
eigenvector formula is scalar arithmetic on (N,)-shaped arrays, which the
VPU executes fully lane-parallel.  The naive (N, 3, 3) formulation (tiny
einsums over 3-element trailing dims) is ~100x slower on TPU because
every op pads 3-lane vectors to 128-lane tiles.

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


def _rot_coeffs(app, aqq, apq):
    """Jacobi rotation (c, s) zeroing the (p, q) entry — elementwise."""
    safe = jnp.abs(apq) > _EPS
    tau = (aqq - app) / (2.0 * jnp.where(safe, apq, 1.0))
    sign = jnp.where(tau >= 0, 1.0, -1.0)
    t = sign / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(safe, t, 0.0)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    return c, t * c


def _eigh3x3_soa(a00, a01, a02, a11, a12, a22):
    """Cyclic Jacobi on symmetric components; returns eigenvalues
    (unsorted diag) and the 9 components of V (row-major v[r][col])."""
    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    v00, v01, v02 = one, zero, zero
    v10, v11, v12 = zero, one, zero
    v20, v21, v22 = zero, zero, one

    for _ in range(_JACOBI_SWEEPS):
        # --- rotate (0, 1): zero a01 -----------------------------------
        c, s = _rot_coeffs(a00, a11, a01)
        a00n = c * c * a00 - 2 * s * c * a01 + s * s * a11
        a11n = s * s * a00 + 2 * s * c * a01 + c * c * a11
        a02n = c * a02 - s * a12
        a12n = s * a02 + c * a12
        a00, a11, a01, a02, a12 = a00n, a11n, zero, a02n, a12n
        v00, v01 = c * v00 - s * v01, s * v00 + c * v01
        v10, v11 = c * v10 - s * v11, s * v10 + c * v11
        v20, v21 = c * v20 - s * v21, s * v20 + c * v21

        # --- rotate (0, 2): zero a02 -----------------------------------
        c, s = _rot_coeffs(a00, a22, a02)
        a00n = c * c * a00 - 2 * s * c * a02 + s * s * a22
        a22n = s * s * a00 + 2 * s * c * a02 + c * c * a22
        a01n = c * a01 - s * a12
        a12n = s * a01 + c * a12
        a00, a22, a02, a01, a12 = a00n, a22n, zero, a01n, a12n
        v00, v02 = c * v00 - s * v02, s * v00 + c * v02
        v10, v12 = c * v10 - s * v12, s * v10 + c * v12
        v20, v22 = c * v20 - s * v22, s * v20 + c * v22

        # --- rotate (1, 2): zero a12 -----------------------------------
        c, s = _rot_coeffs(a11, a22, a12)
        a11n = c * c * a11 - 2 * s * c * a12 + s * s * a22
        a22n = s * s * a11 + 2 * s * c * a12 + c * c * a22
        a01n = c * a01 - s * a02
        a02n = s * a01 + c * a02
        a11, a22, a12, a01, a02 = a11n, a22n, zero, a01n, a02n
        v01, v02 = c * v01 - s * v02, s * v01 + c * v02
        v11, v12 = c * v11 - s * v12, s * v11 + c * v12
        v21, v22 = c * v21 - s * v22, s * v21 + c * v22

    w = (a00, a11, a22)
    V = (v00, v01, v02, v10, v11, v12, v20, v21, v22)
    return w, V


def _sort3_desc(w, V):
    """Sort eigenpairs descending by eigenvalue with compare-swap nets."""
    w0, w1, w2 = w
    v00, v01, v02, v10, v11, v12, v20, v21, v22 = V

    def cswap(wa, wb, cols_a, cols_b):
        swap = wb > wa
        wa2 = jnp.where(swap, wb, wa)
        wb2 = jnp.where(swap, wa, wb)
        new_a = tuple(jnp.where(swap, b, a) for a, b in zip(cols_a, cols_b))
        new_b = tuple(jnp.where(swap, a, b) for a, b in zip(cols_a, cols_b))
        return wa2, wb2, new_a, new_b

    c0 = (v00, v10, v20)
    c1 = (v01, v11, v21)
    c2 = (v02, v12, v22)
    w0, w1, c0, c1 = cswap(w0, w1, c0, c1)
    w0, w2, c0, c2 = cswap(w0, w2, c0, c2)
    w1, w2, c1, c2 = cswap(w1, w2, c1, c2)
    return (w0, w1, w2), (c0, c1, c2)


def _pack_V(cols, dtype):
    c0, c1, c2 = cols
    V = jnp.stack(
        [
            jnp.stack([c0[0], c1[0], c2[0]], axis=-1),
            jnp.stack([c0[1], c1[1], c2[1]], axis=-1),
            jnp.stack([c0[2], c1[2], c2[2]], axis=-1),
        ],
        axis=-2,
    )
    return V.astype(dtype)


def eigh3x3(A: jax.Array):
    """Eigendecomposition of batched symmetric 3x3 matrices.

    Args:
      A: (..., 3, 3) symmetric.

    Returns:
      (w, V): eigenvalues (..., 3) in DESCENDING order and eigenvectors
      (..., 3, 3) with V[..., :, i] the i-th eigenvector; det(V) = +1.
    """
    A = A.astype(jnp.float32)
    w, Vc = _eigh3x3_soa(
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
        A[..., 1, 1], A[..., 1, 2], A[..., 2, 2],
    )
    w, cols = _sort3_desc(w, Vc)
    c0, c1, c2 = cols
    # Right-handed: flip the third column where det < 0.
    detV = (
        c0[0] * (c1[1] * c2[2] - c1[2] * c2[1])
        - c1[0] * (c0[1] * c2[2] - c0[2] * c2[1])
        + c2[0] * (c0[1] * c1[2] - c0[2] * c1[1])
    )
    d = jnp.where(detV < 0, -1.0, 1.0)
    c2 = tuple(x * d for x in c2)
    V = _pack_V((c0, c1, c2), A.dtype)
    return jnp.stack(w, axis=-1), V


def _norm3(x, y, z):
    return jnp.sqrt(jnp.maximum(x * x + y * y + z * z, _EPS))


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
    h = [[H[..., i, j] for j in range(3)] for i in range(3)]
    (u1, u2, u3), (s1, s2, s3), (v1, v2, v3) = svd3x3_soa(h)
    U = _pack_V((u1, u2, u3), H.dtype)
    V = _pack_V((v1, v2, v3), H.dtype)
    s = jnp.stack([s1, s2, s3], axis=-1)
    return U, s, V


def svd3x3_soa(h):
    """Struct-of-arrays SVD: h is a 3x3 nested list of (N,) components.

    Returns ((u1, u2, u3), (s1, s2, s3), (v1, v2, v3)) where each u_i/v_i
    is an (x, y, z) tuple of component arrays (the i-th column of U/V).
    """

    # A = H^T H, components (elementwise).
    def col(j):
        return h[0][j], h[1][j], h[2][j]

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    cols = [col(0), col(1), col(2)]
    a00 = dot3(cols[0], cols[0])
    a01 = dot3(cols[0], cols[1])
    a02 = dot3(cols[0], cols[2])
    a11 = dot3(cols[1], cols[1])
    a12 = dot3(cols[1], cols[2])
    a22 = dot3(cols[2], cols[2])

    w, Vc = _eigh3x3_soa(a00, a01, a02, a11, a12, a22)
    w, vcols = _sort3_desc(w, Vc)
    v1, v2, v3 = vcols  # each a (vx, vy, vz) tuple of (N,) arrays

    s1 = jnp.sqrt(jnp.maximum(w[0], 0.0))
    s2 = jnp.sqrt(jnp.maximum(w[1], 0.0))
    s3 = jnp.sqrt(jnp.maximum(w[2], 0.0))
    scale = jnp.maximum(s1, _EPS)

    def matvec(v):
        return (
            h[0][0] * v[0] + h[0][1] * v[1] + h[0][2] * v[2],
            h[1][0] * v[0] + h[1][1] * v[1] + h[1][2] * v[2],
            h[2][0] * v[0] + h[2][1] * v[1] + h[2][2] * v[2],
        )

    def normalize(u):
        n = _norm3(*u)
        return (u[0] / n, u[1] / n, u[2] / n)

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def where3(c, a, b):
        return (
            jnp.where(c, a[0], b[0]),
            jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]),
        )

    def any_orthonormal(v):
        # Cross with the axis least aligned with v (branch-free).
        ax = jnp.abs(v[0])
        ay = jnp.abs(v[1])
        az = jnp.abs(v[2])
        use_x = (ax <= ay) & (ax <= az)
        use_y = (~use_x) & (ay <= az)
        ex = (jnp.where(use_x, 1.0, 0.0), jnp.where(use_y, 1.0, 0.0),
              jnp.where(use_x | use_y, 0.0, 1.0))
        return normalize(cross(v, ex))

    Hv1 = matvec(v1)
    Hv2 = matvec(v2)
    Hv3 = matvec(v3)

    e1 = (jnp.ones_like(s1), jnp.zeros_like(s1), jnp.zeros_like(s1))
    ok1 = s1 > 1e-6 * scale
    u1 = normalize(where3(ok1, tuple(x / jnp.maximum(s1, _EPS) for x in Hv1),
                          e1))
    ok2 = s2 > 1e-6 * scale
    u2_raw = where3(ok2, tuple(x / jnp.maximum(s2, _EPS) for x in Hv2),
                    any_orthonormal(u1))
    d12 = dot3(u2_raw, u1)
    u2_o = tuple(u2_raw[i] - d12 * u1[i] for i in range(3))
    n2 = u2_o[0] ** 2 + u2_o[1] ** 2 + u2_o[2] ** 2
    u2 = where3(n2 > 1e-12, normalize(u2_o), any_orthonormal(u1))

    u3_cross = cross(u1, u2)
    ok3 = s3 > 1e-4 * scale
    u3_raw = normalize(tuple(x / jnp.maximum(s3, _EPS) for x in Hv3))
    u3 = where3(ok3, u3_raw, u3_cross)
    d13 = dot3(u3, u1)
    u3 = tuple(u3[i] - d13 * u1[i] for i in range(3))
    d23 = dot3(u3, u2)
    u3 = tuple(u3[i] - d23 * u2[i] for i in range(3))
    n3 = u3[0] ** 2 + u3[1] ** 2 + u3[2] ** 2
    u3 = where3(n3 > 1e-12, normalize(u3), u3_cross)

    return (u1, u2, u3), (s1, s2, s3), (v1, v2, v3)
