"""Batched polar decomposition / SVD kernels and rotation derivatives.

TPU-native replacement for the reference's per-element rotation machinery
(reference: src/svd/newton_procrustes.h:108-189 warm-started Newton on SO(3),
src/svd/dsvd.cpp analytic SVD derivatives, src/svd/svd3x3_sse.h SIMD-batched
Jacobi SVD). Design:

- 3x3 SVD via fixed-sweep cyclic Jacobi eigendecomposition of F^T F followed
  by Gram-Schmidt orthonormalization of F V (the McAdams et al. structure,
  branch-free, fully vmappable; no data-dependent iteration counts).
- Signed-sigma convention for inversions: U, V in SO(3), sigma0 >= sigma1 >= 0,
  sigma2 carries sign(det F). This replaces the reference's reflection fix
  (src/svd/svd_eigen.h:7-33).
- Rotation derivative dR/dF in closed form from the polar identity
  A - A^T = Omega S + S Omega  (Omega = R^T dR skew, A = R^T dF), giving
  omega = (tr(S) I - S)^{-1} axial(A - A^T). Equivalent to the reference's
  dsvd/iARAP derivative (src/svd/dsvd.cpp:69-138, src/svd/iARAP.cpp) but
  branch-free and batched.
- ds/dF for the sym-vec stretch s follows dS = R^T dF - Omega S, packed with
  off-diagonal averaging exactly like src/variables/mixed_stretch.cpp:42-52.

All functions operate on batched arrays with leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

def _eps3_np():
    import numpy as np

    e = np.zeros((3, 3, 3))
    e[0, 1, 2] = e[1, 2, 0] = e[2, 0, 1] = 1.0
    e[0, 2, 1] = e[2, 1, 0] = e[1, 0, 2] = -1.0
    return e


_EPS3_NP = _eps3_np()


def _eps3(dtype_name: str):
    # Fresh constant per call site — caching jnp arrays across jit traces
    # leaks tracers/devices.
    return jnp.asarray(_EPS3_NP, dtype=dtype_name)


# ---------------------------------------------------------------------------
# Jacobi eigendecomposition (batched, fixed sweep count, branch-free)
# ---------------------------------------------------------------------------

def jacobi_eigh(A: jnp.ndarray, sweeps: int = 8):
    """Symmetric eigendecomposition of (..., n, n) via cyclic Jacobi.

    Fixed sweep count, exact Givens angles via atan2; fully batched with
    static row/col updates (no data-dependent control flow). Returns
    (w, V) with A approx V @ diag(w) @ V^T. Eigenvalues are NOT sorted.

    TPU note: internally the batch axis is moved LAST so that every Givens
    row/column update is a (n, B)/(B,) vector op with the large batch on the
    128-lane axis — batch-first layout puts the tiny n x n matrix on the
    lane/sublane tiles and wastes ~20x VPU throughput.
    """
    n = A.shape[-1]
    batch_shape = A.shape[:-2]
    B = 1
    for sdim in batch_shape:
        B *= sdim
    Ab = jnp.moveaxis(A.reshape(B, n, n), 0, -1)  # (n, n, B)
    Vb = jnp.tile(jnp.eye(n, dtype=A.dtype)[:, :, None], (1, 1, B))
    pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]

    for _ in range(sweeps):
        for (p, q) in pairs:
            app = Ab[p, p]
            aqq = Ab[q, q]
            apq = Ab[p, q]
            theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq)
            cp = jnp.cos(theta)
            sp = jnp.sin(theta)

            # A <- G^T A G with G the (p,q)-plane rotation by theta.
            colp = Ab[:, p]
            colq = Ab[:, q]
            Ab = Ab.at[:, p].set(cp * colp + sp * colq)
            Ab = Ab.at[:, q].set(-sp * colp + cp * colq)
            rowp = Ab[p, :]
            rowq = Ab[q, :]
            Ab = Ab.at[p, :].set(cp * rowp + sp * rowq)
            Ab = Ab.at[q, :].set(-sp * rowp + cp * rowq)

            vp = Vb[:, p]
            vq = Vb[:, q]
            Vb = Vb.at[:, p].set(cp * vp + sp * vq)
            Vb = Vb.at[:, q].set(-sp * vp + cp * vq)

    w = jnp.stack([Ab[i, i] for i in range(n)], axis=-1)  # (B, n)
    V = jnp.moveaxis(Vb, -1, 0)  # (B, n, n)
    return w.reshape(*batch_shape, n), V.reshape(*batch_shape, n, n)


def _sort3_desc(w, V):
    """Sort 3 eigenpairs descending by eigenvalue, branch-free network."""

    def cswap(w, V, i, j):
        swap = w[..., i] < w[..., j]
        wi = jnp.where(swap, w[..., j], w[..., i])
        wj = jnp.where(swap, w[..., i], w[..., j])
        w = w.at[..., i].set(wi).at[..., j].set(wj)
        vi = jnp.where(swap[..., None], V[..., :, j], V[..., :, i])
        vj = jnp.where(swap[..., None], V[..., :, i], V[..., :, j])
        V = V.at[..., :, i].set(vi).at[..., :, j].set(vj)
        return w, V

    w, V = cswap(w, V, 0, 1)
    w, V = cswap(w, V, 0, 2)
    w, V = cswap(w, V, 1, 2)
    return w, V


# ---------------------------------------------------------------------------
# 3x3 SVD / polar
# ---------------------------------------------------------------------------

def _normalize_safe(v, fallback, eps):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = n > eps
    return jnp.where(ok, v / jnp.where(ok, n, 1.0), fallback)


def svd33(F: jnp.ndarray, sweeps: int = 6):
    """Batched signed SVD of (..., 3, 3): F = U diag(s) V^T.

    U, V in SO(3); s0 >= s1 >= |s2|, sign(s2) = sign(det F).
    """
    dt = F.dtype
    eps = jnp.asarray(1e-12 if dt == jnp.float64 else 1e-20, dt)
    C = jnp.einsum("...ki,...kj->...ij", F, F)
    w, V = jacobi_eigh(C, sweeps=sweeps)
    w, V = _sort3_desc(w, V)
    # Proper rotation V.
    detV = jnp.linalg.det(V)
    V = V.at[..., :, 2].multiply(jnp.sign(detV)[..., None])

    A = jnp.einsum("...ij,...jk->...ik", F, V)  # = U diag(s)
    e0 = jnp.zeros_like(A[..., :, 0]).at[..., 0].set(1.0)
    u0 = _normalize_safe(A[..., :, 0], e0, eps)
    a1 = A[..., :, 1]
    a1p = a1 - jnp.sum(u0 * a1, axis=-1, keepdims=True) * u0
    # Fallback direction orthogonal to u0: cross with the axis least aligned.
    ex = jnp.zeros_like(u0).at[..., 0].set(1.0)
    ey = jnp.zeros_like(u0).at[..., 1].set(1.0)
    alt = jnp.where(
        (jnp.abs(u0[..., 0]) > 0.9)[..., None],
        jnp.cross(u0, ey),
        jnp.cross(u0, ex),
    )
    u1 = _normalize_safe(a1p, _normalize_safe(alt, ey, eps), eps)
    u2 = jnp.cross(u0, u1)

    s0 = jnp.sum(u0 * A[..., :, 0], axis=-1)
    s1 = jnp.sum(u1 * A[..., :, 1], axis=-1)
    s2 = jnp.sum(u2 * A[..., :, 2], axis=-1)  # signed
    U = jnp.stack([u0, u1, u2], axis=-1)
    s = jnp.stack([s0, s1, s2], axis=-1)
    return U, s, V


def polar33(F: jnp.ndarray, sweeps: int = 6):
    """Polar decomposition F = R S with R in SO(3), S symmetric (maybe
    indefinite under inversion)."""
    U, s, V = svd33(F, sweeps=sweeps)
    R = jnp.einsum("...ik,...jk->...ij", U, V)
    S = jnp.einsum("...ik,...k,...jk->...ij", V, s, V)
    return R, S


def polar22(F: jnp.ndarray):
    """Closed-form 2x2 polar decomposition with signed-sigma convention.

    F = U diag(s0, s1) V^T with U, V in SO(2), s1 signed by det F.
    Returns (R, S) = (U V^T, V diag V^T).
    """
    dt = F.dtype
    eps = jnp.asarray(1e-30, dt)
    E = 0.5 * (F[..., 0, 0] + F[..., 1, 1])
    Fm = 0.5 * (F[..., 0, 0] - F[..., 1, 1])
    G = 0.5 * (F[..., 1, 0] + F[..., 0, 1])
    H = 0.5 * (F[..., 1, 0] - F[..., 0, 1])
    Q = jnp.sqrt(E * E + H * H)
    Rm = jnp.sqrt(Fm * Fm + G * G)
    # Polar rotation R = rot(beta), cos = E/Q, sin = H/Q.
    ok = Q > eps
    c = jnp.where(ok, E / jnp.where(ok, Q, 1.0), jnp.ones_like(E))
    s = jnp.where(ok, H / jnp.where(ok, Q, 1.0), jnp.zeros_like(H))
    R = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )
    S = jnp.einsum("...ki,...kj->...ij", R, F)  # R^T F, symmetric in exact math
    S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    return R, S


def svd22(F: jnp.ndarray):
    """Closed-form signed 2x2 SVD: F = U diag(s) V^T, U,V in SO(2)."""
    E = 0.5 * (F[..., 0, 0] + F[..., 1, 1])
    Fm = 0.5 * (F[..., 0, 0] - F[..., 1, 1])
    G = 0.5 * (F[..., 1, 0] + F[..., 0, 1])
    H = 0.5 * (F[..., 1, 0] - F[..., 0, 1])
    Q = jnp.sqrt(E * E + H * H)
    Rm = jnp.sqrt(Fm * Fm + G * G)
    s0 = Q + Rm
    s1 = Q - Rm
    beta = jnp.arctan2(H, E)   # phi - theta
    alpha = jnp.arctan2(G, Fm)  # phi + theta
    phi = 0.5 * (alpha + beta)
    theta = 0.5 * (alpha - beta)

    def rot(t):
        c, s = jnp.cos(t), jnp.sin(t)
        return jnp.stack(
            [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
        )

    return rot(phi), jnp.stack([s0, s1], axis=-1), rot(theta)


# ---------------------------------------------------------------------------
# Rotation / stretch derivatives
# ---------------------------------------------------------------------------

def _sym_inv3(G, eps):
    """Closed-form inverse of symmetric 3x3 with determinant guard."""
    det = jnp.linalg.det(G)
    det = jnp.where(jnp.abs(det) > eps, det, jnp.where(det >= 0, eps, -eps))
    adj = jnp.stack(
        [
            jnp.stack(
                [
                    G[..., 1, 1] * G[..., 2, 2] - G[..., 1, 2] * G[..., 2, 1],
                    G[..., 0, 2] * G[..., 2, 1] - G[..., 0, 1] * G[..., 2, 2],
                    G[..., 0, 1] * G[..., 1, 2] - G[..., 0, 2] * G[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    G[..., 1, 2] * G[..., 2, 0] - G[..., 1, 0] * G[..., 2, 2],
                    G[..., 0, 0] * G[..., 2, 2] - G[..., 0, 2] * G[..., 2, 0],
                    G[..., 0, 2] * G[..., 1, 0] - G[..., 0, 0] * G[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    G[..., 1, 0] * G[..., 2, 1] - G[..., 1, 1] * G[..., 2, 0],
                    G[..., 0, 1] * G[..., 2, 0] - G[..., 0, 0] * G[..., 2, 1],
                    G[..., 0, 0] * G[..., 1, 1] - G[..., 0, 1] * G[..., 1, 0],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def dsdF33(R: jnp.ndarray, S: jnp.ndarray):
    """ds/dF for the 3D sym-vec stretch (..., 6, 3, 3).

    dsdF[..., i, r, c] = d s_i / d F_rc, from
      omega_rc = (tr(S) I - S)^{-1} (e_c x R[r, :])
      dS_rc    = outer(R[r, :], e_c) - skew(omega_rc) S
    packed with off-diagonal averaging (matches the reference's 6x9 ds/dF,
    src/variables/mixed_stretch.cpp:42-52).
    """
    dt = R.dtype
    eps = jnp.asarray(1e-10 if dt == jnp.float64 else 1e-6, dt)
    eps3 = _eps3(jnp.dtype(dt).name)

    trS = jnp.trace(S, axis1=-2, axis2=-1)
    G = trS[..., None, None] * jnp.eye(3, dtype=dt) - S
    Ginv = _sym_inv3(G, eps)

    # T[..., r, c, k] = (e_c x R[r, :])_k = eps_{k c j} R[r, j]
    T = jnp.einsum("kcj,...rj->...rck", eps3, R)
    omega = jnp.einsum("...kl,...rcl->...rck", Ginv, T)
    # skew(w)_{a b} = eps_{a i b} w_i  (skew(w) x = w cross x)
    skew_omega = jnp.einsum("aib,...rci->...rcab", eps3, omega)
    dS = (
        R[..., :, None, :, None] * jnp.eye(3, dtype=dt)[None, :, None, :]
        - jnp.einsum("...rcab,...bd->...rcad", skew_omega, S)
    )
    # dS[..., r, c, a, b]; pack (a, b) -> sym-vec index i.
    d00 = dS[..., 0, 0]
    d11 = dS[..., 1, 1]
    d22 = dS[..., 2, 2]
    d01 = 0.5 * (dS[..., 0, 1] + dS[..., 1, 0])
    d02 = 0.5 * (dS[..., 0, 2] + dS[..., 2, 0])
    d12 = 0.5 * (dS[..., 1, 2] + dS[..., 2, 1])
    out = jnp.stack([d00, d11, d22, d01, d02, d12], axis=-3)
    # current layout (..., i, r, c) — verify: dS has shape (..., r, c, a, b);
    # d00 etc. have shape (..., r, c); stacking on axis=-3 gives (..., i, r, c).
    return out


def dsdF22(R: jnp.ndarray, S: jnp.ndarray):
    """ds/dF for the 2D sym-vec stretch (..., 3, 2, 2)."""
    dt = R.dtype
    eps = jnp.asarray(1e-10 if dt == jnp.float64 else 1e-6, dt)
    trS = jnp.trace(S, axis1=-2, axis2=-1)
    trS = jnp.where(jnp.abs(trS) > eps, trS, jnp.where(trS >= 0, eps, -eps))

    # omega_rc = (R[r,1] delta_{c0} - R[r,0] delta_{c1}) / tr(S)
    # dS_rc = outer(R[r,:], e_c) - omega_rc * J @ S,  J = [[0,-1],[1,0]]
    J = jnp.asarray([[0.0, -1.0], [1.0, 0.0]], dtype=dt)
    JS = jnp.einsum("ab,...bd->...ad", J, S)

    omega = jnp.stack([R[..., :, 1], -R[..., :, 0]], axis=-1) / trS[..., None, None]
    # omega[..., r, c]
    outer = R[..., :, None, :, None] * jnp.eye(2, dtype=dt)[None, :, None, :]
    dS = outer - omega[..., None, None] * JS[..., None, None, :, :]
    d00 = dS[..., 0, 0]
    d11 = dS[..., 1, 1]
    d01 = 0.5 * (dS[..., 0, 1] + dS[..., 1, 0])
    return jnp.stack([d00, d11, d01], axis=-3)


def polar(F: jnp.ndarray, dim: int, sweeps: int = 6):
    """Dispatch polar decomposition by spatial dimension."""
    if dim == 3:
        return polar33(F, sweeps=sweeps)
    return polar22(F)


def dsdF(R: jnp.ndarray, S: jnp.ndarray, dim: int):
    if dim == 3:
        return dsdF33(R, S)
    return dsdF22(R, S)
