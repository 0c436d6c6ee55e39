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

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Jacobi eigendecomposition (batched, fixed sweep count, branch-free)
# ---------------------------------------------------------------------------

def jacobi_eigh(A: jnp.ndarray, sweeps: int = 8):
    """Symmetric eigendecomposition of (..., n, n) via cyclic Jacobi.

    Fixed sweep count, fully batched, branch-free. Returns (w, V) with
    A approx V @ diag(w) @ V^T. Eigenvalues are NOT sorted.

    TPU notes:
    - The n x n symmetric matrix is held as n(n+1)/2 SEPARATE (B,) arrays
      ("scalar registers" over the batch), so every Givens rotation is a
      handful of fused elementwise VPU ops on batch-major vectors — no
      .at[] row/column updates (each of which would copy the whole (n,n,B)
      buffer) and the batch stays on the 128-lane axis throughout.
    - Rotation angles use the algebraic Givens form
        tau = (aqq - app) / (2 apq),  t = sign(tau) / (|tau| + sqrt(1+tau^2))
        c = 1/sqrt(1+t^2),  s = t c
      (sqrt + divides only — no atan2/sin/cos transcendentals; ~3x cheaper
      on the VPU and exactly zeroes the pivot each rotation).
    """
    n = A.shape[-1]
    batch_shape = A.shape[:-2]
    dt = A.dtype
    B = 1
    for sdim in batch_shape:
        B *= sdim
    Af = A.reshape(B, n, n)

    m = n * (n + 1) // 2
    tri = [(i, j) for i in range(n) for j in range(i, n)]
    tri_idx = {ij: k for k, ij in enumerate(tri)}

    def idx(i, j):
        return tri_idx[(i, j) if i <= j else (j, i)]

    a0 = jnp.stack([Af[:, i, j] for (i, j) in tri], axis=0)        # (m, B)
    # identity eigenvector init, derived from the input so its shard_map
    # "varying" type matches a0 (a constant V0 breaks the scan-carry VMA
    # type check inside shard_map bodies)
    V0 = jnp.eye(n, dtype=dt).reshape(n * n, 1) * jnp.ones_like(a0[:1])

    # RELATIVE pivot threshold: skipping |apq| below eps_rel * scale bounds
    # tau <= 1/(2 eps_rel), keeping tau^2 finite — crucial for autodiff
    # (an overflowing sqrt(1+tau^2) has NaN gradient even when the forward
    # value is discarded by the jnp.where) — and leaves only an O(eps_rel)
    # off-diagonal residual, within the sweep-count accuracy anyway.
    eps_rel = jnp.asarray(1e-14 if dt == jnp.float64 else 1e-7, dt)
    tiny = jnp.asarray(1e-300 if dt == jnp.float64 else 1e-30, dt)
    zero = jnp.zeros((B,), dt)
    one = jnp.ones((B,), dt)

    def sweep(carry, _):
        a_arr, V_arr = carry
        # unpack to "scalar registers" over the batch — every rotation below
        # is a handful of fused elementwise VPU ops on (B,) vectors, and the
        # whole sweep is one scan body (keeps the XLA graph small).
        a = [a_arr[k] for k in range(m)]
        V = [V_arr[k] for k in range(n * n)]
        for p in range(n):
            for q in range(p + 1, n):
                app, aqq, apq = a[idx(p, p)], a[idx(q, q)], a[idx(p, q)]
                small = jnp.abs(apq) <= (
                    eps_rel * (jnp.abs(app) + jnp.abs(aqq)) + tiny
                )
                apq_safe = jnp.where(small, one, apq)
                tau = (aqq - app) / (2.0 * apq_safe)
                root = jnp.sqrt(1.0 + tau * tau)
                sgn = jnp.where(tau >= 0, 1.0, -1.0)
                t = sgn / (jnp.abs(tau) + root)
                t = jnp.where(small, zero, t)
                c = jax.lax.rsqrt(1.0 + t * t)
                s = t * c

                a[idx(p, p)] = app - t * apq
                a[idx(q, q)] = aqq + t * apq
                a[idx(p, q)] = zero
                for k in range(n):
                    if k == p or k == q:
                        continue
                    akp, akq = a[idx(k, p)], a[idx(k, q)]
                    a[idx(k, p)] = c * akp - s * akq
                    a[idx(k, q)] = s * akp + c * akq
                for k in range(n):
                    vkp, vkq = V[k * n + p], V[k * n + q]
                    V[k * n + p] = c * vkp - s * vkq
                    V[k * n + q] = s * vkp + c * vkq
        return (jnp.stack(a, axis=0), jnp.stack(V, axis=0)), None

    (a_out, V_out), _ = jax.lax.scan(
        sweep, (a0, V0), None, length=sweeps
    )

    w = jnp.stack([a_out[idx(i, i)] for i in range(n)], axis=-1)   # (B, n)
    Vm = jnp.moveaxis(V_out.reshape(n, n, B), -1, 0)               # (B, n, n)
    return w.reshape(*batch_shape, n), Vm.reshape(*batch_shape, n, n)


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

    trS = jnp.trace(S, axis1=-2, axis2=-1)
    G = trS[..., None, None] * jnp.eye(3, dtype=dt) - S
    Ginv = _sym_inv3(G, eps)

    # Fully unrolled over the 9 (r, c) perturbation directions and the 6
    # sym-vec outputs: every quantity below is a (...,) batch array, so the
    # whole computation fuses into one elementwise VPU kernel with the
    # element batch on the lanes (the einsum form materializes
    # (..., 3,3,3,3) intermediates at ~5% lane utilization).
    Rr = [[R[..., r, j] for j in range(3)] for r in range(3)]
    g = [[Ginv[..., i, j] for j in range(3)] for i in range(3)]
    s = [[S[..., i, j] for j in range(3)] for i in range(3)]

    out_irc = [[[None] * 3 for _ in range(3)] for _ in range(6)]
    for r in range(3):
        v = Rr[r]
        for c in range(3):
            # t = e_c x R[r, :]
            if c == 0:
                t = (jnp.zeros_like(v[0]), -v[2], v[1])
            elif c == 1:
                t = (v[2], jnp.zeros_like(v[0]), -v[0])
            else:
                t = (-v[1], v[0], jnp.zeros_like(v[0]))
            # omega = Ginv @ t
            w0 = g[0][0] * t[0] + g[0][1] * t[1] + g[0][2] * t[2]
            w1 = g[1][0] * t[0] + g[1][1] * t[1] + g[1][2] * t[2]
            w2 = g[2][0] * t[0] + g[2][1] * t[1] + g[2][2] * t[2]
            # dS[a][b] = R[r,a] delta_{b,c} - (omega x S[:, b])[a]
            dS = [[None] * 3 for _ in range(3)]
            for b in range(3):
                sb0, sb1, sb2 = s[0][b], s[1][b], s[2][b]
                cx0 = w1 * sb2 - w2 * sb1
                cx1 = w2 * sb0 - w0 * sb2
                cx2 = w0 * sb1 - w1 * sb0
                dS[0][b] = -cx0
                dS[1][b] = -cx1
                dS[2][b] = -cx2
            for a in range(3):
                dS[a][c] = dS[a][c] + v[a]
            out_irc[0][r][c] = dS[0][0]
            out_irc[1][r][c] = dS[1][1]
            out_irc[2][r][c] = dS[2][2]
            out_irc[3][r][c] = 0.5 * (dS[0][1] + dS[1][0])
            out_irc[4][r][c] = 0.5 * (dS[0][2] + dS[2][0])
            out_irc[5][r][c] = 0.5 * (dS[1][2] + dS[2][1])

    # (..., i, r, c)
    return jnp.stack(
        [
            jnp.stack(
                [jnp.stack(out_irc[i][r], axis=-1) for r in range(3)],
                axis=-2,
            )
            for i in range(6)
        ],
        axis=-3,
    )


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


def _rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    """exp of the cross-product matrix of w (..., 3) -> (..., 3, 3)."""
    dt = w.dtype
    th2 = jnp.sum(w * w, axis=-1)
    th = jnp.sqrt(th2 + 1e-30)
    a = jnp.where(th2 > 1e-24, jnp.sin(th) / th, 1.0 - th2 / 6.0)
    b = jnp.where(
        th2 > 1e-24, (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-30),
        0.5 - th2 / 24.0,
    )
    z = jnp.zeros_like(w[..., 0])
    K = jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], z, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], z], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=dt)
    KK = jnp.einsum("...ik,...kj->...ij", K, K)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def polar_warm(F: jnp.ndarray, R0: jnp.ndarray, iters: int = 5):
    """Warm-started Newton-Procrustes polar decomposition.

    Fixed-count Newton iterations on SO(3) maximizing tr(R^T F), seeded at
    the PREVIOUS iterate's rotation — this tracks a temporally-smooth
    rotation branch through element inversion, where the stateless SVD's
    smallest-singular-value sign convention can jump branches (reference:
    src/svd/newton_procrustes.h:108-189, called warm from
    mixed_stretch.cpp:18-53). Each step solves the 3-dof system

      (tr(sym M) I - sym M) w = axial(M - M^T),   M = R^T F

    and updates R <- R exp(w^). Returns (R, S = sym(R^T F))."""

    def body(_, R):
        M = jnp.einsum("...ki,...kj->...ij", R, F)
        Ms = 0.5 * (M + jnp.swapaxes(M, -1, -2))
        a = jnp.stack(
            [
                M[..., 2, 1] - M[..., 1, 2],
                M[..., 0, 2] - M[..., 2, 0],
                M[..., 1, 0] - M[..., 0, 1],
            ],
            axis=-1,
        )
        tr = jnp.einsum("...ii->...", Ms)
        H = tr[..., None, None] * jnp.eye(3, dtype=F.dtype) - Ms
        Hinv = _sym_inv3(H, 1e-8)
        w = jnp.einsum("...ij,...j->...i", Hinv, a)
        # bounded step keeps the fixed-count iteration stable far from
        # the optimum (the reference backtracks, newton_procrustes.h:145)
        wn2 = jnp.sum(w * w, axis=-1, keepdims=True)
        cap = jnp.asarray(2.4674011, F.dtype)  # (pi/2)^2
        w = w * jnp.sqrt(jnp.minimum(1.0, cap / jnp.maximum(wn2, 1e-30)))
        return jnp.einsum("...ik,...kj->...ij", R, _rodrigues(w))

    R = jax.lax.fori_loop(0, iters, body, R0)
    S = jnp.einsum("...ki,...kj->...ij", R, F)
    S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    return R, S


def dsdF(R: jnp.ndarray, S: jnp.ndarray, dim: int):
    if dim == 3:
        return dsdF33(R, S)
    return dsdF22(R, S)
