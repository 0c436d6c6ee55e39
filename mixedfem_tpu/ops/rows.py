"""Feature-major ("rows") element pipeline for the hot 3D mixed-stretch path.

Why this exists: the element-major coefficient pipeline (ops/rotation.py,
ops/psd.py, ops/smallops.py) carries (E, 3, 3) / (E, 6, 3, 3) / (E, 6, 6)
tensors between functions. Each boundary materializes a tensor whose MINOR
dims are 3-9 wide, so every strided column read/write runs at ~2-7% TPU
lane utilization — measured 28.5 ms for ms.update at 100k tets against a
~2 ms roofline (tools/attribute.py --fine: defgrad 5.4, polar 7.6,
dsdF 10.8, psd 3.7 ms). Here every quantity lives as stacked feature ROWS
(feat, E) with the element batch on the 128-lane axis end-to-end; nothing
element-major is ever materialized. Same math as the element-major kernels
(ported line-for-line, parity-tested in tests/test_rows.py), reshaped for
the VPU.

Row conventions (3D only — the hot path; 2D/shells/rods keep the
element-major pipeline):
  mat3  (9, E)   M[3*r + c] = M_rc
  sym3  (6, E)   [S00, S11, S22, S01, S02, S12]      (ops/sym.py order)
  sym6  (21, E)  [(i, j) for i in 0..5 for j in i..5] (jacobi tri order)
  D     (54, E)  D[9*i + 3*r + c] = ds_i/dF_rc
  dphi  (12, E)  dphi[3*k + c]                        (corner k, ref coord c)
  G/Gw  (72, E)  G[12*i + 3*k + r] = ds_i/dx_{kr}

Reference: the same per-element math as src/variables/mixed_stretch.cpp,
src/svd/* — see ops/rotation.py for the algorithm-level citations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mixedfem_tpu.materials import models as mat

# sym3 index map: (i, j) -> row of the 6-vector
_S3 = {(0, 0): 0, (1, 1): 1, (2, 2): 2,
       (0, 1): 3, (1, 0): 3, (0, 2): 4, (2, 0): 4, (1, 2): 5, (2, 1): 5}

_TRI6 = [(i, j) for i in range(6) for j in range(i, 6)]
_TRI6_IDX = {ij: k for k, ij in enumerate(_TRI6)}


def sym6_idx(i: int, j: int) -> int:
    return _TRI6_IDX[(i, j) if i <= j else (j, i)]


# ---------------------------------------------------------------------------
# Jacobi eigendecomposition on rows (the core of ops/rotation.jacobi_eigh,
# operating directly on the (m, B) "scalar registers" it builds internally)
# ---------------------------------------------------------------------------

def jacobi_rows(a_list, n: int, sweeps: int):
    """Cyclic Jacobi on lists of rows. a_list: n(n+1)/2 rows (B,) in tri
    order [(i,j) i<=j]. Returns (w_list n, V_list n*n) with V[n*i + j]."""
    m = n * (n + 1) // 2
    tri = [(i, j) for i in range(n) for j in range(i, n)]
    tri_idx = {ij: k for k, ij in enumerate(tri)}

    def idx(i, j):
        return tri_idx[(i, j) if i <= j else (j, i)]

    a0 = jnp.stack(a_list, axis=0)                                  # (m, B)
    dt = a0.dtype
    V0 = jnp.eye(n, dtype=dt).reshape(n * n, 1) * jnp.ones_like(a0[:1])

    eps_rel = jnp.asarray(1e-14 if dt == jnp.float64 else 1e-7, dt)
    tiny = jnp.asarray(1e-300 if dt == jnp.float64 else 1e-30, dt)
    zero = jnp.zeros_like(a0[0])
    one = jnp.ones_like(a0[0])

    def sweep(carry, _):
        a_arr, V_arr = carry
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

    (a_out, V_out), _ = jax.lax.scan(sweep, (a0, V0), None, length=sweeps)
    w = [a_out[idx(i, i)] for i in range(n)]
    V = [V_out[k] for k in range(n * n)]
    return w, V


def _sort3_desc_rows(w, V):
    """Descending eigenvalue sort (branch-free network) on rows.
    w: list of 3 rows; V: list of 9 rows V[3*i + j] (j = eigen index)."""

    def cswap(w, V, i, j):
        swap = w[i] < w[j]
        wi = jnp.where(swap, w[j], w[i])
        wj = jnp.where(swap, w[i], w[j])
        w = list(w)
        w[i], w[j] = wi, wj
        V = list(V)
        for r in range(3):
            vi = jnp.where(swap, V[3 * r + j], V[3 * r + i])
            vj = jnp.where(swap, V[3 * r + i], V[3 * r + j])
            V[3 * r + i], V[3 * r + j] = vi, vj
        return w, V

    w, V = cswap(w, V, 0, 1)
    w, V = cswap(w, V, 0, 2)
    w, V = cswap(w, V, 1, 2)
    return w, V


# ---------------------------------------------------------------------------
# 3x3 polar on rows (port of ops/rotation.svd33/polar33)
# ---------------------------------------------------------------------------

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _normalize_safe_rows(v, fallback, eps):
    n2 = _dot3(v, v)
    n = jnp.sqrt(n2)
    ok = n > eps
    inv = jnp.where(ok, 1.0 / jnp.where(ok, n, 1.0), 0.0)
    return tuple(
        jnp.where(ok, v[i] * inv, fallback[i]) for i in range(3)
    )


def polar33_rows(F, sweeps: int = 6):
    """Polar decomposition on rows. F: (9, E) or list of 9 rows.
    Returns (R_rows list 9, Sv_rows list 6) with R in SO(3) and Sv the
    sym-vec of S = R^T F (signed-sigma convention, see rotation.svd33)."""
    f = [F[k] for k in range(9)]
    dt = f[0].dtype
    eps = jnp.asarray(1e-12 if dt == jnp.float64 else 1e-20, dt)
    zero = jnp.zeros_like(f[0])
    one = jnp.ones_like(f[0])

    # C = F^T F (sym3 rows, tri order for jacobi: [(0,0),(0,1),(0,2),
    # (1,1),(1,2),(2,2)])
    def col(j):
        return (f[j], f[3 + j], f[6 + j])

    c = {}
    for i in range(3):
        for j in range(i, 3):
            c[(i, j)] = _dot3(col(i), col(j))
    a_list = [c[(0, 0)], c[(0, 1)], c[(0, 2)], c[(1, 1)], c[(1, 2)],
              c[(2, 2)]]
    w, V = jacobi_rows(a_list, 3, sweeps)
    w, V = _sort3_desc_rows(w, V)

    # proper rotation V: flip third column by sign(det V)
    detV = (
        V[0] * (V[4] * V[8] - V[5] * V[7])
        - V[1] * (V[3] * V[8] - V[5] * V[6])
        + V[2] * (V[3] * V[7] - V[4] * V[6])
    )
    sV = jnp.where(detV >= 0, one, -one)
    V = list(V)
    for r in range(3):
        V[3 * r + 2] = V[3 * r + 2] * sV

    # A = F V  (columns of A are U diag(s))
    A = [[None] * 3 for _ in range(3)]
    for r in range(3):
        for j in range(3):
            A[r][j] = (f[3 * r + 0] * V[0 + j] + f[3 * r + 1] * V[3 + j]
                       + f[3 * r + 2] * V[6 + j])
    a0 = (A[0][0], A[1][0], A[2][0])
    a1 = (A[0][1], A[1][1], A[2][1])
    a2 = (A[0][2], A[1][2], A[2][2])

    e0 = (one, zero, zero)
    u0 = _normalize_safe_rows(a0, e0, eps)
    d01 = _dot3(u0, a1)
    a1p = tuple(a1[i] - d01 * u0[i] for i in range(3))
    # fallback direction orthogonal to u0 (cross with least-aligned axis)
    ex = (one, zero, zero)
    ey = (zero, one, zero)
    cx = _cross3(u0, ey)
    cy = _cross3(u0, ex)
    big0 = jnp.abs(u0[0]) > 0.9
    alt = tuple(jnp.where(big0, cx[i], cy[i]) for i in range(3))
    alt_n = _normalize_safe_rows(alt, ey, eps)
    u1 = _normalize_safe_rows(a1p, alt_n, eps)
    u2 = _cross3(u0, u1)

    s0 = _dot3(u0, a0)
    s1 = _dot3(u1, a1)
    s2 = _dot3(u2, a2)  # signed

    # R = U V^T : R[r, c] = sum_j U[r, j] V[c, j]
    U = [[u0[0], u1[0], u2[0]],
         [u0[1], u1[1], u2[1]],
         [u0[2], u1[2], u2[2]]]
    R = [None] * 9
    for r in range(3):
        for cc in range(3):
            R[3 * r + cc] = (U[r][0] * V[3 * cc + 0]
                             + U[r][1] * V[3 * cc + 1]
                             + U[r][2] * V[3 * cc + 2])

    # S = V diag(s) V^T, sym3 rows
    sdiag = [s0, s1, s2]
    Sv = [None] * 6
    for (i, j), out in ((0, 0), 0), ((1, 1), 1), ((2, 2), 2), \
                       ((0, 1), 3), ((0, 2), 4), ((1, 2), 5):
        acc = None
        for kk in range(3):
            t = V[3 * i + kk] * sdiag[kk] * V[3 * j + kk]
            acc = t if acc is None else acc + t
        Sv[out] = acc
    return R, Sv


# ---------------------------------------------------------------------------
# ds/dF on rows (port of ops/rotation.dsdF33)
# ---------------------------------------------------------------------------

def _sym_inv3_rows(g, eps):
    """Inverse of symmetric 3x3 given sym3 rows -> full 3x3 rows (9)."""
    g00, g11, g22, g01, g02, g12 = g
    det = (g00 * (g11 * g22 - g12 * g12)
           - g01 * (g01 * g22 - g12 * g02)
           + g02 * (g01 * g12 - g11 * g02))
    det = jnp.where(jnp.abs(det) > eps, det,
                    jnp.where(det >= 0, eps, -eps))
    inv = 1.0 / det
    i00 = (g11 * g22 - g12 * g12) * inv
    i11 = (g00 * g22 - g02 * g02) * inv
    i22 = (g00 * g11 - g01 * g01) * inv
    i01 = (g02 * g12 - g01 * g22) * inv
    i02 = (g01 * g12 - g02 * g11) * inv
    i12 = (g01 * g02 - g00 * g12) * inv
    return [i00, i01, i02, i01, i11, i12, i02, i12, i22]


def dsdF33_rows(R, Sv):
    """ds/dF rows: R (9 rows), Sv (6 sym3 rows) -> D (54 rows),
    D[9*i + 3*r + c] = d s_i / d F_rc. Port of rotation.dsdF33."""
    dt = R[0].dtype
    eps = jnp.asarray(1e-10 if dt == jnp.float64 else 1e-6, dt)
    zero = jnp.zeros_like(R[0])

    s_m = [[Sv[_S3[(i, j)]] for j in range(3)] for i in range(3)]
    trS = Sv[0] + Sv[1] + Sv[2]
    # G = tr(S) I - S (sym3 rows)
    gsym = [trS - Sv[0], trS - Sv[1], trS - Sv[2], -Sv[3], -Sv[4], -Sv[5]]
    Gi = _sym_inv3_rows(gsym, eps)
    g = [[Gi[3 * i + j] for j in range(3)] for i in range(3)]

    Rr = [[R[3 * r + j] for j in range(3)] for r in range(3)]
    out = [None] * 54
    for r in range(3):
        v = Rr[r]
        for c in range(3):
            if c == 0:
                t = (zero, -v[2], v[1])
            elif c == 1:
                t = (v[2], zero, -v[0])
            else:
                t = (-v[1], v[0], zero)
            w0 = g[0][0] * t[0] + g[0][1] * t[1] + g[0][2] * t[2]
            w1 = g[1][0] * t[0] + g[1][1] * t[1] + g[1][2] * t[2]
            w2 = g[2][0] * t[0] + g[2][1] * t[1] + g[2][2] * t[2]
            dS = [[None] * 3 for _ in range(3)]
            for b in range(3):
                sb0, sb1, sb2 = s_m[0][b], s_m[1][b], s_m[2][b]
                dS[0][b] = -(w1 * sb2 - w2 * sb1)
                dS[1][b] = -(w2 * sb0 - w0 * sb2)
                dS[2][b] = -(w0 * sb1 - w1 * sb0)
            for a in range(3):
                dS[a][c] = dS[a][c] + v[a]
            out[9 * 0 + 3 * r + c] = dS[0][0]
            out[9 * 1 + 3 * r + c] = dS[1][1]
            out[9 * 2 + 3 * r + c] = dS[2][2]
            out[9 * 3 + 3 * r + c] = 0.5 * (dS[0][1] + dS[1][0])
            out[9 * 4 + 3 * r + c] = 0.5 * (dS[0][2] + dS[2][0])
            out[9 * 5 + 3 * r + c] = 0.5 * (dS[1][2] + dS[2][1])
    return out


# ---------------------------------------------------------------------------
# contractions on rows (ports of ops/smallops contract_* without the
# interleave_cols layout conversion)
# ---------------------------------------------------------------------------

def contract_D_dphi_rows(D, dphi):
    """G[12*i + 3*k + r] = sum_c D[9*i + 3*r + c] * dphi[3*k + c]."""
    out = [None] * 72
    for i in range(6):
        for k in range(4):
            for r in range(3):
                acc = None
                for c in range(3):
                    t = D[9 * i + 3 * r + c] * dphi[3 * k + c]
                    acc = t if acc is None else acc + t
                out[12 * i + 3 * k + r] = acc
    return out


def contract_sym6_rows(M, X):
    """Y[12*i + a] = sum_j M[sym6(i,j)] * X[12*j + a], M sym6 (21 rows),
    X (72 rows)."""
    out = [None] * 72
    for i in range(6):
        for a in range(12):
            acc = None
            for j in range(6):
                t = M[sym6_idx(i, j)] * X[12 * j + a]
                acc = t if acc is None else acc + t
            out[12 * i + a] = acc
    return out


def symmatvec6_rows(M, x):
    """y_i = sum_j M[sym6(i,j)] x_j for sym6 M (21 rows), x (6 rows)."""
    return [
        sum(M[sym6_idx(i, j)] * x[j] for j in range(6)) for i in range(6)
    ]


# ---------------------------------------------------------------------------
# PSD projection of the 6x6 material Hessian on rows (port of psd_fix_sqrt)
# ---------------------------------------------------------------------------

def psd6_rows(H, tol: float = 1e-8, sweeps: int | None = None):
    """H: 21 sym6 rows -> (Hf 21, Hinv 21, Hs 21, max_eval row).
    Eigenvalue clamp to >= tol; Hs = H^{1/2} (see ops/psd.psd_fix_sqrt)."""
    dt = H[0].dtype
    if sweeps is None:
        sweeps = 8 if dt == jnp.float64 else 5
    w, V = jacobi_rows(list(H), 6, sweeps)
    tolr = jnp.asarray(tol, dt)
    w = [jnp.maximum(wi, tolr) for wi in w]
    winv = [1.0 / wi for wi in w]
    wsqrt = [jnp.sqrt(wi) for wi in w]

    def recon(vals):
        out = [None] * 21
        for i in range(6):
            for j in range(i, 6):
                acc = None
                for kk in range(6):
                    t = V[6 * i + kk] * vals[kk] * V[6 * j + kk]
                    acc = t if acc is None else acc + t
                out[sym6_idx(i, j)] = acc
        return out

    maxev = w[0]
    for wi in w[1:]:
        maxev = jnp.maximum(maxev, wi)
    return recon(w), recon(winv), recon(wsqrt), maxev


# ---------------------------------------------------------------------------
# material model derivatives on rows (autodiff over the row-stacked psi;
# the S-space densities in materials/models.py index s[0..5], so they
# evaluate on (6, E) stacks directly)
# ---------------------------------------------------------------------------

def _inv3_rows(s):
    """(tr, |S|^2, det) from sym3 rows (models._invariants_s, which keys
    its 2D/3D dispatch off shape[-1] and so cannot take (6, E) stacks)."""
    tr = s[0] + s[1] + s[2]
    n2 = s[0] ** 2 + s[1] ** 2 + s[2] ** 2 + 2.0 * (
        s[3] ** 2 + s[4] ** 2 + s[5] ** 2
    )
    det = (s[0] * s[1] * s[2] + 2.0 * s[3] * s[4] * s[5]
           - s[0] * s[5] ** 2 - s[1] * s[4] ** 2 - s[2] * s[3] ** 2)
    return tr, n2, det


def _norm_smi2_rows(s):
    return ((s[0] - 1.0) ** 2 + (s[1] - 1.0) ** 2 + (s[2] - 1.0) ** 2
            + 2.0 * (s[3] ** 2 + s[4] ** 2 + s[5] ** 2))


def _psir_arap(s, mu, la):
    return 0.5 * mu * _norm_smi2_rows(s)


def _psir_corot(s, mu, la):
    tr, _, _ = _inv3_rows(s)
    return 0.5 * la * (tr - 3.0) ** 2 + mu * _norm_smi2_rows(s)


def _psir_fcr(s, mu, la):
    _, _, det = _inv3_rows(s)
    return 0.5 * la * (det - 1.0) ** 2 + mu * _norm_smi2_rows(s)


def _psir_snh(s, mu, la):
    _, n2, det = _inv3_rows(s)
    return (mu * (1.0 - det) + 0.5 * la * (1.0 - det) ** 2
            + 0.5 * mu * (n2 - 3.0))


def _psir_nh(s, mu, la):
    _, n2, det = _inv3_rows(s)
    logd, ok = mat._safe_log(det)
    e = -mu * logd + 0.5 * la * logd**2 + 0.5 * mu * (n2 - 3.0)
    return jnp.where(ok, e, mat._BIG)


def _psir_fung(s, mu, la):
    _, n2, det = _inv3_rows(s)
    c = mat._FUNG_C
    return (0.5 * mu * (jnp.exp(0.5 * c * (n2 - 3.0)) - 1.0)
            + 0.5 * mu * (n2 - 3.0)
            + 0.5 * la * ((mu + c * mu) / la + 1.0 - det) ** 2)


# order matches models.MATERIAL_NAMES
_PSI_ROWS = (_psir_arap, _psir_corot, _psir_fcr, _psir_fung, _psir_nh,
             _psir_snh)


def _psi_rows_fn(mu, la, model_id, models):
    def f(s_rows):
        if len(models) == 1:
            return _PSI_ROWS[mat.model_index(models[0])](s_rows, mu, la)
        out = None
        for i, name in enumerate(models):
            val = _PSI_ROWS[mat.model_index(name)](s_rows, mu, la)
            mask = (model_id == i).astype(val.dtype)
            out = val * mask if out is None else out + val * mask
        return out

    return f


def psi_rows(s_rows, mu, la, model_id, models):
    """(6, E) stretch rows -> (E,) energy densities."""
    return _psi_rows_fn(mu, la, model_id, models)(jnp.stack(s_rows))


def grad_rows(s_rows, mu, la, model_id, models):
    """dpsi/ds rows (6, E) via one vjp (elements are independent, so the
    ones-cotangent vjp IS the per-element gradient)."""
    f = _psi_rows_fn(mu, la, model_id, models)
    s = jnp.stack(s_rows)
    val, vjp = jax.vjp(f, s)
    (gr,) = vjp(jnp.ones_like(val))
    return [gr[i] for i in range(6)]


def hess_rows(s_rows, mu, la, model_id, models):
    """d2psi/ds2 sym6 rows (21) via 6 jvp's of the gradient function."""
    f = _psi_rows_fn(mu, la, model_id, models)
    s = jnp.stack(s_rows)

    def gfn(sv):
        val, vjp = jax.vjp(f, sv)
        return vjp(jnp.ones_like(val))[0]

    cols = []
    for j in range(6):
        tang = jnp.zeros_like(s).at[j].set(1.0)
        _, hj = jax.jvp(gfn, (s,), (tang,))
        cols.append(hj)  # (6, E) = H[:, j]
    out = [None] * 21
    for i in range(6):
        for j in range(i, 6):
            # autodiff Hessian is symmetric; average for exactness
            out[sym6_idx(i, j)] = 0.5 * (cols[j][i] + cols[i][j])
    return out
