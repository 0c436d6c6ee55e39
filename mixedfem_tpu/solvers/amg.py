"""Host smoothed-aggregation AMG on the dual system ("subspace-amgcl").

True port of the reference's AMGCLSolver (src/linear_solvers/
amgcl_solver.h:20-85): amgcl with smoothed-aggregation coarsening, SPAI(0)
relaxation, and a CG outer solver, applied to the ASSEMBLED dual-condensed
system with block value type N x N (N = 6 in 3D, 3 in 2D — the per-element
multiplier block; `prm.precond.coarsening.aggr.block_size = N`). amgcl runs
on the CPU in the reference, so — exactly like the direct / eigen-pcg-IC
paths — this path assembles and solves on the host in f64 and the Newton
loop around it is optimizer/newton_direct.py.

The dual system itself is the same Schur complement solvers/dual.py solves
matrix-free (linear_system.h:121-239, lumped-mass elimination):

  S = C Ml^{-1} C^T + W (vol H)^{-1} W,      C = vol * Sym G
  S dlam = C Ml^{-1} r_x - W (vol H)^{-1} r_s - r_l
  dx = Ml^{-1}(r_x - C^T dlam),   ds = (vol H)^{-1}(r_s + W dlam)

Algorithmic choices mirroring amgcl's defaults:
  - strength of connection on the condensed block graph,
    |A_ef|_F > eps * sqrt(|A_ee|_F |A_ff|_F), eps = 0.08
  - greedy root aggregation over strong neighbors
  - tentative prolongator = block identity per aggregate; smoothed
    P = (I - omega D^{-1} A_filtered) P_tent with omega = 4/(3 rho),
    rho from power iteration on D^{-1} A (the standard SA damping)
  - SPAI(0) diagonal smoother m_i = a_ii / sum_j a_ij^2, one pre- and one
    post-sweep per level (amgcl npre/npost defaults)
  - dense coarsest solve; V(1,1) cycle as the CG preconditioner
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from mixedfem_tpu.mesh.mesh import MeshData
from mixedfem_tpu.ops import sym as symmod
from mixedfem_tpu.variables.mixed_stretch import StretchCoeffs


def assemble_dual(mesh: MeshData, c: StretchCoeffs):
    """Assemble the dual Schur matrix S (N*E x N*E scipy CSR) plus the
    operators needed for rhs/recovery: (S, C csr, mlinv_dof (nv*d,),
    WHinvW applied via S's block-diagonal term is NOT separable, so the
    recovery pieces Hinv/vols/w are returned as arrays)."""
    T = np.asarray(mesh.T)
    G = np.asarray(c.G, np.float64)          # (E, N, k, d)
    vols = np.asarray(mesh.vols, np.float64)
    Hinv = np.asarray(c.Hinv, np.float64)    # (E, N, N)
    E, N, k, d = G.shape
    nv = mesh.nv
    w = np.asarray(
        symmod.sym_weights(mesh.dim, dtype=np.float64)
    )                                         # (N,)
    free = np.asarray(mesh.free_mask) > 0
    dof_free = np.repeat(free, d)

    # C (N*E x d*nv): C[eN+i, T[e,k]*d+r] = vols[e] * w[i] * G[e,i,k,r];
    # pinned columns zeroed (the project_free in solvers/dual._Ct_apply)
    rows = (np.arange(E)[:, None, None, None] * N
            + np.arange(N)[None, :, None, None])
    rows = np.broadcast_to(rows, (E, N, k, d)).reshape(-1)
    cols = (T[:, None, :, None] * d + np.arange(d)[None, None, None, :])
    cols = np.broadcast_to(cols, (E, N, k, d)).reshape(-1)
    vals = (vols[:, None, None, None] * w[None, :, None, None] * G).reshape(-1)
    vals = np.where(dof_free[cols], vals, 0.0)
    C = sp.coo_matrix((vals, (rows, cols)), shape=(N * E, d * nv)).tocsr()

    ml = np.asarray(mesh.mass_lumped, np.float64)
    mlinv = np.where(ml > 0, 1.0 / ml, 0.0)
    mlinv_dof = np.repeat(mlinv, d) * dof_free

    # W Hv^{-1} W block diagonal: vol * w_i Hinv[e, i, j] w_j
    blocks = vols[:, None, None] * (w[:, None] * Hinv * w[None, :])
    Bd = sp.bsr_matrix(
        (blocks, np.arange(E), np.arange(E + 1)), shape=(N * E, N * E)
    ).tocsr()
    S = (C @ sp.diags(mlinv_dof) @ C.T + Bd).tocsr()
    return S, C, mlinv_dof, blocks


class SAAMG:
    """Smoothed-aggregation AMG hierarchy with SPAI(0) smoothing."""

    def __init__(self, A: sp.csr_matrix, block_size: int,
                 eps_strong: float = 0.08, max_levels: int = 10,
                 coarse_size: int = 60):
        self.levels = []
        self.block_size = block_size
        while len(self.levels) < max_levels and A.shape[0] > coarse_size:
            P = self._sa_prolongator(A, block_size, eps_strong)
            if P is None or P.shape[1] >= A.shape[0]:
                break
            spai = self._spai0(A)
            self.levels.append((A, P, spai))
            A = (P.T @ A @ P).tocsr()
        self.A_coarse = A.toarray()
        # dense coarsest solve (amgcl uses a direct solver at the bottom);
        # pseudo-inverse guards the semidefinite all-pinned corner case
        self.A_coarse_inv = np.linalg.pinv(self.A_coarse)

    @staticmethod
    def _spai0(A: sp.csr_matrix) -> np.ndarray:
        """SPAI(0): diagonal M minimizing |I - M A|_F: m_i = a_ii / sum a_ij^2
        (amgcl relaxation::spai0)."""
        d = A.diagonal()
        row_sq = np.asarray(A.multiply(A).sum(axis=1)).ravel()
        return np.where(row_sq > 0, d / row_sq, 0.0)

    @staticmethod
    def _sa_prolongator(A: sp.csr_matrix, bs: int, eps: float):
        """Aggregate the block graph, smooth the tentative block-identity
        prolongator."""
        n = A.shape[0]
        nb = n // bs
        # condensed block graph by Frobenius norms
        coo = A.tocoo()
        br, bc = coo.row // bs, coo.col // bs
        Bn = sp.coo_matrix((coo.data ** 2, (br, bc)), shape=(nb, nb)).tocsr()
        Bn.sum_duplicates()
        diag = Bn.diagonal()
        # strong connections: |A_ef|_F > eps sqrt(|A_ee|_F |A_ff|_F)
        Bc = Bn.tocoo()
        thresh = (eps ** 2) * np.sqrt(
            np.maximum(diag[Bc.row], 0) * np.maximum(diag[Bc.col], 0)
        )
        strong = (Bc.data > thresh) & (Bc.row != Bc.col)
        Gs = sp.coo_matrix(
            (np.ones(strong.sum()), (Bc.row[strong], Bc.col[strong])),
            shape=(nb, nb),
        ).tocsr()

        # greedy root aggregation (amgcl coarsening::aggregation phase 1+2)
        agg = np.full(nb, -1, np.int64)
        na = 0
        indptr, indices = Gs.indptr, Gs.indices
        for i in range(nb):
            if agg[i] >= 0:
                continue
            nbrs = indices[indptr[i]:indptr[i + 1]]
            if (agg[nbrs] >= 0).any():
                continue  # neighbor already aggregated: defer to phase 2
            agg[i] = na
            agg[nbrs] = na
            na += 1
        for i in range(nb):  # phase 2: attach leftovers to a strong aggregate
            if agg[i] >= 0:
                continue
            nbrs = indices[indptr[i]:indptr[i + 1]]
            owned = nbrs[agg[nbrs] >= 0]
            if len(owned):
                agg[i] = agg[owned[0]]
            else:
                agg[i] = na
                na += 1
        if na >= nb:
            return None

        # tentative block-identity prolongator (n x na*bs)
        rows = np.arange(n)
        cols = agg[rows // bs] * bs + (rows % bs)
        Pt = sp.coo_matrix(
            (np.ones(n), (rows, cols)), shape=(n, na * bs)
        ).tocsr()

        # damped Jacobi smoothing: P = (I - omega D^{-1} A) Pt
        dinv = 1.0 / np.maximum(A.diagonal(), 1e-300)
        DA = sp.diags(dinv) @ A
        # power iteration for rho(D^{-1} A)
        x = np.ones(n) / np.sqrt(n)
        rho = 1.0
        for _ in range(10):
            y = DA @ x
            ny = np.linalg.norm(y)
            if ny == 0:
                break
            rho = ny
            x = y / ny
        omega = 4.0 / (3.0 * max(rho, 1e-12))
        return (Pt - omega * (DA @ Pt)).tocsr()

    def vcycle(self, b: np.ndarray, lvl: int = 0) -> np.ndarray:
        if lvl == len(self.levels):
            return self.A_coarse_inv @ b
        A, P, spai = self.levels[lvl]
        x = spai * b                          # pre-smooth from x=0
        r = b - A @ x
        x = x + P @ self.vcycle(P.T @ r, lvl + 1)
        x = x + spai * (b - A @ x)            # post-smooth
        return x


def solve_amg_cg(S: sp.csr_matrix, b: np.ndarray, block_size: int,
                 tol: float, maxiter: int):
    """CG on the dual system with one SA-AMG V(1,1) cycle as the
    preconditioner (amgcl make_solver<amg<...>, solver::cg> semantics:
    converge when |r| <= tol |b|). Returns (x, iters)."""
    amg = SAAMG(S, block_size)
    x = np.zeros_like(b)
    r = b.copy()
    nb = float(np.linalg.norm(b))
    if nb == 0.0:
        return x, 0
    z = amg.vcycle(r)
    p = z.copy()
    rz = float(r @ z)
    it = 0
    while float(np.linalg.norm(r)) > tol * nb and it < maxiter:
        Sp = S @ p
        alpha = rz / float(p @ Sp)
        x += alpha * p
        r -= alpha * Sp
        z = amg.vcycle(r)
        rz_new = float(r @ z)
        p = z + (rz_new / rz) * p
        rz = rz_new
        it += 1
    return x, it


def solve_dual_amg(mesh: MeshData, c: StretchCoeffs, rhs_kkt,
                   tol: float, maxiter: int):
    """Full dual solve with the AMG-preconditioned CG: rhs_kkt = (r_x, r_s,
    r_l) from solvers/minres.kkt_rhs. Returns (dx, ds, dlam, iters) as
    numpy f64 arrays (the host path's dtype)."""
    r_x = np.asarray(rhs_kkt[0], np.float64)
    r_s = np.asarray(rhs_kkt[1], np.float64)
    r_l = np.asarray(rhs_kkt[2], np.float64)
    E, N = r_s.shape
    d = mesh.dim

    S, C, mlinv_dof, blocks = assemble_dual(mesh, c)
    vols = np.asarray(mesh.vols, np.float64)
    Hinv = np.asarray(c.Hinv, np.float64)
    w = np.asarray(symmod.sym_weights(d, dtype=np.float64))

    def Hv_inv(v):  # (E, N) -> (E, N)
        return np.einsum("eij,ej->ei", Hinv, v) / vols[:, None]

    rx_flat = r_x.reshape(-1)
    vw = vols[:, None] * w[None, :]
    b = (C @ (mlinv_dof * rx_flat)).reshape(E, N) - vw * Hv_inv(r_s) - r_l

    dl_flat, iters = solve_amg_cg(
        S, b.reshape(-1), block_size=N, tol=tol, maxiter=maxiter
    )
    dl = dl_flat.reshape(E, N)
    dx = (mlinv_dof * (rx_flat - C.T @ dl_flat)).reshape(-1, d)
    ds = Hv_inv(r_s + vw * dl)
    return dx, ds, dl, iters
