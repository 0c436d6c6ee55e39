"""Host direct solver: scipy sparse factorization of the condensed system.

The reference's default solvers are direct (eigen-llt / cholmod,
src/factories/linear_solver_factory.cpp:64-99). On TPU the production path
is matrix-free PCG; this module assembles the same condensed SPD matrix on
the host (f64, scipy CSR) and solves it exactly — used as the cross-
validation oracle in tests and as the 'direct' solver option for small
scenes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from mixedfem_tpu.mesh.mesh import MeshData
from mixedfem_tpu.variables.mixed_stretch import StretchCoeffs


def assemble_condensed(
    mesh: MeshData,
    ms_coeffs: Optional[StretchCoeffs] = None,
    contact=None,  # (frames (C,4), Gx (C,4,d), H (C,), active (C,))
    v_coeffs=None,  # vanilla stretch VanillaCoeffs (h^2 vol psi'' in F-space)
    frame_hessians=(),  # [(frames (C,4), H (C,4d,4d)), ...] — vanilla
    #                     collision / friction full frame Hessians
    #                     (linear_system.h:17-31 sums nodal var lhs too)
) -> sp.csr_matrix:
    """Assemble P (M + K) P^T as scipy CSR over ALL dofs (pinned rows/cols
    are identity to keep the size fixed)."""
    T = np.asarray(mesh.T)
    d = mesh.dim
    nv = mesh.nv
    E, k = T.shape
    free = np.asarray(mesh.free_mask) > 0

    # element blocks
    eye = np.eye(d)
    Kkl = np.asarray(mesh.mass_coeff)[:, :, :, None, None] * eye
    if ms_coeffs is not None:
        G = np.asarray(ms_coeffs.G)
        H = np.asarray(ms_coeffs.H)
        vols = np.asarray(mesh.vols)
        Kkl = Kkl + np.einsum("eikr,eij,ejls,e->eklrs", G, H, G, vols)
    if v_coeffs is not None:
        # J^T psi''(F) J with dF_rc/dx_ks = delta_{rs} dphidX[k, c]
        dphi = np.asarray(mesh.dphidX)
        Hm = np.asarray(v_coeffs.H).reshape(E, d, d, d, d)
        Kkl = Kkl + np.einsum("ekc,ercsf,elf->eklrs", dphi, Hm, dphi)

    rows = (T[:, :, None, None, None] * d + np.arange(d)[None, None, None, :, None])
    rows = np.broadcast_to(rows, (E, k, k, d, d))
    cols = (T[:, None, :, None, None] * d + np.arange(d)[None, None, None, None, :])
    cols = np.broadcast_to(cols, (E, k, k, d, d))
    data = Kkl

    r = rows.reshape(-1)
    c = cols.reshape(-1)
    v = data.reshape(-1)

    if contact is not None:
        frames, Gx, Hc, active = (np.asarray(a) for a in contact)
        C = len(frames)
        if C:
            Aloc = np.einsum(
                "ckr,c,cls->cklrs", Gx, Hc * active, Gx
            )  # (C,4,4,d,d)
            fr = frames[:, :, None, None, None] * d + np.arange(d)[None, None, None, :, None]
            fr = np.broadcast_to(fr, (C, 4, 4, d, d))
            fc = frames[:, None, :, None, None] * d + np.arange(d)[None, None, None, None, :]
            fc = np.broadcast_to(fc, (C, 4, 4, d, d))
            r = np.concatenate([r, fr.reshape(-1)])
            c = np.concatenate([c, fc.reshape(-1)])
            v = np.concatenate([v, Aloc.reshape(-1)])

    for frames_h, Hf in frame_hessians:
        frames_h = np.asarray(frames_h)
        Hf = np.asarray(Hf)
        C = len(frames_h)
        if not C:
            continue
        kf = frames_h.shape[1]
        Hm = Hf.reshape(C, kf, d, kf, d).transpose(0, 1, 3, 2, 4)
        fr = frames_h[:, :, None, None, None] * d + np.arange(d)[None, None, None, :, None]
        fr = np.broadcast_to(fr, (C, kf, kf, d, d))
        fc = frames_h[:, None, :, None, None] * d + np.arange(d)[None, None, None, None, :]
        fc = np.broadcast_to(fc, (C, kf, kf, d, d))
        r = np.concatenate([r, fr.reshape(-1)])
        c = np.concatenate([c, fc.reshape(-1)])
        v = np.concatenate([v, Hm.reshape(-1)])

    # mask pinned dofs
    dof_free = np.repeat(free, d)
    keep = dof_free[r] & dof_free[c]
    A = sp.coo_matrix(
        (v[keep], (r[keep], c[keep])), shape=(nv * d, nv * d)
    ).tocsr()
    # identity on pinned dofs
    pinned = np.nonzero(~dof_free)[0]
    A = A + sp.coo_matrix(
        (np.ones(len(pinned)), (pinned, pinned)), shape=A.shape
    )
    return A


def solve_direct(A: sp.csr_matrix, b: np.ndarray) -> np.ndarray:
    """Sparse Cholesky-style exact solve (spsolve)."""
    return spla.spsolve(A.tocsc(), b)


def _ichol0_python(indptr, indices, data):
    """Pure-python IC(0) fallback (row loop; used only when the native
    library is unavailable — test-sized systems only)."""
    n = len(indptr) - 1
    dmax = max(abs(data[indptr[i + 1] - 1]) for i in range(n)) or 1.0
    a0 = data.copy()
    sigma = 0.0
    for _ in range(12):
        data[:] = a0
        if sigma > 0.0:
            data[indptr[1:] - 1] += sigma * dmax
        ok = True
        for i in range(n):
            r0, r1 = indptr[i], indptr[i + 1]
            for p in range(r0, r1 - 1):
                k = indices[p]
                ki1 = indptr[k + 1] - 1
                s, pi, pk = 0.0, r0, indptr[k]
                while pi < p and pk < ki1:
                    ci, ck = indices[pi], indices[pk]
                    if ci == ck:
                        s += data[pi] * data[pk]
                        pi += 1
                        pk += 1
                    elif ci < ck:
                        pi += 1
                    else:
                        pk += 1
                data[p] = (data[p] - s) / data[ki1]
            piv = data[r1 - 1] - np.dot(data[r0:r1 - 1], data[r0:r1 - 1])
            if piv <= 0.0 or not np.isfinite(piv):
                ok = False
                break
            data[r1 - 1] = np.sqrt(piv)
        if ok:
            return sigma
        sigma = 1e-3 if sigma == 0.0 else sigma * 10.0
    raise np.linalg.LinAlgError("IC(0) breakdown after 12 shift retries")


class ICholPreconditioner:
    """IC(0) of the condensed matrix: A ~= L L^T on A's lower pattern.

    True port of the reference's Eigen::IncompleteCholesky preconditioner
    ("eigen-pcg-IC", linear_solver_factory.cpp:115-130) including the
    shift-and-retry breakdown handling; factorization and triangular
    solves run in native C++ (csrc/native.cpp ichol0/ichol_solve) with a
    python fallback."""

    def __init__(self, A: sp.csr_matrix):
        from mixedfem_tpu.utils import native

        L = sp.tril(A.tocsr(), format="csr")
        L.sort_indices()
        self._indptr = L.indptr.astype(np.int64)
        self._indices = L.indices.astype(np.int64)
        self._data = np.ascontiguousarray(L.data, np.float64)
        self._native = native
        sigma = native.ichol0(self._indptr, self._indices, self._data)
        if sigma is None:
            sigma = _ichol0_python(self._indptr, self._indices, self._data)
        self.shift = sigma
        self._Lcsr = None

    def apply(self, r: np.ndarray) -> np.ndarray:
        x = np.array(r, np.float64, copy=True)
        if self._native.ichol_solve(
            self._indptr, self._indices, self._data, x
        ):
            return x
        if self._Lcsr is None:
            n = len(self._indptr) - 1
            self._Lcsr = sp.csr_matrix(
                (self._data, self._indices, self._indptr), shape=(n, n)
            )
        y = spla.spsolve_triangular(self._Lcsr, x, lower=True)
        return spla.spsolve_triangular(self._Lcsr.T.tocsr(), y, lower=False)


def solve_ic_pcg(A: sp.csr_matrix, b: np.ndarray, tol: float, maxiter: int):
    """CG on the condensed system with the IC(0) preconditioner, Eigen
    ConjugateGradient convergence semantics (iterate until
    |r|^2 <= tol^2 |b|^2; eigen_iterative_solver usage in the reference's
    "eigen-pcg-IC" registration). Returns (x, iters)."""
    M = ICholPreconditioner(A)
    x = np.zeros_like(b)
    r = b.copy()
    thresh = tol * tol * float(r @ r)
    z = M.apply(r)
    p = z.copy()
    rz = float(r @ z)
    it = 0
    while float(r @ r) > thresh and it < maxiter:
        Ap = A @ p
        alpha = rz / float(p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        z = M.apply(r)
        rz_new = float(r @ z)
        p = z + (rz_new / rz) * p
        rz = rz_new
        it += 1
    return x, it
