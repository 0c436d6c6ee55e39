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
