"""Dual-condensed system: Schur complement onto the multipliers.

Reference: src/linear_solvers/linear_system.h:121-239 (DualCondensedSystem,
used by the subspace-CG / subspace-amgcl factory entries): eliminate dx and
ds from the KKT using the LUMPED mass (G = M^{-1/2} B there), solve the SPD
dual system

  S dlam = C Ml^{-1} C^T dlam + W (vol H)^{-1} W dlam
         = C Ml^{-1} r_x - W (vol H)^{-1} r_s - r_l

with CG, then recover dx = Ml^{-1}(r_x - C^T dlam),
ds = (vol H)^{-1}(r_s + W dlam).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.ops import sym
from mixedfem_tpu.solvers import pcg as pcgmod
from mixedfem_tpu.variables import mixed_stretch as ms


def _C_apply(mesh, c, dx):
    """C dx = vol Sym (G : dx) per element -> (E, N)."""
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    Gdx = jnp.einsum("eikr,ekr->ei", c.G, dx[mesh.T])
    return mesh.vols[:, None] * (w * Gdx)


def _Ct_apply(mesh, c, dl):
    """C^T dl -> (nv, d) masked."""
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    y = jnp.einsum("eikr,ei,e->ekr", c.G, w * dl, mesh.vols)
    out = jax.ops.segment_sum(
        y.reshape(-1, mesh.dim), mesh.T.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)


def solve_dual(
    mesh: meshmod.MeshData,
    c: ms.StretchCoeffs,
    rhs_kkt,
    max_iters: int = 500,
    tol: float = 1e-8,
):
    """Solve the dual-condensed system. rhs_kkt = (r_x, r_s, r_l) from
    solvers/minres.kkt_rhs. Returns (dx, ds, dlam, iters, rel)."""
    r_x, r_s, r_l = rhs_kkt
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    ml_inv = jnp.where(mesh.mass_lumped > 0, 1.0 / mesh.mass_lumped, 0.0)

    def Ml_inv(v):
        return meshmod.project_free(mesh, v * ml_inv[:, None])

    def Hv_inv(v):
        return jnp.einsum("eij,ej->ei", c.Hinv, v) / mesh.vols[:, None]

    vw = mesh.vols[:, None] * w  # the KKT s-row weight W = vol * Sym

    def S(dl):
        a = _C_apply(mesh, c, Ml_inv(_Ct_apply(mesh, c, dl)))
        b = vw * Hv_inv(vw * dl)
        return a + b

    b_dual = _C_apply(mesh, c, Ml_inv(r_x)) - vw * Hv_inv(r_s) - r_l

    # diagonal preconditioner of S (lumped C Ml^-1 C^T + W Hinv W / vol diag)
    minv_e = ml_inv[mesh.T]
    diag1 = jnp.einsum(
        "eikr,eikr,ek,e->ei", c.G, c.G, minv_e, mesh.vols**2
    ) * (w * w)[None, :]
    hinv_diag = jnp.diagonal(c.Hinv, axis1=-2, axis2=-1) / mesh.vols[:, None]
    diag = jnp.maximum(diag1 + vw * vw * hinv_diag, 1e-30)

    dl, it, rel = pcgmod.pcg(
        S, b_dual, jnp.zeros_like(b_dual), lambda r: r / diag,
        max_iters=max_iters, tol=tol,
    )
    dx = Ml_inv(r_x - _Ct_apply(mesh, c, dl))
    ds = Hv_inv(r_s + vw * dl)
    return dx, ds, dl, it, rel
