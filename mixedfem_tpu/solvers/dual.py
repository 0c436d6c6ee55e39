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


def _Cc_apply(cf, cc, dx):
    """Contact constraint jacobian: (Gx : dx) per frame -> (C,)."""
    Gdx = jnp.einsum("ckd,ckd->c", cc.Gx, dx[cf.frames])
    return Gdx * cc.active


def _Cct_apply(mesh, cf, cc, dlc):
    """Gx^T dlc -> (nv, d) masked."""
    contrib = cc.Gx * (dlc * cc.active)[:, None, None]
    out = jax.ops.segment_sum(
        contrib.reshape(-1, mesh.dim),
        cf.frames.reshape(-1),
        num_segments=mesh.nv,
    )
    return meshmod.project_free(mesh, out)


def solve_dual(
    mesh: meshmod.MeshData,
    c: ms.StretchCoeffs,
    rhs_kkt,
    max_iters: int = 500,
    tol: float = 1e-8,
    cf=None,
    cc=None,
):
    """Solve the dual-condensed system. rhs_kkt = (r_x, r_s, r_l[, r_d,
    r_lc]) from solvers/minres.kkt_rhs. Returns (dx, ds, dlam[, dd, dlc],
    iters, rel).

    With contact the Schur complement couples BOTH multiplier sets

      [ Cs Ml^-1 Cs^T + W Hv^-1 W     Cs Ml^-1 Cc^T          ] [dl ]
      [ Cc Ml^-1 Cs^T                 Cc Ml^-1 Cc^T + Hc^-1  ] [dlc]

    NOTE the reference's DualCondensedSystem loops over mixed variables but
    OVERWRITES lhs_/rhs_ per variable (linear_system.h:150-172) — only the
    last variable's system survives, so multi-variable contact scenes were
    effectively broken there. This implements the coupled elimination the
    comment structure intends."""
    has_contact = cf is not None and cf.frames.shape[0] > 0
    if has_contact:
        r_x, r_s, r_l, r_d, r_lc = rhs_kkt
    else:
        r_x, r_s, r_l = rhs_kkt
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    ml_inv = jnp.where(mesh.mass_lumped > 0, 1.0 / mesh.mass_lumped, 0.0)

    def Ml_inv(v):
        return meshmod.project_free(mesh, v * ml_inv[:, None])

    def Hv_inv(v):
        return jnp.einsum("eij,ej->ei", c.Hinv, v) / mesh.vols[:, None]

    vw = mesh.vols[:, None] * w  # the KKT s-row weight W = vol * Sym

    # diagonal preconditioner of S (lumped C Ml^-1 C^T + W Hinv W / vol diag)
    minv_e = ml_inv[mesh.T]
    diag1 = jnp.einsum(
        "eikr,eikr,ek,e->ei", c.G, c.G, minv_e, mesh.vols**2
    ) * (w * w)[None, :]
    hinv_diag = jnp.diagonal(c.Hinv, axis1=-2, axis2=-1) / mesh.vols[:, None]
    diag = jnp.maximum(diag1 + vw * vw * hinv_diag, 1e-30)

    if not has_contact:

        def S(dl):
            a = _C_apply(mesh, c, Ml_inv(_Ct_apply(mesh, c, dl)))
            b = vw * Hv_inv(vw * dl)
            return a + b

        b_dual = _C_apply(mesh, c, Ml_inv(r_x)) - vw * Hv_inv(r_s) - r_l
        dl, it, rel = pcgmod.pcg(
            S, b_dual, jnp.zeros_like(b_dual), lambda r: r / diag,
            max_iters=max_iters, tol=tol,
        )
        dx = Ml_inv(r_x - _Ct_apply(mesh, c, dl))
        ds = Hv_inv(r_s + vw * dl)
        return dx, ds, dl, it, rel

    act = cc.active
    hc_inv = jnp.where(act > 0, 1.0 / jnp.maximum(cc.H, 1e-8), 0.0)

    def S2(u):
        dl, dlc = u
        t = Ml_inv(_Ct_apply(mesh, c, dl) + _Cct_apply(mesh, cf, cc, dlc))
        out_l = _C_apply(mesh, c, t) + vw * Hv_inv(vw * dl)
        out_lc = _Cc_apply(cf, cc, t) + hc_inv * dlc
        # identity on inactive contact rows
        out_lc = jnp.where(act > 0, out_lc, dlc)
        return (out_l, out_lc)

    b_l = _C_apply(mesh, c, Ml_inv(r_x)) - vw * Hv_inv(r_s) - r_l
    b_lc = (_Cc_apply(cf, cc, Ml_inv(r_x)) - hc_inv * r_d - r_lc) * act

    diag_lc = jnp.einsum(
        "ckr,ckr,ck->c", cc.Gx, cc.Gx, ml_inv[cf.frames]
    )
    diag_lc = jnp.where(act > 0, jnp.maximum(diag_lc + hc_inv, 1e-30), 1.0)

    def Minv2(u):
        rl, rlc = u
        return (rl / diag, rlc / diag_lc)

    (dl, dlc), it, rel = pcgmod.pcg_tree(
        S2, (b_l, b_lc),
        (jnp.zeros_like(b_l), jnp.zeros_like(b_lc)),
        Minv2, max_iters=max_iters, tol=tol,
    )
    dx = Ml_inv(
        r_x - _Ct_apply(mesh, c, dl) - _Cct_apply(mesh, cf, cc, dlc)
    )
    ds = Hv_inv(r_s + vw * dl)
    dd = hc_inv * (r_d + dlc) * act
    return dx, ds, dl, dd, dlc, it, rel
