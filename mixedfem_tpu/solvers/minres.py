"""Matrix-free MINRES and the full indefinite KKT system.

Reference: src/linear_solvers/linear_system.h:65-118 (SystemMatrixIndefinite)
+ src/linear_solvers/block_matrix.h:74-125 (matrix-free KKT product via
variable callbacks) + the minres-indefinite-* factory entries. The KKT
system in the mixed unknowns u = (dx, ds, dlam):

  [ M        0         C^T ] [dx]     [ r_x ]   r_x  = -(M(x-xt) + C^T lam)
  [ 0        vol H    -W   ] [ds]  =  [ r_s ]   r_s  = -(vol g - W lam)
  [ C       -W         0   ] [dl]     [ r_l ]   r_l  = -(W (Sv - s))

with (C dx)_e = vol_e Sym (G_e : dx) (constraint jacobian) and
W = diag(vol * Sym). Eliminating (ds, dl) reproduces the condensed SPD
system exactly — tested in tests/test_kkt.py. Unknowns are the pytree
(dx (nv,d), ds (E,N), dl (E,N)).

MINRES follows the classic Paige-Saunders recurrence (preconditioned, SPD
preconditioner), on arbitrary pytrees, as a lax.while_loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.ops import sym
from mixedfem_tpu.variables import displacement as disp
from mixedfem_tpu.variables import mixed_stretch as ms


def _dot(a, b):
    return sum(
        jnp.vdot(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def _axpy(alpha, x, y):
    """alpha * x + y"""
    return jax.tree.map(lambda a, b: alpha * a + b, x, y)


def _scale(alpha, x):
    return jax.tree.map(lambda a: alpha * a, x)


def kkt_operator(
    mesh: meshmod.MeshData,
    c: ms.StretchCoeffs,
    cf=None,
    cc=None,
    extra_x_matvec=None,
):
    """Returns the matrix-free KKT product A(u).

    Without contact u = (dx, ds, dl); with contact frames (cf: ContactFrames,
    cc: CollisionCoeffs) the system stacks the MixedCollision blocks exactly
    like the reference's SystemMatrixIndefinite stacks ALL mixed variables
    (linear_system.h:65-118, block_matrix.h:74-125): u = (dx, ds, dl, dd,
    dlc) with the contact rows

      x-row  += Gx^T dlc            (constraint jacobian transpose)
      d-row   = Hc dd - dlc         (barrier Hessian; Gd = -1)
      lc-row  = Gx : dx - dd        (linearized D(x) - d)

    `extra_x_matvec(dx)` adds displacement-only Hessian products (vanilla
    collision / friction, the reference's nodal vars in the same stack)."""
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    has_contact = cf is not None and cf.frames.shape[0] > 0

    def A(u):
        if has_contact:
            dx, ds, dl, dd, dlc = u
        else:
            dx, ds, dl = u
        dxm = meshmod.project_free(mesh, dx)
        # x-row: M dx + C^T dl = M dx + scatter(vol G^T Sym dl)
        out_x = meshmod.project_free(mesh, meshmod.mass_matvec(mesh, dxm))
        y = jnp.einsum("eikr,ei,e->ekr", c.G, w * dl, mesh.vols)
        out_x = out_x + meshmod.project_free(
            mesh,
            jax.ops.segment_sum(
                y.reshape(-1, mesh.dim),
                mesh.T.reshape(-1),
                num_segments=mesh.nv,
            ),
        )
        if extra_x_matvec is not None:
            out_x = out_x + extra_x_matvec(dxm)
        # s-row: vol H ds - W dl
        out_s = mesh.vols[:, None] * (
            jnp.einsum("eij,ej->ei", c.H, ds) - w * dl
        )
        # lam-row: C dx - W ds
        Gdx = jnp.einsum("eikr,ekr->ei", c.G, dxm[mesh.T])
        out_l = mesh.vols[:, None] * (w * (Gdx - ds))
        if not has_contact:
            return (out_x, out_s, out_l)
        act = cc.active
        # x-row += Gx^T dlc over active frames
        contrib = cc.Gx * (dlc * act)[:, None, None]
        out_x = out_x + meshmod.project_free(
            mesh,
            jax.ops.segment_sum(
                contrib.reshape(-1, mesh.dim),
                cf.frames.reshape(-1),
                num_segments=mesh.nv,
            ),
        )
        # d-row: Hc dd - dlc  (identity on inactive frames keeps S nonsingular)
        out_d = jnp.where(act > 0, cc.H * dd - dlc, dd)
        # lc-row: Gx : dx - dd
        Gcdx = jnp.einsum("ckd,ckd->c", cc.Gx, dxm[cf.frames])
        out_lc = jnp.where(act > 0, Gcdx - dd, dlc)
        return (out_x, out_s, out_l, out_d, out_lc)

    return A


def kkt_rhs(
    mesh, bdf, c: ms.StretchCoeffs, x, s, la,
    blend: float = 1.0,
    cf=None, cc=None, extra_grad_x=None,
):
    """Negative KKT gradient at the current iterate (linear_system.h:71-87).

    With contact (cf/cc): appends r_d = -(g_c - la_c), r_lc = -(D - d) and
    adds the contact x-gradient Gx^T la_c (Gd = -1 throughout, matching
    mixed_collision.cpp:252-272)."""
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    r_x = -(disp.gradient(mesh, bdf, x, blend) + ms.gradient_x(mesh, c, la))
    r_s = -mesh.vols[:, None] * (c.g - w * la)
    r_l = -mesh.vols[:, None] * (w * (c.Sv - s))
    if extra_grad_x is not None:
        r_x = r_x - extra_grad_x
    if cf is None or cf.frames.shape[0] == 0:
        return (r_x, r_s, r_l)
    act = cc.active
    contrib = cc.Gx * (cc.la * act)[:, None, None]
    r_x = r_x - meshmod.project_free(
        mesh,
        jax.ops.segment_sum(
            contrib.reshape(-1, mesh.dim),
            cf.frames.reshape(-1),
            num_segments=mesh.nv,
        ),
    )
    r_d = -(cc.g - cc.la) * act
    r_lc = -(cc.D - cc.d) * act
    return (r_x, r_s, r_l, r_d, r_lc)


def kkt_block_diag_preconditioner(
    mesh: meshmod.MeshData, c: ms.StretchCoeffs, cf=None, cc=None
):
    """SPD block-diagonal preconditioner (BlockDiagonalPreconditioner
    analog, preconditioners.h:8-152): lumped-mass inverse on the x block,
    (vol H)^{-1} on the s block, and a lumped C M^{-1} C^T inverse on the
    dual block(s). Contact adds Hc^{-1} on the d block and a lumped
    Gx Ml^{-1} Gx^T + Hc^{-1} diagonal on the contact-dual block."""
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    m_inv = jnp.where(mesh.mass_lumped > 0, 1.0 / mesh.mass_lumped, 1.0)
    has_contact = cf is not None and cf.frames.shape[0] > 0

    # dual block diag: L_e ~ vol^2 w^2 sum_{k,r} G^2 / m_lumped
    minv_e = m_inv[mesh.T]  # (E, k)
    L = jnp.einsum(
        "eikr,eikr,ek,e->ei", c.G, c.G, minv_e, mesh.vols**2
    ) * (w * w)[None, :]
    L = jnp.maximum(L, 1e-30)

    if has_contact:
        act = cc.active
        hc_inv = jnp.where(act > 0, 1.0 / jnp.maximum(cc.H, 1e-8), 1.0)
        Lc = jnp.einsum(
            "ckr,ckr,ck->c", cc.Gx, cc.Gx, m_inv[cf.frames]
        )
        Lc = jnp.where(act > 0, jnp.maximum(Lc + hc_inv, 1e-30), 1.0)

    def Minv(u):
        if has_contact:
            r_x, r_s, r_l, r_d, r_lc = u
        else:
            r_x, r_s, r_l = u
        z_x = meshmod.project_free(mesh, r_x * m_inv[:, None])
        z_s = jnp.einsum("eij,ej->ei", c.Hinv, r_s) / mesh.vols[:, None]
        z_l = r_l / L
        if not has_contact:
            return (z_x, z_s, z_l)
        return (z_x, z_s, z_l, r_d * hc_inv, r_lc / Lc)

    return Minv


def minres(A: Callable, b, x0, max_iters: int, tol: float, Minv=None):
    """Preconditioned MINRES (Paige-Saunders) on pytrees.

    Stops when the preconditioned residual norm phibar <= tol * beta1.
    Returns (x, iters, rel_residual)."""
    if Minv is None:
        Minv = lambda r: r

    r1 = _axpy(-1.0, A(x0), b)     # residual
    y = Minv(r1)
    beta1 = jnp.sqrt(jnp.maximum(_dot(r1, y), 0.0))
    dt = beta1.dtype
    safe_beta1 = jnp.where(beta1 > 0, beta1, 1.0)

    zero_tree = jax.tree.map(jnp.zeros_like, b)

    def cond(carry):
        (x, r1c, r2c, yc, oldb, beta, dbar, epsln, phibar, cs, sn, wv, w2,
         it) = carry
        return jnp.logical_and(it < max_iters, phibar > tol * safe_beta1)

    def body(carry):
        (x, r1c, r2c, yc, oldb, beta, dbar, epsln, phibar, cs, sn, wv, w2,
         it) = carry
        safe_b = jnp.where(beta != 0, beta, 1.0)
        v = _scale(1.0 / safe_b, yc)
        yn = A(v)
        yn = jax.lax.cond(
            it >= 1,
            lambda yy: _axpy(-(beta / jnp.where(oldb != 0, oldb, 1.0)), r1c, yy),
            lambda yy: yy,
            yn,
        )
        alfa = _dot(v, yn)
        yn = _axpy(-(alfa / safe_b), r2c, yn)
        r1n, r2n = r2c, yn
        zn = Minv(r2n)
        oldb_n = beta
        beta_n = jnp.sqrt(jnp.maximum(_dot(r2n, zn), 0.0))

        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln_n = sn * beta_n
        dbar_n = -cs * beta_n
        gamma = jnp.sqrt(gbar * gbar + beta_n * beta_n)
        gamma = jnp.maximum(gamma, jnp.asarray(1e-30, dt))
        cs_n = gbar / gamma
        sn_n = beta_n / gamma
        phi = cs_n * phibar
        phibar_n = sn_n * phibar

        w1 = w2
        w2n = wv
        wn = _scale(
            1.0 / gamma,
            _axpy(-oldeps, w1, _axpy(-delta, w2n, v)),
        )
        xn = _axpy(phi, wn, x)
        return (
            xn, r1n, r2n, zn, oldb_n, beta_n, dbar_n, epsln_n, phibar_n,
            cs_n, sn_n, wn, w2n, it + 1,
        )

    init = (
        x0, r1, r1, y,
        jnp.zeros((), dt), beta1, jnp.zeros((), dt), jnp.zeros((), dt),
        beta1, -jnp.ones((), dt), jnp.zeros((), dt),
        zero_tree, zero_tree, jnp.zeros((), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    x = out[0]
    phibar = out[8]
    it = out[13]
    return x, it, phibar / safe_beta1
