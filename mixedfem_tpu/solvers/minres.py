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


def kkt_operator(mesh: meshmod.MeshData, c: ms.StretchCoeffs):
    """Returns the matrix-free KKT product A(u), u = (dx, ds, dl)."""
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)

    def A(u):
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
        # s-row: vol H ds - W dl
        out_s = mesh.vols[:, None] * (
            jnp.einsum("eij,ej->ei", c.H, ds) - w * dl
        )
        # lam-row: C dx - W ds
        Gdx = jnp.einsum("eikr,ekr->ei", c.G, dxm[mesh.T])
        out_l = mesh.vols[:, None] * (w * (Gdx - ds))
        return (out_x, out_s, out_l)

    return A


def kkt_rhs(mesh, bdf, c: ms.StretchCoeffs, x, s, la, blend: float = 1.0):
    """Negative KKT gradient at the current iterate (linear_system.h:71-87)."""
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    r_x = -(disp.gradient(mesh, bdf, x, blend) + ms.gradient_x(mesh, c, la))
    r_s = -mesh.vols[:, None] * (c.g - w * la)
    r_l = -mesh.vols[:, None] * (w * (c.Sv - s))
    return (r_x, r_s, r_l)


def kkt_block_diag_preconditioner(mesh: meshmod.MeshData, c: ms.StretchCoeffs):
    """SPD block-diagonal preconditioner (BlockDiagonalPreconditioner
    analog, preconditioners.h:8-152): lumped-mass inverse on the x block,
    (vol H)^{-1} on the s block, and a lumped C M^{-1} C^T inverse on the
    dual block."""
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    m_inv = jnp.where(mesh.mass_lumped > 0, 1.0 / mesh.mass_lumped, 1.0)

    # dual block diag: L_e ~ vol^2 w^2 sum_{k,r} G^2 / m_lumped
    minv_e = m_inv[mesh.T]  # (E, k)
    L = jnp.einsum(
        "eikr,eikr,ek,e->ei", c.G, c.G, minv_e, mesh.vols**2
    ) * (w * w)[None, :]
    L = jnp.maximum(L, 1e-30)

    def Minv(u):
        r_x, r_s, r_l = u
        z_x = meshmod.project_free(mesh, r_x * m_inv[:, None])
        z_s = jnp.einsum("eij,ej->ei", c.Hinv, r_s) / mesh.vols[:, None]
        z_l = r_l / L
        return (z_x, z_s, z_l)

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
