"""ADMM solve of the full mixed KKT system (the reference's "admm-solver").

True port of ADMMPreconditioner (src/linear_solvers/preconditioners.h:
154-363), which — despite the name — is registered as a standalone LINEAR
SOLVER on the indefinite system (linear_solver_factory.cpp "admm-solver").
Per iteration it alternates, on the KKT unknowns u = (dx, ds, dl):

  x-update:  (M + rho B^T B) dx = b_x - B^T l  - rho B^T (C s - c)
  s-update:  (H + rho C^T C) ds = b_s - C^T l  - rho C^T (B x - c)
  l-update:  l <- l + step * (B dx + C ds - c)

with B = the constraint jacobian w.r.t. x ((B dx)_e = vol_e w Sym(G:dx)),
C = -vol w (diagonal), c = b_l (the constraint residual row of the KKT
rhs), and the quadratic-penalty factorizations M + rho B B^T and
H + rho C^2 (preconditioners.h:216-236). With contact frames the loop
covers MixedCollision exactly like the reference's `for var in mixed_vars`
(B_c = Gx per frame, C_c = -1, H_c the barrier Hessian).

DEVIATIONS from the as-shipped C++ (all documented here because that code
is explicitly experimental — its own comments read "TODO why the hell"):

1. rho: the reference hard-codes rho = 0.02 and a dual step of 1
   (preconditioners.h:214,316). On vol-weighted constraint jacobians the
   dual Schur complement has eigenvalues ~vol/density, so that fixed step
   moves the multipliers by ~1e-3 of the residual per sweep — measured
   on the two-tet and beam fixtures the as-shipped constants need O(1e4)
   sweeps. Here rho is auto-scaled to balance the penalty against the
   mixed Hessian block, rho = rho_scale * mean(vol |H|) / mean(vol^2 w^2),
   and the dual step equals rho (the standard convergent ADMM step);
   rho_scale ~ 3 reaches 1e-6 relative error in ~100 sweeps on the same
   fixtures.
2. The reference's x-RHS reads the CURRENT (just-zeroed) s iterate for the
   penalty term (preconditioners.h:262-268 reads x.segment after
   x.setZero()), dropping that term entirely; the standard Gauss-Seidel
   ADMM term (previous s iterate, constraint offset c included) is used
   instead.
3. The (M + rho B^T B) solve: the reference prefactors with SimplicialLLT
   per solve (re-built EVERY _solve_impl call, :216-236). Sparse Cholesky
   has no TPU analog; the solve here is an inner Jacobi-PCG with a fixed
   sweep count, warm-started from the previous outer iterate.
4. Convergence: the reference stops on the ABSOLUTE iterate change
   ||u - u0|| < tol; here the test is relative to ||b|| so scene scaling
   does not change the meaning of config.itr_tol.

The reference asserts state_->vars_.size() == 0 (preconditioners.h:212):
nodal (displacement-only Hessian) variables are rejected on this path —
newton.py enforces the same restriction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.ops import sym
from mixedfem_tpu.solvers import pcg as pcgmod
from mixedfem_tpu.variables import mixed_stretch as ms


def _admm_setup(
    mesh: meshmod.MeshData,
    c: ms.StretchCoeffs,
    *,
    rho_scale: float,
    inner_iters: int,
    cf=None,
    cc=None,
):
    """rhs-independent setup of the ADMM iteration: the penalty scaling,
    the constraint-jacobian products, the x-block operator + Jacobi
    diagonal, and the s/d-block factorizations. Built once per Newton
    iteration; shared by the standalone admm-solver and the fixed-sweep
    MINRES preconditioner (minres-indefinite-admm)."""
    w = sym.sym_weights(mesh.dim, dtype=mesh.vols.dtype)
    vols = mesh.vols
    has_contact = cf is not None and cf.frames.shape[0] > 0
    act = cc.active if has_contact else None

    # rho auto-scaling (deviation 1)
    hbar = jnp.mean(vols[:, None, None] * jnp.abs(c.H))
    cbar = jnp.mean(vols[:, None] ** 2 * (w * w)[None, :])
    rho = rho_scale * hbar / jnp.maximum(cbar, 1e-30)

    def Bdx(dx):
        return vols[:, None] * w * jnp.einsum(
            "eikr,ekr->ei", c.G, dx[mesh.T]
        )

    def BT(y):
        z = jnp.einsum("eikr,ei,e->ekr", c.G, w * y, vols)
        return meshmod.project_free(
            mesh,
            jax.ops.segment_sum(
                z.reshape(-1, mesh.dim), mesh.T.reshape(-1),
                num_segments=mesh.nv,
            ),
        )

    Bc_dx = BcT = None
    if has_contact:

        def Bc_dx(dx):
            return jnp.einsum("ckd,ckd->c", cc.Gx, dx[cf.frames]) * act

        def BcT(y):
            contrib = cc.Gx * (y * act)[:, None, None]
            return meshmod.project_free(
                mesh,
                jax.ops.segment_sum(
                    contrib.reshape(-1, mesh.dim), cf.frames.reshape(-1),
                    num_segments=mesh.nv,
                ),
            )

    # x-block operator M + rho B^T B (+ rho Bc^T Bc) and its diagonal
    def Aop(p):
        p = meshmod.project_free(mesh, p)
        out = meshmod.project_free(mesh, meshmod.mass_matvec(mesh, p))
        out = out + rho * BT(Bdx(p))
        if has_contact:
            out = out + rho * BcT(Bc_dx(p))
        return out

    btb = jax.ops.segment_sum(
        jnp.broadcast_to(
            jnp.einsum("eikr,eikr,i,e->ek", c.G, c.G, w * w, vols**2)[
                ..., None
            ],
            (c.G.shape[0], c.G.shape[2], mesh.dim),
        ).reshape(-1, mesh.dim),
        mesh.T.reshape(-1),
        num_segments=mesh.nv,
    )
    diag = mesh.mass_lumped[:, None] + rho * btb
    if has_contact:
        btbc = jax.ops.segment_sum(
            (cc.Gx**2 * act[:, None, None]).reshape(-1, mesh.dim),
            cf.frames.reshape(-1),
            num_segments=mesh.nv,
        )
        diag = diag + rho * btbc
    dinv = jnp.where(mesh.free_mask[:, None] > 0, 1.0 / diag, 0.0)

    def Minv(r):
        return r * dinv

    # s-block factorization (H + rho C^T C)^{-1}: batched (N, N) inverse
    Hs = vols[:, None, None] * c.H + rho * jnp.einsum(
        "e,i,ij->eij", vols**2, w * w,
        jnp.eye(c.H.shape[1], dtype=vols.dtype),
    )
    Hs_inv = jnp.linalg.inv(Hs)
    hc_inv = None
    if has_contact:
        hc_inv = jnp.where(act > 0, 1.0 / (cc.H + rho), 1.0)

    def Cs(s):
        return -vols[:, None] * w * s

    return dict(
        w=w, vols=vols, has_contact=has_contact, act=act, rho=rho,
        Bdx=Bdx, BT=BT, Bc_dx=Bc_dx, BcT=BcT, Aop=Aop, Minv=Minv,
        Hs_inv=Hs_inv, hc_inv=hc_inv, Cs=Cs, inner_iters=inner_iters,
    )


def _admm_body(S, rhs):
    """One ADMM sweep body over carry (u, it, err) for the KKT rhs tuple
    (minres.kkt_rhs layout). Returns (body, zero_u, safe_b)."""
    has_contact = S["has_contact"]
    vols, w, rho = S["vols"], S["w"], S["rho"]
    Bdx, BT, Bc_dx, BcT = S["Bdx"], S["BT"], S["Bc_dx"], S["BcT"]
    Cs, Hs_inv, hc_inv, act = S["Cs"], S["Hs_inv"], S["hc_inv"], S["act"]
    if has_contact:
        b_x, b_s, b_l, b_d, b_lc = rhs
    else:
        b_x, b_s, b_l = rhs

    bnorm = jnp.sqrt(sum(jnp.vdot(b, b) for b in jax.tree.leaves(rhs)))
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)
    zero_u = tuple(jax.tree.map(jnp.zeros_like, rhs))

    def body(carry):
        u, it, _ = carry
        if has_contact:
            xk, sk, lk, dk, lck = u
        else:
            xk, sk, lk = u
        # --- x-update
        bi = b_x - BT(lk) - rho * BT(Cs(sk) - b_l)
        if has_contact:
            bi = bi - BcT(lck) - rho * BcT(-dk - b_lc)
        xn, _, _ = pcgmod.pcg(
            S["Aop"], bi, xk, S["Minv"], max_iters=S["inner_iters"],
            tol=1e-12,
        )
        # --- s-update (and contact d-update)
        bs = b_s + vols[:, None] * w * lk + rho * vols[:, None] * w * (
            Bdx(xn) - b_l
        )
        sn = jnp.einsum("eij,ej->ei", Hs_inv, bs)
        if has_contact:
            bd = b_d + lck + rho * (Bc_dx(xn) - b_lc)
            dn = bd * hc_inv * act
        # --- dual update (step = rho, deviation 1)
        ln = lk + rho * (Bdx(xn) + Cs(sn) - b_l)
        if has_contact:
            lcn = (lck + rho * (Bc_dx(xn) - dn - b_lc)) * act
            un = (xn, sn, ln, dn, lcn)
        else:
            un = (xn, sn, ln)
        du = jnp.sqrt(
            sum(
                jnp.vdot(a - b, a - b)
                for a, b in zip(jax.tree.leaves(un), jax.tree.leaves(u))
            )
        )
        return un, it + 1, du / safe_b

    return body, zero_u, safe_b


def _build_admm_iteration(
    mesh: meshmod.MeshData,
    c: ms.StretchCoeffs,
    rhs,
    *,
    rho_scale: float,
    inner_iters: int,
    cf=None,
    cc=None,
):
    S = _admm_setup(
        mesh, c, rho_scale=rho_scale, inner_iters=inner_iters, cf=cf, cc=cc
    )
    return _admm_body(S, rhs)


def solve_admm(
    mesh: meshmod.MeshData,
    c: ms.StretchCoeffs,
    rhs,
    *,
    rho_scale: float = 3.0,
    max_iters: int = 100,
    tol: float = 1e-4,
    inner_iters: int = 30,
    cf=None,
    cc=None,
):
    """Alternating (dx, ds, dl[, dd, dlc]) solve of the KKT system whose
    rhs tuple comes from minres.kkt_rhs. Returns (sol, iters, err) with
    err = ||u_k - u_{k-1}|| / ||b||."""
    body, zero_u, safe_b = _build_admm_iteration(
        mesh, c, rhs, rho_scale=rho_scale, inner_iters=inner_iters,
        cf=cf, cc=cc,
    )

    def cond(carry):
        _, it, err = carry
        return jnp.logical_and(it < max_iters, err > tol)

    u, it, err = jax.lax.while_loop(
        cond, body, (zero_u, jnp.zeros((), jnp.int32), jnp.array(jnp.inf, safe_b.dtype))
    )
    return u, it, err


def admm_preconditioner(
    mesh: meshmod.MeshData,
    c: ms.StretchCoeffs,
    *,
    rho_scale: float = 3.0,
    sweeps: int = 2,
    inner_iters: int = 10,
    cf=None,
    cc=None,
):
    """The ADMM iteration as the MINRES preconditioner — the reference's
    minres-indefinite-admm registration (linear_solver_factory.cpp pairs
    Eigen MINRES on SystemMatrixIndefinite with ADMMPreconditioner as the
    preconditioner, preconditioners.h:154-363 solve()). The apply runs a
    FIXED number of sweeps from a zero start (no convergence test), so it
    acts as one fixed operator across the MINRES iteration; like the
    reference's, it is only approximately linear (the inner x-solve is a
    truncated Krylov iteration there too — prefactored LLT in C++, fixed-
    sweep Jacobi-PCG here), which Eigen MINRES tolerates in practice."""
    S = _admm_setup(
        mesh, c, rho_scale=rho_scale, inner_iters=inner_iters, cf=cf, cc=cc
    )

    def Minv(r):
        body, zero_u, safe_b = _admm_body(S, r)
        carry = (
            zero_u, jnp.zeros((), jnp.int32),
            jnp.array(jnp.inf, safe_b.dtype),
        )
        for _ in range(sweeps):
            carry = body(carry)
        return carry[0]

    return Minv
