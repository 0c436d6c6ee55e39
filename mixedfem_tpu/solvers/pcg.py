"""Matrix-free preconditioned conjugate gradient on the condensed SPD system.

TPU-native replacement for the reference's direct/iterative solvers
(src/linear_solvers/): the condensed system lhs = PMP^T + sum_e vol G^T H G
is applied matrix-free (the pattern spec'd by BlockMatrix product callbacks,
src/linear_solvers/block_matrix.h:74-125), preconditioned with per-vertex
DIMxDIM block-Jacobi (src/linear_solvers/preconditioners/block_jacobi.h:44-60).
The CG loop follows the reference's standalone pcg.h:12-81 (PR+ beta) as a
lax.while_loop with fused dot products.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.vdot(a, b)


def pcg(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray,
    Minv: Callable[[jnp.ndarray], jnp.ndarray],
    max_iters: int,
    tol: float,
):
    """Solve A x = b. Returns (x, iters, rel_residual).

    Convergence: ||r||_2 <= tol * ||b||_2 (matches Eigen's CG semantics used
    via eigen_iterative_solver.h:21-23).
    """
    bnorm2 = _dot(b, b)
    # Guard: zero rhs -> x = 0.
    safe_b = jnp.where(bnorm2 > 0, bnorm2, 1.0)
    tol2 = (tol * tol) * safe_b

    r = b - A(x0)
    z = Minv(r)
    p = z
    rz = _dot(r, z)

    def cond(carry):
        x, r, z, p, rz, it = carry
        return jnp.logical_and(it < max_iters, _dot(r, r) > tol2)

    def body(carry):
        x, r, z, p, rz, it = carry
        Ap = A(p)
        denom = _dot(p, Ap)
        alpha = rz / jnp.where(denom != 0, denom, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    x, r, z, p, rz, it = jax.lax.while_loop(cond, body, (x0, r, z, p, rz, 0))
    rel = jnp.sqrt(_dot(r, r) / safe_b)
    return x, it, rel


def pcg_tree(
    A: Callable,
    b,
    x0,
    Minv: Callable,
    max_iters: int,
    tol: float,
):
    """pcg generalized to pytree unknowns (used by the coupled dual-Schur
    system with contact, solvers/dual.py). Same Eigen-CG convergence
    semantics: ||r||_2 <= tol * ||b||_2 over the stacked vector."""

    def tdot(u, v):
        return sum(
            jnp.vdot(a, bb)
            for a, bb in zip(jax.tree.leaves(u), jax.tree.leaves(v))
        )

    def taxpy(alpha, u, v):
        return jax.tree.map(lambda a, bb: alpha * a + bb, u, v)

    bnorm2 = tdot(b, b)
    safe_b = jnp.where(bnorm2 > 0, bnorm2, 1.0)
    tol2 = (tol * tol) * safe_b

    r = taxpy(-1.0, A(x0), b)
    z = Minv(r)
    p = z
    rz = tdot(r, z)

    def cond(carry):
        x, r, z, p, rz, it = carry
        return jnp.logical_and(it < max_iters, tdot(r, r) > tol2)

    def body(carry):
        x, r, z, p, rz, it = carry
        Ap = A(p)
        denom = tdot(p, Ap)
        alpha = rz / jnp.where(denom != 0, denom, 1.0)
        x = taxpy(alpha, p, x)
        r = taxpy(-alpha, Ap, r)
        z = Minv(r)
        rz_new = tdot(r, z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = taxpy(beta, p, z)
        return (x, r, z, p, rz_new, it + 1)

    x, r, z, p, rz, it = jax.lax.while_loop(cond, body, (x0, r, z, p, rz, 0))
    rel = jnp.sqrt(tdot(r, r) / safe_b)
    return x, it, rel


def _small_inv(blocks: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched inverse for (n, d, d), d in {2, 3}. The batched
    LU custom-call jnp.linalg.inv lowers to costs ~18 ms per Newton
    iteration at 22k vertices on TPU; the adjugate form is a handful of
    fused elementwise ops."""
    d = blocks.shape[-1]
    if d == 2:
        a, b = blocks[..., 0, 0], blocks[..., 0, 1]
        c, e = blocks[..., 1, 0], blocks[..., 1, 1]
        det = a * e - b * c
        inv = jnp.stack(
            [jnp.stack([e, -b], -1), jnp.stack([-c, a], -1)], -2
        )
        return inv / det[..., None, None]
    if d == 3:
        m = blocks
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        det = m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
        adjT = jnp.stack(
            [
                jnp.stack([c00, c10, c20], -1),
                jnp.stack([c01, c11, c21], -1),
                jnp.stack([c02, c12, c22], -1),
            ],
            -2,
        )
        return adjT / det[..., None, None]
    return jnp.linalg.inv(blocks)


def block_jacobi_inv(diag_blocks: jnp.ndarray, free_mask: jnp.ndarray):
    """Build the block-Jacobi preconditioner application from per-vertex
    (d, d) diagonal blocks. Pinned vertices get the identity (their rows are
    zero in the masked system)."""
    d = diag_blocks.shape[-1]
    eye = jnp.eye(d, dtype=diag_blocks.dtype)
    # Regularize pinned/empty blocks to identity.
    mask = free_mask[:, None, None]
    blocks = diag_blocks * mask + eye * (1.0 - mask)
    inv = _small_inv(blocks)

    def apply(r):
        return jnp.einsum("nij,nj->ni", inv, r) * free_mask[:, None]

    return apply
