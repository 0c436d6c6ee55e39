"""Multicolor (block) Gauss-Seidel on the condensed system.

TPU-native port of the reference's GaussSeidelPreconditioner
(src/linear_solvers/preconditioners/gauss_seidel.h:50-65): repeated sweeps
x <- AL^{-1} (b - AU x) with the Eigen iterative-solver convergence
semantics (error = ||Ax - b|| / ||b||, capped iterations). Sequential
triangular solves do not map to the TPU, so the sweep here is MULTICOLOR
block Gauss-Seidel: vertices are greedily colored so no two adjacent
vertices share a color (host-side, per topology), and one sweep updates
each color in turn with the per-vertex (d, d) diagonal blocks

    x_c <- x_c + D_c^{-1} (b - A x)_c .

Because same-color vertices are non-adjacent, the color-block diagonal of
A is exactly the per-vertex block diagonal, so each color update is an
EXACT block-GS step; a sweep differs from the reference's lexicographic
sweep only in the update order (both are Gauss-Seidel; multicolor is the
standard parallel ordering). A symmetric sweep (forward + reversed color
order) makes the operator SPD for use as a CG preconditioner.

Registered as the solve path for "subspace-gauss_seidel". DEVIATION: the
reference runs its GS sweeps on the assembled DualCondensedSystem (Schur
complement on the multipliers); assembling that operator has no efficient
TPU form, so the sweeps here run on the condensed primal system — the
same step equations solved by Gauss-Seidel relaxation, reaching the same
Newton fixed point.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class GSPlan:
    """Static vertex coloring: masks (C, nv) with masks[c, v] = 1 when
    vertex v has color c."""

    masks: jnp.ndarray
    ncolors: int = flax.struct.field(pytree_node=False)


def build_gs_plan(T, nv: int, dtype=jnp.float32) -> GSPlan:
    """Greedy vertex coloring of the element-sharing adjacency graph."""
    T = np.asarray(T)
    adj = [set() for _ in range(nv)]
    for elem in T:
        for a in elem:
            for b in elem:
                if a != b:
                    adj[a].add(b)
    colors = np.full(nv, -1, np.int64)
    for v in range(nv):
        used = {colors[u] for u in adj[v] if colors[u] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    ncolors = int(colors.max()) + 1
    masks = np.zeros((ncolors, nv), np.float64)
    masks[colors, np.arange(nv)] = 1.0
    return GSPlan(masks=jnp.asarray(masks, dtype), ncolors=ncolors)


def _sweep(A, Binv, plan: GSPlan, b, x, order):
    for c in order:
        m = plan.masks[c][:, None]
        x = x + m * Binv(b - A(x))
    return x


def gs_apply(A, Binv, plan: GSPlan, sweeps: int = 1,
             symmetric: bool = True):
    """Preconditioner apply z ~= A^{-1} r: `sweeps` multicolor GS sweeps
    from zero. Linear in r; `symmetric` adds the reversed color order per
    sweep (symmetric GS — an SPD operator, as CG requires)."""
    fwd = tuple(range(plan.ncolors))
    orders = fwd + tuple(reversed(fwd)) if symmetric else fwd

    def apply(r):
        x = jnp.zeros_like(r)
        for _ in range(sweeps):
            x = _sweep(A, Binv, plan, r, x, orders)
        return x

    return apply


def gs_solve(A, b, x0, Binv, plan: GSPlan, max_iters: int, tol: float):
    """Gauss-Seidel as the linear SOLVER (gauss_seidel.h:50-65): sweep
    until ||A x - b|| <= tol ||b|| or max_iters sweeps. Returns
    (x, sweeps, rel_error)."""
    bnorm = jnp.linalg.norm(b)
    safe_b = jnp.where(bnorm > 0, bnorm, 1.0)
    order = tuple(range(plan.ncolors))

    def cond(carry):
        x, it, err = carry
        return jnp.logical_and(it < max_iters, err > tol)

    def body(carry):
        x, it, _ = carry
        x = _sweep(A, Binv, plan, b, x, order)
        err = jnp.linalg.norm(A(x) - b) / safe_b
        return (x, it + 1, err)

    err0 = jnp.linalg.norm(A(x0) - b) / safe_b
    x, it, err = jax.lax.while_loop(cond, body, (x0, 0, err0))
    return x, it, err
