"""Rest-state elasticity-Laplacian preconditioner: (M + k L)^{-1}.

True port of the reference's LaplacianPreconditioner
(src/linear_solvers/preconditioners/laplacian_preconditioner.h:26-104):

  L = Gx diag(1/vol) Gx^T

assembled from the mixed-stretch constraint jacobian at the REST state
(R = S = I; the reference builds L once at init, before any deformation,
and never rebuilds it), scaled by k = h^2 * max element stress at each
preconditioner refresh (rebuild_factorization(), :67-82).

The reference applies (M + kL)^{-1} exactly through a cached SimplicialLLT
factorization. Sparse Cholesky does not map to the TPU, so the apply here
is a fixed-degree Chebyshev polynomial in (M + kL): a LINEAR SPD operator
(valid inside plain CG, unlike an inner iterative solve, which would need
flexible-CG), whose spectral bounds come from per-topology power
iterations hoisted outside the Newton loop. The polynomial degree trades
apply cost for exactness (degree ~16 reaches a relative apply error of a
few percent on the bench meshes, enough for the preconditioner role).

Two more reference preconditioners are served by this module:

- LBFGS (preconditioners/lbfgs.h) is byte-for-byte the SAME M+kL
  algorithm — the class body declares LaplacianPreconditioner return
  types and implements no quasi-Newton update at all.
- DualAscentPreconditioner (dual_ascent_preconditioner.h:160-200) wraps
  this same factorization in an alternating contact update
      dx_{j+1} = (M+kL)^{-1} (r - Dx^T dl_j)
      dD_{j+1} = Hd^{-1} dl_j
      dl_{j+1} = dl_j - (Dx dx_{j+1} - dD_{j+1})
  (da_apply below). NOTE the reference version reads cached gradient
  vectors gx_/gd_/gl_ that update_gradients() would fill — but nothing in
  the codebase ever calls update_gradients(), so as shipped those terms
  are empty; the homogeneous (linear-in-r) loop implemented here is the
  well-defined reading of that dead code path, and linearity is exactly
  what CG requires of its preconditioner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.ops import rotation, smallops


def laplacian_rows(mesh: meshmod.MeshData) -> jnp.ndarray:
    """(E, N, k, d) factored rows GwL of L = sum_e GwL^T GwL: the
    mixed-stretch jacobian at the rest state (R = S = I) weighted by
    sqrt(vol) — matching the reference's Gx diag(1/vol) Gx^T (Gx carries
    one vol factor; the 1/vol diagonal cancels one of the two)."""
    if mesh.shell or mesh.rod:
        raise NotImplementedError(
            "laplacian preconditioner: solids only (the reference builds "
            "it from the solid mixed-stretch jacobian)"
        )
    E = mesh.T.shape[0]
    d = mesh.dim
    eye = jnp.broadcast_to(jnp.eye(d, dtype=mesh.vols.dtype), (E, d, d))
    D = rotation.dsdF(eye, eye, d)                     # (E, N, d, d)
    G0 = smallops.contract_D_dphi(D, mesh.dphidX)      # (E, N, k, d)
    return jnp.sqrt(mesh.vols)[:, None, None, None] * G0


def ml_matvec(mesh: meshmod.MeshData, GwL: jnp.ndarray, k, p: jnp.ndarray,
              mass_scale: float = 1.0):
    """(mass_scale * M + k L) p on free dofs, element-fused like the
    system operator (mass_scale=0 isolates L for spectral estimation)."""
    p = meshmod.project_free(mesh, p)
    pe = p[mesh.T]                                     # (E, kc, d)
    out_e = mass_scale * jnp.einsum("ekl,eld->ekd", mesh.mass_coeff, pe)
    q = jnp.einsum("eikr,ekr->ei", GwL, pe)            # (E, N)
    out_e = out_e + k * jnp.einsum("eikr,ei->ekr", GwL, q)
    out = jax.ops.segment_sum(
        out_e.reshape(-1, mesh.dim), mesh.T.reshape(-1),
        num_segments=mesh.nv,
    )
    return meshmod.project_free(mesh, out)


def power_lmax(matvec, shape, dtype, iters: int = 20):
    """Largest-eigenvalue estimate by fixed-count power iteration (traced;
    deterministic seed). Returned with a 1.05 safety factor — Chebyshev
    needs spectrum(A) inside [lmin, lmax], and power iteration
    under-estimates from below."""
    v0 = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)

    def body(_, v):
        w = matvec(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v0)
    w = matvec(v)
    lam = jnp.vdot(v, w) / jnp.maximum(jnp.vdot(v, v), 1e-30)
    return 1.05 * lam


def chebyshev_apply(matvec, lmin, lmax, degree: int):
    """z ~= A^{-1} r as the degree-`degree` Chebyshev semi-iteration on
    [lmin, lmax] (the standard smoother recurrence, e.g. Saad §12.3) —
    a fixed linear operator in r."""
    theta = 0.5 * (lmax + lmin)
    # guard near-degenerate intervals (tiny test meshes where lmin ~ lmax)
    delta = jnp.maximum(0.5 * (lmax - lmin), 1e-6 * theta)
    sigma = theta / delta

    def apply(r):
        d = r / theta
        z = d
        rho_prev = 1.0 / sigma
        for _ in range(degree - 1):
            rho = 1.0 / (2.0 * sigma - rho_prev)
            d = rho * rho_prev * d + (2.0 * rho / delta) * (r - matvec(z))
            z = z + d
            rho_prev = rho
        return z

    return apply


def build_ml_preconditioner(
    mesh: meshmod.MeshData,
    GwL: jnp.ndarray,
    k,
    lmax_m,
    lmax_l,
    degree: int = 16,
):
    """(M + kL)^{-1} apply for the current stress scale k.

    lmax_m / lmax_l are the hoisted power-iteration estimates for M and L
    separately, so the per-Newton bound is algebraic:
    lmax(M + kL) <= lmax(M) + k lmax(L). The lower bound uses the smallest
    free-vertex mass diagonal (L is PSD, so lmin(M+kL) >= lmin(M)), with a
    0.5 safety factor — under-estimating lmin only widens the Chebyshev
    interval."""
    free = mesh.free_mask > 0
    lmin = 0.5 * jnp.min(jnp.where(free, mesh.mass_diag, jnp.inf))
    lmax = lmax_m + k * lmax_l

    def mv(p):
        return ml_matvec(mesh, GwL, k, p)

    return chebyshev_apply(mv, lmin, lmax, degree)


def da_apply(ml_inv, mesh, cf, cc, iters: int = 10):
    """DualAscentPreconditioner solve loop (dual_ascent_preconditioner.h:
    160-200), homogeneous form (see module docstring): alternate
    (M+kL)-solves for dx with diagonal contact-Hessian solves for the
    mixed distances, ascending on the contact multipliers."""
    Hsafe = jnp.where(cc.active > 0, cc.H, 1.0)

    def apply(r):
        C = cf.frames.shape[0]
        dl = jnp.zeros((C,), r.dtype)

        def body(_, carry):
            dl, _xz = carry
            # Dx^T dl (scatter the frame gradient back to vertices)
            contrib = cc.Gx * (dl * cc.active)[:, None, None]
            DxT_dl = meshmod.project_free(
                mesh,
                jax.ops.segment_sum(
                    contrib.reshape(-1, mesh.dim), cf.frames.reshape(-1),
                    num_segments=mesh.nv,
                ),
            )
            xz = ml_inv(r - DxT_dl)
            dD = (dl / Hsafe) * cc.active
            Dx_dx = jnp.einsum("ckd,ckd->c", cc.Gx, xz[cf.frames])
            dl = dl - (Dx_dx * cc.active - dD)
            return dl, xz

        _, xz = jax.lax.fori_loop(
            0, iters, body, (dl, jnp.zeros_like(r))
        )
        return xz

    return apply
