"""Vanilla displacement-only elasticity (the non-mixed baseline).

Reference: src/variables/stretch.{h,cpp} — per-element
H = h^2 vol Jloc^T psi''(F) Jloc, g = h^2 vol Jloc^T psi'(F), assembled.
Used for baseline comparisons and by the convergence harness, which probes
the vanilla-FEM gradient norm at the mixed iterates (apps/convergence.cpp:22-52).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from mixedfem_tpu.materials import models as mat
from mixedfem_tpu.mesh import mesh as meshmod


@flax.struct.dataclass
class VanillaCoeffs:
    g: jnp.ndarray   # (E, d, d)  h^2 vol psi'(F)
    H: jnp.ndarray   # (E, d*d, d*d) h^2 vol psi''(F) (row-major F flattening)


def update(mesh: meshmod.MeshData, x: jnp.ndarray, dt) -> VanillaCoeffs:
    F = meshmod.def_grad(mesh, x)
    h2v = (dt * dt) * mesh.vols
    g = mat.grad_F_all(F, mesh.mu, mesh.lam, mesh.model_id, mesh.models)
    H = mat.hess_F_all(F, mesh.mu, mesh.lam, mesh.model_id, mesh.models)
    return VanillaCoeffs(
        g=h2v[:, None, None] * g, H=h2v[:, None, None] * H
    )


def energy(mesh: meshmod.MeshData, x: jnp.ndarray):
    """sum_e vol psi(F_e) — unscaled by h^2 (the optimizer applies it)."""
    F = meshmod.def_grad(mesh, x)
    e = mat.psi_F_all(F, mesh.mu, mesh.lam, mesh.model_id, mesh.models)
    return jnp.sum(mesh.vols * e)


def gradient(mesh: meshmod.MeshData, c: VanillaCoeffs):
    """Assembled masked gradient (nv, d)."""
    return meshmod.project_free(mesh, meshmod.def_grad_adjoint(mesh, c.g))


def gradient_at(mesh: meshmod.MeshData, x: jnp.ndarray, dt):
    """Convenience: h^2-scaled elastic gradient at x (no Hessian)."""
    F = meshmod.def_grad(mesh, x)
    g = mat.grad_F_all(F, mesh.mu, mesh.lam, mesh.model_id, mesh.models)
    h2v = (dt * dt) * mesh.vols
    return meshmod.project_free(
        mesh, meshmod.def_grad_adjoint(mesh, h2v[:, None, None] * g)
    )


def matvec(mesh: meshmod.MeshData, c: VanillaCoeffs, p: jnp.ndarray):
    """Elastic-Hessian product: P (sum_e J^T H J) P^T p."""
    p = meshmod.project_free(mesh, p)
    dF = meshmod.def_grad(mesh, p)                     # (E, d, d)
    d = mesh.dim
    dFf = dF.reshape(dF.shape[0], d * d)
    y = jnp.einsum("eab,eb->ea", c.H, dFf).reshape(dF.shape)
    out = meshmod.def_grad_adjoint(mesh, y)
    return meshmod.project_free(mesh, out)


def diag_blocks(mesh: meshmod.MeshData, c: VanillaCoeffs):
    """Per-vertex (d, d) diagonal blocks of the elastic Hessian."""
    d = mesh.dim
    # dF_rc/dx_kr' = delta_{r r'} dphidX[k, c]: block_k[r, r'] =
    # sum_{c, c'} dphidX[k,c] H[(r,c),(r',c')] dphidX[k,c']
    Hm = c.H.reshape(c.H.shape[0], d, d, d, d)  # [r, c, r', c']
    B = jnp.einsum("ekc,ercsd,ekd->ekrs", mesh.dphidX, Hm, mesh.dphidX)
    return jax.ops.segment_sum(
        B.reshape(-1, d, d), mesh.T.reshape(-1), num_segments=mesh.nv
    )
