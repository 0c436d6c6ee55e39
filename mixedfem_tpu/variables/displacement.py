"""Displacement variable: inertia energy/gradient and the mass operator.

Reference: src/variables/displacement.{h,cpp}. The inertia term of the
implicit step objective is  1/2 ||x - x_tilde - h^2 f_ext||^2_M  with the
FULL consistent mass matrix; its gradient is masked to free DOFs (the
reference's P M product), and the blend factor applies to the gradient only
(displacement.cpp:21-31, 65-75).
"""

from __future__ import annotations

import jax.numpy as jnp

from mixedfem_tpu.integrators import bdf as bdfmod
from mixedfem_tpu.mesh import mesh as meshmod


def target(mesh: meshmod.MeshData, bdf: bdfmod.BDFState, blend: float = 1.0):
    """x_tilde + dt^2 * blend * f_ext (nv, d)."""
    dt = bdfmod.bdf_dt(bdf)
    return bdfmod.bdf_x_tilde(bdf) + (dt * dt * blend) * mesh.ext_force


def energy(mesh: meshmod.MeshData, bdf: bdfmod.BDFState, x: jnp.ndarray):
    """1/2 ||x - x_tilde - dt^2 f||^2_M over ALL dofs (displacement.cpp:21-31).

    Element-level reduction (sum_e diff_e^T Mc_e diff_e — assembly is
    additive, so this equals diff^T M diff exactly): no scatter, which
    matters because the line search evaluates this per trial point."""
    diff = x - target(mesh, bdf, blend=1.0)
    de = diff[mesh.T]
    return 0.5 * jnp.sum(
        jnp.einsum("ekd,ekl,eld->e", de, mesh.mass_coeff, de)
    )


def gradient(
    mesh: meshmod.MeshData, bdf: bdfmod.BDFState, x: jnp.ndarray, blend: float = 1.0
):
    """Masked inertia gradient P M (x - x_tilde - dt^2 blend f)."""
    diff = x - target(mesh, bdf, blend)
    return meshmod.project_free(mesh, meshmod.mass_matvec(mesh, diff))


def gradient_contrib(
    mesh: meshmod.MeshData, bdf: bdfmod.BDFState, x: jnp.ndarray, blend: float = 1.0
):
    """Per-element-corner contributions of M (x - target): (E, k, d).
    Assemble + mask to obtain gradient() (used by the banded Pallas
    assembly path in optimizer/newton.py)."""
    diff = x - target(mesh, bdf, blend)
    return jnp.einsum("ekl,eld->ekd", mesh.mass_coeff, diff[mesh.T])


def matvec(mesh: meshmod.MeshData, p: jnp.ndarray):
    """Inertia block of the condensed operator: P M P^T p."""
    p = meshmod.project_free(mesh, p)
    return meshmod.project_free(mesh, meshmod.mass_matvec(mesh, p))
