"""Rod (1D segment in 3D) discretization with a frame-augmented F.

Reference: src/mesh/rod_mesh.{h,cpp} stores per-segment normal/binormal
outer products (NN_, BN_) and a mass matrix but leaves
`deformation_gradient` an UNIMPLEMENTED stub (rod_mesh.h:30-34) — rods do
not actually simulate in the reference. Here we complete the capability in
the same spirit as the shell membrane (tri_mesh.cpp): the deformation
gradient of a segment is

  F(x) = (x1 - x0) ⊗ dphi  +  n(x) N̂ᵀ  +  b(x) B̂ᵀ

where dphi is the rest tangent / length, (N̂, B̂) the rest cross-section
frame, and (n, b) the rest frame parallel-transported by the rotation
taking the rest tangent to the current tangent (branch-free double-cross
formula). dF/dx comes from jax.jacfwd of this map (9x6 per segment),
feeding the same mixed-stretch G tensor as solids/shells.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rod_rest_frames(V: np.ndarray, E: np.ndarray):
    """Rest tangent direction, length, and an orthonormal (N, B) frame."""
    t = V[E[:, 1]] - V[E[:, 0]]
    L = np.linalg.norm(t, axis=1)
    t = t / L[:, None]
    ref = np.where(np.abs(t[:, :1]) > 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
    N = np.cross(t, ref)
    N /= np.linalg.norm(N, axis=1, keepdims=True)
    B = np.cross(t, N)
    return t, L, N, B


def rod_def_grad_fn(t0, N0, B0, L):
    """Returns F(x01) for one segment: x01 (2, 3) -> (3, 3)."""

    def F(x01):
        d = x01[1] - x01[0]
        l = jnp.sqrt(jnp.sum(d * d) + 1e-30)
        t = d / l
        # rotation taking t0 -> t (Rodrigues via double cross, branch-free)
        c = jnp.dot(t0, t)
        v = jnp.cross(t0, t)
        vx = jnp.array(
            [
                [0.0, -v[2], v[1]],
                [v[2], 0.0, -v[0]],
                [-v[1], v[0], 0.0],
            ]
        )
        R = (
            jnp.eye(3, dtype=x01.dtype)
            + vx
            + vx @ vx / jnp.maximum(1.0 + c, 1e-6)
        )
        n = R @ N0
        b = R @ B0
        # stretch along the rest tangent + transported cross-section frame
        return (
            jnp.outer(d / L, t0) + jnp.outer(n, N0) + jnp.outer(b, B0)
        )

    return F


def rod_def_grad(x, E, t0, N0, B0, L):
    """(nv,3) positions -> (nseg, 3, 3) deformation gradients."""

    def one(x01, t0e, N0e, B0e, Le):
        return rod_def_grad_fn(t0e, N0e, B0e, Le)(x01)

    return jax.vmap(one)(x[E], t0, N0, B0, L)


def rod_def_grad_jacobian(x, E, t0, N0, B0, L):
    """(nseg, 2, 3, 3, 3) tensor dF_ac/dx_kr via forward-mode autodiff."""

    def one(x01, t0e, N0e, B0e, Le):
        J = jax.jacfwd(rod_def_grad_fn(t0e, N0e, B0e, Le))(x01)
        # J[a, c, k, r] -> [k, r, a, c]
        return jnp.transpose(J, (2, 3, 0, 1))

    return jax.vmap(one)(x[E], t0, N0, B0, L)


def rod_mass_coeff(L: np.ndarray, density: np.ndarray, radius: float = 1e-2):
    """(nseg, 2, 2) consistent segment mass blocks (rho * A * L * (1+d)/6),
    the 1D analog of the reference's rod mass matrix (rod_mesh.cpp:30-56)."""
    A = np.pi * radius * radius
    base = (1.0 + np.eye(2)) / 6.0
    return (density * A * L)[:, None, None] * base[None]
