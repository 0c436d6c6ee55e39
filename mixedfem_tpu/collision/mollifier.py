"""Edge-edge mollifier: smooth the EE barrier near parallel edges.

Reference: the mollifier threshold eps_x = 1e-3 |e0_rest|^2 |e1_rest|^2 is
computed in src/utils/mixed_ipc.cpp:295-299 but its application is
DISABLED there (mixed_collision.cpp:149-165) — near-parallel edge pairs
hit the non-smooth region of the EE distance. This implements the full
IPC mollifier (Li et al. 2020):

  c(x)  = || (p1 - p0) x (q1 - q0) ||^2      (parallelism measure)
  m(x)  = 1                    if c >= eps_x
        = (c/eps_x) (2 - c/eps_x)   otherwise   (C1, m(0) = 0)

and the contact energy becomes kappa * m(x) * b(d^2). Off by default
(config.ee_mollifier) to keep trajectory parity with the reference, which
ships it disabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mixedfem_tpu.collision.distances import EE


def eps_x(rest_verts: jnp.ndarray) -> jnp.ndarray:
    """(C, 4, d) REST frame vertices -> (C,) mollifier thresholds."""
    e0 = rest_verts[:, 1] - rest_verts[:, 0]
    e1 = rest_verts[:, 3] - rest_verts[:, 2]
    return 1e-3 * jnp.sum(e0 * e0, axis=-1) * jnp.sum(e1 * e1, axis=-1)


def _m_of_verts(verts, epsx):
    """verts (4, d) -> scalar mollifier value (d == 3)."""
    u = verts[1] - verts[0]
    v = verts[3] - verts[2]
    w = jnp.cross(u, v)
    c = jnp.sum(w * w)
    r = c / jnp.maximum(epsx, 1e-30)
    return jnp.where(r >= 1.0, 1.0, r * (2.0 - r))


def mollifier(verts: jnp.ndarray, ftype: jnp.ndarray, epsx: jnp.ndarray):
    """(C, 4, d) current verts -> (C,) m values (1 for non-EE frames)."""
    m = jax.vmap(_m_of_verts)(verts, epsx)
    return jnp.where(ftype == EE, m, 1.0)


def mollifier_grad(verts: jnp.ndarray, ftype: jnp.ndarray, epsx: jnp.ndarray):
    """(C, 4, d) -> (m (C,), dm/dverts (C, 4, d); zero for non-EE)."""
    m, g = jax.vmap(jax.value_and_grad(_m_of_verts))(verts, epsx)
    is_ee = ftype == EE
    return (
        jnp.where(is_ee, m, 1.0),
        jnp.where(is_ee[:, None, None], g, 0.0),
    )
