"""MechanicalPress: force controller targeting a marker-vertex velocity.

Reference: src/boundary_conditions/press_force.h — a scalar force f along
`axis` applied to a vertex group, adapted each step by
factor = clamp(target_velocity / rate, 1.0, 1.1) (1.1 when moving the wrong
way), clamped to max_force, and zeroed once the marker has displaced
max_displacement. The controller state advances AFTER the Newton solve
(meshes.cpp:195-203), so the adjusted force acts from the next step on.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class PressSpec:
    forced: jnp.ndarray   # (nv,) mask of forced vertices
    axis: int = flax.struct.field(pytree_node=False)
    marker: int = flax.struct.field(pytree_node=False)
    target_velocity: float = flax.struct.field(pytree_node=False)
    max_force: float = flax.struct.field(pytree_node=False)
    max_displacement: float = flax.struct.field(pytree_node=False)


@flax.struct.dataclass
class PressState:
    f: jnp.ndarray             # scalar current force magnitude
    marker_pos: jnp.ndarray    # scalar marker coordinate along axis
    marker_pos0: jnp.ndarray   # initial marker coordinate


def press_init(spec: PressSpec, V: jnp.ndarray, f0: float) -> PressState:
    m = V[spec.marker, spec.axis]
    return PressState(
        f=jnp.asarray(f0, V.dtype), marker_pos=m, marker_pos0=m
    )


def press_force(spec: PressSpec, st: PressState, nv: int, dim: int):
    """(nv, d) per-vertex force contribution."""
    out = jnp.zeros((nv, dim), st.f.dtype)
    return out.at[:, spec.axis].set(spec.forced * st.f)


def press_step(spec: PressSpec, st: PressState, V: jnp.ndarray, dt: float):
    """Advance the controller from the post-solve positions (press_force.h:54-105)."""
    new_pos = V[spec.marker, spec.axis]
    rate = (new_pos - st.marker_pos) / dt
    ratio = spec.target_velocity / jnp.where(jnp.abs(rate) > 1e-30, rate, 1e-30)
    factor = jnp.clip(ratio, 1.0, 1.1)
    factor = jnp.where(ratio < 0, 1.1, factor)
    f = jnp.where(
        jnp.logical_or(factor >= 1.0, jnp.abs(st.f) > 0.01),
        st.f * factor,
        st.f,
    )
    f = jnp.clip(f, -spec.max_force, spec.max_force)
    f = jnp.where(
        jnp.abs(new_pos - st.marker_pos0) > spec.max_displacement, 0.0, f
    )
    return st.replace(f=f, marker_pos=new_pos)
