"""Scripted Dirichlet boundary conditions, as pure jittable step functions.

Reference: src/boundary_conditions/ — each BC pins vertex groups (bottom/top
`ratio` slabs along `axis` of the object's initial bounding box,
boundary_condition.cpp:5-21) and optionally moves them each timestep. Here a
BC is (static BCSpec with precomputed group masks) + (small BCState pytree
for time-varying scripts), and `bc_step` returns updated fixed-vertex
positions — pure, so the whole step stays inside jit.

Registered names (src/factories/boundary_condition_factory.cpp:15-70):
null, scale, randomize, onepoint, hang, hangends, bend, stretch, twist,
translate, twist-and-stretch.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.struct
import jax.numpy as jnp
import numpy as np

BC_NAMES = (
    "null",
    "scale",
    "randomize",
    "onepoint",
    "hang",
    "hangends",
    "bend",
    "stretch",
    "twist",
    "translate",
    "twist-and-stretch",
)


@dataclasses.dataclass(frozen=True)
class BCConfig:
    type: str = "null"
    ratio: float = 0.1
    axis: int = 0
    velocity: float = 0.1
    duration: float = 1.0
    flip: bool = False


@flax.struct.dataclass
class BCSpec:
    """Static per-object BC data (masks are global-vertex-sized)."""

    group0: jnp.ndarray        # (nv,) float mask: bottom slab
    group1: jnp.ndarray        # (nv,) float mask: top slab
    fixed: jnp.ndarray         # (nv,) float mask: pinned vertices of this BC
    center: jnp.ndarray        # (d,) rotation center (twist)
    center0: jnp.ndarray       # (d,) group-0 rotation center (bend)
    center1: jnp.ndarray       # (d,) group-1 rotation center (bend)
    vel_vec: jnp.ndarray       # (d,) translation velocity vector
    type: str = flax.struct.field(pytree_node=False)
    velocity: float = flax.struct.field(pytree_node=False)
    duration: float = flax.struct.field(pytree_node=False)
    flip: bool = flax.struct.field(pytree_node=False)


@flax.struct.dataclass
class BCState:
    elapsed: jnp.ndarray   # scalar
    reversed: jnp.ndarray  # scalar bool
    done: jnp.ndarray      # scalar bool


def boundary_groups(V: np.ndarray, ratio: float, axis: int):
    """Bottom/top `ratio` slabs along `axis` (boundary_condition.cpp:5-21)."""
    lo = V.min(axis=0)
    hi = V.max(axis=0)
    rng = hi - lo
    g0 = V[:, axis] < lo[axis] + rng[axis] * ratio
    g1 = V[:, axis] > hi[axis] - rng[axis] * ratio
    return g0, g1


def build_bc(
    V_obj: np.ndarray,
    cfg: BCConfig,
    nv_total: int,
    offset: int,
    dtype=jnp.float64,
    rng: Optional[np.random.Generator] = None,
):
    """Build (BCSpec, BCState, is_fixed(nv_obj,), V_obj') for one object.

    V_obj may be modified in place semantics (scale/randomize init);
    the returned V_obj' is the post-init position array.
    """
    nvo, d = V_obj.shape
    g0, g1 = boundary_groups(V_obj, cfg.ratio, cfg.axis)
    t = cfg.type
    is_fixed = np.zeros(nvo, dtype=bool)
    V_out = V_obj.copy()

    if t == "null":
        pass
    elif t == "scale":
        # no pins; scales mesh by 1.5 about bbox center (fixed_boundary_conditions.h ScaleBC)
        off = 0.5 * (V_obj.min(axis=0) + V_obj.max(axis=0))
        V_out = (V_obj - off) * 1.5 + off
    elif t == "randomize":
        rng = rng or np.random.default_rng(0)
        off = 0.5 * (V_obj.min(axis=0) + V_obj.max(axis=0))
        off = off.copy()
        off[1] += (V_obj[:, 1].max() - V_obj[:, 1].min()) * 0.5
        V_out = rng.uniform(-0.5, 0.5, size=V_obj.shape)
        V_out = V_out + (off - V_out[0])
    elif t == "onepoint":
        is_fixed[0] = True
    elif t == "hang":
        # last vertex of each group (HangBC)
        for g in (g0, g1):
            idx = np.nonzero(g)[0]
            if len(idx):
                is_fixed[idx[-1]] = True
    elif t == "hangends":
        is_fixed[g1] = True
    elif t in ("bend", "stretch", "twist", "translate", "twist-and-stretch"):
        if t == "translate":
            is_fixed[g1] = True  # TranslateBC pins group 1 only
        else:
            is_fixed[g0] = True
            is_fixed[g1] = True
    else:
        raise KeyError(f"unknown boundary condition '{t}' (have {BC_NAMES})")

    # Static geometry for scripted motion (object initial positions).
    center = 0.5 * (V_out.min(axis=0) + V_out.max(axis=0))
    idx0 = np.nonzero(g0)[0]
    idx1 = np.nonzero(g1)[0]
    center0 = V_out[idx0[-1]] if len(idx0) else np.zeros(d)
    center1 = V_out[idx1[-1]] if len(idx1) else np.zeros(d)
    vel_vec = np.zeros(d)
    vel_vec[cfg.axis] = cfg.velocity

    def gmask(g):
        m = np.zeros(nv_total)
        m[offset : offset + nvo] = g.astype(np.float64)
        return jnp.asarray(m, dtype)

    spec = BCSpec(
        group0=gmask(g0),
        group1=gmask(g1),
        fixed=gmask(is_fixed),
        center=jnp.asarray(center, dtype),
        center0=jnp.asarray(center0, dtype),
        center1=jnp.asarray(center1, dtype),
        vel_vec=jnp.asarray(vel_vec, dtype),
        type=t,
        velocity=cfg.velocity,
        duration=cfg.duration,
        flip=cfg.flip,
    )
    state = BCState(
        elapsed=jnp.zeros((), dtype),
        reversed=jnp.zeros((), bool),
        done=jnp.zeros((), bool),
    )
    return spec, state, is_fixed, V_out


def _rot_about(V, center, angle, dim, axis_3d: str):
    """Rotate positions about `center` by `angle` (2D rotation or 3D about a
    coordinate axis), returning the displaced positions."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    P = V - center
    if dim == 2:
        x = c * P[:, 0] - s * P[:, 1]
        y = s * P[:, 0] + c * P[:, 1]
        Q = jnp.stack([x, y], axis=-1)
    elif axis_3d == "x":
        y = c * P[:, 1] - s * P[:, 2]
        z = s * P[:, 1] + c * P[:, 2]
        Q = jnp.stack([P[:, 0], y, z], axis=-1)
    else:  # "z"
        x = c * P[:, 0] - s * P[:, 1]
        y = s * P[:, 0] + c * P[:, 1]
        Q = jnp.stack([x, y, P[:, 2]], axis=-1)
    return Q + center


def bc_step(spec: BCSpec, st: BCState, V: jnp.ndarray, dt: float):
    """Advance a scripted BC one timestep: returns (V', st').

    Mirrors the per-type step() methods (moving/twist/stretch/bend/
    translate BC headers). Static (non-moving) BC types are no-ops.
    """
    t = spec.type
    dim = V.shape[1]
    if t in ("null", "scale", "randomize", "onepoint", "hang", "hangends"):
        return V, st

    if t == "stretch":
        # group i velocity = (-1)^i * velocity along axis: group0 -> +vel,
        # group1 -> -vel (stretch_boundary_condition.h:24-29).
        dV = (
            spec.group0[:, None] * spec.vel_vec
            - spec.group1[:, None] * spec.vel_vec
        ) * dt
        return V + dV, st

    if t == "translate":
        # group 1 moves at velocity*(-1)^1 = -velocity along axis for
        # `duration`, optional flip (moving_boundary_condition.h:9-64).
        vel = jnp.where(st.reversed, spec.vel_vec, -spec.vel_vec)
        active = jnp.logical_not(st.done)
        dV = spec.group1[:, None] * vel * dt * active.astype(V.dtype)
        elapsed = st.elapsed + dt * active.astype(V.dtype)
        expire = elapsed > spec.duration
        if spec.flip:
            newly_rev = jnp.logical_and(expire, jnp.logical_not(st.reversed))
            done = jnp.logical_or(st.done, jnp.logical_and(expire, st.reversed))
            elapsed = jnp.where(newly_rev, 0.0, elapsed)
            rev = jnp.logical_or(st.reversed, newly_rev)
        else:
            done = jnp.logical_or(st.done, expire)
            rev = st.reversed
        return V + dV, st.replace(elapsed=elapsed, reversed=rev, done=done)

    if t == "twist":
        # groups rotate about the x-axis (3D) / in-plane (2D) at
        # (-1)^i * velocity * pi rad/s about the object bbox center.
        a = spec.velocity * math.pi * dt
        V0r = _rot_about(V, spec.center, a, dim, "x")
        V1r = _rot_about(V, spec.center, -a, dim, "x")
        dV = spec.group0[:, None] * (V0r - V) + spec.group1[:, None] * (V1r - V)
        return V + dV, st

    if t == "bend":
        # like twist but about the z-axis and per-group centers
        a = spec.velocity * math.pi * dt
        V0r = _rot_about(V, spec.center0, a, dim, "z")
        V1r = _rot_about(V, spec.center1, -a, dim, "z")
        dV = spec.group0[:, None] * (V0r - V) + spec.group1[:, None] * (V1r - V)
        return V + dV, st

    if t == "twist-and-stretch":
        # twist about x at (-1)^i velocity pi, plus translation at
        # (-1)^i * (-0.05) along axis (twist_and_stretch_boundary_condition.h).
        a = spec.velocity * math.pi * dt
        axis_vel = spec.vel_vec / jnp.maximum(jnp.abs(spec.velocity), 1e-30)
        trans = -0.05 * axis_vel * dt
        V0r = _rot_about(V, spec.center, a, dim, "x") + trans
        V1r = _rot_about(V, spec.center, -a, dim, "x") - trans
        dV = spec.group0[:, None] * (V0r - V) + spec.group1[:, None] * (V1r - V)
        return V + dV, st

    raise KeyError(f"unknown boundary condition '{t}'")
