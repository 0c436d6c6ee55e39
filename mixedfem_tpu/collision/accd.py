"""Additive CCD: conservative step-size limiting for contact.

Reference: src/utils/additive_ccd.cpp (Li et al.-style ACCD): per candidate
frame, advance time by conservative increments t_l = 0.9 d / l_p until the
distance drops below 0.1 * d0; the step limit is the min over frames
(scaled by 0.9 at the call site, newton_optimizer.cpp:49-61).

Branch-free vmapped lax.while_loop with a fixed iteration cap; padded /
far-away frames return t = 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mixedfem_tpu.collision import distances as dist

_S = 0.1       # scaling factor (additive_ccd.cpp:27)
_MAX_ITERS = 256


def _accd_one(verts0, pverts, ftype, dtype):
    """CCD for one frame: verts0 (4, d) positions, pverts (4, d) motion."""
    # subtract mean motion (additive_ccd.cpp:31-36)
    pbar = jnp.mean(pverts, axis=0, keepdims=True)
    p = pverts - pbar
    l_p = jnp.max(jnp.linalg.norm(p, axis=-1)) * 2.0
    # (the reference sums the max norms of the two primitives; bounding with
    # 2 * overall max is conservative and branch-free across frame types)

    d0 = dist.frame_distance(verts0, ftype)
    g = _S * d0

    def cond(carry):
        t, t_l, v, it, done = carry
        return jnp.logical_and(jnp.logical_not(done), it < _MAX_ITERS)

    def body(carry):
        t, t_l, v, it, done = carry
        v = v + t_l * p
        dcur = dist.frame_distance(v, ftype)
        hit = jnp.logical_and(t > 0.0, dcur < g)
        t_new = jnp.where(hit, t, t + t_l)
        over = t_new > 1.0
        done = jnp.logical_or(hit, over)
        t_l_new = 0.9 * dcur / jnp.maximum(l_p, 1e-30)
        return (
            jnp.where(over, jnp.asarray(1.0, dtype), t_new),
            t_l_new,
            v,
            it + 1,
            done,
        )

    t0 = jnp.asarray(0.0, dtype)
    t_l0 = (1.0 - _S) * d0 / jnp.maximum(l_p, 1e-30)
    t, *_ = jax.lax.while_loop(
        cond, body, (t0, t_l0, verts0, jnp.zeros((), jnp.int32), l_p <= 1e-12)
    )
    # tiny motion -> unconstrained
    return jnp.where(l_p <= 1e-12, jnp.asarray(1.0, dtype), jnp.minimum(t, 1.0))


def accd_alpha(frames, ftype, fmask, x, p_full):
    """Min CCD step over all candidate frames.

    frames: (C, 4) int32, x/p_full: (nv, d). Returns scalar in (0, 1]."""
    if frames.shape[0] == 0:
        return jnp.asarray(1.0, x.dtype)
    return accd_alpha_verts(x[frames], p_full[frames], ftype, fmask)


def accd_alpha_verts(verts, pv, ftype, fmask):
    """accd_alpha on pre-gathered frame vertices (C, 4, d) — used by the
    vertex-partitioned step, which gathers frames with a psum."""
    dtype = verts.dtype
    if verts.shape[0] == 0:
        return jnp.asarray(1.0, dtype)
    t = jax.vmap(lambda v, q, ft: _accd_one(v, q, ft, dtype))(verts, pv, ftype)
    t = jnp.where(fmask > 0, t, 1.0)
    return jnp.min(t)
