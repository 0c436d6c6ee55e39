"""Closed-form primitive distances (point-point/edge/triangle, edge-edge).

Replaces the ipc-toolkit distance kernels used by the reference
(src/utils/mixed_collision_constraint.cpp, DistanceMode::SQRT — UNsquared
distances). Instead of the toolkit's distance-TYPE classification into
PP/PE/PT sub-formulas, each function computes the true clamped distance
branch-free (jnp.where); true distances to convex sets are C^1, so
jax.grad through these gives the correct gradients everywhere (validated
by FD in tests/test_collision.py).

All functions take stacked vertex arguments and are vmap-friendly; they
return UNSQUARED distances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _safe_div(a, b):
    ok = jnp.abs(b) > _EPS
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)




def _safe_norm(v):
    """NaN-free Euclidean norm: finite gradient (0) at v = 0. Padded contact
    frames gather coincident vertices, and autodiff of sqrt at 0 would
    otherwise poison masked arithmetic (0 * nan = nan)."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-30)


def point_point(p0, p1):
    return _safe_norm(p0 - p1)


def point_edge(p, e0, e1):
    """Distance from point p to segment [e0, e1] (any dim)."""
    d = e1 - e0
    t = _safe_div(jnp.sum((p - e0) * d, axis=-1), jnp.sum(d * d, axis=-1))
    t = jnp.clip(t, 0.0, 1.0)
    c = e0 + t[..., None] * d
    return _safe_norm(p - c)


def point_triangle(p, t0, t1, t2):
    """Distance from point p to triangle (t0,t1,t2) in 3D.

    Region classification via barycentric projection with where-clamping
    (Ericson, Real-Time Collision Detection §5.1.5), branch-free."""
    ab = t1 - t0
    ac = t2 - t0
    ap = p - t0

    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = p - t1
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = p - t2
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # interior barycentric coordinates
    denom = va + vb + vc
    v = _safe_div(vb, denom)
    w = _safe_div(vc, denom)

    # vertex regions
    in_a = jnp.logical_and(d1 <= 0, d2 <= 0)
    in_b = jnp.logical_and(d3 >= 0, d4 <= d3)
    in_c = jnp.logical_and(d6 >= 0, d5 <= d6)

    # edge regions
    on_ab = jnp.logical_and(
        jnp.logical_and(vc <= 0, d1 >= 0), d3 <= 0
    )
    on_ac = jnp.logical_and(
        jnp.logical_and(vb <= 0, d2 >= 0), d6 <= 0
    )
    on_bc = jnp.logical_and(
        jnp.logical_and(va <= 0, (d4 - d3) >= 0), (d5 - d6) >= 0
    )

    t_ab = _safe_div(d1, d1 - d3)
    t_ac = _safe_div(d2, d2 - d6)
    t_bc = _safe_div(d4 - d3, (d4 - d3) + (d5 - d6))

    c_int = t0 + v[..., None] * ab + w[..., None] * ac
    c = c_int
    c = jnp.where(on_bc[..., None], t1 + t_bc[..., None] * (t2 - t1), c)
    c = jnp.where(on_ac[..., None], t0 + t_ac[..., None] * ac, c)
    c = jnp.where(on_ab[..., None], t0 + t_ab[..., None] * ab, c)
    c = jnp.where(in_c[..., None], t2, c)
    c = jnp.where(in_b[..., None], t1, c)
    c = jnp.where(in_a[..., None], t0, c)
    return _safe_norm(p - c)


def edge_edge(p0, p1, q0, q1):
    """Distance between segments [p0,p1] and [q0,q1] in 3D.

    Lumelsky's clamped closest-point algorithm, branch-free. Degenerate
    (parallel) cases fall back consistently; the reference's edge-edge
    mollifier is wired but disabled there too (mixed_collision.cpp:149-165).
    """
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b

    s = jnp.clip(_safe_div(b * f - c * e, denom), 0.0, 1.0)
    # recompute t given s, then clamp and recompute s (Lumelsky)
    t = _safe_div(b * s + f, e)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s2 = jnp.clip(_safe_div(b * t_cl - c, a), 0.0, 1.0)
    s = jnp.where(jnp.logical_or(t < 0, t > 1), s2, s)
    t = t_cl

    cp = p0 + s[..., None] * d1
    cq = q0 + t[..., None] * d2
    return _safe_norm(cp - cq)


# ---------------------------------------------------------------------------
# Padded-frame distance dispatch: each contact frame is 4 vertex ids + a type
# code. Types: 0 = point-triangle (p, t0, t1, t2); 1 = edge-edge
# (p0, p1, q0, q1); 2 = point-edge (p, e0, e1, -); 3 = point-point (p, q, -, -).
# ---------------------------------------------------------------------------

PT, EE, PE, PP = 0, 1, 2, 3


def frame_distance(verts, ftype):
    """verts: (..., 4, d) gathered frame vertices; ftype: (...,) int32.

    Returns the UNSQUARED distance per frame. All types evaluated and
    selected (branch-free)."""
    v0, v1, v2, v3 = (verts[..., i, :] for i in range(4))
    if verts.shape[-1] == 2:
        d_pe = point_edge(v0, v1, v2)
        d_pp = point_point(v0, v1)
        return jnp.where(ftype == PE, d_pe, d_pp)
    d_pt = point_triangle(v0, v1, v2, v3)
    d_ee = edge_edge(v0, v1, v2, v3)
    d_pe = point_edge(v0, v1, v2)
    d_pp = point_point(v0, v1)
    out = jnp.where(ftype == PT, d_pt, d_pp)
    out = jnp.where(ftype == EE, d_ee, out)
    out = jnp.where(ftype == PE, d_pe, out)
    return out


# Per-frame distance gradient w.r.t. the 4 stacked vertices (C, 4, d):
frame_distance_grad = jax.vmap(jax.grad(lambda v, t: frame_distance(v, t)), (0, 0))


# ---------------------------------------------------------------------------
# Closest-point coefficients (for friction): weights w (4,) such that the
# relative displacement at the contact point is u_rel = sum_k w_k U[v_k]
# (U = per-vertex displacement). Mirrors ipc-toolkit's lagged closest-point
# barycentrics used by construct_friction_constraint_set.
# ---------------------------------------------------------------------------

def _pt_bary(p, t0, t1, t2):
    """Clamped barycentric coords of the closest point on the triangle."""
    ab = t1 - t0
    ac = t2 - t0
    ap = p - t0
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = p - t1
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = p - t2
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = va + vb + vc
    v = _safe_div(vb, denom)
    w = _safe_div(vc, denom)
    u = 1.0 - v - w

    in_a = jnp.logical_and(d1 <= 0, d2 <= 0)
    in_b = jnp.logical_and(d3 >= 0, d4 <= d3)
    in_c = jnp.logical_and(d6 >= 0, d5 <= d6)
    on_ab = jnp.logical_and(jnp.logical_and(vc <= 0, d1 >= 0), d3 <= 0)
    on_ac = jnp.logical_and(jnp.logical_and(vb <= 0, d2 >= 0), d6 <= 0)
    on_bc = jnp.logical_and(
        jnp.logical_and(va <= 0, (d4 - d3) >= 0), (d5 - d6) >= 0
    )
    t_ab = _safe_div(d1, d1 - d3)
    t_ac = _safe_div(d2, d2 - d6)
    t_bc = _safe_div(d4 - d3, (d4 - d3) + (d5 - d6))

    bary = jnp.stack([u, v, w], axis=-1)
    bary = jnp.where(
        on_bc[..., None],
        jnp.stack([jnp.zeros_like(t_bc), 1 - t_bc, t_bc], axis=-1),
        bary,
    )
    bary = jnp.where(
        on_ac[..., None],
        jnp.stack([1 - t_ac, jnp.zeros_like(t_ac), t_ac], axis=-1),
        bary,
    )
    bary = jnp.where(
        on_ab[..., None],
        jnp.stack([1 - t_ab, t_ab, jnp.zeros_like(t_ab)], axis=-1),
        bary,
    )
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    bary = jnp.where(in_c[..., None], jnp.stack([zero, zero, one], -1), bary)
    bary = jnp.where(in_b[..., None], jnp.stack([zero, one, zero], -1), bary)
    bary = jnp.where(in_a[..., None], jnp.stack([one, zero, zero], -1), bary)
    return bary


def _ee_params(p0, p1, q0, q1):
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.clip(_safe_div(b * f - c * e, denom), 0.0, 1.0)
    t = _safe_div(b * s + f, e)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s2 = jnp.clip(_safe_div(b * t_cl - c, a), 0.0, 1.0)
    s = jnp.where(jnp.logical_or(t < 0, t > 1), s2, s)
    return s, t_cl


def _pe_param(p, e0, e1):
    d = e1 - e0
    t = _safe_div(jnp.sum((p - e0) * d, axis=-1), jnp.sum(d * d, axis=-1))
    return jnp.clip(t, 0.0, 1.0)


def frame_contact_weights(verts, ftype):
    """(..., 4) relative-displacement weights at the (lagged) closest point."""
    v0, v1, v2, v3 = (verts[..., i, :] for i in range(4))
    one = jnp.ones(verts.shape[:-2], verts.dtype)
    zero = jnp.zeros_like(one)
    if verts.shape[-1] == 2:
        t = _pe_param(v0, v1, v2)
        w_pe = jnp.stack([one, -(1 - t), -t, zero], axis=-1)
        w_pp = jnp.stack([one, -one, zero, zero], axis=-1)
        return jnp.where((ftype == PE)[..., None], w_pe, w_pp)
    bary = _pt_bary(v0, v1, v2, v3)
    w_pt = jnp.concatenate([one[..., None], -bary], axis=-1)
    s, t = _ee_params(v0, v1, v2, v3)
    w_ee = jnp.stack([1 - s, s, -(1 - t), -t], axis=-1)
    tpe = _pe_param(v0, v1, v2)
    w_pe = jnp.stack([one, -(1 - tpe), -tpe, zero], axis=-1)
    w_pp = jnp.stack([one, -one, zero, zero], axis=-1)
    out = jnp.where((ftype == PT)[..., None], w_pt, w_pp)
    out = jnp.where((ftype == EE)[..., None], w_ee, out)
    out = jnp.where((ftype == PE)[..., None], w_pe, out)
    return out


def frame_normal(verts, ftype):
    """Unit vector from the second primitive's closest point toward the
    first's (the contact normal direction), i.e. n = u / ||u|| where
    u = sum_k w_k verts_k."""
    w = frame_contact_weights(verts, ftype)
    u = jnp.einsum("...k,...kd->...d", w, verts)
    n = jnp.linalg.norm(u, axis=-1, keepdims=True)
    ok = n > _EPS
    return jnp.where(ok, u / jnp.where(ok, n, 1.0), jnp.zeros_like(u))
