"""Lagged IPC friction (displacement-only variable).

Reference: src/variables/friction.{h,cpp}. Once per timestep (pre_solve),
the friction constraint set is built from the PRE-STEP positions V0: active
contacts (D < dhat) with lagged normal-force magnitudes
N = -kappa * 2 d b'(d^2, dhat^2), tangent bases, and closest-point weights.
During the step the potential depends on U = V - V0:

  E = sum_i mu N_i f0(||Tan_i^T u_i||, epsv*h),  u_i = sum_k w_ik U[v_ik]

with the IPC C^1 smoother f0(y) = -y^3/(3 e^2) + y^2/e + e/3 for y < e else y.
Energy is returned divided by h^2 (the optimizer multiplies h^2 back,
friction.cpp:25); gradient/Hessian enter the system unscaled
(friction.cpp:69-74). Gradients/Hessians come from autodiff of the
potential w.r.t. the 4 frame vertices, Hessians PSD-projected.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from mixedfem_tpu.collision import barrier as bar
from mixedfem_tpu.collision import distances as dist
from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.ops import psd
from mixedfem_tpu.variables.mixed_collision import ContactFrames


@flax.struct.dataclass
class FrictionFrames:
    """Lagged per-step friction data (built at V0 once per step)."""

    frames: jnp.ndarray  # (C, 4) int32
    w: jnp.ndarray       # (C, 4) closest-point relative-displacement weights
    basis: jnp.ndarray   # (C, d, d-1) tangent basis at V0
    N: jnp.ndarray       # (C,) lagged normal force magnitude (>= 0)
    active: jnp.ndarray  # (C,) mask
    V0: jnp.ndarray      # (C, 4, d) pre-step frame positions


def _tangent_basis(n):
    """(..., d) unit normal -> (..., d, d-1) orthonormal tangent basis."""
    d = n.shape[-1]
    if d == 2:
        t = jnp.stack([-n[..., 1], n[..., 0]], axis=-1)
        return t[..., None]
    ex = jnp.zeros_like(n).at[..., 0].set(1.0)
    ey = jnp.zeros_like(n).at[..., 1].set(1.0)
    ref = jnp.where((jnp.abs(n[..., 0]) > 0.9)[..., None], ey, ex)
    t0 = jnp.cross(n, ref)
    norm = jnp.linalg.norm(t0, axis=-1, keepdims=True)
    t0 = t0 / jnp.maximum(norm, 1e-30)
    t1 = jnp.cross(n, t0)
    return jnp.stack([t0, t1], axis=-1)


def build(
    mesh: meshmod.MeshData,
    cf: ContactFrames,
    x0: jnp.ndarray,
    dhat: float,
    kappa: float,
) -> FrictionFrames:
    """Construct the lagged friction set at pre-step positions x0
    (Friction::pre_solve, friction.cpp:108-145)."""
    verts = x0[cf.frames]
    D = dist.frame_distance(verts, cf.ftype)
    active = jnp.logical_and(D < dhat, cf.fmask > 0).astype(x0.dtype)
    g2 = bar.barrier_gradient(D * D, dhat * dhat)
    N = -kappa * 2.0 * D * g2  # normal force magnitude (b' < 0 inside)
    N = jnp.maximum(N, 0.0) * active
    w = dist.frame_contact_weights(verts, cf.ftype)
    n = dist.frame_normal(verts, cf.ftype)
    basis = _tangent_basis(n)
    return FrictionFrames(
        frames=cf.frames, w=w, basis=basis, N=N, active=active, V0=verts
    )


def _f0(y, eps):
    """IPC smooth friction potential."""
    inside = y < eps
    ys = jnp.where(inside, y, eps)
    val_in = -(ys**3) / (3 * eps * eps) + ys * ys / eps + eps / 3.0
    return jnp.where(inside, val_in, y)


def _potential_one(vframe, ff_w, ff_basis, ff_N, V0, mu, epsv_h):
    """Friction potential of one frame as a function of its vertices."""
    U = vframe - V0
    u = jnp.einsum("k,kd->d", ff_w, U)
    ut = jnp.einsum("dk,d->k", ff_basis, u)
    y = jnp.sqrt(jnp.sum(ut * ut) + 1e-30)
    return mu * ff_N * _f0(y, epsv_h)


def energy(ff: FrictionFrames, x: jnp.ndarray, mu: float, epsv_h: float, dt):
    """Potential / dt^2 (the optimizer multiplies h^2; friction.cpp:25)."""
    verts = x[ff.frames]
    e = jax.vmap(_potential_one, (0, 0, 0, 0, 0, None, None))(
        verts, ff.w, ff.basis, ff.N, ff.V0, mu, epsv_h
    )
    return jnp.sum(e * ff.active) / (dt * dt)


@flax.struct.dataclass
class FrictionCoeffs:
    g: jnp.ndarray  # (C, 4, d) potential gradient
    H: jnp.ndarray  # (C, 4*d, 4*d) PSD-projected Hessian


def update(ff: FrictionFrames, x: jnp.ndarray, mu: float, epsv_h: float):
    verts = x[ff.frames]
    C, k, d = verts.shape

    def pot_flat(vflat, w, basis, N, V0):
        return _potential_one(vflat.reshape(k, d), w, basis, N, V0, mu, epsv_h)

    vflat = verts.reshape(C, k * d)
    g = jax.vmap(jax.grad(pot_flat))(vflat, ff.w, ff.basis, ff.N, ff.V0)
    H = jax.vmap(jax.hessian(pot_flat))(vflat, ff.w, ff.basis, ff.N, ff.V0)
    H, _, _ = psd.psd_fix(H, tol=0.0, sweeps=6)
    af = ff.active
    return FrictionCoeffs(
        g=(g * af[:, None]).reshape(C, k, d), H=H * af[:, None, None]
    )


def gradient(mesh: meshmod.MeshData, ff: FrictionFrames, c: FrictionCoeffs):
    out = jax.ops.segment_sum(
        c.g.reshape(-1, mesh.dim), ff.frames.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)


def matvec(mesh: meshmod.MeshData, ff: FrictionFrames, c: FrictionCoeffs, p):
    p = meshmod.project_free(mesh, p)
    pe = p[ff.frames].reshape(ff.frames.shape[0], -1)
    y = jnp.einsum("cab,cb->ca", c.H, pe)
    out = jax.ops.segment_sum(
        y.reshape(-1, mesh.dim), ff.frames.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)


def diag_blocks(mesh: meshmod.MeshData, ff: FrictionFrames, c: FrictionCoeffs):
    d = mesh.dim
    C = ff.frames.shape[0]
    Hm = c.H.reshape(C, 4, d, 4, d)
    B = jnp.einsum("ckrks->ckrs", Hm)
    return jax.ops.segment_sum(
        B.reshape(-1, d, d), ff.frames.reshape(-1), num_segments=mesh.nv
    )
