"""Vanilla (displacement-only) IPC collision barrier.

Reference: src/variables/collision.{h,cpp} — barrier potential
kappa * b(D(x)^2, dhat^2) per active frame, energy divided by h^2 (the
optimizer multiplies it back), gradient/Hessian unscaled and PSD-projected
(collision.cpp:122-128). Grad/Hess by autodiff through the clamped
distance functions.
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


def _potential_one(vframe, ftype, dhat, kappa):
    D = dist.frame_distance(vframe, ftype)
    return kappa * bar.barrier(D * D, dhat * dhat)


def energy(cf: ContactFrames, x, dhat, kappa, dt):
    verts = x[cf.frames]
    D = dist.frame_distance(verts, cf.ftype)
    act = jnp.logical_and(D < dhat, cf.fmask > 0)
    b = bar.barrier(D * D, dhat * dhat)
    e = kappa * jnp.sum(b * act) / (dt * dt)
    bad = jnp.any(jnp.logical_and(cf.fmask > 0, D <= 0))
    return jnp.where(bad, jnp.asarray(1e30, x.dtype), e)


@flax.struct.dataclass
class VCollisionCoeffs:
    g: jnp.ndarray  # (C, 4, d)
    H: jnp.ndarray  # (C, 4*d, 4*d) PSD-projected


def update(cf: ContactFrames, x, dhat, kappa):
    verts = x[cf.frames]
    C, k, d = verts.shape
    D = dist.frame_distance(verts, cf.ftype)
    act = jnp.logical_and(D < dhat, cf.fmask > 0).astype(x.dtype)

    def pot_flat(vflat, ftype):
        return _potential_one(vflat.reshape(k, d), ftype, dhat, kappa)

    vflat = verts.reshape(C, k * d)
    g = jax.vmap(jax.grad(pot_flat))(vflat, cf.ftype)
    H = jax.vmap(jax.hessian(pot_flat))(vflat, cf.ftype)
    H, _, _ = psd.psd_fix(H, tol=0.0, sweeps=6)
    return VCollisionCoeffs(
        g=(g * act[:, None]).reshape(C, k, d), H=H * act[:, None, None]
    )


def gradient(mesh: meshmod.MeshData, cf: ContactFrames, c: VCollisionCoeffs):
    out = jax.ops.segment_sum(
        c.g.reshape(-1, mesh.dim), cf.frames.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)


def matvec(mesh: meshmod.MeshData, cf: ContactFrames, c: VCollisionCoeffs, p):
    p = meshmod.project_free(mesh, p)
    pe = p[cf.frames].reshape(cf.frames.shape[0], -1)
    y = jnp.einsum("cab,cb->ca", c.H, pe)
    out = jax.ops.segment_sum(
        y.reshape(-1, mesh.dim), cf.frames.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)


def diag_blocks(mesh: meshmod.MeshData, cf: ContactFrames, c: VCollisionCoeffs):
    d = mesh.dim
    C = cf.frames.shape[0]
    Hm = c.H.reshape(C, 4, d, 4, d)
    B = jnp.einsum("ckrks->ckrs", Hm)
    return jax.ops.segment_sum(
        B.reshape(-1, d, d), cf.frames.reshape(-1), num_segments=mesh.nv
    )
