"""MixedCollision: IPC contact with a mixed per-frame distance variable.

Reference: src/variables/mixed_collision.{h,cpp} + src/utils/mixed_ipc.cpp.
Per contact frame (padded, static capacity C): mixed distance d, multiplier
la, enforcing D(x) - d = 0 with the barrier applied to the MIXED distance:

  psi(d) = kappa * b(d^2, dhat^2)        (b = IPC log-barrier)

Condensed-system pieces (Gd = -1 throughout, mixed_collision.cpp:216-323):

  element stiffness  A_c = Gx H Gx^T
  rhs contribution   -Gx gl,  gl = H (D - d) + g
  local solve        delta_d = (D - d) + Gx : dx,   la = H delta_d + g

Frame lifecycle per Newton iteration (construct_constraint_set semantics,
mixed_ipc.cpp:199-391): a candidate activates when its true distance D <
dhat; previously-active frames persist (keeping d, la) while their MIXED
distance stays < dhat even if D grew; newly active frames initialize
d = D, la = 0. Candidates come from the host broadphase once per step
(collision/broadphase.py) with margin covering the step's motion.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from mixedfem_tpu.collision import barrier as bar
from mixedfem_tpu.collision import distances as dist
from mixedfem_tpu.mesh import mesh as meshmod


@flax.struct.dataclass
class ContactFrames:
    """Padded per-step candidate set (host-built, static capacity)."""

    frames: jnp.ndarray  # (C, 4) int32 vertex ids (0-padded)
    ftype: jnp.ndarray   # (C,) int32 distance type
    fmask: jnp.ndarray   # (C,) 1.0 for real candidates


@flax.struct.dataclass
class CollisionCoeffs:
    D: jnp.ndarray       # (C,) true distance at current x
    Gx: jnp.ndarray      # (C, 4, d) distance gradient
    g: jnp.ndarray       # (C,) dpsi/dd (mollifier-scaled when enabled)
    H: jnp.ndarray       # (C,) d2psi/dd2 (clamped; mollifier-scaled)
    active: jnp.ndarray  # (C,) float mask
    d: jnp.ndarray       # (C,) mixed distances (with new-frame init applied)
    la: jnp.ndarray      # (C,) multipliers (new frames zeroed)
    # EE-mollifier force kappa * b(d^2) * dm/dx (zeros when disabled)
    gmf: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0, 4, 3))
    )


def _frame_verts(cf: ContactFrames, x: jnp.ndarray):
    return x[cf.frames]  # (C, 4, d)


def update(
    mesh: meshmod.MeshData,
    cf: ContactFrames,
    x: jnp.ndarray,
    d_prev: jnp.ndarray,
    la_prev: jnp.ndarray,
    active_prev: jnp.ndarray,
    dhat: float,
    kappa: float,
    ee_mollifier: bool = False,
) -> CollisionCoeffs:
    verts = _frame_verts(cf, x)
    D = dist.frame_distance(verts, cf.ftype)
    Gx = dist.frame_distance_grad(verts, cf.ftype)

    newly = jnp.logical_and(D < dhat, cf.fmask > 0)
    keep = jnp.logical_and(active_prev > 0, d_prev < dhat)
    active = jnp.logical_or(newly, keep)

    was = active_prev > 0
    d = jnp.where(was, d_prev, D)
    la = jnp.where(was, la_prev, 0.0)

    g, H = bar.mixed_barrier_grad_hess(d, dhat, kappa)
    af = active.astype(x.dtype)

    C = cf.frames.shape[0]
    gmf = jnp.zeros((C, 4, mesh.dim), x.dtype)
    if ee_mollifier and mesh.dim == 3:
        # scale the barrier by m(x) (collision/mollifier.py; Gauss-Newton:
        # grad^2 m and the m-d cross blocks are dropped, keeping the
        # condensed system SPD); the dm/dx force enters the rhs via gmf.
        from mixedfem_tpu.collision import mollifier as mol

        epsx = mol.eps_x(mesh.V0[cf.frames])
        m, gm = mol.mollifier_grad(verts, cf.ftype, epsx)
        bval = bar.barrier(d * d, dhat * dhat)
        g = g * m
        H = jnp.maximum(H * m, 1e-8)
        gmf = (kappa * bval * af)[:, None, None] * gm
    return CollisionCoeffs(
        D=D, Gx=Gx, g=g * af, H=H, active=af, d=d, la=la, gmf=gmf
    )


def _scatter_frames(mesh, cf, contrib):
    """(C, 4, d) frame contributions -> (nv, d), masked free."""
    out = jax.ops.segment_sum(
        contrib.reshape(-1, mesh.dim),
        cf.frames.reshape(-1),
        num_segments=mesh.nv,
    )
    return meshmod.project_free(mesh, out)


def rhs(mesh: meshmod.MeshData, cf: ContactFrames, c: CollisionCoeffs):
    gl = c.H * (c.D - c.d) + c.g
    contrib = -c.Gx * (gl * c.active)[:, None, None]
    if c.gmf.shape[0] == cf.frames.shape[0]:
        contrib = contrib - c.gmf  # EE-mollifier dm/dx force
    return _scatter_frames(mesh, cf, contrib)


def matvec(mesh: meshmod.MeshData, cf: ContactFrames, c: CollisionCoeffs, p):
    p = meshmod.project_free(mesh, p)
    pe = p[cf.frames]                                  # (C, 4, d)
    Gdx = jnp.einsum("ckd,ckd->c", c.Gx, pe)
    contrib = c.Gx * (c.H * Gdx * c.active)[:, None, None]
    return _scatter_frames(mesh, cf, contrib)


def diag_blocks(mesh: meshmod.MeshData, cf: ContactFrames, c: CollisionCoeffs):
    B = jnp.einsum(
        "ckr,cks,c->ckrs", c.Gx, c.Gx, c.H * c.active
    )
    return jax.ops.segment_sum(
        B.reshape(-1, mesh.dim, mesh.dim),
        cf.frames.reshape(-1),
        num_segments=mesh.nv,
    )


def local_solve(mesh: meshmod.MeshData, cf: ContactFrames, c: CollisionCoeffs, dx):
    """delta_d = (D - d) + Gx : dx;  la = H delta_d + g (mixed_collision.cpp:289-323)."""
    dxe = dx[cf.frames]
    Gdx = jnp.einsum("ckd,ckd->c", c.Gx, dxe)
    delta = ((c.D - c.d) + Gdx) * c.active
    la = (c.H * delta + c.g) * c.active
    return delta, la


def energy(c_dmixed, active, dhat, kappa, dtype, m=None):
    """kappa * sum [m *] b(d^2, dhat^2) over active frames — NOT h^2-scaled
    (the reference divides by h^2 and the optimizer multiplies back,
    mixed_collision.cpp:44-46). Infeasible d <= 0 -> huge energy. `m` is
    the optional EE-mollifier value per frame."""
    b = bar.barrier(c_dmixed * c_dmixed, dhat * dhat)
    if m is not None:
        b = b * m
    e = kappa * jnp.sum(b * active)
    bad = jnp.any(jnp.logical_and(active > 0, c_dmixed <= 0))
    return jnp.where(bad, jnp.asarray(1e30, dtype), e)


def constraint_value(mesh, cf, c: CollisionCoeffs, x, d, la, dhat):
    """sum la (D(x) - d) over frames with D <= dhat or d <= dhat
    (mixed_collision.cpp:75-85)."""
    verts = _frame_verts(cf, x)
    D = dist.frame_distance(verts, cf.ftype)
    m = jnp.logical_and(
        c.active > 0, jnp.logical_or(D <= dhat, d <= dhat)
    ).astype(x.dtype)
    return jnp.sum(la * (D - d) * m)
