"""MeshData: the static discretization pytree + element-level jax ops.

TPU-native replacement for the reference Mesh class hierarchy (reference:
src/mesh/mesh.h:54-188, tet_mesh.cpp, tri2d_mesh.cpp, meshes.cpp). Instead
of global sparse matrices (J_, M_, W_, PJW_) everything is matrix-free:

- deformation gradients are per-element gathers + small contractions
  (F = J x, reference tet_mesh.cpp:77-80),
- the transpose J^T W y is a scatter-add segment-sum,
- the consistent mass matrix is applied element-wise (M x).

Multi-object scenes are concatenated into a single global mesh at build time
(the reference's Meshes composite, src/mesh/meshes.cpp:11-144), carrying
per-element material parameters and a per-vertex object id.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from mixedfem_tpu.mesh import discretization as disc


@flax.struct.dataclass
class MeshData:
    """Static per-simulation discretization data (all arrays device-ready)."""

    V0: jnp.ndarray          # (nv, d) reference/rest positions
    T: jnp.ndarray           # (E, k) int32 element vertex ids
    dphidX: jnp.ndarray      # (E, k, d) shape function gradients
    vols: jnp.ndarray        # (E,) element volumes (2D: double areas)
    mass_coeff: jnp.ndarray  # (E, k, k) consistent mass blocks (scalar x I_d)
    mass_lumped: jnp.ndarray  # (nv,) lumped (row-sum) mass
    mass_diag: jnp.ndarray   # (nv,) true diagonal of the consistent mass
    free_mask: jnp.ndarray   # (nv,) f: 1.0 where vertex is free, 0.0 pinned
    mu: jnp.ndarray          # (E,) per-element Lame mu
    lam: jnp.ndarray         # (E,) per-element Lame lambda
    model_id: jnp.ndarray    # (E,) int32 material model index into `models`
    ext_force: jnp.ndarray   # (nv, d) external acceleration (gravity etc.)
    obj_id: jnp.ndarray      # (nv,) int32 object index per vertex
    F_srf: jnp.ndarray       # boundary facets (3D: (nf,3), 2D: (ne,2)) int32
    E_srf: jnp.ndarray       # boundary edges (3D) / == F_srf (2D)
    rest_normal: jnp.ndarray  # (E, 3) shell rest normals ((0,) for solids)
    # rods only (k=2 segments in 3D, mesh/rod.py): rest frame rows
    # [t0; N0; B0] per segment and rest lengths ((0,...) otherwise)
    rod_frames: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0, 3, 3))
    )
    rod_L: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0,))
    )

    dim: int = flax.struct.field(pytree_node=False, default=3)
    models: Tuple[str, ...] = flax.struct.field(
        pytree_node=False, default=()
    )
    shell: bool = flax.struct.field(pytree_node=False, default=False)
    rod: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def nv(self) -> int:
        return self.V0.shape[0]

    @property
    def nelem(self) -> int:
        return self.T.shape[0]

    @property
    def nodes_per_elem(self) -> int:
        return self.T.shape[1]


def build_mesh_data(
    V: np.ndarray,
    T: np.ndarray,
    *,
    density: np.ndarray,
    mu: np.ndarray,
    lam: np.ndarray,
    model_id: np.ndarray,
    models: Tuple[str, ...],
    is_fixed: np.ndarray,
    ext_force: np.ndarray,
    obj_id: np.ndarray | None = None,
    dtype=jnp.float64,
    shell: bool = False,
    thickness: float = 1e-3,
) -> MeshData:
    """Build MeshData from host arrays (f64 precompute, cast to `dtype`).

    shell=True: 3D triangle membranes with the normal-augmented deformation
    gradient (reference TriMesh, src/mesh/tri_mesh.cpp); volumes are
    doublearea * thickness / 2 (tri_mesh.cpp:38-41)."""
    V = np.asarray(V, dtype=np.float64)
    T = np.asarray(T, dtype=np.int32)
    dim = V.shape[1]
    k = T.shape[1]

    rest_normal = np.zeros((0, 3))
    if shell:
        assert dim == 3 and k == 3
        vols = disc.tri_double_areas(V, T) * (thickness / 2.0)
        dphidX = disc.tri3d_dphidX(V, T)
        rest_normal = disc.tri3d_rest_normals(V, T)
    elif dim == 3:
        vols = disc.tet_volumes(V, T)
        dphidX = disc.tet_dphidX(V, T)
    else:
        vols = disc.tri_double_areas(V, T)
        dphidX = disc.tri2d_dphidX(V, T)

    density = np.broadcast_to(np.asarray(density, np.float64), (len(T),))
    mass_coeff = disc.consistent_mass_coeff(vols, density, k, shell=shell)
    # Lumped mass: row sums of the consistent mass, scattered to vertices.
    lumped = np.zeros(len(V))
    np.add.at(lumped, T.reshape(-1), mass_coeff.sum(axis=2).reshape(-1))
    mdiag = np.zeros(len(V))
    np.add.at(
        mdiag, T.reshape(-1), np.diagonal(mass_coeff, axis1=1, axis2=2).reshape(-1)
    )

    if shell:
        F_srf = T.copy()            # the surface IS the shell
        E_srf = disc.edges(T)
    else:
        F_srf = disc.boundary_facets(T)
        E_srf = disc.edges(F_srf) if dim == 3 else F_srf

    return MeshData(
        V0=jnp.asarray(V, dtype),
        T=jnp.asarray(T),
        dphidX=jnp.asarray(dphidX, dtype),
        vols=jnp.asarray(vols, dtype),
        mass_coeff=jnp.asarray(mass_coeff, dtype),
        mass_lumped=jnp.asarray(lumped, dtype),
        mass_diag=jnp.asarray(mdiag, dtype),
        free_mask=jnp.asarray(~np.asarray(is_fixed, bool), dtype),
        mu=jnp.asarray(np.broadcast_to(mu, (len(T),)), dtype),
        lam=jnp.asarray(np.broadcast_to(lam, (len(T),)), dtype),
        model_id=jnp.asarray(np.broadcast_to(model_id, (len(T),)), jnp.int32),
        ext_force=jnp.asarray(ext_force, dtype),
        obj_id=jnp.asarray(
            obj_id if obj_id is not None else np.zeros(len(V)), jnp.int32
        ),
        F_srf=jnp.asarray(F_srf),
        E_srf=jnp.asarray(E_srf),
        rest_normal=jnp.asarray(rest_normal, dtype),
        dim=dim,
        models=tuple(models),
        shell=shell,
    )


def build_rod_mesh_data(
    V: np.ndarray,
    E: np.ndarray,
    *,
    density: np.ndarray,
    mu: np.ndarray,
    lam: np.ndarray,
    model_id: np.ndarray,
    models: Tuple[str, ...],
    is_fixed: np.ndarray,
    ext_force: np.ndarray,
    radius: float = 1e-2,
    dtype=jnp.float64,
) -> MeshData:
    """Rods as a FIRST-CLASS element type: k=2 segments in 3D with the
    frame-augmented deformation gradient of mesh/rod.py. The reference
    leaves RodMesh::deformation_gradient an unimplemented stub
    (src/mesh/rod_mesh.h:30-34); this completes the capability."""
    from mixedfem_tpu.mesh import rod as rodmod

    V = np.asarray(V, np.float64)
    E = np.asarray(E, np.int32)
    assert V.shape[1] == 3 and E.shape[1] == 2
    t0, L, N0, B0 = rodmod.rod_rest_frames(V, E)
    area = np.pi * radius * radius
    vols = area * L
    # linear-stretch part of F: dphi rows (-t0/L, +t0/L)
    dphidX = np.stack([-t0 / L[:, None], t0 / L[:, None]], axis=1)
    density = np.broadcast_to(np.asarray(density, np.float64), (len(E),))
    mass_coeff = rodmod.rod_mass_coeff(L, density, radius)
    lumped = np.zeros(len(V))
    np.add.at(lumped, E.reshape(-1), mass_coeff.sum(axis=2).reshape(-1))
    mdiag = np.zeros(len(V))
    np.add.at(
        mdiag,
        E.reshape(-1),
        np.diagonal(mass_coeff, axis1=1, axis2=2).reshape(-1),
    )
    frames = np.stack([t0, N0, B0], axis=1)  # (E, 3, 3) rows
    return MeshData(
        V0=jnp.asarray(V, dtype),
        T=jnp.asarray(E),
        dphidX=jnp.asarray(dphidX, dtype),
        vols=jnp.asarray(vols, dtype),
        mass_coeff=jnp.asarray(mass_coeff, dtype),
        mass_lumped=jnp.asarray(lumped, dtype),
        mass_diag=jnp.asarray(mdiag, dtype),
        free_mask=jnp.asarray(~np.asarray(is_fixed, bool), dtype),
        mu=jnp.asarray(np.broadcast_to(mu, (len(E),)), dtype),
        lam=jnp.asarray(np.broadcast_to(lam, (len(E),)), dtype),
        model_id=jnp.asarray(np.broadcast_to(model_id, (len(E),)), jnp.int32),
        ext_force=jnp.asarray(ext_force, dtype),
        obj_id=jnp.asarray(np.zeros(len(V)), jnp.int32),
        F_srf=jnp.zeros((0, 3), jnp.int32),  # no faces: rods contact via EE
        E_srf=jnp.asarray(E),
        rest_normal=jnp.asarray(np.zeros((0, 3)), dtype),
        rod_frames=jnp.asarray(frames, dtype),
        rod_L=jnp.asarray(L, dtype),
        dim=3,
        models=tuple(models),
        rod=True,
    )


# ---------------------------------------------------------------------------
# Element-level jax ops (all matrix-free)
# ---------------------------------------------------------------------------

def _face_normals(xe: jnp.ndarray):
    """(E, 3, 3) shell element verts -> (unit normal (E,3), unnormalized n,
    length)."""
    v1 = xe[:, 1] - xe[:, 0]
    v2 = xe[:, 2] - xe[:, 0]
    nr = jnp.cross(v1, v2)
    l = jnp.sqrt(jnp.sum(nr * nr, axis=-1) + 1e-30)
    return nr / l[:, None], nr, l, v1, v2


def def_grad(mesh: MeshData, x: jnp.ndarray) -> jnp.ndarray:
    """Deformation gradients (E, d, d) from vertex positions x (nv, d).

    Solids: F[r, c] = sum_k x[T[e,k], r] * dphidX[e, k, c]  (F = J x in the
    reference, src/mesh/tet_mesh.cpp:77-80).
    Shells: F = F0 + outer(n(x), N_rest) — the normal-augmented membrane
    deformation gradient (tri_mesh.cpp:104-126)."""
    if mesh.rod:
        from mixedfem_tpu.mesh import rod as rodmod

        return rodmod.rod_def_grad(
            x, mesh.T,
            mesh.rod_frames[:, 0], mesh.rod_frames[:, 1],
            mesh.rod_frames[:, 2], mesh.rod_L,
        )
    xe = x[mesh.T]  # (E, k, d)
    F = jnp.einsum("ekr,ekc->erc", xe, mesh.dphidX)
    if mesh.shell:
        n, _, _, _, _ = _face_normals(xe)
        F = F + n[:, :, None] * mesh.rest_normal[:, None, :]
    return F


def _skew(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def shell_def_grad_jacobian(mesh: MeshData, x: jnp.ndarray) -> jnp.ndarray:
    """(E, k, r, a, c) tensor dF_ac/dx_kr at the current iterate for shells.

    The re-linearized jacobian of the reference (tri_mesh.cpp:128-190):
    Jloc = Jloc0 + N (I - n n^T) dn/dq / |n|, with dn/dq from cross-product
    matrices of the edge vectors."""
    xe = x[mesh.T]
    n, nr, l, v1, v2 = _face_normals(xe)
    P = jnp.eye(3, dtype=x.dtype) - n[:, :, None] * n[:, None, :]
    dx1 = _skew(v1)
    dx2 = _skew(v2)
    # dn/dq per corner: corner 0: dx2 - dx1; corner 1: -dx2; corner 2: dx1
    # (tri_mesh.cpp:164-168); rows are normal components, cols are coords.
    dndq = jnp.stack([dx2 - dx1, -dx2, dx1], axis=1)  # (E, k, 3, 3)
    # dn_unit/dx_kr = P (dndq[k][:, r]) / l
    dn = jnp.einsum("eab,ekbr,e->ekra", P, dndq, 1.0 / l)
    # dF_ac/dx_kr = delta_ar dphidX[k, c] + dn_a/dx_kr * N_rest[c]
    eye = jnp.eye(3, dtype=x.dtype)
    base = eye[None, None, :, :, None] * mesh.dphidX[:, :, None, None, :]
    # base[e, k, r, a, c] = delta_{r a} dphidX[e, k, c]
    shellterm = dn[:, :, :, :, None] * mesh.rest_normal[:, None, None, None, :]
    return base + shellterm


def def_grad_adjoint(mesh: MeshData, Y: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of def_grad: (E, d, d) co-gradients -> (nv, d) via scatter-add.

    Computes J^T y (the reference's sparse-transpose product in e.g.
    src/variables/mixed_stretch.cpp:232)."""
    contrib = jnp.einsum("ekc,erc->ekr", mesh.dphidX, Y)
    flat = contrib.reshape(-1, mesh.dim)
    return jax.ops.segment_sum(flat, mesh.T.reshape(-1), num_segments=mesh.nv)


def mass_matvec(mesh: MeshData, x: jnp.ndarray) -> jnp.ndarray:
    """Consistent mass matrix product M x, matrix-free (nv, d) -> (nv, d)."""
    xe = x[mesh.T]  # (E, k, d)
    ye = jnp.einsum("ekl,eld->ekd", mesh.mass_coeff, xe)
    return jax.ops.segment_sum(
        ye.reshape(-1, mesh.dim), mesh.T.reshape(-1), num_segments=mesh.nv
    )


def project_free(mesh: MeshData, x: jnp.ndarray) -> jnp.ndarray:
    """Zero out rows at pinned vertices (the P^T P projector)."""
    return x * mesh.free_mask[:, None]
