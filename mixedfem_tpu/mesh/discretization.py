"""Host-side (numpy, f64) linear FEM discretization precompute.

Replaces the reference's Bartels-based mesh init (reference:
src/mesh/tet_mesh.cpp:31-75, src/mesh/tri2d_mesh.cpp:25-73): shape-function
gradients dphi/dX, element volumes, consistent mass matrices, boundary
facets. All outputs are static numpy arrays baked into the MeshData pytree.

Conventions (identical to the reference):
- x is the flattened vertex-position vector [v0x v0y v0z v1x ...] — here kept
  as an (nv, d) array.
- F_e = sum_k x[T[e,k]] dphi_k/dX^T, i.e. F[r,c] = sum_k x_k[r] dphidX[k,c]
  (reference tet local_jacobian, src/mesh/tet_mesh.cpp:17-27).
- volumes: 3D = |tet volume| (igl::volume), 2D = DOUBLE area
  (igl::doublearea — the reference weights all 2D element quantities by 2A,
  src/mesh/tri2d_mesh.cpp:32-34; we reproduce that).
"""

from __future__ import annotations

import numpy as np


def tet_volumes(V: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Absolute tetrahedron volumes (reference: tet_mesh.cpp:31-34)."""
    a, b, c, d = V[T[:, 0]], V[T[:, 1]], V[T[:, 2]], V[T[:, 3]]
    # igl::volume convention: vol = det([b-a; c-a; d-a]) / 6 (sign dropped)
    M = np.stack([b - a, c - a, d - a], axis=-2)
    return np.abs(np.linalg.det(M)) / 6.0


def tri_double_areas(V: np.ndarray, T: np.ndarray) -> np.ndarray:
    """Double triangle areas (igl::doublearea; reference: tri2d_mesh.cpp:32)."""
    a, b, c = V[T[:, 0]], V[T[:, 1]], V[T[:, 2]]
    e1, e2 = b - a, c - a
    if V.shape[1] == 2:
        return np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    return np.linalg.norm(np.cross(e1, e2), axis=-1)


def tet_dphidX(V: np.ndarray, T: np.ndarray) -> np.ndarray:
    """(E, 4, 3) shape-function gradients for linear tets.

    F = Ds Dm^{-1}: rows 1..3 are rows of Dm^{-1}, row 0 = -sum(rows).
    (Semantics of sim::linear_tetmesh_dphi_dX used at tet_mesh.cpp:46-47.)
    """
    a = V[T[:, 0]]
    Dm = np.stack([V[T[:, 1]] - a, V[T[:, 2]] - a, V[T[:, 3]] - a], axis=-1)
    Dmi = np.linalg.inv(Dm)  # (E, 3, 3)
    # dphi_k/dX for k=1..3 is the k-th ROW of Dm^{-1}.
    dphi = np.empty((len(T), 4, 3), dtype=V.dtype)
    dphi[:, 1:, :] = Dmi
    dphi[:, 0, :] = -Dmi.sum(axis=1)
    return dphi


def tri2d_dphidX(V: np.ndarray, T: np.ndarray) -> np.ndarray:
    """(E, 3, 2) shape-function gradients for linear 2D triangles."""
    a = V[T[:, 0]]
    Dm = np.stack([V[T[:, 1]] - a, V[T[:, 2]] - a], axis=-1)  # (E, 2, 2)
    Dmi = np.linalg.inv(Dm)
    dphi = np.empty((len(T), 3, 2), dtype=V.dtype)
    dphi[:, 1:, :] = Dmi
    dphi[:, 0, :] = -Dmi.sum(axis=1)
    return dphi


def tri3d_dphidX(V: np.ndarray, T: np.ndarray) -> np.ndarray:
    """(E, 3, 3) in-plane shape-function gradients for 3D membrane triangles.

    dphi_k is the 3D in-plane gradient of barycentric phi_k:
    grad phi_{1,2} = Dm (Dm^T Dm)^{-1} columns, phi_0 = -sum. (Semantics of
    sim::linear_tri3dmesh_dphi_dX used at tri_mesh.cpp:35.)"""
    e1 = V[T[:, 1]] - V[T[:, 0]]
    e2 = V[T[:, 2]] - V[T[:, 0]]
    Dm = np.stack([e1, e2], axis=-1)  # (E, 3, 2)
    G2 = np.linalg.inv(np.einsum("eik,eil->ekl", Dm, Dm))  # (E, 2, 2)
    grad12 = np.einsum("eik,ekl->eil", Dm, G2)  # (E, 3, 2) columns
    dphi = np.empty((len(T), 3, 3), dtype=V.dtype)
    dphi[:, 1, :] = grad12[:, :, 0]
    dphi[:, 2, :] = grad12[:, :, 1]
    dphi[:, 0, :] = -(dphi[:, 1] + dphi[:, 2])
    return dphi


def tri3d_rest_normals(V: np.ndarray, T: np.ndarray) -> np.ndarray:
    n = np.cross(V[T[:, 1]] - V[T[:, 0]], V[T[:, 2]] - V[T[:, 0]])
    return n / np.linalg.norm(n, axis=1, keepdims=True)


def consistent_mass_coeff(
    vols: np.ndarray, density: np.ndarray, k: int, shell: bool = False
):
    """(E, k, k) per-element consistent mass blocks (scalar per vertex pair;
    the d-dim block is coeff * I_d).

    3D tets (k=4): M_kl = rho * vol * (1 + delta_kl) / 20
    2D tris (k=3): M_kl = rho * area * (1 + delta_kl) / 12, with
                   area = vols / 2 because vols stores DOUBLE area.
    shells (k=3):  M_kl = rho * vols * (1 + delta_kl) / 12, vols already
                   carrying the thickness factor (tri_mesh.cpp:43-69).
    (Semantics of sim::linear_tetmesh_mass_matrix / linear_tri2dmesh_mass_matrix
    used at tet_mesh.cpp:36-41, tri2d_mesh.cpp:36-42.)
    """
    base = 1.0 + np.eye(k)
    if k == 4:
        w = density * vols / 20.0
    elif shell:
        w = density * vols / 12.0
    else:
        w = density * (vols / 2.0) / 12.0
    return w[:, None, None] * base[None]


def boundary_facets(T: np.ndarray) -> np.ndarray:
    """Boundary faces of a tet mesh (or boundary edges of a tri mesh).

    Matches igl::boundary_facets semantics (faces occurring exactly once),
    with outward orientation for tets. Reference: src/mesh/mesh.cpp:25.
    """
    k = T.shape[1]
    if k == 4:
        # Faces opposite each vertex, oriented outward for positive tets.
        faces = np.concatenate(
            [
                T[:, [1, 3, 2]],
                T[:, [0, 2, 3]],
                T[:, [0, 3, 1]],
                T[:, [0, 1, 2]],
            ],
            axis=0,
        )
    else:
        faces = np.concatenate([T[:, [1, 2]], T[:, [2, 0]], T[:, [0, 1]]], axis=0)
    key = np.sort(faces, axis=1)
    _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    return faces[counts[inv] == 1].astype(np.int32)


def edges(F: np.ndarray) -> np.ndarray:
    """Unique undirected edges of a face list (igl::edges semantics)."""
    k = F.shape[1]
    if k == 3:
        E = np.concatenate([F[:, [0, 1]], F[:, [1, 2]], F[:, [2, 0]]], axis=0)
    else:
        E = F.copy()
    E = np.sort(E, axis=1)
    return np.unique(E, axis=0).astype(np.int32)
