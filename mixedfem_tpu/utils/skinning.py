"""Linear-blend skinning: embed a render surface mesh in the sim tet mesh.

Reference: src/utils/linear_blend_skinning.h:13-52 — AABB containment +
barycentric weights of the containing tetrahedron per render vertex (nearest
tet when outside). The scene key `skinning_mesh` attaches an OBJ whose
vertices are advected as V_render = sum_k bary_k x[tet_verts_k]
(apps/sim3d.cpp:216-251 export path).
"""

from __future__ import annotations

import numpy as np


def embed_in_tets(Vr: np.ndarray, V: np.ndarray, T: np.ndarray):
    """Barycentric embedding: returns (tet_id (nr,), bary (nr, 4)).

    Containing tet when one exists; otherwise the tet minimizing the most
    negative barycentric coordinate (nearest in a barycentric sense)."""
    a = V[T[:, 0]]
    Dm = np.stack(
        [V[T[:, 1]] - a, V[T[:, 2]] - a, V[T[:, 3]] - a], axis=-1
    )  # (E, 3, 3)
    Dmi = np.linalg.inv(Dm)

    nr = len(Vr)
    tet_id = np.zeros(nr, np.int32)
    bary = np.zeros((nr, 4))
    # chunk to bound memory: (chunk, E, 3) intermediates
    chunk = max(1, int(2e7 // max(len(T), 1)))
    for s in range(0, nr, chunk):
        P = Vr[s : s + chunk]
        # bary123[p, e, :] = Dmi[e] @ (P[p] - a[e])
        rel = P[:, None, :] - a[None, :, :]
        b123 = np.einsum("eij,pej->pei", Dmi, rel)
        b0 = 1.0 - b123.sum(axis=-1)
        ball = np.concatenate([b0[..., None], b123], axis=-1)  # (p, E, 4)
        worst = ball.min(axis=-1)  # most negative coordinate
        best = worst.argmax(axis=-1)
        tet_id[s : s + chunk] = best
        bary[s : s + chunk] = ball[np.arange(len(P)), best]
    return tet_id, bary


def apply_skinning(x: np.ndarray, T: np.ndarray, tet_id, bary) -> np.ndarray:
    """Advect render vertices: (nv, 3) sim positions -> (nr, 3)."""
    corners = x[T[tet_id]]  # (nr, 4, 3)
    return np.einsum("rk,rkd->rd", bary, corners)
