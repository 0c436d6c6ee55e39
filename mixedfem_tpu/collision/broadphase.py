"""Host-side broadphase: candidate contact frames within a distance margin.

Replaces ipc-toolkit's construct_collision_candidates (used at
src/variables/mixed_collision.cpp:116-118 with margin 1.1*dhat). A uniform
grid hash over surface primitives produces padded, static-shaped candidate
arrays for the jitted step:

  frames:  (C, 4) int32 vertex ids (full-mesh indexing, -1 padded)
  types:   (C,)   int32 (distances.PT / EE / PE / PP)

(d, lambda) persistence across constraint-set changes — the reference's
hash-set warm start, src/utils/mixed_ipc.cpp:255-268 — is handled
differently here: the candidate set is FIXED within a step (slots carry
their own d/lambda through the Newton iterations in-jit) and is cleared at
step end exactly like MixedCollision::post_solve (mixed_collision.cpp:
397-403). If the step's motion exceeds the margin the candidates were
built with, io/scene.py re-runs the whole step from its saved pre-step
state with a wider margin (see Simulation.step), so no remapping between
old and new slots is ever needed.

3D: point-triangle (surface vertex x face, excluding incident) and
edge-edge (surface edge pairs, excluding sharing a vertex).
2D: point-edge (boundary vertex x boundary edge, excluding incident).

Candidates whose current distance exceeds `margin` are dropped; the array
is padded to a fixed capacity (power-of-two bucketing upstream avoids
recompiles).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from mixedfem_tpu.collision.distances import EE, PE, PP, PT


def _grid_pairs(P0: np.ndarray, P1: np.ndarray, cell: float):
    """All (i, j) pairs with |bbox dist| possibly < cell between point sets
    P0 (n0, d) and P1 (n1, d) via integer cell binning (26-neighborhood).

    Uses the native C++ grid hash when available (csrc/native.cpp),
    numpy/dict fallback otherwise."""
    from mixedfem_tpu.utils import native

    res = native.grid_pairs(P0, P1, cell)
    if res is not None:
        return res
    d = P0.shape[1]
    c0 = np.floor(P0 / cell).astype(np.int64)
    c1 = np.floor(P1 / cell).astype(np.int64)
    # hash cells of P1 into dict -> indices
    buckets: Dict[Tuple, np.ndarray] = {}
    for j, key in enumerate(map(tuple, c1)):
        buckets.setdefault(key, []).append(j)
    offs = (
        np.stack(
            np.meshgrid(*([np.arange(-1, 2)] * d), indexing="ij"), axis=-1
        ).reshape(-1, d)
    )
    out_i, out_j = [], []
    for i, base in enumerate(c0):
        for off in offs:
            b = buckets.get(tuple(base + off))
            if b:
                out_i.extend([i] * len(b))
                out_j.extend(b)
    if not out_i:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.asarray(out_i), np.asarray(out_j)


def _seg_midpoints(V, E):
    return 0.5 * (V[E[:, 0]] + V[E[:, 1]])


def _seg_radius(V, E):
    return 0.5 * np.linalg.norm(V[E[:, 0]] - V[E[:, 1]], axis=1)


def _tri_centroid(V, F):
    return (V[F[:, 0]] + V[F[:, 1]] + V[F[:, 2]]) / 3.0


def _tri_radius(V, F):
    c = _tri_centroid(V, F)
    return np.max(
        [np.linalg.norm(V[F[:, k]] - c, axis=1) for k in range(3)], axis=0
    )


def candidates_3d(
    V: np.ndarray,
    F_srf: np.ndarray,
    E_srf: np.ndarray,
    surf_verts: np.ndarray,
    margin: float,
):
    """3D candidate frames: (frames (C,4) int32, types (C,) int32)."""
    frames, types = [], []

    # point-triangle
    Pv = V[surf_verts]
    tr = _tri_radius(V, F_srf)
    cell = max(margin + tr.max(), 1e-8)
    ii, jj = _grid_pairs(Pv, _tri_centroid(V, F_srf), cell)
    if len(ii):
        vid = surf_verts[ii]
        f = F_srf[jj]
        # exclude incident
        ok = (f != vid[:, None]).all(axis=1)
        # prune by true point-centroid distance bound
        dist_ub = (
            np.linalg.norm(Pv[ii] - _tri_centroid(V, F_srf)[jj], axis=1)
            - tr[jj]
        )
        ok &= dist_ub < margin
        vid, f = vid[ok], f[ok]
        if len(vid):
            frames.append(
                np.concatenate([vid[:, None], f], axis=1).astype(np.int32)
            )
            types.append(np.full(len(vid), PT, np.int32))

    # edge-edge
    em = _seg_midpoints(V, E_srf)
    er = _seg_radius(V, E_srf)
    cell = max(margin + 2 * er.max(), 1e-8)
    ii, jj = _grid_pairs(em, em, cell)
    if len(ii):
        keep = ii < jj  # unordered pairs once
        ii, jj = ii[keep], jj[keep]
        e0 = E_srf[ii]
        e1 = E_srf[jj]
        shared = (
            (e0[:, 0:1] == e1).any(axis=1) | (e0[:, 1:2] == e1).any(axis=1)
        )
        dist_ub = (
            np.linalg.norm(em[ii] - em[jj], axis=1) - er[ii] - er[jj]
        )
        ok = (~shared) & (dist_ub < margin)
        e0, e1 = e0[ok], e1[ok]
        if len(e0):
            frames.append(np.concatenate([e0, e1], axis=1).astype(np.int32))
            types.append(np.full(len(e0), EE, np.int32))

    if frames:
        return np.concatenate(frames), np.concatenate(types)
    return np.zeros((0, 4), np.int32), np.zeros(0, np.int32)


def candidates_2d(V: np.ndarray, E_srf: np.ndarray, surf_verts: np.ndarray, margin: float):
    """2D candidate frames: point-edge (v, e0, e1, -1)."""
    Pv = V[surf_verts]
    em = _seg_midpoints(V, E_srf)
    er = _seg_radius(V, E_srf)
    cell = max(margin + er.max(), 1e-8)
    ii, jj = _grid_pairs(Pv, em, cell)
    if not len(ii):
        return np.zeros((0, 4), np.int32), np.zeros(0, np.int32)
    vid = surf_verts[ii]
    e = E_srf[jj]
    ok = (e != vid[:, None]).all(axis=1)
    dist_ub = np.linalg.norm(Pv[ii] - em[jj], axis=1) - er[jj]
    ok &= dist_ub < margin
    vid, e = vid[ok], e[ok]
    frames = np.concatenate(
        [vid[:, None], e, -np.ones((len(vid), 1), np.int64)], axis=1
    ).astype(np.int32)
    return frames, np.full(len(vid), PE, np.int32)


def pad_candidates(frames, types, capacity: int):
    """Pad to `capacity` with inert frames (ids 0, type PP, mask 0)."""
    C = len(frames)
    if C > capacity:
        raise ValueError(
            f"contact candidate overflow: {C} > capacity {capacity}"
        )
    out_f = np.zeros((capacity, 4), np.int32)
    out_t = np.full(capacity, PP, np.int32)
    mask = np.zeros(capacity, np.float64)
    out_f[:C] = np.where(frames[:C] < 0, 0, frames[:C])
    out_t[:C] = types
    mask[:C] = 1.0
    return out_f, out_t, mask
