"""Vertex-partitioned halo-exchange matvec (shard_map + ppermute).

The GSPMD path (parallel/sharding.py) shards the element axis and
replicates vertex arrays — fine up to ~8 chips, but vertex state then
scales with the whole mesh per chip. This module is the next level: both
axes partitioned, with explicit neighbor halo exchange over ICI.

Layout (host-built, static):
- vertices in banded order, split into D contiguous blocks of nb rows;
- elements assigned to the shard owning their minimum vertex;
- banded meshes have bandwidth << nb, so every element's vertices lie in
  [block_start - Bd, block_start + nb + Bd) for a halo depth Bd: the halo
  is exactly the tail of the left neighbor and the head of the right
  neighbor, exchanged with two ppermutes per application.

The fused condensed matvec then runs fully local per shard:
  halo-exchange x -> gather -> element einsums -> local scatter ->
  reverse halo-exchange of boundary contributions -> add.

This is the FEM analog of sequence-parallel halo exchange (SURVEY §5);
validated against the single-device operator on the 8-device CPU mesh
(tests/test_sharding.py::TestHaloMatvec).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mixedfem_tpu.mesh.mesh import MeshData


class HaloPlan(NamedTuple):
    """Static partition data (all arrays stacked per shard on axis 0)."""

    T_local: jnp.ndarray      # (D, Ep, k) indices into [halo_L | own | halo_R]
    emask: jnp.ndarray        # (D, Ep) 1.0 for real elements
    eidx: jnp.ndarray         # (D, Ep) global element id (0 for padding)
    nb: int                   # vertices per shard (padded)
    Bd: int                   # halo depth (rows exchanged with each neighbor)
    nv_pad: int               # D * nb
    D: int


def build_halo_plan(mesh: MeshData, n_shards: int) -> HaloPlan:
    """Partition a (banded-ordered) mesh for n_shards. Fails loudly if the
    element span exceeds the halo capacity (mesh must be banded/reordered)."""
    T = np.asarray(mesh.T)
    nv = mesh.nv
    E, k = T.shape
    nb = -(-nv // n_shards)
    nv_pad = nb * n_shards

    owner = T.min(axis=1) // nb
    # halo depth: max distance of any element vertex from its own block
    starts = owner * nb
    lo = (T - starts[:, None]).min()
    hi = (T - starts[:, None]).max()
    Bd = int(max(-lo, hi - nb + 1, 0))
    Bd = -(-Bd // 8) * 8  # pad to sublane multiple
    if Bd > nb:
        raise ValueError(
            f"halo depth {Bd} exceeds block size {nb}: reorder the mesh "
            "(bandwidth too large for this shard count)"
        )

    Ep = -(-int(np.bincount(owner, minlength=n_shards).max()) // 8) * 8
    T_local = np.zeros((n_shards, Ep, k), np.int32)
    emask = np.zeros((n_shards, Ep), np.float64)
    eidx = np.zeros((n_shards, Ep), np.int32)
    for d in range(n_shards):
        ids = np.nonzero(owner == d)[0]
        # local frame: [halo_L (Bd) | own (nb) | halo_R (Bd)]
        T_local[d, : len(ids)] = T[ids] - d * nb + Bd
        emask[d, : len(ids)] = 1.0
        eidx[d, : len(ids)] = ids
    assert T_local.min() >= 0 and T_local.max() < nb + 2 * Bd
    return HaloPlan(
        T_local=jnp.asarray(T_local),
        emask=jnp.asarray(emask),
        eidx=jnp.asarray(eidx),
        nb=nb,
        Bd=Bd,
        nv_pad=nv_pad,
        D=n_shards,
    )


def halo_matvec(mesh: MeshData, plan: HaloPlan, coeffs, jmesh: Mesh, p):
    """P (M + sum vol G^T H G) P^T p with vertex-partitioned storage.

    p: (nv_pad, d) sharded over rows (PartitionSpec('e')). coeffs: the
    StretchCoeffs Gw gathered per shard via plan.eidx (done here; in a
    production loop Gw would be built shard-local)."""
    dim = mesh.dim
    nb, Bd, D = plan.nb, plan.Bd, plan.D

    # per-shard element data (replicated inputs -> shard-local gathers)
    Gw_sh = coeffs.Gw[plan.eidx] * plan.emask[..., None, None, None]
    Mc_sh = mesh.mass_coeff[plan.eidx] * plan.emask[..., None, None]
    fm_pad = jnp.pad(mesh.free_mask, (0, plan.nv_pad - mesh.nv)).reshape(
        D, nb
    )

    right = [(i, (i + 1) % D) for i in range(D)]
    left = [(i, (i - 1) % D) for i in range(D)]

    def body(p_blk, Gw_blk, Mc_blk, Tl_blk, fm_blk):
        # shard_map gives blocks with a leading singleton shard axis
        p_loc = p_blk[0] * fm_blk[0][:, None]          # (nb, d)
        Gw = Gw_blk[0]
        Mc = Mc_blk[0]
        Tl = Tl_blk[0]

        # --- halo exchange of x: receive left neighbor's tail and right
        # neighbor's head (two ppermutes over ICI)
        tail = p_loc[nb - Bd :]
        head = p_loc[:Bd]
        halo_L = jax.lax.ppermute(tail, "e", right)   # from left neighbor
        halo_R = jax.lax.ppermute(head, "e", left)    # from right neighbor
        xbuf = jnp.concatenate([halo_L, p_loc, halo_R], axis=0)

        # --- local element compute
        pe = xbuf[Tl]                                  # (Ep, k, d)
        out_e = jnp.einsum("ekl,eld->ekd", Mc, pe)
        q = jnp.einsum("eikr,ekr->ei", Gw, pe)
        out_e = out_e + jnp.einsum("eikr,ei->ekr", Gw, q)
        obuf = jax.ops.segment_sum(
            out_e.reshape(-1, dim),
            Tl.reshape(-1),
            num_segments=nb + 2 * Bd,
        )

        # --- reverse halo exchange of boundary contributions
        back_L = jax.lax.ppermute(obuf[:Bd], "e", left)          # to left
        back_R = jax.lax.ppermute(obuf[nb + Bd :], "e", right)   # to right
        out = obuf[Bd : nb + Bd]
        out = out.at[nb - Bd :].add(back_L)
        out = out.at[:Bd].add(back_R)
        return (out * fm_blk[0][:, None])[None]

    f = shard_map(
        body,
        mesh=jmesh,
        in_specs=(P("e"), P("e"), P("e"), P("e"), P("e")),
        out_specs=P("e"),
    )
    return f(
        p.reshape(D, nb, dim),
        Gw_sh,
        Mc_sh,
        plan.T_local,
        fm_pad,
    ).reshape(plan.nv_pad, dim)
