"""Fused condensed-system operator: one gather + one scatter per matvec.

The CG matvec is the hot kernel of the implicit step (SURVEY §3.2: sparse
solve is hot path #2). The mass, mixed-stretch and vanilla-stretch blocks
all act on the same element index set T, so their products share a single
vertex gather and a single scatter-add — on TPU the scatter is the dominant
cost (~3 ms per 400k rows at 100k tets), so fusing halves the matvec time
vs. per-variable products (the reference instead sums assembled CSR
matrices, linear_system.h:17-31).
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.variables.mixed_stretch import StretchCoeffs
from mixedfem_tpu.variables.stretch import VanillaCoeffs


def element_matvec(
    mesh: meshmod.MeshData,
    p: jnp.ndarray,
    ms_coeffs: Optional[StretchCoeffs] = None,
    v_coeffs: Optional[VanillaCoeffs] = None,
) -> jnp.ndarray:
    """(P M P^T + P K P^T) p with all element blocks fused."""
    p = meshmod.project_free(mesh, p)
    pe = p[mesh.T]                                       # (E, k, d) gather

    out_e = jnp.einsum("ekl,eld->ekd", mesh.mass_coeff, pe)

    if ms_coeffs is not None:
        # factored form A_e = Gw^T Gw (Gw = sqrt(vol) H^{1/2} G): one fewer
        # contraction and 25% less HBM traffic per CG iteration
        q = jnp.einsum("eikr,ekr->ei", ms_coeffs.Gw, pe)
        out_e = out_e + jnp.einsum("eikr,ei->ekr", ms_coeffs.Gw, q)

    if v_coeffs is not None:
        d = mesh.dim
        dF = jnp.einsum("ekr,ekc->erc", pe, mesh.dphidX)
        y = jnp.einsum(
            "eab,eb->ea", v_coeffs.H, dF.reshape(dF.shape[0], d * d)
        ).reshape(dF.shape)
        out_e = out_e + jnp.einsum("ekc,erc->ekr", mesh.dphidX, y)

    out = jax.ops.segment_sum(
        out_e.reshape(-1, mesh.dim), mesh.T.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)


# ---------------------------------------------------------------------------
# Planned matvec: destination-sorted emission + Pallas windowed scatter.
#
# XLA's general scatter sustains ~7.5 ns/row on v5lite regardless of input
# order — ~3 ms of the ~5 ms CG iteration at 100k tets. The assembly scatter
# has STATIC structure (mesh topology), so contributions can be produced
# directly in destination-sorted order (per-row gathers of q and p — gathers
# are fast — against a pre-permuted static index/mass layout and a
# once-per-Newton-iteration permuted Gw), then reduced by the sequential
# windowed kernel in ops/pallas_scatter.py with zero runtime permutation.
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class MatvecPlan:
    """Static destination-sorted assembly plan for one mesh topology."""

    lidx: jnp.ndarray       # (Rp,) int32 window-local destination index
    win_start: jnp.ndarray  # (nchunks,) int32 window start vertex
    qidx: jnp.ndarray       # (Rp,) int32 element of each sorted slot
    row_perm: jnp.ndarray   # (Rp,) int32 clamped row (e*k+corner) per slot
    Tp: jnp.ndarray         # (Rp, k) int32 element vertex ids per slot
    Mp: jnp.ndarray         # (Rp, k) mass row (zeroed on padded slots)
    valid: jnp.ndarray      # (Rp,) 1.0 for real slots
    nrows: int = flax.struct.field(pytree_node=False)
    chunk: int = flax.struct.field(pytree_node=False)
    W: int = flax.struct.field(pytree_node=False)
    nv: int = flax.struct.field(pytree_node=False)


def build_matvec_plan(mesh: meshmod.MeshData, chunk: int = 2048) -> MatvecPlan:
    """Host-side: sort assembly rows by destination vertex, precompute the
    per-slot element/corner indexing and window layout."""
    from mixedfem_tpu.ops import pallas_scatter as psc

    T = np.asarray(mesh.T)
    E, k = T.shape
    R = E * k
    base = psc.build_scatter_plan(T.reshape(-1), mesh.nv, chunk=chunk)
    perm = np.asarray(base.perm)            # (Rp,) padded slots point at R
    valid = (perm < R).astype(np.asarray(mesh.vols).dtype)
    rowc = np.minimum(perm, R - 1)
    e_of = rowc // k
    c_of = rowc % k
    Mp = np.asarray(mesh.mass_coeff)[e_of, c_of, :] * valid[:, None]
    return MatvecPlan(
        lidx=base.lidx,
        win_start=base.win_start,
        qidx=jnp.asarray(e_of.astype(np.int32)),
        row_perm=jnp.asarray(rowc.astype(np.int32)),
        Tp=jnp.asarray(T[e_of].astype(np.int32)),
        Mp=jnp.asarray(Mp),
        valid=jnp.asarray(valid),
        nrows=R,
        chunk=base.chunk,
        W=base.W,
        nv=base.nv,
    )


def permute_gw(plan: MatvecPlan, Gw: jnp.ndarray) -> jnp.ndarray:
    """Gw (E, N, k, d) -> destination-sorted per-row (Rp, N, d). One gather
    per Newton iteration, amortized over all CG matvecs."""
    E, N, k, d = Gw.shape
    rows = jnp.swapaxes(Gw, 1, 2).reshape(E * k, N, d)
    return rows[plan.row_perm]


def planned_matvec(
    mesh: meshmod.MeshData,
    plan: MatvecPlan,
    Gwp: jnp.ndarray,
    Gw: jnp.ndarray,
    p: jnp.ndarray,
) -> jnp.ndarray:
    """(P M P^T + P A_stretch P^T) p with destination-sorted emission.

    Gwp = permute_gw(plan, Gw). q is computed in element order (one gather
    of p), then contributions are emitted per sorted row and reduced by the
    windowed Pallas kernel."""
    from mixedfem_tpu.ops import pallas_scatter as psc

    E, N, k, d = Gw.shape
    p = meshmod.project_free(mesh, p)
    pe = p[mesh.T]                                     # (E, k, d)
    # q = einsum('eikr,ekr->ei') unrolled (lane-major small contraction)
    q = jnp.stack(
        [
            sum(
                Gw[:, i, kk, r] * pe[:, kk, r]
                for kk in range(k)
                for r in range(d)
            )
            for i in range(N)
        ],
        axis=-1,
    )                                                  # (E, N)

    qs = q[plan.qidx]                                  # (Rp, N)
    pes = p[plan.Tp]                                   # (Rp, k, d)
    cols = []
    for r in range(d):
        acc = Gwp[:, 0, r] * qs[:, 0]
        for i in range(1, N):
            acc = acc + Gwp[:, i, r] * qs[:, i]
        for l in range(k):
            acc = acc + plan.Mp[:, l] * pes[:, l, r]
        cols.append(acc * plan.valid)
    contrib = jnp.stack(cols, axis=-1)                 # (Rp, d)
    out = psc.scatter_add_sorted(plan, contrib)
    return meshmod.project_free(mesh, out)


# ---------------------------------------------------------------------------
# Gather-only matvec: scatter->gather transposition via static adjacency.
#
# Element->vertex assembly is the transpose of a gather, so with a static
# per-vertex adjacency list (vertex -> incident (element, corner) rows,
# padded to the max degree) the reduction becomes a gather + dense sum.
#
# MEASURED @100k tets on v5lite (see docs/GAPS.md): the random-row
# permutation cost is symmetric — XLA scatter-add 3.8 ms (9.5 ns/row),
# this gather form 7.0 ms/matvec vs 6.0 ms fused-scatter, Pallas windowed
# scatter 39 ms (sequential window RMW + cross-sublane one-hot reduce).
# The fused element_matvec therefore REMAINS THE DEFAULT; this path and
# the planned/Pallas path above are kept as validated alternatives (both
# parity-tested) and as building blocks for a future whole-CG VMEM-resident
# kernel, which is the only structural way past the row-rate wall.
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class GatherPlan:
    """Static vertex<-element adjacency: adj[v, j] indexes the flattened
    (E*k,) contribution rows; slot R points at an appended zero row."""

    adj: jnp.ndarray  # (nv, Dmax) int32


def build_gather_plan(mesh: meshmod.MeshData) -> GatherPlan:
    T = np.asarray(mesh.T)
    E, k = T.shape
    R = E * k
    seg = T.reshape(-1)
    order = np.argsort(seg, kind="stable")
    sorted_seg = seg[order]
    counts = np.bincount(seg, minlength=mesh.nv)
    Dmax = int(counts.max())
    adj = np.full((mesh.nv, Dmax), R, np.int64)
    # position of each sorted row within its vertex's run
    starts = np.zeros(mesh.nv + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(R) - starts[sorted_seg]
    adj[sorted_seg, pos] = order
    return GatherPlan(adj=jnp.asarray(adj.astype(np.int32)))


def gather_matvec(
    mesh: meshmod.MeshData,
    plan: GatherPlan,
    p: jnp.ndarray,
    ms_coeffs: Optional[StretchCoeffs] = None,
    v_coeffs: Optional[VanillaCoeffs] = None,
) -> jnp.ndarray:
    """element_matvec with the final scatter replaced by the adjacency
    gather + sum. Bit-identical semantics (summation order differs)."""
    E, k = mesh.T.shape
    d = mesh.dim
    p = meshmod.project_free(mesh, p)
    pe = p[mesh.T]                                       # (E, k, d)

    out_e = jnp.einsum("ekl,eld->ekd", mesh.mass_coeff, pe)
    if ms_coeffs is not None:
        Gw = ms_coeffs.Gw
        N = Gw.shape[1]
        q = jnp.stack(
            [
                sum(
                    Gw[:, i, kk, r] * pe[:, kk, r]
                    for kk in range(k)
                    for r in range(d)
                )
                for i in range(N)
            ],
            axis=-1,
        )                                                # (E, N)
        cols = []
        for kk in range(k):
            for r in range(d):
                acc = Gw[:, 0, kk, r] * q[:, 0]
                for i in range(1, N):
                    acc = acc + Gw[:, i, kk, r] * q[:, i]
                cols.append(acc)
        out_e = out_e + jnp.stack(cols, axis=-1).reshape(E, k, d)
    if v_coeffs is not None:
        dF = jnp.einsum("ekr,ekc->erc", pe, mesh.dphidX)
        y = jnp.einsum(
            "eab,eb->ea", v_coeffs.H, dF.reshape(dF.shape[0], d * d)
        ).reshape(dF.shape)
        out_e = out_e + jnp.einsum("ekc,erc->ekr", mesh.dphidX, y)

    rows = jnp.concatenate(
        [out_e.reshape(E * k, d), jnp.zeros((1, d), out_e.dtype)], axis=0
    )
    out = jnp.sum(rows[plan.adj], axis=1)                # (nv, Dmax, d) -> sum
    return meshmod.project_free(mesh, out)


# ---------------------------------------------------------------------------
# Banded matvec: element-order windowed scatter (zero runtime permutation).
#
# With ELEMENTS sorted by min vertex (a free static reorder at mesh build,
# see sort_elements_banded), the contribution rows emitted in natural
# element order already target per-chunk vertex windows of ~bandwidth
# width. The MXU one-hot windowed kernel then replaces XLA's scatter with
# no gathers or permutations added anywhere.
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class BandedPlan:
    lidx: jnp.ndarray
    win_start: jnp.ndarray
    nrows: int = flax.struct.field(pytree_node=False)
    chunk: int = flax.struct.field(pytree_node=False)
    W: int = flax.struct.field(pytree_node=False)
    nv: int = flax.struct.field(pytree_node=False)


def sort_elements_banded(T: np.ndarray):
    """Element permutation sorting by min vertex id (apply to ALL
    per-element arrays before build_mesh_data for banded assembly)."""
    T = np.asarray(T)
    return np.argsort(T.min(axis=1), kind="stable")


def build_banded_plan(mesh: meshmod.MeshData, chunk: int = 2048) -> BandedPlan:
    from mixedfem_tpu.ops import pallas_scatter as psc

    T = np.asarray(mesh.T)
    base = psc.build_banded_scatter_plan(T.reshape(-1), mesh.nv, chunk=chunk)
    return BandedPlan(
        lidx=base.lidx,
        win_start=base.win_start,
        nrows=base.nrows,
        chunk=base.chunk,
        W=base.W,
        nv=base.nv,
    )


def banded_matvec(
    mesh: meshmod.MeshData,
    plan: BandedPlan,
    p: jnp.ndarray,
    ms_coeffs: Optional[StretchCoeffs] = None,
    v_coeffs: Optional[VanillaCoeffs] = None,
) -> jnp.ndarray:
    """element_matvec with the scatter replaced by the element-order
    windowed kernel (requires banded element ordering)."""
    from mixedfem_tpu.ops import pallas_scatter as psc

    E, k = mesh.T.shape
    d = mesh.dim
    p = meshmod.project_free(mesh, p)
    pe = p[mesh.T]

    out_e = jnp.einsum("ekl,eld->ekd", mesh.mass_coeff, pe)
    if ms_coeffs is not None:
        Gw = ms_coeffs.Gw
        N = Gw.shape[1]
        q = jnp.stack(
            [
                sum(
                    Gw[:, i, kk, r] * pe[:, kk, r]
                    for kk in range(k)
                    for r in range(d)
                )
                for i in range(N)
            ],
            axis=-1,
        )
        cols = []
        for kk in range(k):
            for r in range(d):
                acc = Gw[:, 0, kk, r] * q[:, 0]
                for i in range(1, N):
                    acc = acc + Gw[:, i, kk, r] * q[:, i]
                cols.append(acc)
        out_e = out_e + jnp.stack(cols, axis=-1).reshape(E, k, d)
    if v_coeffs is not None:
        dF = jnp.einsum("ekr,ekc->erc", pe, mesh.dphidX)
        y = jnp.einsum(
            "eab,eb->ea", v_coeffs.H, dF.reshape(dF.shape[0], d * d)
        ).reshape(dF.shape)
        out_e = out_e + jnp.einsum("ekc,erc->ekr", mesh.dphidX, y)

    rows = out_e.reshape(E * k, d)
    Rp = plan.lidx.shape[0]
    if Rp > E * k:
        rows = jnp.concatenate(
            [rows, jnp.zeros((Rp - E * k, d), rows.dtype)], axis=0
        )
    out = psc.scatter_add_sorted(plan, rows)
    return meshmod.project_free(mesh, out)
