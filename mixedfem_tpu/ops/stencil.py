"""Structured-grid stencil fast path for the condensed-system CG matvec.

When the tet mesh is a regular box grid (mesh/generators.box_tet_mesh: a
vertex lattice with each cell split into 5 tets, parity-mirrored for face
conformity), the sparse matvec needs NO gathers or scatters at all — the
TPU-native form of A x is a 27-point stencil:

  assemble  per-vertex-pair 3x3 blocks in OFFSET form: W[o, :, :, v] =
            A[v, v+o] for o in {-1,0,1}^3, built once per Newton iteration
            from the factored element blocks A_e = mass (x) I +
            sum_i Gw_i Gw_i^T by ~160 masked pad-and-sum windows (2 cell
            parities x 5 tet slots x 16 corner pairs). No scatter, no
            dynamic-update-slice: every term is a zero-pad of a contiguous
            cell-lattice window, summed functionally.
  layout    vertices live FLAT on a ghost-padded lattice (NI+2, NJ+2,
            NK+2) so every lattice offset is a constant flat shift; the
            vertex index is the MINOR axis of W (full 128-lane tiles; a
            trailing (3, 3) block layout would pad 9 elements to an (8,
            128) tile — ~100x memory blowup, measured 53 ms/assembly).
  matvec    y[a, v] = sum_{o, b} W[o, a, b, v] * x[b, v + shift_o]: 27
            shifted elementwise block products, fused by XLA; ~27 MB of
            HBM per matvec at 100k tets, zero irregular memory traffic.

This plays the role the reference's assembled CSR + Eigen CG plays
(src/utils/sparse_utils.cpp:120-171, linear_system.h:17-31) for its
benchmark meshes, at HBM-streaming speed. General (unstructured) meshes
use the fused windowed brick kernel (ops/brick.py) instead; the stencil
plan builder returns None when the mesh is not a conforming box grid.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

# offset id: oid = 9*(di+1) + 3*(dj+1) + (dk+1)
OFFSETS = [(di, dj, dk) for di in (-1, 0, 1) for dj in (-1, 0, 1)
           for dk in (-1, 0, 1)]


@flax.struct.dataclass
class StencilPlan:
    """Static plan for the box-grid stencil path.

    `terms` is a tuple of (parity, slot, a, b, (cai, caj, cak), oid)
    assembly descriptors; `masks` holds the two cell-parity indicator
    lattices. Element order MUST be cell-major, slot-minor (the builder
    returns the permutation that achieves it)."""

    masks: jnp.ndarray  # (2, NIc, NJc, NKc) 0/1
    NI: int = flax.struct.field(pytree_node=False)
    NJ: int = flax.struct.field(pytree_node=False)
    NK: int = flax.struct.field(pytree_node=False)
    nslots: int = flax.struct.field(pytree_node=False)
    terms: tuple = flax.struct.field(pytree_node=False)
    vec_terms: tuple = flax.struct.field(pytree_node=False)

    @property
    def nv(self) -> int:
        return self.NI * self.NJ * self.NK

    @property
    def npad(self) -> int:
        return (self.NI + 2) * (self.NJ + 2) * (self.NK + 2)


def build_stencil_plan(
    T: np.ndarray, nv: int, grid_dims: tuple[int, int, int] | None = None
) -> tuple[Optional[StencilPlan], Optional[np.ndarray]]:
    """Detect the box-grid structure of (T, nv) and build the plan.

    grid_dims = (NI, NJ, NK) vertex lattice dims with
    vid = (i*NJ + j)*NK + k (box_tet_mesh's layout). Returns
    (plan, element_permutation) — reorder T (and any per-element data)
    with the permutation BEFORE building the mesh — or (None, None) when
    the mesh is not a conforming grid of uniform element classes."""
    T = np.asarray(T)
    if grid_dims is None:
        return None, None
    NI, NJ, NK = grid_dims
    if NI * NJ * NK != nv or T.shape[1] != 4:
        return None, None
    E, k = T.shape

    i3 = np.stack([T // (NJ * NK), (T // NK) % NJ, T % NK], axis=-1)
    cell = i3.min(axis=1)                      # (E, 3) lattice cell
    ca = i3 - cell[:, None, :]                 # (E, 4, 3) corner offsets
    if ca.min() < 0 or ca.max() > 1:
        return None, None
    NIc, NJc, NKc = NI - 1, NJ - 1, NK - 1
    if E % (NIc * NJc * NKc) != 0:
        return None, None
    nslots = E // (NIc * NJc * NKc)
    cellid = (cell[:, 0] * NJc + cell[:, 1]) * NKc + cell[:, 2]
    perm = np.argsort(cellid, kind="stable")
    counts = np.bincount(cellid, minlength=NIc * NJc * NKc)
    if (counts != nslots).any():
        return None, None
    parity = (cell[:, 0] + cell[:, 1] + cell[:, 2]) % 2

    # class = (parity, slot); verify every element of a class shares the
    # corner-offset pattern
    slot = np.empty(E, np.int64)
    slot[perm] = np.arange(E) % nslots
    terms = []
    for p in (0, 1):
        for t in range(nslots):
            sel = np.flatnonzero((parity == p) & (slot == t))
            if len(sel) == 0:
                continue
            ca0 = ca[sel[0]]
            if not (ca[sel] == ca0).all():
                return None, None
            for a in range(k):
                for b in range(k):
                    d = ca0[b] - ca0[a]
                    oid = 9 * (d[0] + 1) + 3 * (d[1] + 1) + (d[2] + 1)
                    terms.append(
                        (p, t, a, b, tuple(int(c) for c in ca0[a]),
                         int(oid))
                    )
    # per-corner vector-scatter terms (rhs assembly): (p, t, a, ca)
    vec_terms = tuple(
        (p, t, a, caa) for (p, t, a, b, caa, _o) in terms if b == 0
    )

    pc = ((np.add.outer(np.add.outer(np.arange(NIc), np.arange(NJc)),
                        np.arange(NKc))) % 2)
    masks = np.stack([(pc == 0), (pc == 1)]).astype(np.float32)
    plan = StencilPlan(
        masks=jnp.asarray(masks),
        NI=NI, NJ=NJ, NK=NK, nslots=nslots,
        terms=tuple(terms), vec_terms=vec_terms,
    )
    return plan, perm


def assemble_W(
    plan: StencilPlan,
    Gw: jnp.ndarray,          # (E, N, k, d) factored stretch rows
    mass: jnp.ndarray,        # (E, k, k) consistent-mass coefficients
) -> jnp.ndarray:
    """Offset-form system blocks W (27, d, d, npad) on the ghost-padded
    flat vertex lattice — one masked pad-and-sum window per
    (parity, slot, corner-pair); no scatter, no dynamic-update-slice.

    Layout discipline: ALL per-term products run feature-major with the
    cell index as the minor axis ((d, d, ncells) broadcasts of contiguous
    (ncells,) feature rows). The naive batched einsum over trailing
    (d, d) blocks lowered to convolution/broadcast fusions at ~9/512 lane
    utilization — measured ~30 ms per assembly at 100k tets; this form is
    ~1 ms of VPU work."""
    E, N, k, d = Gw.shape
    ns = plan.nslots
    ncells = E // ns
    # (ns, N*k*d, ncells): slot-major feature rows, cells minor
    GwS = jnp.transpose(
        Gw.reshape(ncells, ns, N * k * d), (1, 2, 0)
    )
    MS = jnp.transpose(mass.reshape(ncells, ns, k * k), (1, 2, 0))
    return _assemble_terms(plan, GwS, MS, N, k, d)


def assemble_W_from_rows(
    plan: StencilPlan,
    Gw_rows: jnp.ndarray,     # (N*k*d, E) feature-major factored rows
    mass_rows: jnp.ndarray,   # (k*k, E) consistent-mass rows
    N: int = 6, k: int = 4, d: int = 3,
) -> jnp.ndarray:
    """assemble_W on feature-major inputs (ops/rows.py pipeline): only a
    minor-axis (ncells, ns) transpose separates the row layout from the
    per-slot feature rows the term loop consumes — no element-major
    (E, N, k, d) tensor is ever materialized."""
    E = Gw_rows.shape[-1]
    ns = plan.nslots
    ncells = E // ns
    GwS = jnp.transpose(Gw_rows.reshape(N * k * d, ncells, ns), (2, 0, 1))
    MS = jnp.transpose(mass_rows.reshape(k * k, ncells, ns), (2, 0, 1))
    return _assemble_terms(plan, GwS, MS, N, k, d)


def _assemble_terms(plan, GwS, MS, N, k, d):
    ncells = GwS.shape[-1]
    mk = plan.masks.reshape(2, ncells).astype(GwS.dtype)
    eye = jnp.eye(d, dtype=GwS.dtype)[:, :, None]
    NIc, NJc, NKc = plan.NI - 1, plan.NJ - 1, plan.NK - 1

    planes = [None] * 27
    for (p, t, a, b, ca, oid) in plan.terms:
        acc = None
        for n in range(N):
            g1 = GwS[t, n * k * d + a * d : n * k * d + (a + 1) * d]
            g2 = GwS[t, n * k * d + b * d : n * k * d + (b + 1) * d]
            term = g1[:, None, :] * g2[None, :, :]   # (d, d, ncells)
            acc = term if acc is None else acc + term
        C = acc + MS[t, a * k + b][None, None, :] * eye
        C = C * mk[p]
        C = C.reshape(d, d, NIc, NJc, NKc)
        ci, cj, ck = ca
        Cp = jnp.pad(
            C,
            (
                (0, 0), (0, 0),
                (1 + ci, plan.NI + 1 - ci - NIc),
                (1 + cj, plan.NJ + 1 - cj - NJc),
                (1 + ck, plan.NK + 1 - ck - NKc),
            ),
        )
        planes[oid] = Cp if planes[oid] is None else planes[oid] + Cp
    zero = jnp.zeros(
        (d, d, plan.NI + 2, plan.NJ + 2, plan.NK + 2), GwS.dtype
    )
    W = jnp.stack([pl if pl is not None else zero for pl in planes])
    return W.reshape(27, d, d, plan.npad)


def gather_corners_lat(plan: StencilPlan, x_lat: jnp.ndarray) -> jnp.ndarray:
    """Per-element-corner values from a ghost-padded lattice vector:
    (m, npad) -> (k*m, E) feature-major rows, row index m*a + comp.

    The grid-mesh inverse of scatter_vec: each (slot, corner) value is a
    contiguous lattice WINDOW SLICE (one per cell parity, blended by the
    parity masks) — no gather op anywhere. Replaces the XLA x[mesh.T]
    gather (measured 5.4 ms @ 100k tets) on the stencil path."""
    m = x_lat.shape[0]
    ns = plan.nslots
    NIc, NJc, NKc = plan.NI - 1, plan.NJ - 1, plan.NK - 1
    ncells = NIc * NJc * NKc
    x4 = x_lat.reshape(m, plan.NI + 2, plan.NJ + 2, plan.NK + 2)
    mk = plan.masks.reshape(2, ncells).astype(x_lat.dtype)

    # corner offsets per (parity, slot, corner) from the vec_terms
    ca_of = {}
    for (p, t, a, ca) in plan.vec_terms:
        ca_of[(p, t, a)] = ca
    k = 1 + max(a for (_p, _t, a, _ca) in plan.vec_terms)

    def window(ca):
        ci, cj, ck = ca
        sl = x4[:, 1 + ci : 1 + ci + NIc, 1 + cj : 1 + cj + NJc,
                1 + ck : 1 + ck + NKc]
        return sl.reshape(m, ncells)

    rows = []
    for a in range(k):
        per_t = []
        for t in range(ns):
            acc = None
            for p in (0, 1):
                ca = ca_of.get((p, t, a))
                if ca is None:
                    continue
                v = window(ca) * mk[p]
                acc = v if acc is None else acc + v
            per_t.append(acc)
        rows.append(jnp.stack(per_t, axis=-1))      # (m, ncells, ns)
    return jnp.stack(rows, axis=0).reshape(k * m, ncells * ns)


def scatter_rows_lat(plan: StencilPlan, rows: jnp.ndarray,
                     m: int) -> jnp.ndarray:
    """Feature-major scatter onto the GHOST-PADDED lattice: (k*m, E) rows
    (row index m*a + comp, scatter_vec's math) -> (m, npad) with zero
    ghosts. The lattice-resident dual of gather_corners_lat — output
    feeds the stencil CG directly, no (nv, m) round trip."""
    E = rows.shape[-1]
    ns = plan.nslots
    NI, NJ, NK = plan.NI, plan.NJ, plan.NK
    NIc, NJc, NKc = NI - 1, NJ - 1, NK - 1
    ncells = NIc * NJc * NKc
    RS = jnp.transpose(rows.reshape(-1, ncells, ns), (2, 0, 1))
    mk = plan.masks.reshape(2, ncells).astype(rows.dtype)
    out = None
    for (p, t, a, (ci, cj, ck)) in plan.vec_terms:
        C = RS[t, a * m : (a + 1) * m] * mk[p]      # (m, ncells)
        C = C.reshape(m, NIc, NJc, NKc)
        Cp = jnp.pad(
            C,
            (
                (0, 0),
                (1 + ci, NI + 1 - ci - NIc),
                (1 + cj, NJ + 1 - cj - NJc),
                (1 + ck, NK + 1 - ck - NKc),
            ),
        )
        out = Cp if out is None else out + Cp
    return out.reshape(m, plan.npad)


def scatter_vec(plan: StencilPlan, rows: jnp.ndarray) -> jnp.ndarray:
    """Per-element-corner vector contributions (E, k, m) -> vertex sums
    (nv, m) via ~40 masked pad-and-sum windows (replaces the segment_sum
    scatter for rhs/assembly on grid meshes). Feature-major layout: see
    assemble_W."""
    E, k, m = rows.shape
    ns = plan.nslots
    NI, NJ, NK = plan.NI, plan.NJ, plan.NK
    NIc, NJc, NKc = NI - 1, NJ - 1, NK - 1
    ncells = NIc * NJc * NKc
    RS = jnp.transpose(rows.reshape(ncells, ns, k * m), (1, 2, 0))
    mk = plan.masks.reshape(2, ncells).astype(rows.dtype)
    out = None
    for (p, t, a, (ci, cj, ck)) in plan.vec_terms:
        C = RS[t, a * m : (a + 1) * m] * mk[p]    # (m, ncells)
        C = C.reshape(m, NIc, NJc, NKc)
        Cp = jnp.pad(
            C,
            (
                (0, 0),
                (ci, NI - ci - NIc),
                (cj, NJ - cj - NJc),
                (ck, NK - ck - NKc),
            ),
        )
        out = Cp if out is None else out + Cp
    return jnp.transpose(out.reshape(m, plan.nv))


@functools.partial(jax.jit, static_argnames=("dims",))
def _stencil_matvec(W, x, dims):
    NI, NJ, NK, d = dims
    NIp, NJp, NKp = NI + 2, NJ + 2, NK + 2
    npad = NIp * NJp * NKp
    x3 = x.reshape(NI, NJ, NK, d)
    xp = jnp.pad(x3, ((1, 1), (1, 1), (1, 1), (0, 0)))
    xf = xp.reshape(npad, d).T                # (d, npad)
    S = NJp * NKp + NKp + 1                   # max |flat shift|
    xfe = jnp.pad(xf, ((0, 0), (S, S)))
    y = jnp.zeros((d, npad), x.dtype)
    for oid, (di, dj, dk) in enumerate(OFFSETS):
        sh = (di * NJp + dj) * NKp + dk
        xs = jax.lax.slice(xfe, (0, S + sh), (d, S + sh + npad))
        y = y + jnp.einsum("abn,bn->an", W[oid], xs)
    y3 = y.T.reshape(NIp, NJp, NKp, d)
    return y3[1:-1, 1:-1, 1:-1].reshape(NI * NJ * NK, d)


def stencil_matvec(plan: StencilPlan, W: jnp.ndarray, x: jnp.ndarray):
    """y = A x with A in offset form; caller masks pinned rows/cols."""
    return _stencil_matvec(W, x, (plan.NI, plan.NJ, plan.NK, x.shape[1]))


def diag_blocks(plan: StencilPlan, W: jnp.ndarray) -> jnp.ndarray:
    """(nv, d, d) diagonal blocks — the o=0 plane of W."""
    d = W.shape[1]
    NI, NJ, NK = plan.NI, plan.NJ, plan.NK
    D = jnp.moveaxis(W[13], -1, 0).reshape(NI + 2, NJ + 2, NK + 2, d, d)
    return D[1:-1, 1:-1, 1:-1].reshape(plan.nv, d, d)


# ---------------------------------------------------------------------------
# lattice-resident CG: vectors stay (d, npad) feature-major across the whole
# solve (one (nv, d) <-> lattice conversion per solve, not per matvec)
# ---------------------------------------------------------------------------

def to_lat(plan: StencilPlan, x: jnp.ndarray) -> jnp.ndarray:
    """(nv, d) -> (d, npad) ghost-padded feature-major."""
    NI, NJ, NK = plan.NI, plan.NJ, plan.NK
    d = x.shape[1]
    x3 = x.reshape(NI, NJ, NK, d)
    xp = jnp.pad(x3, ((1, 1), (1, 1), (1, 1), (0, 0)))
    return xp.reshape(plan.npad, d).T


def from_lat(plan: StencilPlan, yl: jnp.ndarray) -> jnp.ndarray:
    """(d, npad) -> (nv, d)."""
    NI, NJ, NK = plan.NI, plan.NJ, plan.NK
    d = yl.shape[0]
    y3 = yl.T.reshape(NI + 2, NJ + 2, NK + 2, d)
    return y3[1:-1, 1:-1, 1:-1].reshape(plan.nv, d)


def matvec_lat(plan: StencilPlan, W, xl: jnp.ndarray) -> jnp.ndarray:
    """y = A x on (d, npad) lattice vectors. Ghost rows of W are zero, so
    ghost outputs stay zero; the caller masks pinned rows."""
    d, npad = xl.shape
    NIp, NJp, NKp = plan.NI + 2, plan.NJ + 2, plan.NK + 2
    S = NJp * NKp + NKp + 1
    xfe = jnp.pad(xl, ((0, 0), (S, S)))
    y = jnp.zeros_like(xl)
    for oid, (di, dj, dk) in enumerate(OFFSETS):
        sh = (di * NJp + dj) * NKp + dk
        xs = jax.lax.slice(xfe, (0, S + sh), (d, S + sh + npad))
        y = y + jnp.einsum("abn,bn->an", W[oid], xs)
    return y


def lattice_two_level_preconditioner(plan: StencilPlan, cs, free_mask,
                                     binv, dim: int):
    """Two-level (or plain block-Jacobi when cs is None) preconditioner on
    (d, npad) lattice vectors: block-Jacobi as an elementwise block
    product in the matvec's own layout; the rigid-mode restriction/
    prolongation as lattice reshape-sums (cs must be a grid-aligned
    CoarseSpace from solvers/coarse.build_coarse_space_grid)."""
    nv = free_mask.shape[0]
    d = dim
    # (d, d, npad) block-Jacobi inverse (zeros at ghosts and pins)
    Binv_l = to_lat(plan, binv.reshape(nv, d * d)).reshape(d, d, -1)
    fm_l = to_lat(
        plan,
        jnp.broadcast_to(free_mask[:, None], (nv, d)).astype(binv.dtype),
    )

    if cs is not None:
        from mixedfem_tpu.solvers.coarse import _vert_modes

        assert cs.grid is not None, "lattice precond needs a grid coarse space"
        (NI, NJ, NK), (bi, bj_, bk) = cs.grid
        nbi, nbj, nbk = -(-NI // bi), -(-NJ // bj_), -(-NK // bk)
        B = _vert_modes(cs, free_mask, d)      # (nv, d, 6)
        B_l = to_lat(plan, B.reshape(nv, d * 6)).reshape(d, 6, -1)
        pad = (
            (0, 0), (0, nbi * bi - NI), (0, nbj * bj_ - NJ),
            (0, nbk * bk - NK),
        )

        def apply(rl, Ac_inv):
            z = jnp.einsum("abn,bn->an", Binv_l, rl)
            w = jnp.einsum("dan,dn->an", B_l, rl)   # (6, npad)
            w3 = from_lat(plan, w).T.reshape(6, NI, NJ, NK)
            rc = (
                jnp.pad(w3, pad)
                .reshape(6, nbi, bi, nbj, bj_, nbk, bk)
                .sum(axis=(2, 4, 6))
                .reshape(6, cs.naggr)
            )
            zc = (Ac_inv @ rc.T.reshape(-1)).reshape(cs.naggr, 6)
            z6 = jnp.broadcast_to(
                zc.T.reshape(6, nbi, 1, nbj, 1, nbk, 1),
                (6, nbi, bi, nbj, bj_, nbk, bk),
            ).reshape(6, nbi * bi, nbj * bj_, nbk * bk)
            zv = z6[:, :NI, :NJ, :NK].reshape(6, nv)
            zv_l = to_lat(plan, zv.T)
            return (
                z + jnp.einsum("dan,an->dn", B_l, zv_l)
            ) * fm_l

        return apply

    def apply_bj(rl, Ac_inv=None):
        return jnp.einsum("abn,bn->an", Binv_l, rl)

    return apply_bj
