"""Two-level preconditioner: block-Jacobi smoother + rigid-body coarse solve.

The reference relies on direct sparse factorization (CHOLMOD/LLT) or AMG
(amgcl on the dual system) for stiff systems; neither maps to TPU. Instead:
aggregate vertices into geometric clusters, span each aggregate with its 6
rigid-body modes (3 translations + 3 rotations about the aggregate centroid
— the near-null space of elasticity), assemble the coarse Galerkin matrix
A_c = P^T A P element-wise (segment-sum over a static aggregate-pair
bucketing), invert it densely on-device, and apply

  M^{-1} r = blockJacobi(r) + P A_c^{-1} P^T r   (additive two-level)

per CG iteration. The coarse basis is static (rest positions); A_c is
rebuilt from the current element coefficients each Newton iteration.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.variables.mixed_stretch import StretchCoeffs


@flax.struct.dataclass
class CoarseSpace:
    """Static aggregation data.

    `grid` (optional) marks lattice-block aggregation on a structured
    vertex lattice: ((NI, NJ, NK), (bi, bj, bk)) with aggregates =
    lattice blocks in row-major block order. When set, restrict/prolong
    run as reshape-sums instead of segment_sum (see
    grid_two_level_preconditioner) — ~3x cheaper per CG iteration."""

    agg_id: jnp.ndarray      # (nv,) int32 aggregate per vertex
    r: jnp.ndarray           # (nv, 3) X_v - centroid(agg) (masked at pins)
    pair_id: jnp.ndarray     # (E, k, k) int32 bucket of (agg_k, agg_l)
    pair_rows: jnp.ndarray   # (npairs,) int32 aggregate row of each bucket
    pair_cols: jnp.ndarray   # (npairs,) int32 aggregate col
    naggr: int = flax.struct.field(pytree_node=False)
    grid: tuple | None = flax.struct.field(pytree_node=False, default=None)

    @property
    def ncd(self) -> int:
        return 6 * self.naggr


def build_coarse_space(
    V: np.ndarray,
    T: np.ndarray,
    is_fixed: np.ndarray,
    target_size: int = 64,
    dtype=jnp.float32,
) -> CoarseSpace:
    """Geometric grid clustering of vertices into ~target_size aggregates."""
    V = np.asarray(V)
    nv, d = V.shape
    lo = V.min(axis=0)
    extent = np.maximum(V.max(axis=0) - lo, 1e-12)
    # cell edge so that a cell holds ~target_size vertices (assuming uniform)
    ncells = max(nv / target_size, 1)
    cell = (np.prod(extent) / ncells) ** (1.0 / d)
    keys = np.floor((V - lo) / cell).astype(np.int64)
    flat = keys[:, 0]
    for j in range(1, d):
        flat = flat * 100003 + keys[:, j]
    uniq, agg_id = np.unique(flat, return_inverse=True)
    naggr = len(uniq)

    cent = np.zeros((naggr, d))
    cnt = np.zeros(naggr)
    np.add.at(cent, agg_id, V)
    np.add.at(cnt, agg_id, 1.0)
    cent /= cnt[:, None]
    r = V - cent[agg_id]
    if d == 2:
        r = np.concatenate([r, np.zeros((nv, 1))], axis=1)
    r[np.asarray(is_fixed, bool)] = 0.0

    # aggregate-pair buckets per element corner pair (static topology)
    E, k = T.shape
    ak = agg_id[T]  # (E, k)
    prs = np.stack(
        [np.repeat(ak, k, axis=1), np.tile(ak, (1, k))], axis=-1
    ).reshape(-1, 2)
    flatp = prs[:, 0].astype(np.int64) * naggr + prs[:, 1]
    uniqp, pid = np.unique(flatp, return_inverse=True)
    return CoarseSpace(
        agg_id=jnp.asarray(agg_id, jnp.int32),
        r=jnp.asarray(r, dtype),
        pair_id=jnp.asarray(pid.reshape(E, k, k), jnp.int32),
        pair_rows=jnp.asarray((uniqp // naggr).astype(np.int32)),
        pair_cols=jnp.asarray((uniqp % naggr).astype(np.int32)),
        naggr=naggr,
    )


def build_coarse_space_grid(
    V: np.ndarray,
    T: np.ndarray,
    is_fixed: np.ndarray,
    grid_dims: tuple[int, int, int],
    block=None,
    target_size: int = 48,
    dtype=jnp.float32,
) -> CoarseSpace:
    """Lattice-block aggregation for structured box-grid meshes
    (ops/stencil.py): aggregate = (bi, bj, bk) vertex sub-lattice. Same
    CoarseSpace contract as build_coarse_space, plus the `grid` marker
    enabling reshape-sum restrict/prolong. `block=None` picks per-axis
    sizes so blocks are ~physically cubic with ~target_size vertices
    (elongated index blocks on anisotropic lattices measurably weaken
    the coarse space: 33 -> 47 CG iters on the 100k beam)."""
    V = np.asarray(V)
    nv, d = V.shape
    NI, NJ, NK = grid_dims
    assert NI * NJ * NK == nv
    if block is None:
        spacing = np.array(
            [
                (V[:, 0].max() - V[:, 0].min()) / max(NI - 1, 1),
                (V[:, 1].max() - V[:, 1].min()) / max(NJ - 1, 1),
                (V[:, 2].max() - V[:, 2].min()) / max(NK - 1, 1)
                if d > 2
                else 1.0,
            ]
        )
        spacing = np.maximum(spacing, 1e-12)
        edge = (np.prod(spacing) * target_size) ** (1.0 / 3.0)
        block = np.maximum(
            1, np.rint(edge / spacing).astype(int)
        )
    if np.isscalar(block):
        block = (int(block),) * 3
    bi, bj, bk = int(block[0]), int(block[1]), int(block[2])
    nbi, nbj, nbk = -(-NI // bi), -(-NJ // bj), -(-NK // bk)
    ii, jj, kk = np.meshgrid(
        np.arange(NI), np.arange(NJ), np.arange(NK), indexing="ij"
    )
    agg_id = ((ii // bi) * nbj + (jj // bj)) * nbk + (kk // bk)
    agg_id = agg_id.reshape(-1).astype(np.int64)
    naggr = nbi * nbj * nbk

    cent = np.zeros((naggr, d))
    cnt = np.zeros(naggr)
    np.add.at(cent, agg_id, V)
    np.add.at(cnt, agg_id, 1.0)
    cent /= np.maximum(cnt, 1.0)[:, None]
    r = V - cent[agg_id]
    if d == 2:
        r = np.concatenate([r, np.zeros((nv, 1))], axis=1)
    r[np.asarray(is_fixed, bool)] = 0.0

    T = np.asarray(T)
    E, k = T.shape
    ak = agg_id[T]
    prs = np.stack(
        [np.repeat(ak, k, axis=1), np.tile(ak, (1, k))], axis=-1
    ).reshape(-1, 2)
    flatp = prs[:, 0] * naggr + prs[:, 1]
    uniqp, pid = np.unique(flatp, return_inverse=True)
    return CoarseSpace(
        agg_id=jnp.asarray(agg_id, jnp.int32),
        r=jnp.asarray(r, dtype),
        pair_id=jnp.asarray(pid.reshape(E, k, k), jnp.int32),
        pair_rows=jnp.asarray((uniqp // naggr).astype(np.int32)),
        pair_cols=jnp.asarray((uniqp % naggr).astype(np.int32)),
        naggr=naggr,
        grid=((NI, NJ, NK), (bi, bj, bk)),
    )


def _vert_modes(cs: CoarseSpace, free_mask, dim):
    """(nv, d, 6) per-vertex rigid-mode matrix B_v = [I, -skew(r_v)],
    zeroed at pinned vertices."""
    nv = cs.r.shape[0]
    dt = cs.r.dtype
    r = cs.r
    eye = jnp.eye(3, dtype=dt)
    zero = jnp.zeros((nv,), dt)
    # -skew(r): rows are displacement components
    sk = jnp.stack(
        [
            jnp.stack([zero, r[:, 2], -r[:, 1]], axis=-1),
            jnp.stack([-r[:, 2], zero, r[:, 0]], axis=-1),
            jnp.stack([r[:, 1], -r[:, 0], zero], axis=-1),
        ],
        axis=-2,
    )  # (nv, 3, 3) = -skew(r)
    B = jnp.concatenate(
        [jnp.broadcast_to(eye, (nv, 3, 3)), sk], axis=-1
    )  # (nv, 3, 6)
    B = B[:, :dim, :] * free_mask[:, None, None]
    return B


def restrict(cs: CoarseSpace, free_mask, y: jnp.ndarray) -> jnp.ndarray:
    """P^T y: (nv, d) -> (naggr, 6)."""
    d = y.shape[1]
    B = _vert_modes(cs, free_mask, d)  # (nv, d, 6)
    contrib = jnp.einsum("nda,nd->na", B, y)
    return jax.ops.segment_sum(contrib, cs.agg_id, num_segments=cs.naggr)


def prolong(cs: CoarseSpace, free_mask, z: jnp.ndarray, dim) -> jnp.ndarray:
    """P z: (naggr, 6) -> (nv, d)."""
    B = _vert_modes(cs, free_mask, dim)
    zv = z[cs.agg_id]  # (nv, 6)
    return jnp.einsum("nda,na->nd", B, zv)


def coarse_matrix(
    mesh: meshmod.MeshData,
    cs: CoarseSpace,
    ms_coeffs: Optional[StretchCoeffs],
    contact=None,  # (frames (C,4) int32, Gx (C,4,d), H (C,), active (C,))
) -> jnp.ndarray:
    """Galerkin A_c = P^T (M + K [+ K_contact]) P, dense (6 naggr, 6 naggr).

    Contact barrier blocks enter the coarse space so stiff-contact (high
    kappa) systems keep low CG counts — the role the reference's dual-ascent
    preconditioner plays (preconditioners/dual_ascent_preconditioner.h:
    41-226). Frame->aggregate pairs are dynamic, so they scatter directly
    into the dense A_c (static shapes; indices change per step)."""
    d = mesh.dim
    k = mesh.nodes_per_elem
    dt = mesh.vols.dtype
    B = _vert_modes(cs, mesh.free_mask, d)     # (nv, d, 6)
    Be = B[mesh.T]                             # (E, k, d, 6)

    # Coarse element blocks without materializing the (E,k,k,d,d) Kkl
    # tensor: fold Be into G first (GB[e,i,k,a] = sum_r G[e,i,k,r] Be[e,k,r,a]),
    # then contract through H — ~4x less intermediate traffic.
    blocks = jnp.einsum(
        "ekl,ekra,elrb->eklab", mesh.mass_coeff, Be, Be
    )  # mass part (E,k,k,6,6)
    if ms_coeffs is not None:
        GB = jnp.einsum("eikr,ekra->eika", ms_coeffs.G, Be)  # (E, N, k, 6)
        Y = jnp.einsum("eij,eika->ejka", ms_coeffs.H, GB)
        blocks = blocks + jnp.einsum(
            "ejka,ejlb,e->eklab", Y, GB, mesh.vols
        )
    flat = blocks.reshape(-1, 36)
    npairs = cs.pair_rows.shape[0]
    pair_sums = jax.ops.segment_sum(
        flat, cs.pair_id.reshape(-1), num_segments=npairs
    ).reshape(npairs, 6, 6)

    ncd = cs.ncd
    Ac = jnp.zeros((cs.naggr, 6, cs.naggr, 6), dt)
    Ac = Ac.at[cs.pair_rows, :, cs.pair_cols, :].add(pair_sums)

    if contact is not None:
        frames, Gx, Hc, act = contact
        Bf = B[frames]                                    # (C, 4, d, 6)
        Y = jnp.einsum("ckr,ckra->cka", Gx, Bf)           # (C, 4, 6)
        blocks_c = jnp.einsum("cka,clb,c->cklab", Y, Y, Hc * act)
        rows = cs.agg_id[frames]                          # (C, 4)
        Ac = Ac.at[rows[:, :, None], :, rows[:, None, :], :].add(blocks_c)

    Ac = Ac.reshape(ncd, ncd)
    # Ridge for aggregates with all-pinned vertices / rank deficiency,
    # AND for f32 Galerkin-assembly roundoff: at ncd ~ 5-7k the assembled
    # Ac picks up O(eps * ||Ac||) negative eigenvalues (measured -1.7e-3
    # at lambda_max 5.4e3) which make Newton-Schulz diverge to NaN. Scale
    # the ridge by the inf-norm (>= lambda_max), not the mean diagonal.
    scale = jnp.max(jnp.sum(jnp.abs(Ac), axis=1)) + 1e-30
    return Ac + (3e-6 * scale) * jnp.eye(ncd, dtype=dt)


def coarse_inverse(Ac: jnp.ndarray) -> jnp.ndarray:
    """Dense inverse (applied as a matmul per CG iteration — triangular
    solves serialize on TPU)."""
    return jnp.linalg.inv(Ac)


def coarse_inverse_ns(
    Ac: jnp.ndarray,
    X0: Optional[jnp.ndarray] = None,
    cold_iters: int = 36,
    warm_iters: int = 10,
) -> jnp.ndarray:
    """Matmul-only Newton-Schulz inverse: X <- X (2I - A X).

    jnp.linalg.inv lowers to LU — serialized triangular solves that cost
    ~350 ms at ncd=3000 on the dev slice. Newton-Schulz is pure MXU
    matmuls. Cold start X0 = I/||A||_inf needs ~log2(cond * ln 1/eps)
    iterations; warm-started from the PREVIOUS step's cached inverse
    (A changes mildly between refreshes) it converges in a few. A spectral
    safeguard (power iteration on E = I - A X0) rejects stale warm starts
    so the iteration can never diverge. The result is a symmetric
    polynomial in A — SPD whenever X0 is, so the two-level preconditioner
    stays admissible for CG even at loose tolerance."""
    ncd = Ac.shape[0]
    dt = Ac.dtype
    eye = jnp.eye(ncd, dtype=dt)
    cold = eye * (1.0 / jnp.maximum(jnp.max(jnp.sum(jnp.abs(Ac), 1)), 1e-30))

    def ns(X, iters):
        def body(_, X):
            return X @ (2.0 * eye - Ac @ X)
        X = jax.lax.fori_loop(0, iters, body, X)
        return 0.5 * (X + X.T)

    if X0 is None:
        return ns(cold, cold_iters)

    # spectral-norm estimate of E = I - A X0 by power iteration
    E = eye - Ac @ X0
    v = jnp.full((ncd,), 1.0 / np.sqrt(ncd), dt)

    def pow_body(_, v):
        w = E @ (E.T @ v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, 6, pow_body, v)
    sigma = jnp.linalg.norm(E @ v)
    usable = jnp.logical_and(sigma < 0.9, jnp.isfinite(sigma))
    return jax.lax.cond(
        usable,
        lambda: ns(X0, warm_iters),
        lambda: ns(cold, cold_iters),
    )


def two_level_apply(cs: CoarseSpace, free_mask, Ac_inv, bj_apply, r, dim):
    """M^{-1} r = blockJacobi(r) + P Ac^{-1} P^T r."""
    z = bj_apply(r)
    rc = restrict(cs, free_mask, r).reshape(-1)
    zc = (Ac_inv @ rc).reshape(cs.naggr, 6)
    return z + prolong(cs, free_mask, zc, dim) * free_mask[:, None]


def two_level_preconditioner(cs: CoarseSpace, free_mask, bj_apply, dim):
    """Factory form of two_level_apply with the per-vertex rigid-mode
    matrix hoisted out of the CG loop; when `cs.grid` is set the
    aggregate restriction/prolongation run as lattice reshape-sums /
    broadcasts instead of segment_sum/gather (the aggregates are exact
    lattice blocks)."""
    B = _vert_modes(cs, free_mask, dim)       # (nv, dim, 6)
    fm = free_mask[:, None]

    if cs.grid is not None:
        (NI, NJ, NK), (bi, bj_, bk) = cs.grid
        nbi, nbj, nbk = -(-NI // bi), -(-NJ // bj_), -(-NK // bk)
        pad = (
            (0, nbi * bi - NI), (0, nbj * bj_ - NJ),
            (0, nbk * bk - NK),
        )

        def _restrict(w):  # (nv, 6) -> (naggr, 6)
            w3 = jnp.pad(w.reshape(NI, NJ, NK, 6), pad + ((0, 0),))
            return (
                w3.reshape(nbi, bi, nbj, bj_, nbk, bk, 6)
                .sum(axis=(1, 3, 5))
                .reshape(cs.naggr, 6)
            )

        def _prolong_modes(zc):  # (naggr, 6) -> (nv, 6)
            z6 = jnp.broadcast_to(
                zc.reshape(nbi, 1, nbj, 1, nbk, 1, 6),
                (nbi, bi, nbj, bj_, nbk, bk, 6),
            ).reshape(nbi * bi, nbj * bj_, nbk * bk, 6)
            return z6[:NI, :NJ, :NK].reshape(NI * NJ * NK, 6)
    else:

        def _restrict(w):
            return jax.ops.segment_sum(
                w, cs.agg_id, num_segments=cs.naggr
            )

        def _prolong_modes(zc):
            return zc[cs.agg_id]

    def apply(r, Ac_inv):
        z = bj_apply(r)
        rc = _restrict(jnp.einsum("nda,nd->na", B, r)).reshape(-1)
        zc = (Ac_inv @ rc).reshape(cs.naggr, 6)
        zv = _prolong_modes(zc)
        return z + jnp.einsum("nda,na->nd", B, zv) * fm

    return apply


def brick_preconditioner(
    cs: Optional[CoarseSpace], free_mask, binv, dim: int, Hpad: int
):
    """Two-level (or plain block-Jacobi) preconditioner operating directly
    on brick-layout vectors (ops/brick.py), so the whole CG loop stays in
    the matvec kernel's native layout — no per-iteration (nv, d) <->
    (d*Hpad, 128) relayouts.

    `binv` is the per-vertex (nv, d, d) block-Jacobi inverse, already
    zeroed at pinned vertices. The key identity making this cheap: a
    single brick component's row-major flattening IS vertex order, so the
    aggregate restriction stays a segment_sum with no permutation."""
    from mixedfem_tpu.ops import brick as brickmod

    nv = free_mask.shape[0]
    LANE = brickmod.LANE
    nvpad = Hpad * LANE
    Binv_b = brickmod.to_brick(
        binv.reshape(nv, dim * dim), Hpad
    ).reshape(dim, dim, Hpad, LANE)
    if cs is not None:
        B = _vert_modes(cs, free_mask, dim)  # (nv, d, 6) zeroed at pins
        Bb = brickmod.to_brick(
            B.reshape(nv, dim * 6), Hpad
        ).reshape(dim, 6, Hpad, LANE)
        agg_pad = jnp.concatenate(
            [
                cs.agg_id,
                jnp.full((nvpad - nv,), cs.naggr, jnp.int32),
            ]
        )

    def apply(rb, Ac_inv=None):
        r3 = rb.reshape(dim, Hpad, LANE)
        z = jnp.einsum("ijhw,jhw->ihw", Binv_b, r3)
        if cs is not None:
            w = jnp.einsum("dmhw,dhw->mhw", Bb, r3)  # (6, Hpad, LANE)
            rc = jax.ops.segment_sum(
                w.reshape(6, -1).T, agg_pad, num_segments=cs.naggr + 1
            )[: cs.naggr]
            zc = (Ac_inv @ rc.reshape(-1)).reshape(cs.naggr, 6)
            zcp = jnp.concatenate(
                [zc, jnp.zeros((1, 6), zc.dtype)], axis=0
            )
            zv = zcp[agg_pad]  # (nvpad, 6)
            z = z + jnp.einsum(
                "dmhw,mhw->dhw", Bb, zv.T.reshape(6, Hpad, LANE)
            )
        return z.reshape(dim * Hpad, LANE)

    return apply
