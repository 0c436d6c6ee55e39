"""Lattice-slab sharded CG for the structured-grid stencil path.

Multi-chip scale-out of ops/stencil.py (the flagship matvec): the vertex
lattice is split into contiguous I-axis slabs, one per device, and the
WHOLE preconditioned CG runs under shard_map:

  assembly  each shard assembles offset-form W from its own cell slab;
            the one boundary vertex plane that receives contributions
            from the neighbour's cells is ppermute'd and added (one
            (27, d, d, plane) exchange per Newton iteration).
  matvec    per CG iteration each shard exchanges ONE vertex plane of x
            with each neighbour (d * NJp * NKp floats ~ 8 KB at 100k
            tets) and applies the 27-point stencil on its halo-extended
            slab — a compute/comm ratio of ~Si planes per 2 exchanged.
  precond   block-Jacobi is shard-local; the rigid-body coarse residual
            is restricted shard-locally and psum'd (6 * naggr floats),
            solved redundantly with the replicated dense inverse, and
            prolonged shard-locally (the same replicate-the-tiny-coarse
            pattern as parallel/vp_step.py).
  cg        dot products are psum'd; the loop is one lax.while_loop.

This is the structured counterpart of the general banded vertex
partitioning in parallel/vp_step.py (SURVEY §5: the element/vertex axes
are this framework's sequence-parallelism analog). Validated on the
virtual 8-device CPU mesh by tests/test_stencil_shard.py and
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mixedfem_tpu.ops.stencil import OFFSETS, StencilPlan


class ShardStencilPlan(NamedTuple):
    """Static I-slab partition. Leading axis of every array = shard."""

    masks: jnp.ndarray       # (D, Sc, NJc, NKc) cell parity indicators
    emask: jnp.ndarray       # (D, Sc * NJc * NKc * ns) valid-element mask
    NI: int
    NJ: int
    NK: int
    nslots: int
    terms: tuple
    D: int
    Si: int                  # vertex planes per shard (NI padded to D*Si)
    Sc: int                  # cell planes per shard (= Si)

    @property
    def plane(self) -> int:
        """Flat size of one lattice plane (ghost-padded J/K)."""
        return (self.NJ + 2) * (self.NK + 2)


def build_shard_plan(plan: StencilPlan, n_shards: int) -> ShardStencilPlan:
    """Split the box lattice into n_shards I-slabs.

    Shard s owns vertex planes [s Si, (s+1) Si) and the cell planes with
    the same indices (cell plane ci touches vertex planes ci and ci+1;
    the spill into plane (s+1) Si is ppermute'd during assembly)."""
    NI, NJ, NK, ns = plan.NI, plan.NJ, plan.NK, plan.nslots
    NIc, NJc, NKc = NI - 1, NJ - 1, NK - 1
    D = n_shards
    Si = -(-NI // D)
    Sc = Si
    # per-shard cell-plane parity masks + element validity (zero-padded
    # slabs beyond NIc)
    pc = (
        np.add.outer(np.add.outer(np.arange(D * Sc), np.arange(NJc)),
                     np.arange(NKc))
    ) % 2
    valid = (np.arange(D * Sc) < NIc)[:, None, None]
    masks = np.stack([(pc == 0) & valid, (pc == 1) & valid]).astype(
        np.float32
    )  # (2, D*Sc, NJc, NKc)
    masks = masks.reshape(2, D, Sc, NJc, NKc).transpose(1, 0, 2, 3, 4)
    emask = np.repeat(
        valid[:, 0, 0], NJc * NKc * ns
    ).reshape(D, Sc * NJc * NKc * ns)
    return ShardStencilPlan(
        masks=jnp.asarray(masks),
        emask=jnp.asarray(emask.astype(np.float32)),
        NI=NI, NJ=NJ, NK=NK, nslots=ns, terms=plan.terms,
        D=D, Si=Si, Sc=Sc,
    )


def shard_element_rows(sp: ShardStencilPlan, rows: jnp.ndarray):
    """(E, ...) cell-major element data -> (D, Eshard, ...) zero-padded
    I-slab shards (elements are contiguous per cell plane)."""
    NJc, NKc, ns = sp.NJ - 1, sp.NK - 1, sp.nslots
    per_plane = NJc * NKc * ns
    Epad = sp.D * sp.Sc * per_plane
    rows = jnp.concatenate(
        [
            rows,
            jnp.zeros((Epad - rows.shape[0],) + rows.shape[1:],
                      rows.dtype),
        ]
    )
    return rows.reshape((sp.D, sp.Sc * per_plane) + rows.shape[1:])


def shard_vertex_field(sp: ShardStencilPlan, x: jnp.ndarray):
    """(nv, d) -> (D, d, Si * plane) ghost-padded (J/K only) I-slabs."""
    NI, NJ, NK = sp.NI, sp.NJ, sp.NK
    d = x.shape[1]
    x3 = x.reshape(NI, NJ, NK, d)
    xp = jnp.pad(
        x3, ((0, sp.D * sp.Si - NI), (1, 1), (1, 1), (0, 0))
    )  # (D*Si, NJp, NKp, d)
    xs = xp.reshape(sp.D, sp.Si * sp.plane, d)
    return jnp.transpose(xs, (0, 2, 1))


def shard_vertex_ints(sp: ShardStencilPlan, ids: jnp.ndarray,
                      sentinel: int):
    """(nv,) int vertex ids -> (D, Si * plane) with ghost/pad positions
    mapped to `sentinel` (e.g. the aggregate count for segment_sum)."""
    NI, NJ, NK = sp.NI, sp.NJ, sp.NK
    i3 = ids.reshape(NI, NJ, NK)
    ip = jnp.pad(
        i3, ((0, sp.D * sp.Si - NI), (1, 1), (1, 1)),
        constant_values=sentinel,
    )
    return ip.reshape(sp.D, sp.Si * sp.plane)


def unshard_vertex_field(sp: ShardStencilPlan, xs: jnp.ndarray):
    """(D, d, Si * plane) -> (nv, d)."""
    NI, NJ, NK = sp.NI, sp.NJ, sp.NK
    d = xs.shape[1]
    xp = jnp.transpose(xs, (0, 2, 1)).reshape(
        sp.D * sp.Si, NJ + 2, NK + 2, d
    )
    return xp[:NI, 1:-1, 1:-1].reshape(NI * NJ * NK, d)


def _assemble_local(sp: ShardStencilPlan, Gw, mass, mk):
    """Shard-local offset-form assembly: W (27, d, d, (Sc+1) * plane)
    over the shard's OWN cell slab; plane Sc is the spill into the right
    neighbour's first vertex plane. Mirrors ops/stencil.assemble_W."""
    Eloc, N, k, d = Gw.shape
    ns = sp.nslots
    NJc, NKc = sp.NJ - 1, sp.NK - 1
    ncells = sp.Sc * NJc * NKc
    NJp, NKp = sp.NJ + 2, sp.NK + 2
    GwS = jnp.transpose(Gw.reshape(ncells, ns, N * k * d), (1, 2, 0))
    MS = jnp.transpose(mass.reshape(ncells, ns, k * k), (1, 2, 0))
    mkf = mk.reshape(2, ncells)
    eye = jnp.eye(d, dtype=Gw.dtype)[:, :, None]

    planes = [None] * 27
    for (p, t, a, b, ca, oid) in sp.terms:
        acc = None
        for n in range(N):
            g1 = GwS[t, n * k * d + a * d : n * k * d + (a + 1) * d]
            g2 = GwS[t, n * k * d + b * d : n * k * d + (b + 1) * d]
            term = g1[:, None, :] * g2[None, :, :]
            acc = term if acc is None else acc + term
        C = acc + MS[t, a * k + b][None, None, :] * eye
        C = C * mkf[p]
        C = C.reshape(d, d, sp.Sc, NJc, NKc)
        ci, cj, ck = ca
        Cp = jnp.pad(
            C,
            (
                (0, 0), (0, 0),
                (ci, (sp.Sc + 1) - ci - sp.Sc),
                (1 + cj, NJp - 1 - cj - NJc),
                (1 + ck, NKp - 1 - ck - NKc),
            ),
        )
        planes[oid] = Cp if planes[oid] is None else planes[oid] + Cp
    zero = jnp.zeros((d, d, sp.Sc + 1, NJp, NKp), Gw.dtype)
    W = jnp.stack([pl if pl is not None else zero for pl in planes])
    return W.reshape(27, d, d, (sp.Sc + 1) * sp.plane)


def sharded_pcg(
    sp: ShardStencilPlan,
    jmesh: Mesh,
    Gw_sh, mass_sh,          # (D, Eloc, N, k, d) / (D, Eloc, k, k)
    b_sh, x0_sh, fm_sh,      # (D, d, Si * plane)
    binv_sh,                 # (D, d, d, Si * plane)
    max_iters: int,
    tol: float,
    coarse_B_sh=None,        # (D, d, 6, Si * plane) rigid modes, or None
    coarse_agg_sh=None,      # (D, Si * plane) int32 aggregate id (pad ->
    #                          naggr sentinel), or None
    naggr: int = 0,
    Ac_inv=None,             # (6 naggr, 6 naggr) replicated, or None
):
    """shard_map'd preconditioned CG on I-slab lattice vectors.

    Returns (x_sh, iters, rel_residual). All inputs carry the shard axis
    leading; the caller builds them with shard_element_rows /
    shard_vertex_field and jax.device_put's them onto `jmesh`."""
    D, Si, plane = sp.D, sp.Si, sp.plane
    left = [(i, (i - 1) % D) for i in range(D)]
    right = [(i, (i + 1) % D) for i in range(D)]
    use_coarse = coarse_B_sh is not None and Ac_inv is not None

    def body(emask_b, Gw_b, mass_b, mk_b, b_b, x0_b, fm_b, binv_b, B6_b,
             agg_b, Aci):
        # shard_map keeps the sharded axis with local size 1
        emask, Gw, mass, mk = emask_b[0], Gw_b[0], mass_b[0], mk_b[0]
        b, x0, fm, binv = b_b[0], x0_b[0], fm_b[0], binv_b[0]
        B6, agg = B6_b[0], agg_b[0]
        d = b.shape[0]
        emaskf = emask[:, None, None, None]
        W = _assemble_local(
            sp, Gw * emaskf, mass * emask[:, None, None], mk
        )
        # spill plane -> right neighbour's first owned plane
        spill = jax.lax.ppermute(
            W[..., Si * plane : (Si + 1) * plane], "x", right
        )
        W = W[..., : Si * plane].at[..., :plane].add(spill)

        def halo(p):
            """(d, Si*plane) -> (d, (Si+2)*plane): one plane from each
            neighbour (edge shards receive zeros via the ring + mask)."""
            first = jax.lax.ppermute(p[:, :plane], "x", left)
            last = jax.lax.ppermute(
                p[:, (Si - 1) * plane :], "x", right
            )
            idx = jax.lax.axis_index("x")
            first = jnp.where(idx == D - 1, 0.0, first)  # from right edge
            last = jnp.where(idx == 0, 0.0, last)        # from left edge
            return jnp.concatenate([last, p, first], axis=1)

        NJp = sp.NJ + 2
        NKp = sp.NK + 2
        S = NJp * NKp + NKp + 1

        def A(p):
            pb = halo(p)                         # (d, (Si+2)*plane)
            # extra S-zeros both sides: flat shifts overhang the single
            # halo plane by up to NKp+1 at J/K ghost positions (where the
            # W rows are zero); without the pad lax.slice would clamp and
            # shift REAL positions' reads
            pbe = jnp.pad(pb, ((0, 0), (S, S)))
            y = jnp.zeros_like(p)
            for oid, (di, dj, dk) in enumerate(OFFSETS):
                sh = (di * NJp + dj) * NKp + dk
                base = S + plane + sh            # owned plane 0 in pbe
                xs = jax.lax.slice(
                    pbe, (0, base), (d, base + Si * plane)
                )
                y = y + jnp.einsum("abn,bn->an", W[oid], xs)
            return y * fm

        def pdot(u, v):
            return jax.lax.psum(jnp.vdot(u, v), "x")

        def Minv(r):
            z = jnp.einsum("abn,bn->an", binv, r)
            if use_coarse:
                w = jnp.einsum("dan,dn->an", B6, r)   # (6, Si*plane)
                rc = jax.ops.segment_sum(
                    w.T, agg, num_segments=naggr + 1
                )[:naggr]                              # (naggr, 6)
                rc = jax.lax.psum(rc, "x")
                zc = (Aci @ rc.reshape(-1)).reshape(naggr, 6)
                zcp = jnp.concatenate(
                    [zc, jnp.zeros((1, 6), zc.dtype)]
                )
                zv = zcp[agg]                          # (Si*plane, 6)
                z = z + jnp.einsum("dan,na->dn", B6, zv) * fm
            return z

        bnorm2 = pdot(b, b)
        safe_b = jnp.where(bnorm2 > 0, bnorm2, 1.0)
        tol2 = (tol * tol) * safe_b
        r = b - A(x0)
        z = Minv(r)
        p = z
        rz = pdot(r, z)

        def cond(c):
            x, r, z, p, rz, it = c
            return jnp.logical_and(it < max_iters, pdot(r, r) > tol2)

        def step(c):
            x, r, z, p, rz, it = c
            Ap = A(p)
            denom = pdot(p, Ap)
            alpha = rz / jnp.where(denom != 0, denom, 1.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = Minv(r)
            rz_new = pdot(r, z)
            beta = rz_new / jnp.where(rz != 0, rz, 1.0)
            p = z + beta * p
            return (x, r, z, p, rz_new, it + 1)

        x, r, z, p, rz, it = jax.lax.while_loop(
            cond, step, (x0, r, z, p, rz, 0)
        )
        rel = jnp.sqrt(pdot(r, r) / safe_b)
        return x[None], it, rel

    if not use_coarse:
        zeros_B = jnp.zeros(
            (D, b_sh.shape[1], 6, Si * plane), b_sh.dtype
        )
        coarse_B_sh = zeros_B
        coarse_agg_sh = jnp.zeros((D, Si * plane), jnp.int32)
        Ac_inv = jnp.zeros((max(6 * naggr, 6), max(6 * naggr, 6)),
                           b_sh.dtype)

    spec = P("x")
    rep = P()
    fn = shard_map(
        body,
        mesh=jmesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec, spec, spec,
                  spec, rep),
        out_specs=(spec, rep, rep),
        check_vma=False,
    )
    return fn(
        sp.emask, Gw_sh, mass_sh, sp.masks, b_sh, x0_sh, fm_sh, binv_sh,
        coarse_B_sh, coarse_agg_sh, Ac_inv,
    )
