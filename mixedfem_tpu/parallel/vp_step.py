"""Vertex-partitioned FULL Newton step (shard_map + halo exchange).

parallel/halo.py validates the halo-exchange matvec in isolation; this
module runs the ENTIRE implicit step vertex-partitioned — the >8-chip
scaling path where no chip ever holds whole-mesh vertex arrays (SURVEY §5:
the element/vertex axes are this framework's sequence-parallelism analog):

- shard-local coefficient builds (F -> polar -> ds/dF -> G -> psd-fixed H),
- halo'd inertia gradient + condensed rhs,
- PCG with psum dot products and the halo matvec,
- shard-local (ds, la) recovery,
- line-search energies as shard-local sums + psum,
- pmax Newton decrement.

Per-shard data layout matches parallel/halo.py: vertices in banded order
(see parallel/reorder.py for the RCM pass that makes arbitrary meshes
banded), D contiguous blocks of nb rows, elements owned by the shard of
their minimum vertex, halo depth Bd rows exchanged with each neighbor by
ppermute over ICI.

Scope: mixed-stretch solids (the flagship path), BDF1-6 (pass a BDFState
of padded histories), block-Jacobi or two-level-coarse preconditioner,
and mixed IPC contact (pass `cf`): the padded frame set is SMALL and
irregular, so its vertex values are gathered with one psum of (C, 4, d)
per use (frames may span shards arbitrarily — no banded-locality
assumption) while every frame's barrier algebra runs replicated; frame
rhs/diag/matvec contributions scatter into owned rows only. Shells/rods
run through the replicated GSPMD path (parallel/sharding.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.integrators import bdf as bdfmod
from mixedfem_tpu.materials import models as mat
from mixedfem_tpu.mesh.mesh import MeshData
from mixedfem_tpu.ops import rotation, smallops, sym
from mixedfem_tpu.solvers import pcg as pcgmod
from mixedfem_tpu.variables import mixed_stretch as ms


class VPPlan(NamedTuple):
    """Static per-shard partition + element data (leading axis = shard)."""

    T_local: jnp.ndarray     # (D, Ep, k) into [halo_L | own | halo_R]
    emask: jnp.ndarray       # (D, Ep)
    dphidX: jnp.ndarray      # (D, Ep, k, d)
    vols: jnp.ndarray        # (D, Ep)
    mass_coeff: jnp.ndarray  # (D, Ep, k, k)
    mu: jnp.ndarray          # (D, Ep)
    lam: jnp.ndarray         # (D, Ep)
    model_id: jnp.ndarray    # (D, Ep) int32
    free_mask: jnp.ndarray   # (D, nb)
    ext: jnp.ndarray         # (D, nb, dim)
    nb: int
    Bd: int
    D: int
    nv_pad: int
    dim: int
    models: Tuple[str, ...]
    # two-level coarse preconditioner data (naggr == 0 -> disabled):
    # shard-local rigid-mode geometry + GLOBAL aggregate ids (the coarse
    # space is replicated — it is tiny, 6*naggr dofs)
    agg_v: jnp.ndarray = jnp.zeros((0, 0), jnp.int32)    # (D, nb)
    r_v: jnp.ndarray = jnp.zeros((0, 0, 3))              # (D, nb, 3)
    agg_e: jnp.ndarray = jnp.zeros((0, 0, 0), jnp.int32)  # (D, Ep, k)
    naggr: int = 0


def build_vp_plan(mesh: MeshData, n_shards: int, coarse=None) -> VPPlan:
    """Partition a banded-ordered mesh; raises if the bandwidth exceeds the
    halo capacity (use parallel/reorder.py first for arbitrary meshes).

    `coarse` (solvers/coarse.py CoarseSpace) enables the two-level
    rigid-body preconditioner INSIDE the vertex-partitioned CG: each shard
    assembles its elements' Galerkin contributions, a psum replicates the
    tiny dense coarse matrix, and the (matmul-only Newton-Schulz) inverse
    is applied replicated per iteration (VERDICT r2 item 4)."""
    T = np.asarray(mesh.T)
    nv = mesh.nv
    E, k = T.shape
    d = mesh.dim
    nb = -(-nv // n_shards)
    nv_pad = nb * n_shards

    owner = T.min(axis=1) // nb
    starts = owner * nb
    lo = (T - starts[:, None]).min()
    hi = (T - starts[:, None]).max()
    Bd = int(max(-lo, hi - nb + 1, 0))
    Bd = -(-Bd // 8) * 8
    if Bd > nb:
        raise ValueError(
            f"halo depth {Bd} exceeds block size {nb}: reorder the mesh "
            "(parallel/reorder.py) or use fewer shards"
        )

    Ep = -(-max(int(np.bincount(owner, minlength=n_shards).max()), 1) // 8) * 8
    dt_np = np.float64
    T_local = np.zeros((n_shards, Ep, k), np.int32)
    emask = np.zeros((n_shards, Ep), dt_np)
    dphi = np.zeros((n_shards, Ep, k, d), dt_np)
    vols = np.zeros((n_shards, Ep), dt_np)
    mc = np.zeros((n_shards, Ep, k, k), dt_np)
    mu = np.ones((n_shards, Ep), dt_np)
    lam = np.ones((n_shards, Ep), dt_np)
    mid = np.zeros((n_shards, Ep), np.int32)
    for sh in range(n_shards):
        ids = np.nonzero(owner == sh)[0]
        n_own = len(ids)
        T_local[sh, :n_own] = T[ids] - sh * nb + Bd
        emask[sh, :n_own] = 1.0
        dphi[sh, :n_own] = np.asarray(mesh.dphidX)[ids]
        vols[sh, :n_own] = np.asarray(mesh.vols)[ids]
        mc[sh, :n_own] = np.asarray(mesh.mass_coeff)[ids]
        mu[sh, :n_own] = np.asarray(mesh.mu)[ids]
        lam[sh, :n_own] = np.asarray(mesh.lam)[ids]
        mid[sh, :n_own] = np.asarray(mesh.model_id)[ids]
    assert T_local.min() >= 0 and T_local.max() < nb + 2 * Bd

    def vpad(a):
        return np.concatenate(
            [np.asarray(a), np.zeros((nv_pad - nv,) + a.shape[1:], a.dtype)]
        )

    jdt = mesh.vols.dtype
    agg_v = jnp.zeros((0, 0), jnp.int32)
    r_v = jnp.zeros((0, 0, 3), jdt)
    agg_e = jnp.zeros((0, 0, 0), jnp.int32)
    naggr = 0
    if coarse is not None:
        agg_np = np.asarray(coarse.agg_id)
        r_np = np.asarray(coarse.r)
        naggr = coarse.naggr
        agg_v = jnp.asarray(
            np.concatenate(
                [agg_np, np.zeros(nv_pad - nv, np.int32)]
            ).reshape(n_shards, nb).astype(np.int32)
        )
        r_v = jnp.asarray(vpad(r_np).reshape(n_shards, nb, 3), jdt)
        ae_np = np.zeros((n_shards, Ep, k), np.int32)
        agg_of_T = agg_np[T]  # (E, k)
        for sh in range(n_shards):
            ids = np.nonzero(owner == sh)[0]
            ae_np[sh, : len(ids)] = agg_of_T[ids]
        agg_e = jnp.asarray(ae_np)
    return VPPlan(
        T_local=jnp.asarray(T_local),
        emask=jnp.asarray(emask, jdt),
        dphidX=jnp.asarray(dphi, jdt),
        vols=jnp.asarray(vols, jdt),
        mass_coeff=jnp.asarray(mc, jdt),
        mu=jnp.asarray(mu, jdt),
        lam=jnp.asarray(lam, jdt),
        model_id=jnp.asarray(mid),
        free_mask=jnp.asarray(
            vpad(np.asarray(mesh.free_mask)).reshape(n_shards, nb), jdt
        ),
        ext=jnp.asarray(
            vpad(np.asarray(mesh.ext_force)).reshape(n_shards, nb, d), jdt
        ),
        nb=nb,
        Bd=Bd,
        D=n_shards,
        nv_pad=nv_pad,
        dim=d,
        models=mesh.models,
        agg_v=agg_v,
        r_v=r_v,
        agg_e=agg_e,
        naggr=naggr,
    )


def pad_vertex_field(plan: VPPlan, x: jnp.ndarray) -> jnp.ndarray:
    """(nv, d) -> (nv_pad, d) zero-padded (ready to shard over rows)."""
    return jnp.pad(x, ((0, plan.nv_pad - x.shape[0]), (0, 0)))


def init_vp_state(plan: VPPlan, x0_pad: jnp.ndarray):
    """Initial shard-local (s, la): rest-state identity stretch.

    Matches MixedStretch::reset for simulations starting from the rest
    pose (F = I); for deformed initial states, compute s per shard from the
    initial polar decomposition instead."""
    D, Ep, _ = plan.T_local.shape
    d = plan.dim
    N = 6 if d == 3 else 3
    eye = jnp.zeros((N,), x0_pad.dtype)
    eye = eye.at[:d].set(1.0)
    s0 = jnp.broadcast_to(eye, (D, Ep, N))
    return s0, jnp.zeros_like(s0)


def vp_newton_step(
    plan: VPPlan,
    config: SimConfig,
    jmesh: Mesh,
    x: jnp.ndarray,      # (nv_pad, d) current positions (sharded rows)
    v: jnp.ndarray,      # (nv_pad, d) velocities
    s: jnp.ndarray,      # (D, Ep, N) mixed stretch (sharded on axis 0)
    la: jnp.ndarray,     # (D, Ep, N)
    bdf=None,            # optional BDFState with PADDED (nv_pad) histories
    cf=None,             # optional ContactFrames (GLOBAL vertex ids,
    #                      replicated) — enables mixed IPC contact
):
    """One implicit step, fully vertex-partitioned. Returns
    (x_new, v_new, s_new, la_new, iters, decrement).

    `bdf` (integrators/bdf.py BDFState over nv_pad rows) selects the
    integrator order: the target x_tilde and the effective dt = beta*h
    (BDF.cpp:6-27) are row-wise reductions over the history stack, so
    they shard over the vertex rows for free; the caller advances the
    history with bdf_update(bdf, x_new). Without `bdf` the step is BDF1
    from (x, v), matching the original signature.

    `cf` stacks MixedCollision into the sharded step (activation,
    barrier rhs/Hessian, frame matvec + diag blocks, local (dd, la_c)
    recovery, merit terms and the CCD alpha clamp — the same per-Newton
    lifecycle as optimizer/newton.py under contact); frame vertex values
    move with one (C, 4, d) psum per use."""
    from mixedfem_tpu.collision import accd as accdmod
    from mixedfem_tpu.collision import barrier as bar
    from mixedfem_tpu.collision import distances as dist

    nb, Bd, D, d = plan.nb, plan.Bd, plan.D, plan.dim
    if bdf is not None:
        h = bdfmod.bdf_dt(bdf)
    else:
        h = config.h
    dtype = x.dtype
    dt2 = h * h
    outer = config.outer_steps
    models = plan.models
    N = s.shape[-1]
    w_sym = sym.sym_weights(d, dtype=dtype)
    syminv = sym.syminv_weights(d, dtype=dtype)

    right = [(i, (i + 1) % D) for i in range(D)]
    left = [(i, (i - 1) % D) for i in range(D)]
    use_coarse = plan.naggr > 0
    naggr = plan.naggr
    ncd = 6 * naggr
    use_contact = cf is not None and cf.frames.shape[0] > 0
    nC = cf.frames.shape[0] if use_contact else 0
    dhat, kappa = config.dhat, config.kappa

    # BDF1 target: x_tilde + h^2 ext (displacement.py:target)
    if bdf is not None:
        target = bdfmod.bdf_x_tilde(bdf) + dt2 * plan.ext.reshape(-1, d)
    else:
        target = x + h * v + dt2 * plan.ext.reshape(-1, d)

    def _modes_of(r3, mask):
        """Per-vertex rigid-mode matrix [I | -skew(r)] (n, d, 6), masked
        (solvers/coarse.py _vert_modes semantics)."""
        n = r3.shape[0]
        eye3 = jnp.eye(3, dtype=dtype)
        zero = jnp.zeros((n,), dtype)
        sk = jnp.stack(
            [
                jnp.stack([zero, r3[:, 2], -r3[:, 1]], axis=-1),
                jnp.stack([-r3[:, 2], zero, r3[:, 0]], axis=-1),
                jnp.stack([r3[:, 1], -r3[:, 0], zero], axis=-1),
            ],
            axis=-2,
        )
        B = jnp.concatenate(
            [jnp.broadcast_to(eye3, (n, 3, 3)), sk], axis=-1
        )
        return B[:, :d, :] * mask[:, None, None]

    def body(x_blk, tgt_blk, s_blk, la_blk, Tl_b, em_b, dphi_b, vol_b,
             mc_b, mu_b, lam_b, mid_b, fm_b, *coarse_b):
        x0 = x_blk[0]
        tgt = tgt_blk[0]
        s0 = s_blk[0]
        la0 = la_blk[0]
        Tl, em, dphi, vol = Tl_b[0], em_b[0], dphi_b[0], vol_b[0]
        mc, mu_e, lam_e, mid = mc_b[0], mu_b[0], lam_b[0], mid_b[0]
        fm = fm_b[0]
        if use_coarse:
            agg_v, r_v, agg_e = (a[0] for a in coarse_b)

        def halo(p):
            """(nb, X) -> (nb + 2 Bd, X) via two ppermutes."""
            halo_L = jax.lax.ppermute(p[nb - Bd:], "e", right)
            halo_R = jax.lax.ppermute(p[:Bd], "e", left)
            return jnp.concatenate([halo_L, p, halo_R], axis=0)

        def unhalo_add(buf):
            """(nb + 2 Bd, X) boundary contributions -> (nb, X)."""
            back_L = jax.lax.ppermute(buf[:Bd], "e", left)
            back_R = jax.lax.ppermute(buf[nb + Bd:], "e", right)
            out = buf[Bd: nb + Bd]
            out = out.at[nb - Bd:].add(back_L)
            out = out.at[:Bd].add(back_R)
            return out

        def scatter_local(contrib):
            """(Ep, k, d) -> (nb, d) with halo return."""
            buf = jax.ops.segment_sum(
                contrib.reshape(-1, d), Tl.reshape(-1),
                num_segments=nb + 2 * Bd,
            )
            return unhalo_add(buf)

        def pdot(a, b):
            return jax.lax.psum(jnp.vdot(a, b), "e")

        # contact frame gather/scatter: frames are few and may span shards
        # arbitrarily; one (C, 4, X) psum replicates their vertex values,
        # scatters touch owned rows only (closure over the replicated cf)
        sh_start = jax.lax.axis_index("e") * nb

        def gather_frames(p):
            """(nb, X) owned rows -> (C, 4, X) replicated frame values."""
            rel = cf.frames - sh_start
            ok = (rel >= 0) & (rel < nb)
            vals = jnp.where(
                ok[..., None], p[jnp.clip(rel, 0, nb - 1)], 0.0
            )
            return jax.lax.psum(vals, "e")

        def scatter_frames_own(contrib):
            """(C, 4, X) frame contributions -> (nb, X) owned rows."""
            rel = cf.frames - sh_start
            ok = (rel >= 0) & (rel < nb)
            seg = jnp.where(ok, rel, nb)
            X = contrib.shape[-1]
            return jax.ops.segment_sum(
                (contrib * ok[..., None]).reshape(-1, X),
                seg.reshape(-1), num_segments=nb + 1,
            )[:nb]

        def F_of(xbuf):
            xe = xbuf[Tl]
            return jnp.einsum("ekr,ekc->erc", xe, dphi), xe

        def mass_apply(rbuf):
            """element-wise consistent-mass product of a halo'd field."""
            re = rbuf[Tl]
            return jnp.einsum("ekl,eld->ekd", mc, re)

        def stretch_Sv(xbuf):
            F, _ = F_of(xbuf)
            R, S = rotation.polar(F, d)
            return sym.pack(S), R, S, F

        def merit(x_t, s_t, la_t, tgtbuf):
            xtbuf = halo(x_t)
            diff_buf = xtbuf - tgtbuf
            e_in = 0.5 * jnp.sum(
                diff_buf[Bd: nb + Bd] * unhalo_add(
                    jax.ops.segment_sum(
                        mass_apply(diff_buf).reshape(-1, d),
                        Tl.reshape(-1),
                        num_segments=nb + 2 * Bd,
                    )
                )
            )
            psi = mat.psi_s_all(s_t, mu_e, lam_e, mid, models)
            e_el = dt2 * jnp.sum(vol * psi * em)
            Sv_t, _, _, _ = stretch_Sv(xtbuf)
            e_c = jnp.sum(
                vol * em * jnp.einsum("ei,ei->e", la_t, w_sym * (Sv_t - s_t))
            )
            return jax.lax.psum(e_in + e_el + e_c, "e")

        tgtbuf0 = halo(tgt)

        def newton_cond(carry):
            (xx, ss, ll, ccd_d, ccla, ccact, it, E_prev, dec, res,
             cg_sum) = carry
            return jnp.logical_and(
                it < outer,
                jnp.logical_and(dec > config.newton_tol, res > 1e-12),
            )

        def newton_body(carry):
            (xx, ss, ll, ccd_d, ccla, ccact, it, E_prev, dec, res,
             cg_sum) = carry
            xbuf = halo(xx)
            F, _ = F_of(xbuf)
            R, S = rotation.polar(F, d)
            Sv = sym.pack(S)
            Dt = rotation.dsdF(R, S, d)
            G = smallops.contract_D_dphi(Dt, dphi)
            coeffs = ms.coeffs_from_FG(
                F, G, R, Sv, ss, vol, mu_e, lam_e, mid, models, h
            )
            Gw = coeffs.Gw * em[:, None, None, None]

            # mixed-contact lifecycle at the iterate (the mc.update
            # activation/persistence semantics, replicated on gathered
            # frame vertices — mixed_ipc.cpp:199-391)
            if use_contact:
                cverts = gather_frames(xx)
                Dc = dist.frame_distance(cverts, cf.ftype)
                Gxc = dist.frame_distance_grad(cverts, cf.ftype)
                newly = jnp.logical_and(Dc < dhat, cf.fmask > 0)
                keep = jnp.logical_and(ccact > 0, ccd_d < dhat)
                was = ccact > 0
                cdv = jnp.where(was, ccd_d, Dc)
                clav = jnp.where(was, ccla, 0.0)
                af = jnp.logical_or(newly, keep).astype(dtype)
                gc, Hc = bar.mixed_barrier_grad_hess(cdv, dhat, kappa)
                gc = gc * af

            # inertia gradient + rhs
            diff_buf = xbuf - tgtbuf0
            inertia = scatter_local(mass_apply(diff_buf)) * fm[:, None]
            y = (
                jnp.einsum("eij,ej->ei", coeffs.H, Sv - ss) + coeffs.g
            ) * em[:, None]
            b = -inertia + scatter_local(
                -jnp.einsum("eikr,ei,e->ekr", G, y, vol)
            ) * fm[:, None]
            if use_contact:
                glc = Hc * (Dc - cdv) + gc
                b = b + scatter_frames_own(
                    -Gxc * (glc * af)[:, None, None]
                ) * fm[:, None]

            # block-Jacobi from mass + Gw blocks
            eye_d = jnp.eye(d, dtype=dtype)
            blk_e = jnp.einsum("eikr,eiks->ekrs", Gw, Gw) + (
                jnp.einsum("ekk->ek", mc)[..., None, None] * eye_d
            )
            blk_buf = jax.ops.segment_sum(
                blk_e.reshape(-1, d * d), Tl.reshape(-1),
                num_segments=nb + 2 * Bd,
            )
            blocks = unhalo_add(blk_buf).reshape(nb, d, d)
            if use_contact:
                Bc = jnp.einsum("ckr,cks,c->ckrs", Gxc, Gxc, Hc * af)
                blocks = blocks + scatter_frames_own(
                    Bc.reshape(nC, 4, d * d)
                ).reshape(nb, d, d)
            mask = fm[:, None, None]
            blocks = blocks * mask + eye_d * (1.0 - mask)
            binv = pcgmod._small_inv(blocks)

            def bj_apply(r):
                return jnp.einsum("nij,nj->ni", binv, r) * fm[:, None]

            if use_coarse:
                # Two-level coarse solve inside the sharded CG: each shard
                # assembles its elements' Galerkin blocks into the tiny
                # dense (6 naggr)^2 matrix, psum replicates it, and the
                # matmul-only Newton-Schulz inverse is applied replicated
                # (solvers/coarse.py semantics, distributed).
                B_own = _modes_of(r_v, fm)                # (nb, d, 6)
                B_buf = _modes_of(halo(r_v), halo(fm[:, None])[:, 0])
                Be = B_buf[Tl]                            # (Ep, k, d, 6)
                blk_c = jnp.einsum(
                    "ekl,ekra,elrb->eklab", mc, Be, Be
                )
                GB = jnp.einsum("eikr,ekra->eika", Gw, Be)
                blk_c = blk_c + jnp.einsum(
                    "eika,eilb->eklab", GB, GB
                )
                blk_c = blk_c * em[:, None, None, None, None]
                Ac4 = jnp.zeros((naggr, 6, naggr, 6), dtype)
                Ac4 = Ac4.at[
                    agg_e[:, :, None], :, agg_e[:, None, :], :
                ].add(blk_c)
                Ac = jax.lax.psum(Ac4.reshape(ncd, ncd), "e")
                ridge = jnp.trace(Ac) / ncd + 1e-30
                Ac = Ac + (1e-6 * ridge) * jnp.eye(ncd, dtype=dtype)
                # Newton-Schulz inverse (cold start; ~36 matmul pairs on a
                # tiny replicated matrix)
                eye_c = jnp.eye(ncd, dtype=dtype)
                Xc0 = eye_c * (
                    1.0 / jnp.maximum(jnp.max(jnp.sum(jnp.abs(Ac), 1)), 1e-30)
                )
                Acinv = jax.lax.fori_loop(
                    0, 36, lambda _, X: X @ (2.0 * eye_c - Ac @ X), Xc0
                )

                def Minv(r):
                    z = bj_apply(r)
                    rc = jax.ops.segment_sum(
                        jnp.einsum("nda,nd->na", B_own, r),
                        agg_v, num_segments=naggr,
                    )
                    rc = jax.lax.psum(rc.reshape(-1), "e")
                    zc = (Acinv @ rc).reshape(naggr, 6)
                    return z + jnp.einsum(
                        "nda,na->nd", B_own, zc[agg_v]
                    ) * fm[:, None]
            else:
                Minv = bj_apply

            def A(p):
                p = p * fm[:, None]
                pbuf = halo(p)
                pe = pbuf[Tl]
                out_e = jnp.einsum("ekl,eld->ekd", mc, pe)
                q = jnp.einsum("eikr,ekr->ei", Gw, pe)
                out_e = out_e + jnp.einsum("eikr,ei->ekr", Gw, q)
                out = scatter_local(out_e) * fm[:, None]
                if use_contact:
                    pv = gather_frames(p)
                    Gdx = jnp.einsum("ckd,ckd->c", Gxc, pv)
                    out = out + scatter_frames_own(
                        Gxc * (Hc * Gdx * af)[:, None, None]
                    ) * fm[:, None]
                return out

            # PCG with psum dots (warm start: explicit-Euler prediction)
            dx0 = (tgt - xx) * fm[:, None]
            bn2 = pdot(b, b)
            safe_b = jnp.where(bn2 > 0, bn2, 1.0)
            tol2 = (config.itr_tol ** 2) * safe_b

            r0 = b - A(dx0)
            z0 = Minv(r0)

            def cg_cond(c):
                xc, rc, zc, pc, rzc, itc = c
                return jnp.logical_and(
                    itc < config.max_iterative_solver_iters,
                    pdot(rc, rc) > tol2,
                )

            def cg_body(c):
                xc, rc, zc, pc, rzc, itc = c
                Ap = A(pc)
                alpha = rzc / jnp.where(
                    pdot(pc, Ap) != 0, pdot(pc, Ap), 1.0
                )
                xc = xc + alpha * pc
                rc = rc - alpha * Ap
                zc = Minv(rc)
                rz_new = pdot(rc, zc)
                beta = rz_new / jnp.where(rzc != 0, rzc, 1.0)
                return (xc, rc, zc, zc + beta * pc, rz_new, itc + 1)

            dx, _, _, _, _, cg_it = jax.lax.while_loop(
                cg_cond, cg_body,
                (dx0, r0, z0, z0, pdot(r0, z0), jnp.zeros((), jnp.int32)),
            )

            # local (ds, la) recovery
            dxbuf = halo(dx)
            ds = (Sv - ss) + jnp.einsum("eikr,ekr->ei", G, dxbuf[Tl])
            ds = ds * em[:, None]
            la_new = syminv * (
                jnp.einsum("eij,ej->ei", coeffs.H, ds) + coeffs.g
            ) * em[:, None]

            dec_new = jnp.maximum(
                jax.lax.pmax(jnp.max(jnp.abs(dx)), "e"),
                jax.lax.pmax(jnp.max(jnp.abs(ds)), "e"),
            )

            # contact local solve (mc.local_solve) + merit terms
            # (mixed_contact_merit): replicated per-frame algebra; added
            # AFTER the psum'd element/inertia merit (counted once)
            if use_contact:
                dxv = gather_frames(dx)
                Gdxc = jnp.einsum("ckd,ckd->c", Gxc, dxv)
                cdd = ((Dc - cdv) + Gdxc) * af
                cla_new = (Hc * cdd + gc) * af
                dec_new = jnp.maximum(dec_new, jnp.max(jnp.abs(cdd)))

                from mixedfem_tpu.variables import mixed_collision as mcmod

                def contact_merit(vt, cd_t):
                    D_t = dist.frame_distance(vt, cf.ftype)
                    act_prev = af > 0
                    d_eff = jnp.where(act_prev, cd_t, D_t)
                    act = jnp.logical_or(
                        act_prev,
                        jnp.logical_and(D_t < dhat, cf.fmask > 0),
                    )
                    e = mcmod.energy(
                        d_eff, act.astype(dtype), dhat, kappa, dtype
                    )
                    mm = jnp.logical_and(
                        act_prev,
                        jnp.logical_or(D_t <= dhat, cd_t <= dhat),
                    ).astype(dtype)
                    return e + jnp.sum(cla_new * (D_t - cd_t) * mm)
            else:
                cdd, cla_new = jnp.zeros_like(ccd_d), ccla
                cdv = ccd_d
                af = ccact

            E = merit(xx, ss, la_new, tgtbuf0)
            if use_contact:
                E = E + contact_merit(cverts, cdv)
            res_new = jnp.abs((E - E_prev) / (E + 1e-6))

            # CCD step-size clamp (newton_optimizer.cpp:49-61)
            if use_contact and config.enable_ccd:
                alpha0 = 0.9 * accdmod.accd_alpha_verts(
                    cverts, dxv, cf.ftype, cf.fmask
                )
            else:
                alpha0 = jnp.asarray(1.0, dtype)

            def ls_cond(c):
                a, kk = c
                Ea = merit(xx + a * dx, ss + a * ds, la_new, tgtbuf0)
                if use_contact:
                    Ea = Ea + contact_merit(
                        cverts + a * dxv, cdv + a * cdd
                    )
                return jnp.logical_and(kk < config.ls_iters, Ea >= E)

            alpha, ls_k = jax.lax.while_loop(
                ls_cond, lambda c: (c[0] * 0.5, c[1] + 1),
                (alpha0, jnp.zeros((), jnp.int32)),
            )
            accept = (ls_k < config.ls_iters).astype(dtype)
            xx = xx + accept * alpha * dx
            ss = ss + accept * alpha * ds
            cd_next = cdv + accept * alpha * cdd
            return (xx, ss, la_new, cd_next, cla_new, af, it + 1, E,
                    dec_new, res_new, cg_sum + cg_it)

        big = jnp.asarray(jnp.inf, dtype)
        zC = jnp.zeros((nC,), dtype)
        (xx, ss, ll, _cd, _cla, _cact, it, E, dec, res,
         cg_sum) = jax.lax.while_loop(
            newton_cond, newton_body,
            (x0, s0, la0, zC, zC, zC, jnp.zeros((), jnp.int32),
             jnp.zeros((), dtype), big, big, jnp.zeros((), jnp.int32)),
        )
        return xx[None], ss[None], ll[None], it, dec, cg_sum

    coarse_args = (
        (plan.agg_v, plan.r_v, plan.agg_e) if use_coarse else ()
    )
    f = shard_map(
        body,
        mesh=jmesh,
        in_specs=(P("e"),) * (13 + len(coarse_args)),
        out_specs=(P("e"), P("e"), P("e"), P(), P(), P()),
    )
    x_new, s_new, la_new, iters, dec, cg_total = f(
        x.reshape(D, nb, d),
        target.reshape(D, nb, d),
        s,
        la,
        plan.T_local,
        plan.emask,
        plan.dphidX,
        plan.vols,
        plan.mass_coeff,
        plan.mu,
        plan.lam,
        plan.model_id,
        plan.free_mask,
        *coarse_args,
    )
    x_new = x_new.reshape(-1, d)
    if bdf is not None:
        # BDF velocity recovery v = (x - sum_i a_i x_{n-i}) / (beta h)
        # (BDF.cpp:16-27); same formula bdf_update applies when the caller
        # pushes x_new into the history.
        v_new = (x_new - bdfmod._weighted(bdf.x_hist, bdf.order)) / h
    else:
        v_new = (x_new - x) / h
    # multipliers are cleared at step end (MixedCollision/MixedStretch
    # post_solve semantics)
    return x_new, v_new, s_new, jnp.zeros_like(la_new), iters, dec, cg_total
