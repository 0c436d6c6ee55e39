"""Newton/SQP implicit time stepper — the jitted hot path.

Reference: src/optimizers/newton_optimizer.cpp:14-118 (step), 120-157
(update_system), 159-171 (substep) and src/linesearch.h:78-129 (plain
backtracking, accept when E(a) < E(0)). One call = one implicit BDF step:

  pre_solve -> [ update -> linear solve (PCG) -> local (ds, la) ->
                 line search ] x <= outer_steps -> scripted BC update ->
  BDF history push -> la = 0

The Newton loop, the PCG solve and the line search are lax.while_loops, so
the whole timestep is a single XLA computation. Per-iteration diagnostics
(energy, residual, decrement, alpha, CG iters) are written into fixed-size
stat arrays matching the reference's OptimizerData table.
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp

from mixedfem_tpu.bc import boundary_conditions as bcmod
from mixedfem_tpu.bc import press as pressmod
from mixedfem_tpu.collision import accd as accdmod
from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.integrators import bdf as bdfmod
from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.ops import brick as brickmod
from mixedfem_tpu.ops import stencil as stmod
from mixedfem_tpu.solvers import admm as admmmod
from mixedfem_tpu.solvers import coarse as coarsemod
from mixedfem_tpu.solvers import dual as dualmod
from mixedfem_tpu.solvers import factory as solver_factory
from mixedfem_tpu.solvers import gauss_seidel as gsmod
from mixedfem_tpu.solvers import laplacian as lapmod
from mixedfem_tpu.solvers import minres as mrmod
from mixedfem_tpu.solvers import operator as opmod
from mixedfem_tpu.solvers import pcg as pcgmod
from mixedfem_tpu.variables import collision as vcol
from mixedfem_tpu.variables import displacement as disp
from mixedfem_tpu.variables import friction as fric
from mixedfem_tpu.variables import mixed_collision as mc
from mixedfem_tpu.variables import mixed_stretch as ms
from mixedfem_tpu.variables import stretch as vstretch
from mixedfem_tpu.variables.mixed_collision import ContactFrames


@flax.struct.dataclass
class StepStats:
    """Per-Newton-iteration diagnostics (fixed-size: outer_steps slots)."""

    energy: jnp.ndarray      # (outer,)
    energy_res: jnp.ndarray  # (outer,)
    decrement: jnp.ndarray   # (outer,)
    alpha: jnp.ndarray       # (outer,)
    solver_iters: jnp.ndarray  # (outer,) int32
    solver_error: jnp.ndarray  # (outer,)
    vanilla_grad: jnp.ndarray  # (outer,) ||vanilla-FEM gradient|| at iterate
    iterations: jnp.ndarray  # scalar int32: Newton iterations taken


@flax.struct.dataclass
class SimState:
    x: jnp.ndarray    # (nv, d) current positions (fixed rows = BC script)
    s: jnp.ndarray    # (E, N) mixed stretch
    la: jnp.ndarray   # (E, N) multipliers
    bdf: bdfmod.BDFState
    bc_states: Tuple[bcmod.BCState, ...]
    contact: ContactFrames  # padded per-step candidates (capacity may be 0)
    press_states: Tuple[pressmod.PressState, ...]
    step_count: jnp.ndarray  # scalar int32
    stats: StepStats
    # cached dense coarse inverse (ncd, ncd) when coarse_refresh_every > 1;
    # (0, 0) otherwise
    precond: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0, 0))
    )
    # per-element rotation cache (E, 3, 3) when
    # config.rotation_warm_start; (0, 3, 3) otherwise
    R: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.zeros((0, 3, 3))
    )


def empty_contact(dtype, capacity: int = 0) -> ContactFrames:
    return ContactFrames(
        frames=jnp.zeros((capacity, 4), jnp.int32),
        ftype=jnp.full((capacity,), 3, jnp.int32),  # PP inert
        fmask=jnp.zeros((capacity,), dtype),
    )


def _empty_stats(outer: int, dtype) -> StepStats:
    z = jnp.zeros((outer,), dtype)
    return StepStats(
        energy=z,
        energy_res=z,
        decrement=z,
        alpha=z,
        solver_iters=jnp.zeros((outer,), jnp.int32),
        solver_error=z,
        vanilla_grad=z,
        iterations=jnp.zeros((), jnp.int32),
    )


def init_state(
    mesh: meshmod.MeshData,
    config: SimConfig,
    bc_states: Tuple[bcmod.BCState, ...],
    x0: jnp.ndarray,
    v0: jnp.ndarray,
    press_states: Tuple[pressmod.PressState, ...] = (),
) -> SimState:
    s0, la0 = ms.reset(mesh, x0)
    bdf = bdfmod.bdf_init(config.integrator, x0, v0, config.h)
    R0 = jnp.zeros((0, 3, 3), x0.dtype)
    if (
        config.rotation_warm_start
        and mesh.dim == 3
        and "mixed-stretch" in config.mixed_variables
    ):
        _, R0 = ms.stretch_of_x(mesh, x0)
    return SimState(
        R=R0,
        x=x0,
        s=s0,
        la=la0,
        bdf=bdf,
        bc_states=tuple(bc_states),
        contact=empty_contact(x0.dtype, 0),
        press_states=tuple(press_states),
        step_count=jnp.zeros((), jnp.int32),
        stats=_empty_stats(config.outer_steps, x0.dtype),
    )


def mixed_contact_merit(
    cf, x_t, cd_t, act_prev_mask, cla, dhat, kappa, dtype,
    mesh=None, ee_mollifier=False,
):
    """Mixed-IPC contact terms of the merit function at a trial point:
    barrier on trial mixed distances (newly violating candidates join with
    d = D(x_t)) + the constraint term la . (D - d) over the active set
    (MixedCollision::energy + constraint_value, mixed_collision.cpp:12-85)."""
    from mixedfem_tpu.collision import distances as cdist

    verts = x_t[cf.frames]
    D_t = cdist.frame_distance(verts, cf.ftype)
    act_prev = act_prev_mask > 0
    d_eff = jnp.where(act_prev, cd_t, D_t)
    act = jnp.logical_or(
        act_prev, jnp.logical_and(D_t < dhat, cf.fmask > 0)
    )
    m_t = None
    if ee_mollifier and mesh is not None and mesh.dim == 3:
        from mixedfem_tpu.collision import mollifier as mol

        m_t = mol.mollifier(
            verts, cf.ftype, mol.eps_x(mesh.V0[cf.frames])
        )
    e = mc.energy(d_eff, act.astype(dtype), dhat, kappa, dtype, m=m_t)
    m = jnp.logical_and(
        act_prev, jnp.logical_or(D_t <= dhat, cd_t <= dhat)
    ).astype(dtype)
    return e + jnp.sum(cla * (D_t - cd_t) * m)


def _total_energy(mesh, bdf, h2, x, s, la, use_mixed, use_vanilla,
                  Sv=None):
    """The merit function of the line search (newton_optimizer.cpp:63-78):
    inertia + h^2 psi(s) + la . c(x, s) [+ h^2 psi(F) for vanilla vars].

    `Sv` short-circuits the F-rebuild + polar inside constraint_value when
    S(x) is already known at this exact x (the update just computed it) —
    bitwise identical, saves one polar pipeline per Newton iteration."""
    E = disp.energy(mesh, bdf, x)
    if use_mixed:
        E = E + h2 * ms.energy(mesh, s) + ms.constraint_value(
            mesh, x, s, la, Sv=Sv
        )
    if use_vanilla:
        E = E + h2 * vstretch.energy(mesh, x)
    return E


@functools.partial(jax.jit, static_argnames=("config",))
def newton_step(
    mesh: meshmod.MeshData,
    config: SimConfig,
    bc_specs: Tuple[bcmod.BCSpec, ...],
    state: SimState,
    coarse: coarsemod.CoarseSpace | None = None,
    press_specs: Tuple[pressmod.PressSpec, ...] = (),
    matvec_plan: opmod.GatherPlan | None = None,
    gs_plan: gsmod.GSPlan | None = None,
) -> SimState:
    """One implicit BDF timestep. `coarse` enables the two-level
    rigid-body-coarse preconditioner (solvers/coarse.py); `matvec_plan`
    (opmod.build_gather_plan) switches the CG matvec to the gather-only
    adjacency form (no scatter in the inner loop); `gs_plan`
    (gsmod.build_gs_plan) is required by the 'gauss-seidel' solve path."""
    dt = bdfmod.bdf_dt(state.bdf)
    h2 = dt * dt
    dtype = state.x.dtype
    outer = config.outer_steps
    use_mixed = "mixed-stretch" in config.mixed_variables
    use_vanilla = "stretch" in config.variables

    cf = state.contact
    have_frames = cf.frames.shape[0] > 0
    use_contact = "mixed-collision" in config.mixed_variables and have_frames
    use_vcollision = "collision" in config.variables and have_frames
    use_friction = "friction" in config.variables and have_frames
    dhat, kappa = config.dhat, config.kappa

    # Solve-path selection (the reference's linear_solver factory vocabulary,
    # linear_solver_factory.cpp:24-226, resolved to internal path names).
    solver = solver_factory.resolve_solver(config.solver)
    if solver in ("direct", "pcg-ic", "amgcl"):
        raise ValueError(
            f"config.solver='{solver}' is a host path "
            "(optimizer/newton_direct.py; Simulation.step routes there) — "
            "newton_step compiles only the on-device iterative paths"
        )
    if solver in ("minres-kkt", "minres-kkt-admm", "dual-cg", "admm"):
        if not use_mixed:
            raise NotImplementedError(f"{solver} requires mixed-stretch")
    if solver in ("admm", "minres-kkt-admm") and (
        use_vanilla or use_friction or use_vcollision
    ):
        # the reference asserts state_->vars_.size() == 0 on this path
        # (preconditioners.h:212): nodal variables are rejected (the same
        # ADMMPreconditioner object backs minres-indefinite-admm)
        raise NotImplementedError(
            "the ADMM iteration handles mixed variables only "
            "(the reference asserts vars_.size()==0)"
        )
    if solver in ("pcg-laplacian", "pcg-dualascent") and not use_mixed:
        # the reference throws "Using ARAP preconditioner without mixed
        # vars" (laplacian_preconditioner.h:29-31)
        raise NotImplementedError(f"{solver} requires mixed-stretch")
    if solver == "gauss-seidel" and gs_plan is None:
        raise ValueError(
            "solver 'gauss-seidel' needs a vertex coloring: pass "
            "gs_plan=gauss_seidel.build_gs_plan(mesh.T, mesh.nv)"
        )
    if solver == "dual-cg" and (use_vanilla or use_friction or use_vcollision):
        # The dual Schur eliminates dx through the LUMPED mass alone
        # (linear_system.h:131-134); nodal Hessians (vanilla stretch /
        # friction) cannot be folded into that elimination. The
        # reference has the same structural restriction.
        raise NotImplementedError(
            "dual-cg eliminates dx via the lumped mass; nodal-Hessian "
            "variables (stretch/friction) need 'pcg' or 'minres-kkt'"
        )

    # f64 islands for the cancellation-limited pieces (config.rhs_precision)
    hp = config.rhs_precision == "float64" and dtype != jnp.float64
    if hp:
        if use_vcollision or use_friction:
            raise NotImplementedError(
                "rhs_precision='float64' covers the mixed variables "
                "(stretch + mixed contact); nodal collision/friction "
                "variables run f32 — use dtype='float64' for those"
            )
        if solver not in (
            "pcg", "pcg-block-jacobi", "pcg-diag",
            "pcg-laplacian", "pcg-dualascent",
        ):
            raise NotImplementedError(
                "rhs_precision='float64' is implemented for the condensed "
                "pcg paths (use dtype='float64' for the full-KKT paths)"
            )
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "rhs_precision='float64' requires jax_enable_x64"
            )

        def _up(t):
            return jax.tree.map(
                lambda a: a.astype(jnp.float64)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                t,
            )

        mesh_hp = _up(mesh)
        bdf_hp = _up(state.bdf)

    # dynamic external forces (MechanicalPress controllers)
    press_ext = jnp.zeros_like(state.x)
    for spec, pst in zip(press_specs, state.press_states):
        press_ext = press_ext + pressmod.press_force(
            spec, pst, mesh.nv, mesh.dim
        )
    mesh = mesh.replace(ext_force=mesh.ext_force + press_ext)

    target = disp.target(mesh, state.bdf, blend=config.inertia_blend_factor)

    # Laplacian preconditioner setup (solvers/laplacian.py): rest-state
    # factored rows of L and hoisted power-iteration spectral estimates
    # for M and L separately — the per-Newton Chebyshev bound
    # lmax(M + kL) <= lmax(M) + k lmax(L) is then algebraic.
    if solver in ("pcg-laplacian", "pcg-dualascent"):
        GwL = lapmod.laplacian_rows(mesh)
        lap_lmax_m = lapmod.power_lmax(
            lambda p: lapmod.ml_matvec(mesh, GwL, 0.0, p),
            state.x.shape, dtype,
        )
        lap_lmax_l = lapmod.power_lmax(
            lambda p: lapmod.ml_matvec(mesh, GwL, 1.0, p, mass_scale=0.0),
            state.x.shape, dtype,
        )

    # Lagged friction set from the PRE-step positions (Friction::pre_solve)
    if use_friction:
        ffr = fric.build(mesh, cf, state.x, dhat, kappa)
        epsv_h = config.espv * dt

    # Two-level coarse preconditioner: assemble + invert ONCE per step from
    # the initial iterate (the reference refactors its preconditioners once
    # per outer cycle too, preconditioners.h:94-102). Newton updates change
    # H mildly within a step; the preconditioner only affects CG iteration
    # counts, not solutions.
    if solver != "pcg":
        coarse = None  # only the default pcg path uses the two-level precond
    precond_out = state.precond
    if coarse is not None:
        refresh_every = max(config.coarse_refresh_every, 1)

        def _build_precond():
            coeffs0 = (
                ms.update(mesh, state.x, state.s, dt) if use_mixed else None
            )
            contact0 = None
            if use_contact:
                z = jnp.zeros((cf.frames.shape[0],), dtype)
                cc0 = mc.update(
                    mesh, cf, state.x, z, z, z, dhat, kappa,
                    ee_mollifier=config.ee_mollifier,
                )
                contact0 = (cf.frames, cc0.Gx, cc0.H, cc0.active)
            Ac = coarsemod.coarse_matrix(mesh, coarse, coeffs0, contact0)
            if config.coarse_inverse_method == "newton-schulz":
                # warm start from the cached inverse when one exists (the
                # spectral safeguard inside rejects stale/zero caches)
                X0 = (
                    state.precond
                    if state.precond.shape[0] == coarse.ncd
                    else None
                )
                return coarsemod.coarse_inverse_ns(Ac, X0)
            return coarsemod.coarse_inverse(Ac)

        if refresh_every > 1 and state.precond.shape[0] == coarse.ncd:
            Ac_inv = jax.lax.cond(
                state.step_count % refresh_every == 0,
                _build_precond,
                lambda: state.precond,
            )
            precond_out = Ac_inv
        else:
            Ac_inv = _build_precond()
            if refresh_every > 1:
                precond_out = Ac_inv

    warm_R = (
        config.rotation_warm_start
        and use_mixed
        and mesh.dim == 3
        and state.R.shape[0] == mesh.T.shape[0]
    )

    # Feature-major fast path (ops/rows.py): on structured-grid 3D solid
    # mixed-stretch steps the ENTIRE per-Newton pipeline — corner gather,
    # polar, ds/dF, material derivatives, PSD fix, W assembly, rhs,
    # local solve, and an alpha-parametrized line-search merit — runs on
    # (feature, E) rows with the element batch on the lane axis. The
    # element-major pipeline measured 56 ms of per-Newton fixed work at
    # 100k tets (~95% layout overhead, tools/attribute.py); this path
    # removes every (E, small, small) tensor from the hot loop.
    use_stencil_rows = (
        isinstance(matvec_plan, stmod.StencilPlan)
        and use_mixed
        and not use_vanilla
        and not mesh.shell
        and not mesh.rod
        and mesh.dim == 3
        and mesh.T.shape[1] == 4
        and not hp
        and solver in ("pcg", "pcg-block-jacobi")
        and not (use_contact or use_vcollision or use_friction)
        and (coarse is None or coarse.grid is not None)
        and not warm_R
        and not config.record_vanilla_gradient
        # the merit's inertia term uses blend=1 (displacement.energy);
        # the row path folds target into one lattice vector, so require
        # the gradient target (blend=cfg) to coincide with it
        and config.inertia_blend_factor == 1.0
    )
    if use_stencil_rows:
        from mixedfem_tpu.ops import rows as rowsmod
        from mixedfem_tpu.ops import sym as symmod

        plan_r = matvec_plan
        E_, k_ = mesh.T.shape
        # per-step hoists (static per mesh/step; the two transposes below
        # are the ONLY element-major layout conversions on this path)
        dphi_rows = mesh.dphidX.reshape(E_, 3 * k_).T        # (12, E)
        mass_rows = mesh.mass_coeff.reshape(E_, k_ * k_).T   # (16, E)
        target_l = stmod.to_lat(plan_r, target)              # (3, npad)
        targ_e = stmod.gather_corners_lat(plan_r, target_l)  # (12, E)
        fm_l_row = stmod.to_lat(
            plan_r,
            jnp.broadcast_to(
                mesh.free_mask[:, None], (mesh.nv, 3)
            ).astype(dtype),
        )
        wsym_r = symmod.sym_weights(3, dtype=dtype)
        syminv_r = symmod.syminv_weights(3, dtype=dtype)

        def _F_rows(corners):
            """(12, E) corner rows -> 9 deformation-gradient rows."""
            return [
                sum(corners[3 * kk + r] * dphi_rows[3 * kk + c]
                    for kk in range(k_))
                for r in range(3) for c in range(3)
            ]

        def _mass_rows_apply(corners):
            """Consistent-mass contraction on corner rows: (12,)->(12,)."""
            return [
                sum(mass_rows[k_ * kk + l] * corners[3 * l + r]
                    for l in range(k_))
                for kk in range(k_) for r in range(3)
            ]

    def _newton_body_rows(carry):
        x, s_r, la_r, cd, cla, cact, it, E_prev, dec, res, stats, Rcur = carry
        x_l = stmod.to_lat(plan_r, x)
        xe = stmod.gather_corners_lat(plan_r, x_l)          # (12, E)
        F = _F_rows(xe)
        s_list = [s_r[i] for i in range(6)]
        cr = ms.update_rows(
            F, s_list, dphi_rows, mesh.vols, mesh.mu, mesh.lam,
            mesh.model_id, mesh.models, dt,
        )
        G, Gw, H, g6, Sv = cr["G"], cr["Gw"], cr["H"], cr["g"], cr["Sv"]
        W_st = stmod.assemble_W_from_rows(
            plan_r, jnp.stack(Gw), mass_rows, N=6, k=k_, d=3
        )
        blocks = stmod.diag_blocks(plan_r, W_st)

        # rhs rows: contrib = -vol G^T (H (Sv - s) + g)  (ms.rhs_contrib)
        dsv = [Sv[i] - s_list[i] for i in range(6)]
        y6 = rowsmod.symmatvec6_rows(H, dsv)
        y6 = [y6[i] + g6[i] for i in range(6)]
        rhs12 = [
            -mesh.vols * sum(G[12 * i + a] * y6[i] for i in range(6))
            for a in range(3 * k_)
        ]
        diffe = [xe[a] - targ_e[a] for a in range(3 * k_)]
        mg12 = _mass_rows_apply(diffe)
        Min_l = stmod.scatter_rows_lat(plan_r, jnp.stack(mg12), 3)
        rhs_l = stmod.scatter_rows_lat(plan_r, jnp.stack(rhs12), 3)
        b_l = (rhs_l - Min_l) * fm_l_row

        # two-level / block-Jacobi lattice CG (same solve as the
        # element-major stencil branch below)
        eye_d = jnp.eye(3, dtype=dtype)
        maskv = mesh.free_mask[:, None, None]
        blocks_reg = blocks * maskv + eye_d * (1.0 - maskv)
        binv = pcgmod._small_inv(blocks_reg) * maskv
        Minv_lat = stmod.lattice_two_level_preconditioner(
            plan_r, coarse, mesh.free_mask, binv, 3
        )
        if coarse is not None:
            def Minv_l(rl):
                return Minv_lat(rl, Ac_inv)
        else:
            Minv_l = Minv_lat

        def A_l(pl_):
            return stmod.matvec_lat(plan_r, W_st, pl_) * fm_l_row

        dx0_l = (target_l - x_l) * fm_l_row
        dx_l, cg_iters, cg_err = pcgmod.pcg(
            A_l, b_l, dx0_l, Minv_l,
            max_iters=config.max_iterative_solver_iters,
            tol=config.itr_tol,
        )

        # local recovery rows (ms.local_solve)
        dxe = stmod.gather_corners_lat(plan_r, dx_l)
        ds6 = [
            dsv[i] + sum(G[12 * i + a] * dxe[a] for a in range(3 * k_))
            for i in range(6)
        ]
        hds = rowsmod.symmatvec6_rows(H, ds6)
        la6 = [syminv_r[i] * (hds[i] + g6[i]) for i in range(6)]
        dec_new = jnp.maximum(
            jnp.max(jnp.abs(dx_l)), jnp.max(jnp.abs(jnp.stack(ds6)))
        )

        # alpha-parametrized merit: def_grad is LINEAR in x, so
        # F(x + a dx) = F + a dF with dF hoisted out of the line-search
        # loop, and the inertia term is an exact quadratic in a — each
        # trial evaluation is one rows-polar + psi + dots, no gathers.
        diff_l = x_l - target_l
        E_in0 = 0.5 * jnp.vdot(diff_l, Min_l)
        gin = jnp.vdot(Min_l, dx_l)
        Mdx_l = stmod.scatter_rows_lat(
            plan_r, jnp.stack(_mass_rows_apply(dxe)), 3
        )
        dxMdx = jnp.vdot(dx_l, Mdx_l)
        dF = _F_rows(dxe)

        def merit_alpha(a):
            s_a = [s_list[i] + a * ds6[i] for i in range(6)]
            Fa = [F[q] + a * dF[q] for q in range(9)]
            _, Sva = rowsmod.polar33_rows(Fa)
            psi = rowsmod.psi_rows(
                s_a, mesh.mu, mesh.lam, mesh.model_id, mesh.models
            )
            constr = jnp.sum(
                mesh.vols
                * sum(wsym_r[i] * la6[i] * (Sva[i] - s_a[i])
                      for i in range(6))
            )
            return (
                E_in0 + a * gin + 0.5 * a * a * dxMdx
                + h2 * jnp.sum(mesh.vols * psi) + constr
            )

        # base-point merit reuses Sv (same x -> identical polar)
        psi0 = rowsmod.psi_rows(
            s_list, mesh.mu, mesh.lam, mesh.model_id, mesh.models
        )
        E = (
            E_in0 + h2 * jnp.sum(mesh.vols * psi0)
            + jnp.sum(
                mesh.vols
                * sum(wsym_r[i] * la6[i] * dsv[i] for i in range(6))
            )
        )
        res_new = jnp.abs((E - E_prev) / (E + 1e-6))

        if config.ls_strict:
            eps_E = jnp.zeros((), dtype)
        else:
            eps_E = 16.0 * jnp.finfo(dtype).eps * jnp.abs(E)

        def ls_cond(c):
            a, k = c
            return jnp.logical_and(
                k < config.ls_iters, merit_alpha(a) >= E + eps_E
            )

        def ls_body(c):
            a, k = c
            return (a * 0.5, k + 1)

        alpha, ls_k = jax.lax.while_loop(
            ls_cond, ls_body,
            (jnp.asarray(1.0, dtype), jnp.zeros((), jnp.int32)),
        )
        accept = (ls_k < config.ls_iters).astype(dtype)
        x_new = x + accept * alpha * stmod.from_lat(plan_r, dx_l)
        s_new = jnp.stack(
            [s_list[i] + accept * alpha * ds6[i] for i in range(6)]
        )
        la_new = jnp.stack(la6)

        stats = stats.replace(
            energy=stats.energy.at[it].set(E),
            energy_res=stats.energy_res.at[it].set(res_new),
            decrement=stats.decrement.at[it].set(dec_new),
            alpha=stats.alpha.at[it].set(alpha),
            solver_iters=stats.solver_iters.at[it].set(cg_iters),
            solver_error=stats.solver_error.at[it].set(cg_err),
            vanilla_grad=stats.vanilla_grad.at[it].set(
                jnp.zeros((), dtype)
            ),
            iterations=it + 1,
        )
        return (
            x_new, s_new, la_new, cd, cla, cact,
            it + 1, E, dec_new, res_new, stats, Rcur,
        )

    def newton_cond(carry):
        x, s, la, cd, cla, cact, it, E_prev, dec, res, stats, Rcur = carry
        return jnp.logical_and(
            it < outer,
            jnp.logical_and(dec > config.newton_tol, res > 1e-12),
        )

    def newton_body(carry):
        if use_stencil_rows:
            return _newton_body_rows(carry)
        x, s, la, cd, cla, cact, it, E_prev, dec, res, stats, Rcur = carry

        # --- update_system: rotations, derivatives (mixed_stretch.update)
        # Banded Pallas assembly for the once-per-Newton scatters too
        # (inertia gradient, rhs, block-Jacobi blocks) when a plan exists.
        use_bassemble = (
            isinstance(
                matvec_plan,
                (opmod.BandedPlan, brickmod.BrickPlan, stmod.StencilPlan),
            )
            and not mesh.shell
            and not hp
        )
        if isinstance(matvec_plan, stmod.StencilPlan):
            _E, _k = mesh.T.shape

            def bassemble(contrib):
                """(E, k, ...) corner contributions -> (nv, ...) via the
                static masked window-adds of the grid stencil plan."""
                m = 1
                for sdim in contrib.shape[2:]:
                    m *= sdim
                out = stmod.scatter_vec(
                    matvec_plan, contrib.reshape(_E, _k, m)
                )
                return out.reshape((mesh.nv,) + contrib.shape[2:])
        elif isinstance(matvec_plan, brickmod.BrickPlan):
            _E, _k = mesh.T.shape

            def bassemble(contrib):
                """(E, k, ...) corner contributions -> (nv, ...) via the
                fused windowed brick scatter."""
                m = 1
                for sdim in contrib.shape[2:]:
                    m *= sdim
                out = brickmod.from_brick(
                    brickmod.brick_scatter(
                        matvec_plan, contrib.reshape(_E, _k, m)
                    ),
                    mesh.nv, m,
                )
                return out.reshape((mesh.nv,) + contrib.shape[2:])
        elif use_bassemble:
            from mixedfem_tpu.ops import pallas_scatter as psc

            _Ekk = mesh.T.shape[0] * mesh.T.shape[1]
            _Rp = matvec_plan.lidx.shape[0]

            def bassemble(contrib):
                rows = contrib.reshape(_Ekk, -1)
                if _Rp > _Ekk:
                    rows = jnp.concatenate(
                        [
                            rows,
                            jnp.zeros((_Rp - _Ekk, rows.shape[1]), rows.dtype),
                        ],
                        axis=0,
                    )
                return psc.scatter_add_sorted(matvec_plan, rows)

        eye = jnp.eye(mesh.dim, dtype=dtype)
        if hp:
            x64 = x.astype(jnp.float64)
            s64 = s.astype(jnp.float64)
            inertia_grad64 = disp.gradient(
                mesh_hp, bdf_hp, x64, blend=config.inertia_blend_factor
            )
            inertia_grad = inertia_grad64.astype(dtype)
            b64 = -inertia_grad64
        elif use_bassemble:
            inertia_grad = meshmod.project_free(
                mesh,
                bassemble(
                    disp.gradient_contrib(
                        mesh, state.bdf, x, blend=config.inertia_blend_factor
                    )
                ),
            )
            b = -inertia_grad
        else:
            inertia_grad = disp.gradient(
                mesh, state.bdf, x, blend=config.inertia_blend_factor
            )
            b = -inertia_grad
        blocks = mesh.mass_diag[:, None, None] * eye

        if use_mixed:
            if hp:
                coeffs_hp = ms.update(
                    mesh_hp, x64, s64, dt,
                    R_prev=Rcur.astype(jnp.float64) if warm_R else None,
                )
                coeffs = jax.tree.map(
                    lambda a: a.astype(dtype), coeffs_hp
                )
                b64 = b64 + ms.rhs(mesh_hp, coeffs_hp, s64)
            else:
                coeffs = ms.update(
                    mesh, x, s, dt, R_prev=Rcur if warm_R else None
                )
                if use_bassemble:
                    b = b + meshmod.project_free(
                        mesh, bassemble(ms.rhs_contrib(mesh, coeffs, s))
                    )
                else:
                    b = b + ms.rhs(mesh, coeffs, s)
            if isinstance(matvec_plan, stmod.StencilPlan) and not hp:
                # assemble the offset-form blocks here and use their o=0
                # plane as the (exact) block-Jacobi diagonal — replaces
                # the lumped-mass + stretch-diag approximation AND the
                # separate diag scatter
                W_st = stmod.assemble_W(
                    matvec_plan, coeffs.Gw, mesh.mass_coeff
                )
                blocks = stmod.diag_blocks(matvec_plan, W_st)
            elif use_bassemble and not hp:
                blocks = blocks + bassemble(
                    ms.diag_blocks_contrib(mesh, coeffs)
                ).reshape(mesh.nv, mesh.dim, mesh.dim)
            else:
                blocks = blocks + ms.diag_blocks(mesh, coeffs)
        if use_contact and hp:
            # f64 island for the contact rhs/local-solve: the barrier g/H
            # and the D - d residual are the cancellation-limited pieces
            # (the reference runs the whole contact solve in f64,
            # mixed_collision.cpp:216-323)
            ccoeffs_hp = mc.update(
                mesh_hp, cf, x64,
                cd.astype(jnp.float64), cla.astype(jnp.float64),
                cact.astype(jnp.float64), dhat, kappa,
                ee_mollifier=config.ee_mollifier,
            )
            ccoeffs = jax.tree.map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                ccoeffs_hp,
            )
            b64 = b64 + mc.rhs(mesh_hp, cf, ccoeffs_hp)
        if hp:
            b = b64.astype(dtype)
        if use_vanilla:
            vcoeffs = vstretch.update(mesh, x, dt)
            b = b - vstretch.gradient(mesh, vcoeffs)
            blocks = blocks + vstretch.diag_blocks(mesh, vcoeffs)
        if use_contact:
            if not hp:
                ccoeffs = mc.update(
                    mesh, cf, x, cd, cla, cact, dhat, kappa,
                    ee_mollifier=config.ee_mollifier,
                )
                b = b + mc.rhs(mesh, cf, ccoeffs)
            blocks = blocks + mc.diag_blocks(mesh, cf, ccoeffs)
        if use_vcollision:
            vccoeffs = vcol.update(cf, x, dhat, kappa)
            b = b - vcol.gradient(mesh, cf, vccoeffs)
            blocks = blocks + vcol.diag_blocks(mesh, cf, vccoeffs)
        if use_friction:
            fcoeffs = fric.update(ffr, x, config.contact_mu, epsv_h)
            b = b - fric.gradient(mesh, ffr, fcoeffs)
            blocks = blocks + fric.diag_blocks(mesh, ffr, fcoeffs)

        # --- matrix-free condensed SPD operator + block-Jacobi preconditioner
        # (mass + element blocks fused into one gather/scatter pass)
        use_brick = (
            isinstance(matvec_plan, brickmod.BrickPlan)
            and use_mixed
            and not use_vanilla
            and not mesh.shell
        )
        use_stencil = (
            isinstance(matvec_plan, stmod.StencilPlan)
            and use_mixed
            and not use_vanilla
            and not mesh.shell
        )
        use_plan = (
            matvec_plan is not None
            and not mesh.shell
            and not use_brick
            and not use_stencil
        )
        plan_fn = (
            opmod.banded_matvec
            if isinstance(matvec_plan, opmod.BandedPlan)
            else opmod.gather_matvec
        )

        def _extra_matvec(p):
            out = None
            if use_contact:
                out = mc.matvec(mesh, cf, ccoeffs, p)
            if use_vcollision:
                y = vcol.matvec(mesh, cf, vccoeffs, p)
                out = y if out is None else out + y
            if use_friction:
                y = fric.matvec(mesh, ffr, fcoeffs, p)
                out = y if out is None else out + y
            return out

        if use_brick:
            # the fused single-kernel CG matvec (ops/brick.py): the whole
            # gather->block-product->scatter runs as ONE Pallas program on
            # brick-layout vectors
            Gw_rows, m_rows = brickmod.element_rows(mesh, coeffs)
            Gw_rows = brickmod.pad_rows(matvec_plan, Gw_rows)
            m_rows = brickmod.pad_rows(matvec_plan, m_rows)
        if use_stencil and hp:
            # (non-hp stencil steps assembled W at the diag-blocks stage)
            W_st = stmod.assemble_W(
                matvec_plan, coeffs.Gw, mesh.mass_coeff
            )

        def A(p):
            if use_stencil:
                out = stmod.stencil_matvec(
                    matvec_plan, W_st, p
                ) * mesh.free_mask[:, None]
            elif use_brick:
                out = brickmod.from_brick(
                    brickmod.brick_matvec(
                        matvec_plan, Gw_rows, m_rows,
                        brickmod.to_brick(p, matvec_plan.Hpad), mesh.dim,
                        scheme=config.matvec_scheme,
                    ),
                    mesh.nv, mesh.dim,
                ) * mesh.free_mask[:, None]
            elif use_plan:
                out = plan_fn(
                    mesh,
                    matvec_plan,
                    p,
                    ms_coeffs=coeffs if use_mixed else None,
                    v_coeffs=vcoeffs if use_vanilla else None,
                )
            else:
                out = opmod.element_matvec(
                    mesh,
                    p,
                    ms_coeffs=coeffs if use_mixed else None,
                    v_coeffs=vcoeffs if use_vanilla else None,
                )
            extra = _extra_matvec(p)
            if extra is not None:
                out = out + extra
            return out

        # Brick-resident CG: when the fused matvec kernel is active and no
        # extra (contact/friction) terms need vertex-layout products, the
        # WHOLE CG loop — matvec, block-Jacobi, two-level coarse apply,
        # dots, axpys — runs on brick-layout vectors; the (nv, d) layout
        # round-trips (measured ~0.5 ms/iteration of pure data formatting
        # at 100k tets) happen once per solve instead of once per matvec.
        use_stencil_cg = (
            use_stencil
            and solver in ("pcg", "pcg-block-jacobi")
            and not (use_contact or use_vcollision or use_friction)
            and (coarse is None or coarse.grid is not None)
        )
        use_brick_cg = (
            use_brick
            and solver in ("pcg", "pcg-block-jacobi")
            and not (use_contact or use_vcollision or use_friction)
        )
        if use_stencil_cg:
            # Lattice-resident CG: vectors stay in the stencil's (d, npad)
            # feature-major layout for the whole solve — matvec, block-
            # Jacobi, two-level coarse apply, dots, axpys — with ONE
            # (nv, d) <-> lattice round trip per solve.
            eye_d = jnp.eye(mesh.dim, dtype=dtype)
            maskv = mesh.free_mask[:, None, None]
            blocks_reg = blocks * maskv + eye_d * (1.0 - maskv)
            binv = pcgmod._small_inv(blocks_reg) * maskv
            fm_l = stmod.to_lat(
                matvec_plan,
                jnp.broadcast_to(
                    mesh.free_mask[:, None], (mesh.nv, mesh.dim)
                ).astype(dtype),
            )
            Minv_lat = stmod.lattice_two_level_preconditioner(
                matvec_plan, coarse, mesh.free_mask, binv, mesh.dim
            )
            if coarse is not None:
                def Minv_l(rl):
                    return Minv_lat(rl, Ac_inv)
            else:
                Minv_l = Minv_lat

            def A_l(pl_):
                return (
                    stmod.matvec_lat(matvec_plan, W_st, pl_) * fm_l
                )

            dx0 = meshmod.project_free(mesh, target - x)
            dx_l, cg_iters, cg_err = pcgmod.pcg(
                A_l,
                stmod.to_lat(matvec_plan, b),
                stmod.to_lat(matvec_plan, dx0),
                Minv_l,
                max_iters=config.max_iterative_solver_iters,
                tol=config.itr_tol,
            )
            dx = stmod.from_lat(matvec_plan, dx_l)

            if use_mixed:
                if hp:
                    ds64, la64 = ms.local_solve(
                        mesh_hp, coeffs_hp, s64, dx.astype(jnp.float64)
                    )
                    ds, la_new = ds64.astype(dtype), la64.astype(dtype)
                else:
                    ds, la_new = ms.local_solve(mesh, coeffs, s, dx)
            else:
                ds, la_new = jnp.zeros_like(s), la
                if hp:
                    ds64 = jnp.zeros_like(s64)
                    la64 = la.astype(jnp.float64)
        elif use_brick_cg:
            Hpad = matvec_plan.Hpad
            eye_d = jnp.eye(mesh.dim, dtype=dtype)
            maskv = mesh.free_mask[:, None, None]
            blocks_reg = blocks * maskv + eye_d * (1.0 - maskv)
            binv = pcgmod._small_inv(blocks_reg) * maskv
            fm_b = brickmod.to_brick(
                jnp.broadcast_to(
                    mesh.free_mask[:, None], (mesh.nv, mesh.dim)
                ).astype(dtype),
                Hpad,
            )
            Minv_apply = coarsemod.brick_preconditioner(
                coarse, mesh.free_mask, binv, mesh.dim, Hpad
            )
            if coarse is not None:
                def Minv_b(rb):
                    return Minv_apply(rb, Ac_inv)
            else:
                Minv_b = Minv_apply

            def A_b(pb):
                return (
                    brickmod.brick_matvec(
                        matvec_plan, Gw_rows, m_rows, pb, mesh.dim,
                        scheme=config.matvec_scheme,
                    )
                    * fm_b
                )

            dx0 = meshmod.project_free(mesh, target - x)
            dx_b, cg_iters, cg_err = pcgmod.pcg(
                A_b,
                brickmod.to_brick(b, Hpad),
                brickmod.to_brick(dx0, Hpad),
                Minv_b,
                max_iters=config.max_iterative_solver_iters,
                tol=config.itr_tol,
            )
            dx = brickmod.from_brick(dx_b, mesh.nv, mesh.dim)

            if use_mixed:
                if hp:
                    ds64, la64 = ms.local_solve(
                        mesh_hp, coeffs_hp, s64, dx.astype(jnp.float64)
                    )
                    ds, la_new = ds64.astype(dtype), la64.astype(dtype)
                else:
                    ds, la_new = ms.local_solve(mesh, coeffs, s, dx)
            else:
                ds, la_new = jnp.zeros_like(s), la
                if hp:
                    ds64 = jnp.zeros_like(s64)
                    la64 = la.astype(jnp.float64)
        elif solver in (
            "pcg", "pcg-block-jacobi", "pcg-diag",
            "pcg-laplacian", "pcg-dualascent", "gauss-seidel",
        ):
            if solver in ("pcg-laplacian", "pcg-dualascent"):
                # (M + kL)^{-1} Chebyshev with the stress-rescaled
                # k = h^2 * max stress (rebuild_factorization(),
                # laplacian_preconditioner.h:67-82; coeffs.max_evals are
                # eigenvalues of H = h^2 psi'', so the h^2 is included)
                k_lap = jnp.max(coeffs.max_evals)
                ml_inv = lapmod.build_ml_preconditioner(
                    mesh, GwL, k_lap, lap_lmax_m, lap_lmax_l,
                    degree=config.lap_cheby_degree,
                )
                if solver == "pcg-dualascent" and use_contact:
                    bj = lapmod.da_apply(
                        ml_inv, mesh, cf, ccoeffs, iters=config.da_iters
                    )
                else:
                    # with no active frames the reference's DA solve is
                    # exactly the Laplacian solve
                    # (dual_ascent_preconditioner.h:163-166)
                    bj = ml_inv
            elif solver == "pcg-diag":
                # scalar Jacobi (eigen-pcg-diag semantics)
                dvec = jnp.diagonal(blocks, axis1=-2, axis2=-1)
                dinv = jnp.where(dvec > 0, 1.0 / dvec, 1.0)

                def bj(r):
                    return r * dinv * mesh.free_mask[:, None]
            else:
                bj = pcgmod.block_jacobi_inv(blocks, mesh.free_mask)
            if coarse is not None:
                _tl = coarsemod.two_level_preconditioner(
                    coarse, mesh.free_mask, bj, mesh.dim
                )

                def Minv(r):
                    return _tl(r, Ac_inv)
            else:
                Minv = bj

            # Warm start: explicit-Euler prediction
            # (eigen_iterative_solver.h:40-56)
            dx0 = meshmod.project_free(mesh, target - x)
            if solver == "gauss-seidel":
                # multicolor GS sweeps as the solver
                # (subspace-gauss_seidel, gauss_seidel.h:50-65)
                dx, cg_iters, cg_err = gsmod.gs_solve(
                    A, b, dx0, bj, gs_plan,
                    max_iters=config.max_iterative_solver_iters,
                    tol=config.itr_tol,
                )
            else:
                dx, cg_iters, cg_err = pcgmod.pcg(
                    A, b, dx0, Minv,
                    max_iters=config.max_iterative_solver_iters,
                    tol=config.itr_tol,
                )

            # --- local recovery of (ds, la) (SystemMatrixPD::post_solve)
            if use_mixed:
                if hp:
                    ds64, la64 = ms.local_solve(
                        mesh_hp, coeffs_hp, s64, dx.astype(jnp.float64)
                    )
                    ds, la_new = ds64.astype(dtype), la64.astype(dtype)
                else:
                    ds, la_new = ms.local_solve(mesh, coeffs, s, dx)
            else:
                ds, la_new = jnp.zeros_like(s), la
                if hp:
                    ds64 = jnp.zeros_like(s64)
                    la64 = la.astype(jnp.float64)
        else:
            # Full-system paths: (dx, ds, dlam[, dd, dlc]) solved together —
            # the reference's SystemMatrixIndefinite (minres-indefinite-*)
            # and DualCondensedSystem (subspace-*) post_solve unpacking,
            # with MixedCollision stacked into the system when present
            # (linear_system.h:65-118 stacks ALL mixed variables).
            kkt_cf = cf if use_contact else None
            kkt_cc = ccoeffs if use_contact else None
            extra_gx = None
            extra_mv = None
            if use_vanilla or use_vcollision or use_friction:
                gx = jnp.zeros_like(x)
                if use_vanilla:
                    gx = gx + vstretch.gradient(mesh, vcoeffs)
                if use_vcollision:
                    gx = gx + vcol.gradient(mesh, cf, vccoeffs)
                if use_friction:
                    gx = gx + fric.gradient(mesh, ffr, fcoeffs)
                extra_gx = gx

                def extra_mv(p):
                    out = jnp.zeros_like(p)
                    if use_vanilla:
                        out = out + vstretch.matvec(mesh, vcoeffs, p)
                    if use_vcollision:
                        out = out + vcol.matvec(mesh, cf, vccoeffs, p)
                    if use_friction:
                        out = out + fric.matvec(mesh, ffr, fcoeffs, p)
                    return out

            rhs_kkt = mrmod.kkt_rhs(
                mesh, state.bdf, coeffs, x, s, la,
                blend=config.inertia_blend_factor,
                cf=kkt_cf, cc=kkt_cc, extra_grad_x=extra_gx,
            )
            if solver in ("minres-kkt", "minres-kkt-admm"):
                Aop = mrmod.kkt_operator(
                    mesh, coeffs, cf=kkt_cf, cc=kkt_cc,
                    extra_x_matvec=extra_mv,
                )
                if solver == "minres-kkt-admm":
                    # minres-indefinite-admm: the ADMM iteration as the
                    # MINRES preconditioner (the reference pairs Eigen
                    # MINRES with ADMMPreconditioner in its factory)
                    Mk = admmmod.admm_preconditioner(
                        mesh, coeffs,
                        rho_scale=config.admm_rho_scale,
                        sweeps=config.admm_precond_sweeps,
                        inner_iters=config.admm_inner_iters,
                        cf=kkt_cf, cc=kkt_cc,
                    )
                else:
                    Mk = mrmod.kkt_block_diag_preconditioner(
                        mesh, coeffs, cf=kkt_cf, cc=kkt_cc
                    )
                u0 = tuple(jax.tree.map(jnp.zeros_like, rhs_kkt))
                sol, cg_iters, cg_err = mrmod.minres(
                    Aop, rhs_kkt, u0,
                    max_iters=config.max_iterative_solver_iters,
                    tol=config.itr_tol,
                    Minv=Mk,
                )
            elif solver == "admm":
                sol, cg_iters, cg_err = admmmod.solve_admm(
                    mesh, coeffs, rhs_kkt,
                    rho_scale=config.admm_rho_scale,
                    max_iters=config.max_iterative_solver_iters,
                    tol=config.itr_tol,
                    inner_iters=config.admm_inner_iters,
                    cf=kkt_cf, cc=kkt_cc,
                )
            else:  # dual-cg
                sol_all = dualmod.solve_dual(
                    mesh, coeffs, rhs_kkt,
                    max_iters=config.max_iterative_solver_iters,
                    tol=config.itr_tol,
                    cf=kkt_cf, cc=kkt_cc,
                )
                sol, cg_iters, cg_err = sol_all[:-2], sol_all[-2], sol_all[-1]
            if use_contact:
                dx, ds, dl, kkt_dd, kkt_dlc = sol
            else:
                dx, ds, dl = sol
            la_new = la + dl

        if use_mixed:
            dec_new = jnp.maximum(jnp.max(jnp.abs(dx)), jnp.max(jnp.abs(ds)))
        else:
            dec_new = jnp.max(jnp.abs(dx))
        if use_contact:
            if solver in ("minres-kkt", "minres-kkt-admm", "dual-cg", "admm"):
                # full-system paths carry (dd, dlc) as unknowns — unpack
                # them directly (linear_system.h:89-100 post_solve)
                cdd = kkt_dd * ccoeffs.active
                cla_new = (ccoeffs.la + kkt_dlc) * ccoeffs.active
            elif hp:
                cdd64, cla64_new = mc.local_solve(
                    mesh_hp, cf, ccoeffs_hp, dx.astype(jnp.float64)
                )
                cdd, cla_new = cdd64.astype(dtype), cla64_new.astype(dtype)
            else:
                cdd, cla_new = mc.local_solve(mesh, cf, ccoeffs, dx)
            cd_cur, cact_new = ccoeffs.d, ccoeffs.active
            dec_new = jnp.maximum(dec_new, jnp.max(jnp.abs(cdd)))
        else:
            cdd, cla_new = jnp.zeros_like(cd), cla
            cd_cur, cact_new = cd, cact

        def contact_energy(x_t, cd_t):
            """Contact terms of the merit function at a trial point."""
            e_tot = jnp.zeros((), dtype)
            if use_contact:
                e_tot = e_tot + mixed_contact_merit(
                    cf, x_t, cd_t, cact_new, cla_new, dhat, kappa, dtype,
                    mesh=mesh, ee_mollifier=config.ee_mollifier,
                )
            if use_vcollision:
                e_tot = e_tot + h2 * vcol.energy(cf, x_t, dhat, kappa, dt)
            if use_friction:
                e_tot = e_tot + h2 * fric.energy(
                    ffr, x_t, config.contact_mu, epsv_h, dt
                )
            return e_tot

        # --- energies + backtracking line search (linesearch.h:78-129)
        if hp:
            dx64 = dx.astype(jnp.float64)

            def merit64(a):
                e = _total_energy(
                    mesh_hp, bdf_hp, h2, x64 + a * dx64,
                    s64 + a * ds64, la64, use_mixed, use_vanilla,
                )
                if use_contact:
                    e = e + mixed_contact_merit(
                        cf, x64 + a * dx64, ccoeffs_hp.d + a * cdd64,
                        cact_new, cla64_new, dhat, kappa, jnp.float64,
                        mesh=mesh_hp, ee_mollifier=config.ee_mollifier,
                    )
                return e

            E64_full = merit64(jnp.zeros((), jnp.float64))
            E = E64_full.astype(dtype)
        else:
            # base-point merit: reuse the update's stretch (same x ->
            # identical polar result; skips a full F/polar recompute)
            E = _total_energy(
                mesh, state.bdf, h2, x, s, la_new, use_mixed, use_vanilla,
                Sv=coeffs.Sv if use_mixed else None,
            ) + contact_energy(x, cd_cur)
        res_new = jnp.abs((E - E_prev) / (E + 1e-6))

        # vanilla-FEM gradient norm at the iterate (convergence.cpp:22-52)
        if config.record_vanilla_gradient:
            vg = inertia_grad + vstretch.gradient_at(mesh, x, dt)
            vg_norm = jnp.linalg.norm(vg)
        else:
            vg_norm = jnp.zeros((), dtype)

        # CCD step-size clamp (newton_optimizer.cpp:49-61)
        if (use_contact or use_vcollision) and config.enable_ccd:
            alpha0 = 0.9 * accdmod.accd_alpha(
                cf.frames, cf.ftype, cf.fmask, x, dx
            )
        else:
            alpha0 = jnp.asarray(1.0, dtype)

        # Noise-tolerant acceptance: near convergence the true decrease
        # (~decrement^2) falls below the floating-point rounding of the
        # energy sums; a strict E(a) < E(0) then rejects every step and
        # Newton stalls (f32: at decrement ~1e-5). Accepting changes within
        # the rounding noise band is safe (the 1e30 infeasibility guard for
        # contact still dominates) and lets f32 contract to the rhs noise
        # floor. In f64 the band is ~1e-15 relative — behavior unchanged.
        if hp:
            # f64 merit: comparisons are exact at f32-relevant scales
            def ls_cond(c):
                a, k = c
                Ea = merit64(a.astype(jnp.float64))
                return jnp.logical_and(k < config.ls_iters, Ea >= E64_full)
        else:
            # config.ls_strict recovers the reference-exact acceptance
            # (tested against the f64 oracle in tests/test_newton.py::
            # TestLineSearchAcceptance)
            if config.ls_strict:
                eps_E = jnp.zeros((), dtype)
            else:
                eps_E = 16.0 * jnp.finfo(dtype).eps * jnp.abs(E)

            def ls_cond(c):
                a, k = c
                Ea = _total_energy(
                    mesh, state.bdf, h2, x + a * dx, s + a * ds, la_new,
                    use_mixed, use_vanilla,
                ) + contact_energy(x + a * dx, cd_cur + a * cdd)
                return jnp.logical_and(k < config.ls_iters, Ea >= E + eps_E)

        def ls_body(c):
            a, k = c
            return (a * 0.5, k + 1)

        alpha, ls_k = jax.lax.while_loop(
            ls_cond, ls_body, (alpha0, jnp.zeros((), jnp.int32))
        )
        accept = (ls_k < config.ls_iters).astype(dtype)
        x = x + accept * alpha * dx
        s = s + accept * alpha * ds
        cd_next = cd_cur + accept * alpha * cdd

        stats = stats.replace(
            energy=stats.energy.at[it].set(E),
            energy_res=stats.energy_res.at[it].set(res_new),
            decrement=stats.decrement.at[it].set(dec_new),
            alpha=stats.alpha.at[it].set(alpha),
            solver_iters=stats.solver_iters.at[it].set(cg_iters),
            solver_error=stats.solver_error.at[it].set(cg_err),
            vanilla_grad=stats.vanilla_grad.at[it].set(vg_norm),
            iterations=it + 1,
        )
        if warm_R:
            Rcur = coeffs.R.astype(dtype)
        return (
            x, s, la_new, cd_next, cla_new, cact_new,
            it + 1, E, dec_new, res_new, stats, Rcur,
        )

    big = jnp.asarray(jnp.inf, dtype)
    C = cf.frames.shape[0]
    init = (
        state.x,
        # the rows fast path carries (s, la) feature-major (6, E)
        state.s.T if use_stencil_rows else state.s,
        state.la.T if use_stencil_rows else state.la,
        jnp.zeros((C,), dtype),   # mixed contact distances (fresh per step,
        jnp.zeros((C,), dtype),   # la) — MixedCollision::post_solve clears
        jnp.zeros((C,), dtype),   # active mask (frames re-detected in-loop)
        jnp.zeros((), jnp.int32),
        jnp.zeros((), dtype),
        big,
        big,
        _empty_stats(outer, dtype),
        state.R,
    )
    (x, s, la, cd, cla, cact, it, E_prev, dec, res, stats,
     R_out) = jax.lax.while_loop(newton_cond, newton_body, init)
    if use_stencil_rows:
        s, la = s.T, la.T

    # --- scripted Dirichlet BC motion (mesh update_bcs, meshes.cpp:188-208)
    V = x
    new_bc_states = []
    for spec, bcst in zip(bc_specs, state.bc_states):
        V, bcst = bcmod.bc_step(spec, bcst, V, config.h)
        new_bc_states.append(bcst)

    new_press_states = tuple(
        pressmod.press_step(spec, pst, V, config.h)
        for spec, pst in zip(press_specs, state.press_states)
    )

    # --- post_solve: BDF history push with BC-moved positions, clear la
    bdf = bdfmod.bdf_update(state.bdf, V)

    return SimState(
        x=V,
        s=s,
        la=jnp.zeros_like(la),
        bdf=bdf,
        bc_states=tuple(new_bc_states),
        contact=state.contact,
        press_states=new_press_states,
        step_count=state.step_count + 1,
        stats=stats,
        precond=precond_out,
        R=R_out,
    )
