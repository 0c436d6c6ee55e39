"""Host direct-solver Newton step (the reference's eigen-llt/cholmod path).

Reference: src/linear_solvers/eigen_solver.h:8-42 (factorize + solve per
Newton iteration) registered under eigen-llt/eigen-ldlt/eigen-lu/cholmod
(linear_solver_factory.cpp:64-99). Sparse Cholesky has no TPU mapping, so —
exactly like the reference's CPU path — this Newton loop runs on the host:
per-element coefficient builds are eager JAX calls, the condensed SPD system
is assembled into scipy CSR (solvers/direct.py) and solved exactly, and the
line search/BC/BDF bookkeeping mirrors optimizer/newton.py step for step.

Supports the FULL variable set the reference's direct path does
(linear_system.h:17-31): mixed-stretch, vanilla stretch, mixed-collision,
vanilla collision, and lagged friction.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from mixedfem_tpu.bc import boundary_conditions as bcmod
from mixedfem_tpu.bc import press as pressmod
from mixedfem_tpu.collision import accd as accdmod
from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.integrators import bdf as bdfmod
from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.optimizer import newton as newtonmod
from mixedfem_tpu.solvers import direct as directmod
from mixedfem_tpu.variables import collision as vcol
from mixedfem_tpu.variables import displacement as disp
from mixedfem_tpu.variables import friction as fric
from mixedfem_tpu.variables import mixed_collision as mc
from mixedfem_tpu.variables import mixed_stretch as ms
from mixedfem_tpu.variables import stretch as vstretch


def newton_step_direct(
    mesh: meshmod.MeshData,
    config: SimConfig,
    bc_specs: Tuple[bcmod.BCSpec, ...],
    state: newtonmod.SimState,
    press_specs: Tuple[pressmod.PressSpec, ...] = (),
) -> newtonmod.SimState:
    """One implicit BDF timestep with a host sparse solve per Newton
    iteration — exact factorization ('direct': eigen-llt/ldlt/lu/cholmod)
    or IC(0)-preconditioned CG ('pcg-ic': eigen-pcg-IC). Semantics match
    optimizer/newton.py's newton_step."""
    from mixedfem_tpu.solvers import factory as solver_factory

    solver_path = solver_factory.resolve_solver(config.solver)
    dt = float(bdfmod.bdf_dt(state.bdf))
    if solver_path == "amgcl":
        if (
            "mixed-stretch" not in config.mixed_variables
            or config.variables
            or "mixed-collision" in config.mixed_variables
            and state.contact.frames.shape[0] > 0
        ):
            # The dual elimination is lumped-mass-only, and the reference's
            # DualCondensedSystem overwrites lhs_/rhs_ per mixed variable
            # (linear_system.h:150-172) so only single-mixed-variable
            # systems are well-defined on it; contact scenes should use
            # subspace-CG (the coupled matrix-free Schur, solvers/dual.py).
            raise NotImplementedError(
                "subspace-amgcl solves the mixed-stretch dual system only"
            )
    h2 = dt * dt
    dtype = state.x.dtype
    outer = config.outer_steps
    use_mixed = "mixed-stretch" in config.mixed_variables
    use_vanilla = "stretch" in config.variables

    cf = state.contact
    C = cf.frames.shape[0]
    use_contact = "mixed-collision" in config.mixed_variables and C > 0
    use_vcollision = "collision" in config.variables and C > 0
    use_friction = "friction" in config.variables and C > 0
    dhat, kappa = config.dhat, config.kappa

    press_ext = jnp.zeros_like(state.x)
    for spec, pst in zip(press_specs, state.press_states):
        press_ext = press_ext + pressmod.press_force(
            spec, pst, mesh.nv, mesh.dim
        )
    mesh = mesh.replace(ext_force=mesh.ext_force + press_ext)

    x, s, la = state.x, state.s, state.la
    cd = jnp.zeros((C,), dtype)
    cla = jnp.zeros((C,), dtype)
    cact = jnp.zeros((C,), dtype)

    # Lagged friction set from the PRE-step positions (Friction::pre_solve)
    if use_friction:
        ffr = fric.build(mesh, cf, x, dhat, kappa)
        epsv_h = config.espv * dt

    stats = newtonmod._empty_stats(outer, dtype)
    E_prev = np.inf
    dec = np.inf
    res = np.inf
    it = 0

    while it < outer and dec > config.newton_tol and res > 1e-12:
        inertia_grad = disp.gradient(
            mesh, state.bdf, x, blend=config.inertia_blend_factor
        )
        b = -inertia_grad
        coeffs = vcoeffs = ccoeffs = None
        if use_mixed:
            coeffs = ms.update(mesh, x, s, dt)
            b = b + ms.rhs(mesh, coeffs, s)
        if use_vanilla:
            vcoeffs = vstretch.update(mesh, x, dt)
            b = b - vstretch.gradient(mesh, vcoeffs)
        if use_contact:
            ccoeffs = mc.update(
                mesh, cf, x, cd, cla, cact, dhat, kappa,
                ee_mollifier=config.ee_mollifier,
            )
            b = b + mc.rhs(mesh, cf, ccoeffs)

        frame_hessians = []
        if use_vcollision:
            vccoeffs = vcol.update(cf, x, dhat, kappa)
            b = b - vcol.gradient(mesh, cf, vccoeffs)
            frame_hessians.append((cf.frames, vccoeffs.H))
        if use_friction:
            fcoeffs = fric.update(ffr, x, config.contact_mu, epsv_h)
            b = b - fric.gradient(mesh, ffr, fcoeffs)
            frame_hessians.append((ffr.frames, fcoeffs.H))

        contact_blocks = (
            (cf.frames, ccoeffs.Gx, ccoeffs.H, ccoeffs.active)
            if use_contact
            else None
        )
        if solver_path != "amgcl":
            A = directmod.assemble_condensed(
                mesh, coeffs, contact=contact_blocks, v_coeffs=vcoeffs,
                frame_hessians=frame_hessians,
            )
        if solver_path == "amgcl":
            # dual-condensed flow (AMGCLSolver::solve, amgcl_solver.h:40-75):
            # solve S dlam = b on the host with SA-AMG-preconditioned CG,
            # then the dual recovery replaces the condensed local solve.
            from mixedfem_tpu.solvers import amg as amgmod
            from mixedfem_tpu.solvers import minres as mrmod

            rhs_kkt = mrmod.kkt_rhs(
                mesh, state.bdf, coeffs, x, s, la,
                blend=config.inertia_blend_factor,
            )
            dx_np, ds_np, dl_np, lin_iters = amgmod.solve_dual_amg(
                mesh, coeffs, rhs_kkt,
                tol=config.itr_tol,
                maxiter=config.max_iterative_solver_iters,
            )
            dx = meshmod.project_free(mesh, jnp.asarray(dx_np, dtype))
            ds = jnp.asarray(ds_np, dtype)
            la_new = la + jnp.asarray(dl_np, dtype)
            dec = max(
                float(jnp.max(jnp.abs(dx))), float(jnp.max(jnp.abs(ds)))
            )
        else:
            b_np = np.asarray(b, np.float64).reshape(-1)
            if solver_path == "pcg-ic":
                dx_np, lin_iters = directmod.solve_ic_pcg(
                    A, b_np, config.itr_tol,
                    config.max_iterative_solver_iters,
                )
            else:
                dx_np, lin_iters = directmod.solve_direct(A, b_np), 1
            dx = jnp.asarray(dx_np.reshape(mesh.nv, mesh.dim), dtype)
            dx = meshmod.project_free(mesh, dx)

            # local recovery (SystemMatrixPD::post_solve)
            if use_mixed:
                ds, la_new = ms.local_solve(mesh, coeffs, s, dx)
                dec = max(
                    float(jnp.max(jnp.abs(dx))), float(jnp.max(jnp.abs(ds)))
                )
            else:
                ds, la_new = jnp.zeros_like(s), la
                dec = float(jnp.max(jnp.abs(dx)))
        if use_contact:
            cdd, cla_new = mc.local_solve(mesh, cf, ccoeffs, dx)
            cd_cur, cact_new = ccoeffs.d, ccoeffs.active
            dec = max(dec, float(jnp.max(jnp.abs(cdd))))
        else:
            cdd, cla_new = jnp.zeros((C,), dtype), cla
            cd_cur, cact_new = cd, cact

        def merit(x_t, s_t, cd_t):
            E = newtonmod._total_energy(
                mesh, state.bdf, h2, x_t, s_t, la_new, use_mixed, use_vanilla
            )
            if use_contact:
                E = E + newtonmod.mixed_contact_merit(
                    cf, x_t, cd_t, cact_new, cla_new, dhat, kappa, dtype,
                    mesh=mesh, ee_mollifier=config.ee_mollifier,
                )
            if use_vcollision:
                E = E + h2 * vcol.energy(cf, x_t, dhat, kappa, dt)
            if use_friction:
                E = E + h2 * fric.energy(
                    ffr, x_t, config.contact_mu, epsv_h, dt
                )
            return float(E)

        E = merit(x, s, cd_cur)
        res = abs((E - E_prev) / (E + 1e-6)) if np.isfinite(E_prev) else np.inf

        if config.record_vanilla_gradient:
            vg = inertia_grad + vstretch.gradient_at(mesh, x, dt)
            vg_norm = float(jnp.linalg.norm(vg))
        else:
            vg_norm = 0.0

        alpha = 1.0
        if use_contact and config.enable_ccd:
            alpha = 0.9 * float(
                accdmod.accd_alpha(cf.frames, cf.ftype, cf.fmask, x, dx)
            )

        # backtracking line search (linesearch.h:78-129)
        k = 0
        while k < config.ls_iters:
            if merit(x + alpha * dx, s + alpha * ds, cd_cur + alpha * cdd) < E:
                break
            alpha *= 0.5
            k += 1
        accept = 1.0 if k < config.ls_iters else 0.0
        x = x + accept * alpha * dx
        s = s + accept * alpha * ds
        la = la_new
        cd = cd_cur + accept * alpha * cdd
        cla, cact = cla_new, cact_new

        stats = stats.replace(
            energy=stats.energy.at[it].set(E),
            energy_res=stats.energy_res.at[it].set(res),
            decrement=stats.decrement.at[it].set(dec),
            alpha=stats.alpha.at[it].set(alpha),
            solver_iters=stats.solver_iters.at[it].set(lin_iters),
            solver_error=stats.solver_error.at[it].set(0.0),
            vanilla_grad=stats.vanilla_grad.at[it].set(vg_norm),
            iterations=jnp.asarray(it + 1, jnp.int32),
        )
        it += 1

    # scripted BC motion + press controllers + BDF push (as in newton_step)
    V = x
    new_bc_states = []
    for spec, bcst in zip(bc_specs, state.bc_states):
        V, bcst = bcmod.bc_step(spec, bcst, V, config.h)
        new_bc_states.append(bcst)
    new_press_states = tuple(
        pressmod.press_step(spec, pst, V, config.h)
        for spec, pst in zip(press_specs, state.press_states)
    )
    bdf = bdfmod.bdf_update(state.bdf, V)

    return newtonmod.SimState(
        x=V,
        s=s,
        la=jnp.zeros_like(la),
        bdf=bdf,
        bc_states=tuple(new_bc_states),
        contact=state.contact,
        press_states=new_press_states,
        step_count=state.step_count + 1,
        stats=stats,
        precond=state.precond,
    )
