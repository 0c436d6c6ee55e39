"""In-step performance attribution for the flagship 100k-tet bench step.

Two complementary measurements (VERDICT r4 item 1 — the separate-jit
stage tool in bench.py overstates layout-boundary costs, so neither of
these uses it):

1. Parameter-sweep attribution INSIDE the production fused newton_step:
   with itr_tol=0 the CG loop runs exactly `max_iterative_solver_iters`
   iterations and newton_tol=0 runs exactly `outer_steps` Newton
   iterations, so wall-clock fits the linear model
       T(outer, cg) = c0 + outer * c_newton + outer * cg * c_cg
   and finite differences of measured cells give the true in-step cost
   of (a) one CG iteration (matvec + block-Jacobi + coarse apply + dots)
   and (b) the per-Newton fixed work (update/assembly/local-solve/line
   search), plus the per-step dispatch floor c0.

2. Composite prefix programs: single jit programs that run a prefix of
   the newton_body pipeline and reduce to scalars (so no wide tensor
   crosses the jit boundary and XLA keeps in-step layouts). Deltas of
   consecutive prefixes attribute the per-Newton fixed work to stages.

Usage: python tools/attribute.py [--size 100k|10k]
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _sync(x):
    np.asarray(x).ravel()[:1]


def timed(fn, *args, reps=5):
    o = fn(*args)
    _sync(jax.tree.leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    _sync(jax.tree.leaves(o)[0])
    return (time.perf_counter() - t0) / reps * 1e3


def fine(mesh, state, config0, plan):
    """Prefix attribution INSIDE ms.update + the merit evaluation: each
    program runs a prefix of the coefficient pipeline and reduces to a
    scalar; deltas of consecutive prefixes attribute the update's 30 ms."""
    import jax
    import jax.numpy as jnp

    from mixedfem_tpu.integrators import bdf as bdfmod
    from mixedfem_tpu.materials import models as mat
    from mixedfem_tpu.mesh import mesh as meshmod
    from mixedfem_tpu.ops import psd, rotation, smallops, sym
    from mixedfem_tpu.variables import mixed_stretch as ms

    dt = bdfmod.bdf_dt(state.bdf)
    h2 = dt * dt
    x, s = state.x, state.s

    def red(*ts):
        return sum(jnp.sum(t) for t in ts)

    def p_defgrad(x, s):
        return red(meshmod.def_grad(mesh, x))

    def p_polar(x, s):
        F = meshmod.def_grad(mesh, x)
        R, S = rotation.polar(F, mesh.dim)
        return red(R, S)

    def p_dsdF(x, s):
        F = meshmod.def_grad(mesh, x)
        R, S = rotation.polar(F, mesh.dim)
        return red(rotation.dsdF(R, S, mesh.dim))

    def p_G(x, s):
        F = meshmod.def_grad(mesh, x)
        R, S = rotation.polar(F, mesh.dim)
        D = rotation.dsdF(R, S, mesh.dim)
        return red(smallops.contract_D_dphi(D, mesh.dphidX))

    def p_mat(x, s):
        Hraw = h2 * mat.hess_s_all(
            s, mesh.mu, mesh.lam, mesh.model_id, mesh.models
        )
        g = h2 * mat.grad_s_all(
            s, mesh.mu, mesh.lam, mesh.model_id, mesh.models
        )
        return red(Hraw, g)

    def p_mat_psd(x, s):
        Hraw = h2 * mat.hess_s_all(
            s, mesh.mu, mesh.lam, mesh.model_id, mesh.models
        )
        H, Hinv, Hs, evals = psd.psd_fix_sqrt(Hraw, tol=1e-8)
        return red(H, Hinv, Hs, evals)

    def p_full(x, s):
        return red(*jax.tree.leaves(ms.update(mesh, x, s, dt)))

    progs = [
        ("defgrad", p_defgrad), ("polar", p_polar), ("dsdF", p_dsdF),
        ("G", p_G), ("material", p_mat), ("material+psd", p_mat_psd),
        ("full_update", p_full),
    ]
    out = {}
    for name, p in progs:
        out[name] = round(timed(jax.jit(p), x, s), 3)
        print(f"fine[{name}] = {out[name]} ms", flush=True)
    out["derived"] = {
        "polar_ms": round(out["polar"] - out["defgrad"], 3),
        "dsdF_ms": round(out["dsdF"] - out["polar"], 3),
        "G_contract_ms": round(out["G"] - out["dsdF"], 3),
        "psd_ms": round(out["material+psd"] - out["material"], 3),
        "Gw_contract_ms": round(
            out["full_update"] - out["material+psd"]
            - (out["G"] - out["defgrad"]), 3),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="100k")
    ap.add_argument("--fine", action="store_true",
                    help="prefix attribution inside ms.update only")
    cli = ap.parse_args()

    import bench

    global jax
    import jax
    import jax.numpy as jnp

    from mixedfem_tpu.optimizer.newton import newton_step
    from mixedfem_tpu.solvers import coarse as coarsemod
    from mixedfem_tpu.solvers import pcg as pcgmod
    from mixedfem_tpu.ops import stencil as stmod
    from mixedfem_tpu.variables import displacement as disp
    from mixedfem_tpu.variables import mixed_stretch as ms
    from mixedfem_tpu.integrators import bdf as bdfmod
    from mixedfem_tpu.mesh import mesh as meshmod

    dims = (40, 25, 20) if cli.size == "100k" else (20, 10, 10)
    mesh, config0, state, ntets = bench.build(*dims, "float32")
    plan = bench.build.last_stencil_plan
    cs = coarsemod.build_coarse_space_grid(
        np.asarray(mesh.V0), np.asarray(mesh.T),
        ~np.asarray(mesh.free_mask, bool),
        (plan.NI, plan.NJ, plan.NK), dtype=jnp.float32,
    )
    state = state.replace(precond=jnp.zeros((cs.ncd, cs.ncd), jnp.float32))

    out = {"ntets": ntets, "ncd": cs.ncd}

    if cli.fine:
        out["fine_update"] = fine(mesh, state, config0, plan)
        print(json.dumps(out, indent=1))
        return

    # --- 1. parameter sweep on the production fused step -------------
    def step_t(outer, cg, coarse=cs, reps=4):
        cfg = dataclasses.replace(
            config0,
            outer_steps=outer, max_iterative_solver_iters=cg, itr_tol=0.0,
        )
        from mixedfem_tpu.optimizer.newton import _empty_stats
        st = state.replace(stats=_empty_stats(outer, jnp.float32))
        f = lambda s: newton_step(mesh, cfg, (), s, coarse, (), plan)
        return timed(f, st, reps=reps)

    cells = {}
    for (o, c) in [(5, 36), (5, 72), (5, 2), (1, 2), (1, 36), (2, 2)]:
        cells[(o, c)] = step_t(o, c)
        print(f"T(outer={o}, cg={c}) = {cells[(o,c)]:.1f} ms", flush=True)

    c_cg = (cells[(5, 72)] - cells[(5, 36)]) / (5 * 36)
    c_newton = (cells[(5, 2)] - cells[(1, 2)]) / 4 - 2 * c_cg
    c0 = cells[(1, 2)] - c_newton - 2 * c_cg
    out["per_cg_iter_ms"] = round(c_cg, 4)
    out["per_newton_fixed_ms"] = round(c_newton, 3)
    out["per_step_overhead_ms"] = round(c0, 3)
    out["model_check_T(5,36)"] = round(c0 + 5 * c_newton + 180 * c_cg, 1)
    out["measured_T(5,36)"] = round(cells[(5, 36)], 1)

    # no-coarse variant: isolates the coarse apply inside the CG iteration
    t_nc_72 = step_t(5, 72, coarse=None)
    t_nc_36 = step_t(5, 36, coarse=None)
    c_cg_nc = (t_nc_72 - t_nc_36) / (5 * 36)
    out["per_cg_iter_ms_nocoarse"] = round(c_cg_nc, 4)
    out["coarse_apply_per_cg_ms"] = round(c_cg - c_cg_nc, 4)

    # --- 2. prefix programs for the per-Newton fixed work ------------
    dt = bdfmod.bdf_dt(state.bdf)
    x, s, la = state.x, state.s, state.la
    bdf = state.bdf

    def p_update(x, s):
        coeffs = ms.update(mesh, x, s, dt)
        return sum(jnp.sum(l) for l in jax.tree.leaves(coeffs))

    def p_update_W(x, s):
        coeffs = ms.update(mesh, x, s, dt)
        W = stmod.assemble_W(plan, coeffs.Gw, mesh.mass_coeff)
        return jnp.sum(W)

    def p_update_W_rhs(x, s):
        coeffs = ms.update(mesh, x, s, dt)
        W = stmod.assemble_W(plan, coeffs.Gw, mesh.mass_coeff)
        E_, k_ = mesh.T.shape
        rc = ms.rhs_contrib(mesh, coeffs, s)
        b = stmod.scatter_vec(plan, rc.reshape(E_, k_, -1))
        ig = disp.gradient_contrib(mesh, bdf, x)
        b2 = stmod.scatter_vec(plan, ig.reshape(E_, k_, -1))
        return jnp.sum(W) + jnp.sum(b) + jnp.sum(b2)

    def p_local_solve(x, s):
        coeffs = ms.update(mesh, x, s, dt)
        ds, la_new = ms.local_solve(mesh, coeffs, s, x)
        return jnp.sum(ds) + jnp.sum(la_new)

    def p_merit(x, s):
        h2 = dt * dt
        E = (disp.energy(mesh, bdf, x) + h2 * ms.energy(mesh, s)
             + ms.constraint_value(mesh, x, s, la))
        return E

    def p_merit3(x, s):
        h2 = dt * dt
        E = 0.0
        for a in (1.0, 0.5, 0.25):
            E = E + (disp.energy(mesh, bdf, a * x)
                     + h2 * ms.energy(mesh, a * s)
                     + ms.constraint_value(mesh, a * x, a * s, la))
        return E

    stages = {}
    stages["update_ms"] = timed(jax.jit(p_update), x, s)
    stages["update+W_ms"] = timed(jax.jit(p_update_W), x, s)
    stages["update+W+rhs_ms"] = timed(jax.jit(p_update_W_rhs), x, s)
    stages["update+localsolve_ms"] = timed(jax.jit(p_local_solve), x, s)
    stages["merit1_ms"] = timed(jax.jit(p_merit), x, s)
    stages["merit3_ms"] = timed(jax.jit(p_merit3), x, s)
    out["prefix"] = {k: round(v, 3) for k, v in stages.items()}
    out["derived"] = {
        "W_assembly_ms": round(
            stages["update+W_ms"] - stages["update_ms"], 3),
        "rhs_scatter_ms": round(
            stages["update+W+rhs_ms"] - stages["update+W_ms"], 3),
        "local_solve_ms": round(
            stages["update+localsolve_ms"] - stages["update_ms"], 3),
        "merit_per_eval_ms": round(
            (stages["merit3_ms"] - stages["merit1_ms"]) / 2, 3),
    }

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
