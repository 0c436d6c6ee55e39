"""Benchmark: wall-clock ms per implicit step (assembly + solve).

Prints ONE JSON line:
  {"metric": "ms_per_implicit_step_100k_tets", "value": N, "unit": "ms",
   "vs_baseline": R, ...extras}

Protocol (BASELINE.md): SNH mixed-stretch beam under gravity, one end
pinned, BDF1, Newton (5 outer iterations), matrix-free block-Jacobi PCG,
f32 on the available accelerator. `vs_baseline` = single-node CPU (JAX CPU
backend, all cores) wall-clock / accelerator wall-clock at 10k tets —
the north-star is >10x (BASELINE.json).
"""

import json
import time

import numpy as np


def build(nx, ny, nz, dtype, backend_device=None, force_unstructured=False):
    import jax
    import jax.numpy as jnp

    from mixedfem_tpu.config import SimConfig, enu_to_lame
    from mixedfem_tpu.mesh import generators, mesh as meshmod
    from mixedfem_tpu.optimizer import newton
    from mixedfem_tpu.solvers.operator import sort_elements_banded

    from mixedfem_tpu.ops import stencil as stmod

    V, T = generators.box_tet_mesh(nx, ny, nz, size=(4.0, 1.0, 1.0))
    # structured-grid stencil plan (cell-major element order) when the
    # box structure is detected; else banded element order (free static
    # reorder; enables the windowed Pallas brick kernel on TPU).
    # force_unstructured measures the path EVERY reference scene takes
    # (no reference mesh is a conforming box grid): banded order + brick.
    splan, perm = (None, None) if force_unstructured else (
        stmod.build_stencil_plan(T, len(V), (nx + 1, ny + 1, nz + 1))
    )
    if splan is not None:
        T = T[perm]
    else:
        T = T[sort_elements_banded(T)]
    la, mu = enu_to_lame(1e6, 0.45)
    is_fixed = np.zeros(len(V), bool)
    is_fixed[V[:, 0] < 1e-9] = True
    ext = np.tile(np.array([0.0, -9.8, 0.0]), (len(V), 1))
    jdtype = jnp.dtype(dtype)
    mesh = meshmod.build_mesh_data(
        V, T,
        density=np.full(len(T), 1000.0),
        mu=np.full(len(T), mu),
        lam=np.full(len(T), la),
        model_id=np.zeros(len(T), int),
        models=("Stable-Neohookean",),
        is_fixed=is_fixed,
        ext_force=ext,
        dtype=jdtype,
    )
    config = SimConfig(
        h=0.02,
        outer_steps=5,
        newton_tol=0.0,       # fixed Newton count for stable timing
        max_iterative_solver_iters=500,
        itr_tol=1e-4,
        coarse_refresh_every=10,
        dtype=dtype,
    )
    x0 = jnp.asarray(V, jdtype)
    state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
    if backend_device is not None:
        mesh = jax.device_put(mesh, backend_device)
        state = jax.device_put(state, backend_device)
        if splan is not None:
            splan = jax.device_put(splan, backend_device)
    build.last_stencil_plan = splan
    return mesh, config, state, len(T)


def _sync(x):
    """Force completion. block_until_ready is a no-op over the axon tunnel,
    so fetch a scalar instead."""
    np.asarray(x).ravel()[:1]


def time_steps(mesh, config, state, n_steps=5, coarse=None, plan=None):
    from mixedfem_tpu.optimizer.newton import newton_step

    # warmup/compile
    state = newton_step(mesh, config, (), state, coarse, (), plan)
    _sync(state.stats.energy)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = newton_step(mesh, config, (), state, coarse, (), plan)
    _sync(state.stats.energy)
    dt_ms = (time.perf_counter() - t0) / n_steps * 1e3
    it = int(state.stats.iterations)
    cg = np.asarray(state.stats.solver_iters)[:it]
    return dt_ms, it, cg, state


def stage_breakdown(mesh, config, state, coarse=None, reps=5, plan=None):
    """Per-stage wall-clock (the reference's timing.csv categories:
    rotations/derivatives -> update, linsolve -> matvec x CG iters, LS ->
    energy evals, assemble -> scatter inside matvec). Stages are jitted
    separately here since the production step fuses them in one program.

    CAVEAT: separate-jit stage timings OVERSTATE in-step costs by a large
    factor for stages consuming per-element coefficient tensors: at the
    jit boundary XLA materializes e.g. Gw (E, 6, 4, 3) with its trailing
    (4, 3) dims padded to an (8, 128) tile (~85x bytes), so standalone
    reads are layout-bound. Inside the fused production step those
    tensors never take that layout. For true in-step attribution use
    jax.profiler.trace around newton_step and the HLO stats tool."""
    import jax
    import jax.numpy as jnp

    from mixedfem_tpu.integrators import bdf as bdfmod
    from mixedfem_tpu.solvers import coarse as coarsemod
    from mixedfem_tpu.solvers import operator as opmod
    from mixedfem_tpu.variables import displacement as disp
    from mixedfem_tpu.variables import mixed_stretch as ms

    dt = bdfmod.bdf_dt(state.bdf)
    x, s = state.x, state.s

    def timed(fn, *args):
        o = fn(*args)
        _sync(jax.tree.leaves(o)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        _sync(jax.tree.leaves(o)[0])
        return (time.perf_counter() - t0) / reps * 1e3

    out = {}
    upd = jax.jit(lambda x, s: ms.update(mesh, x, s, dt))
    out["update_ms"] = round(timed(upd, x, s), 3)
    coeffs = upd(x, s)
    from mixedfem_tpu.ops import stencil as stmod

    if isinstance(plan, stmod.StencilPlan):
        fW = jax.jit(
            lambda c: stmod.assemble_W(plan, c.Gw, mesh.mass_coeff)
        )
        out["stencil_assemble_ms"] = round(timed(fW, coeffs), 3)
        W = fW(coeffs)
        smv = jax.jit(lambda p: stmod.stencil_matvec(plan, W, p))
        out["matvec_ms"] = round(timed(smv, jnp.ones_like(x)), 3)
    else:
        mv = jax.jit(
            lambda p: opmod.element_matvec(mesh, p, ms_coeffs=coeffs)
        )
        out["matvec_ms"] = round(timed(mv, jnp.ones_like(x)), 3)
    en = jax.jit(
        lambda x: disp.energy(mesh, state.bdf, x)
        + dt * dt * ms.energy(mesh, s)
        + ms.constraint_value(mesh, x, s, state.la)
    )
    out["linesearch_energy_ms"] = round(timed(en, x), 3)
    rhs = jax.jit(lambda: ms.rhs(mesh, coeffs, s))
    out["rhs_ms"] = round(timed(rhs), 3)
    db = jax.jit(lambda: ms.diag_blocks(mesh, coeffs))
    out["diag_blocks_ms"] = round(timed(db), 3)
    if coarse is not None:
        ca = jax.jit(lambda c: coarsemod.coarse_matrix(mesh, coarse, c))
        out["coarse_assembly_ms"] = round(timed(ca, coeffs), 3)
        Ac = ca(coeffs)
        ci = jax.jit(coarsemod.coarse_inverse)
        out["coarse_inverse_ms"] = round(timed(ci, Ac), 3)
    return out


def flop_byte_estimate(ntets, newton_iters, cg_total, nv=None,
                       path="stencil"):
    """Analytic useful-work accounting for the flagship step (documented
    per-term; the honest MFU denominator is the v5e bf16 MXU peak since
    f32 matmuls execute as bf16 passes).

    Per-element flop counts (mixed-stretch tets, N=6, k=4, d=3):
      update    batched Jacobi eigensolve + polar + dsdF + material
                derivatives + PSD fix                      ~ 4600 flops
      assembly  rhs + diag blocks + Gw build               ~ 1200 flops
      linesearch energy (F rebuild + polar + psi) per eval ~ 1600 flops
    matvec per path:
      stencil   y[v] = sum_o W_o[v] x[v+o]: nv * 27 * (9 MAC) = 486/vert,
                plus per-Newton offset-form assembly E * 16 pairs * 54
                MAC = 864/elem; HBM streams W (27*9*npad f32) + vectors
      brick     q=GwPe (72 MAC) + emission (72) + mass (48) = 384/elem;
                HBM streams Gw + mass + indices per element"""
    E = ntets
    n_mv = cg_total + newton_iters          # +1 matvec per solve for r0
    flops = (
        newton_iters * (4600 + 1200) * E
        + 2 * newton_iters * 1600 * E
    )
    if path == "stencil" and nv:
        flops += n_mv * 486 * nv + newton_iters * 864 * E
        bytes_hbm = n_mv * (27 * 9 * nv * 4 + 8 * nv * 3 * 4)
    else:
        flops += n_mv * 384 * E
        bytes_hbm = (
            n_mv * E * 4 * (6 * 4 * 3 + 4 * 4 + 8) + n_mv * 64 * E
        )
    return flops, bytes_hbm


def _make_plan(mesh, stencil_plan=None):
    """Production matvec plan: the structured-grid 27-point stencil
    (ops/stencil.py) when the mesh is a box grid; else the fused brick
    kernel (ops/brick.py) when the banded window fits, else the banded
    windowed-scatter path."""
    import jax
    import numpy as np

    if stencil_plan is not None:
        return stencil_plan
    if jax.default_backend() == "cpu":
        return None
    from mixedfem_tpu.ops.brick import build_brick_plan
    from mixedfem_tpu.solvers.operator import build_banded_plan

    plan = build_brick_plan(np.asarray(mesh.T), mesh.nv, ce=512)
    return plan if plan is not None else build_banded_plan(mesh)


def _wait_for_accelerator(max_wait_s=600):
    """The TPU tunnel occasionally drops (round-3 driver bench failed on a
    transient 'backend setup/compile error (Unavailable)'). jax caches a
    failed backend init for the process lifetime, so probe in a fresh
    subprocess and only proceed here once a probe succeeds."""
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    while True:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=300,
        )
        if r.returncode == 0:
            return True
        if time.time() > deadline:
            sys.stderr.write(
                "bench: accelerator probe still failing after "
                f"{max_wait_s}s:\n{r.stderr.decode()[-2000:]}\n"
            )
            return False
        time.sleep(20)


def inline_attribution(mesh, config0, state, coarse, plan, cg_total):
    """In-step breakdown via parameter sweeps on the PRODUCTION fused step
    (tools/attribute.py method; VERDICT r4 item 1 — the separate-jit stage
    tool overstates layout-boundary costs, so the default bench fits

        T(outer, cg) = c0 + outer * c_newton + outer * cg * c_cg

    on fused-step cells with pinned iteration counts and reports rows that
    sum to ~the measured step time)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mixedfem_tpu.optimizer.newton import _empty_stats, newton_step

    def step_t(outer, cg, reps=4):
        cfg = dataclasses.replace(
            config0,
            outer_steps=outer, max_iterative_solver_iters=cg, itr_tol=0.0,
        )
        st = state.replace(stats=_empty_stats(outer, jnp.float32))
        f = lambda s: newton_step(mesh, cfg, (), s, coarse, (), plan)
        o = f(st)
        _sync(o.stats.energy)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(st)
        _sync(o.stats.energy)
        return (time.perf_counter() - t0) / reps * 1e3

    cells = {}
    for (o, c) in [(5, 36), (5, 72), (1, 2), (5, 2)]:
        cells[(o, c)] = step_t(o, c)
    c_cg = (cells[(5, 72)] - cells[(5, 36)]) / (5 * 36)
    c_newton = (cells[(5, 2)] - cells[(1, 2)]) / 4 - 2 * c_cg
    c0 = cells[(1, 2)] - c_newton - 2 * c_cg
    n_cg = int(cg_total)
    return {
        "per_cg_iter_ms": round(c_cg, 4),
        "per_newton_fixed_ms": round(c_newton, 3),
        "per_step_overhead_ms": round(c0, 3),
        "rows_ms": {
            "dispatch_floor": round(c0, 1),
            "newton_fixed_work_x5": round(5 * c_newton, 1),
            "cg_iterations": round(n_cg * c_cg, 1),
        },
        "rows_sum_ms": round(c0 + 5 * c_newton + n_cg * c_cg, 1),
        "measured_T(5,36)_ms": round(cells[(5, 36)], 1),
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", action="store_true",
                    help="also print the per-stage breakdown (slower)")
    ap.add_argument("--skip-cpu-100k", action="store_true",
                    help="skip the JAX-CPU 100k baseline (~5 min on one "
                         "vCPU; it is the honest north-star denominator, "
                         "measured by default)")
    ap.add_argument("--skip-attribution", action="store_true",
                    help="skip the in-step parameter-sweep breakdown")
    ap.add_argument("--skip-brick", action="store_true",
                    help="skip the unstructured (brick-path) 100k step")
    cli = ap.parse_args()

    _wait_for_accelerator()

    import jax

    accel = jax.devices()[0]
    cpu = jax.devices("cpu")[0] if any(
        d.platform == "cpu" for d in jax.devices("cpu")
    ) else None

    extras = {}

    # 100k tets on the accelerator (primary metric)
    import jax.numpy as jnp

    from mixedfem_tpu.solvers.coarse import (
        build_coarse_space,
        build_coarse_space_grid,
    )

    def _coarse(mesh, splan, target_size=48):
        if splan is not None:
            return build_coarse_space_grid(
                np.asarray(mesh.V0), np.asarray(mesh.T),
                ~np.asarray(mesh.free_mask, bool),
                (splan.NI, splan.NJ, splan.NK),
                dtype=jnp.float32,
            )
        return build_coarse_space(
            np.asarray(mesh.V0), np.asarray(mesh.T),
            ~np.asarray(mesh.free_mask, bool),
            target_size=target_size, dtype=jnp.float32,
        )

    from mixedfem_tpu.solvers.operator import build_banded_plan

    mesh, config, state, ntets = build(40, 25, 20, "float32")  # 100k tets
    plan = _make_plan(mesh, build.last_stencil_plan)
    cs = _coarse(mesh, build.last_stencil_plan)
    state = state.replace(
        precond=jnp.zeros((cs.ncd, cs.ncd), jnp.float32)
    )
    ms_100k, it, cg, _ = time_steps(
        mesh, config, state, n_steps=5, coarse=cs, plan=plan
    )
    extras["tets_100k"] = ntets
    extras["value_stencil_100k"] = round(ms_100k, 1)  # == top-level value
    extras["coarse_aggregates"] = cs.naggr
    extras["matvec_path"] = type(plan).__name__ if plan is not None else "xla"
    if cli.stages:
        extras["stages_100k"] = stage_breakdown(
            mesh, config, state, coarse=cs, plan=plan
        )
    extras["newton_iters"] = it
    extras["cg_iters_per_newton"] = [int(c) for c in cg]

    # in-step per-stage breakdown in the DEFAULT output (VERDICT r4
    # item 1): parameter sweeps on the production fused step
    if not cli.skip_attribution:
        try:
            extras["stages_100k"] = inline_attribution(
                mesh, config, state, cs, plan, int(sum(cg))
            )
        except Exception as e:
            extras["attribution_error"] = str(e)[:200]

    # unstructured (brick-path) 100k step: the matvec path EVERY
    # reference scene takes (VERDICT r4 item 2b)
    if not cli.skip_brick:
        try:
            mesh_u, config_u, state_u, _ = build(
                40, 25, 20, "float32", force_unstructured=True
            )
            plan_u = _make_plan(mesh_u, None)
            cs_u = _coarse(mesh_u, None)
            state_u = state_u.replace(
                precond=jnp.zeros((cs_u.ncd, cs_u.ncd), jnp.float32)
            )
            ms_brick, _it_b, cg_b, _ = time_steps(
                mesh_u, config_u, state_u, n_steps=3, coarse=cs_u,
                plan=plan_u,
            )
            extras["value_brick_100k"] = round(ms_brick, 1)
            extras["brick_matvec_path"] = (
                type(plan_u).__name__ if plan_u is not None else "xla"
            )
            extras["brick_cg_iters"] = [int(c) for c in cg_b]
        except Exception as e:
            extras["brick_error"] = str(e)[:200]

    # analytic useful-work accounting (VERDICT r2: report MFU/flops)
    flops, bytes_hbm = flop_byte_estimate(
        ntets, it, int(sum(cg)), nv=mesh.nv,
        path="stencil" if build.last_stencil_plan is not None else "brick",
    )
    extras["useful_gflop_per_step"] = round(flops / 1e9, 2)
    extras["achieved_gflops"] = round(flops / (ms_100k / 1e3) / 1e9, 1)
    # v5e bf16 MXU peak 197 TFLOPS (f32 matmuls run as bf16 passes)
    extras["mfu_pct_bf16_peak"] = round(
        flops / (ms_100k / 1e3) / 197e12 * 100, 3
    )
    extras["hbm_gb_per_step"] = round(bytes_hbm / 1e9, 2)
    extras["achieved_hbm_gbps"] = round(
        bytes_hbm / (ms_100k / 1e3) / 1e9, 1
    )
    extras["bound_note"] = (
        "FEM SpMV/assembly is memory-bound, not FLOP-bound: MFU is "
        "structurally low. On the structured-grid stencil path the "
        "ceiling is HBM streaming of the offset-form blocks W (27*9 f32/"
        "vertex/matvec); on unstructured meshes it is the one-hot MXU "
        "row rate (~1 K-cycle per scattered scalar, ops/brick.py)"
    )

    # 10k tets accelerator vs CPU for vs_baseline (same solver config both)
    mesh, config, state, nt10 = build(20, 10, 10, "float32")  # 10k tets
    plan10_stencil = build.last_stencil_plan
    cs10 = _coarse(mesh, build.last_stencil_plan)
    state = state.replace(
        precond=jnp.zeros((cs10.ncd, cs10.ncd), jnp.float32)
    )
    plan10 = _make_plan(mesh, plan10_stencil)
    ms_10k, _, _, _ = time_steps(
        mesh, config, state, n_steps=5, coarse=cs10, plan=plan10
    )
    extras["ms_per_step_10k_tets"] = round(ms_10k, 3)

    # Honest north-star denominator: CPU at the SAME 100k size, measured
    # BY DEFAULT (VERDICT r4 item 2a). Slow (~90 s/step on a 1-vCPU
    # container; --skip-cpu-100k to omit); BASELINE.md records the
    # multi-core extrapolation next to each round's value.
    if not cli.skip_cpu_100k:
        try:
            mesh_c, config_c, state_c, _ = build(
                40, 25, 20, "float32", backend_device=cpu
            )
            cs_c = jax.device_put(cs, cpu)
            state_c = state_c.replace(
                precond=jax.device_put(
                    jnp.zeros((cs.ncd, cs.ncd), jnp.float32), cpu
                )
            )
            ms_cpu_100k, _, _, _ = time_steps(
                mesh_c, config_c, state_c, n_steps=1, coarse=cs_c,
                plan=build.last_stencil_plan,
            )
            extras["ms_per_step_100k_tets_cpu"] = round(ms_cpu_100k, 1)
            extras["vs_cpu_100k"] = round(ms_cpu_100k / ms_100k, 2)
        except Exception as e:
            extras["cpu_100k_error"] = str(e)[:200]

    vs_baseline = None
    try:
        mesh_c, config_c, state_c, _ = build(20, 10, 10, "float32", backend_device=cpu)
        state_c = state_c.replace(
            precond=jax.device_put(
                jnp.zeros((cs10.ncd, cs10.ncd), jnp.float32), cpu
            )
        )
        cs10c = jax.device_put(cs10, cpu)
        ms_cpu_10k, _, _, _ = time_steps(
            mesh_c, config_c, state_c, n_steps=2, coarse=cs10c,
            plan=build.last_stencil_plan,
        )
        extras["ms_per_step_10k_tets_cpu"] = round(ms_cpu_10k, 3)
        vs_baseline = ms_cpu_10k / ms_10k
    except Exception as e:  # CPU backend may be unavailable under the tunnel
        extras["cpu_baseline_error"] = str(e)[:200]

    out = {
        "metric": "ms_per_implicit_step_100k_tets",
        "value": round(ms_100k, 3),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }
    out.update(extras)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
