"""Two-level preconditioner with contact blocks: CG-iteration regression
under stiff (high-kappa) contact — the role the reference's dual-ascent
preconditioner plays (preconditioners/dual_ascent_preconditioner.h:41-226)."""

import numpy as np
import jax.numpy as jnp

from mixedfem_tpu.config import SimConfig, enu_to_lame
from mixedfem_tpu.io.scene import Simulation
from mixedfem_tpu.mesh import generators, mesh as meshmod
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.solvers.coarse import build_coarse_space


def _stiff_contact_sim(solver, coarse_target=24):
    V1, T1 = generators.box_tet_mesh(6, 2, 6, size=(1.0, 0.2, 1.0))
    V2, T2 = generators.box_tet_mesh(4, 2, 4, size=(0.5, 0.2, 0.5))
    V2 = V2 + np.array([0.25, 0.205, 0.25])
    V = np.concatenate([V1, V2])
    T = np.concatenate([T1, T2 + len(V1)])
    la, mu = enu_to_lame(1e6, 0.40)
    is_fixed = np.zeros(len(V), bool)
    is_fixed[: len(V1)] = True
    ext = np.zeros_like(V)
    ext[:, 1] = -9.8
    mesh = meshmod.build_mesh_data(
        V, T,
        density=np.full(len(T), 1000.0),
        mu=np.full(len(T), mu),
        lam=np.full(len(T), la),
        model_id=np.zeros(len(T), int),
        models=("Stable-Neohookean",),
        is_fixed=is_fixed,
        ext_force=ext,
    )
    config = SimConfig(
        h=0.01,
        outer_steps=4,
        itr_tol=1e-10,
        max_iterative_solver_iters=2000,
        dhat=2e-2,
        kappa=1e7,            # stiff barrier: block-Jacobi alone degrades
        solver=solver,
        mixed_variables=("mixed-stretch", "mixed-collision"),
        dtype="float64",
    )
    x0 = jnp.asarray(mesh.V0)
    state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
    coarse = None
    if solver == "pcg":
        coarse = build_coarse_space(
            np.asarray(mesh.V0), np.asarray(mesh.T),
            ~np.asarray(mesh.free_mask, bool),
            target_size=coarse_target, dtype=jnp.float64,
        )
    return Simulation(
        mesh=mesh, config=config, bc_specs=(), state=state,
        dim=3, obj_slices=[], coarse=coarse,
    )


def _run(sim, steps=3):
    iters = []
    for _ in range(steps):
        sim.step()
        it = int(sim.state.stats.iterations)
        iters.extend(np.asarray(sim.state.stats.solver_iters)[:it])
    assert sim.state.contact.frames.shape[0] > 0  # contact actually active
    return np.asarray(sim.state.x), float(np.mean(iters))


def test_contact_coarse_no_regression_vs_blind_coarse():
    """A coarse space that IGNORES the barrier Hessian mis-corrects under
    stiff contact and triples the CG count (measured: ~130 vs ~40 here);
    the contact blocks restore block-Jacobi-level counts while keeping the
    two-level win on the elastic part. All variants reach the same
    solution."""
    from mixedfem_tpu.solvers import coarse as coarsemod

    x_c, it_c = _run(_stiff_contact_sim("pcg"))
    x_bj, it_bj = _run(_stiff_contact_sim("pcg-block-jacobi"))

    orig = coarsemod.coarse_matrix
    try:
        coarsemod.coarse_matrix = (
            lambda mesh, cs, ms_coeffs, contact=None: orig(
                mesh, cs, ms_coeffs, None
            )
        )
        # the jitted step traced coarse_matrix already — force a retrace
        newton.newton_step.clear_cache()
        x_blind, it_blind = _run(_stiff_contact_sim("pcg"))
    finally:
        coarsemod.coarse_matrix = orig
        newton.newton_step.clear_cache()

    # same solution everywhere (preconditioning changes iterations only)
    scale = np.abs(x_bj).max()
    np.testing.assert_allclose(x_c, x_bj, atol=5e-6 * scale)
    np.testing.assert_allclose(x_blind, x_bj, atol=5e-6 * scale)
    # contact-aware coarse must not regress vs block-Jacobi...
    assert it_c <= 1.1 * it_bj, (it_c, it_bj)
    # ...and must fix the contact-blind regression
    assert it_c < 0.5 * it_blind, (it_c, it_blind)
