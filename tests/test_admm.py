"""ADMM full-KKT solver (solvers/admm.py, the reference's "admm-solver"):
the alternating sweeps must reach the MINRES/KKT solution, and the Newton
trajectory under it must agree with the exact direct path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.integrators import bdf as bdfmod
from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.optimizer.newton_direct import newton_step_direct
from mixedfem_tpu.solvers import admm as admmmod
from mixedfem_tpu.solvers import minres as mrmod
from mixedfem_tpu.variables import mixed_stretch as ms

from tests.test_newton import make_state, small_beam


class TestAdmmSolve:
    def test_matches_minres_kkt_solution(self):
        """The ADMM fixed point IS the KKT solution (same system as
        tests/test_kkt.py's cross-check)."""
        mesh, V = small_beam(3, 2, 2)
        config = SimConfig(outer_steps=1, dtype="float64")
        state = make_state(mesh, config)
        dt = bdfmod.bdf_dt(state.bdf)
        x = state.x + meshmod.project_free(
            mesh,
            0.02 * jax.random.normal(jax.random.PRNGKey(0), state.x.shape),
        )
        s = state.s * 1.01
        la = 0.1 * jax.random.normal(jax.random.PRNGKey(1), state.la.shape)
        coeffs = ms.update(mesh, x, s, dt)
        rhs = mrmod.kkt_rhs(mesh, state.bdf, coeffs, x, s, la)

        A = mrmod.kkt_operator(mesh, coeffs)
        Mk = mrmod.kkt_block_diag_preconditioner(mesh, coeffs)
        u0 = tuple(jax.tree.map(jnp.zeros_like, rhs))
        sol_ref, _, _ = mrmod.minres(A, rhs, u0, 20000, 1e-13, Minv=Mk)

        sol, it, err = admmmod.solve_admm(
            mesh, coeffs, rhs,
            max_iters=300, tol=1e-10, inner_iters=60,
        )
        assert int(it) > 2
        for got, ref in zip(sol, sol_ref):
            scale = float(jnp.abs(ref).max())
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-4 * scale
            )

    def test_linear_in_rhs(self):
        """With a fixed iteration count the solve is (piecewise) smooth in
        the rhs and exactly zero on a zero rhs."""
        mesh, V = small_beam(2, 1, 1)
        config = SimConfig(outer_steps=1, dtype="float64")
        state = make_state(mesh, config)
        dt = bdfmod.bdf_dt(state.bdf)
        coeffs = ms.update(mesh, state.x, state.s, dt)
        rhs = tuple(
            jnp.zeros_like(r)
            for r in mrmod.kkt_rhs(
                mesh, state.bdf, coeffs, state.x, state.s, state.la
            )
        )
        sol, it, err = admmmod.solve_admm(
            mesh, coeffs, rhs, max_iters=5, tol=0.0, inner_iters=5
        )
        for leaf in jax.tree.leaves(sol):
            assert float(jnp.abs(leaf).max()) == 0.0


def _step_n(mesh, solver, n=2, outer=4):
    config = SimConfig(
        solver=solver,
        outer_steps=outer,
        dtype="float64",
        max_iterative_solver_iters=500,
        itr_tol=1e-10,
        mixed_variables=("mixed-stretch",),
    )
    state = make_state(mesh, config)
    from mixedfem_tpu.solvers.factory import resolve_solver

    for _ in range(n):
        if resolve_solver(solver) == "direct":
            state = newton_step_direct(mesh, config, (), state)
        else:
            state = newton.newton_step(mesh, config, (), state)
    return state


class TestAdmmTrajectory:
    def test_matches_direct(self):
        """Two BDF steps under 'admm-solver' track the exact direct
        trajectory (inexact inner solves -> looser tolerance, like the
        dual-cg trajectory test)."""
        mesh, V = small_beam(3, 2, 2)
        ref = _step_n(mesh, "eigen-llt")
        out = _step_n(mesh, "admm-solver", outer=8)
        x, x_ref = np.asarray(out.x), np.asarray(ref.x)
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=2e-4 * scale)

    def test_contact_drop_matches_direct(self):
        """Contact frames stack into the ADMM sweeps like the reference's
        `for var in mixed_vars` loop (preconditioners.h:255-320)."""
        from tests.test_solver_factory import (
            _contact_drop_mesh,
            _run_contact_drop,
        )

        mesh, V, nfloor = _contact_drop_mesh()
        x_ref, nc = _run_contact_drop(mesh, V, nfloor, "eigen-llt")
        assert nc > 0
        x, _ = _run_contact_drop(mesh, V, nfloor, "admm-solver", outer=8)
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=2e-3 * scale)

    def test_rejects_nodal_variables(self):
        """preconditioners.h:212 asserts vars_.size()==0 — nodal variables
        are rejected on the admm path."""
        mesh, V = small_beam(2, 1, 1)
        config = SimConfig(
            solver="admm-solver",
            dtype="float64",
            mixed_variables=("mixed-stretch",),
            variables=("stretch",),
        )
        state = make_state(mesh, config)
        with pytest.raises(NotImplementedError):
            newton.newton_step(mesh, config, (), state)
