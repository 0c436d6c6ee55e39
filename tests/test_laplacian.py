"""Laplacian / dual-ascent preconditioner tests (solvers/laplacian.py).

Reference: src/linear_solvers/preconditioners/laplacian_preconditioner.h
(M + kL with k = h^2 max stress, L from the rest-state mixed-stretch
jacobian) and dual_ascent_preconditioner.h (the alternating contact loop
around the same factorization)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.solvers import laplacian as lap

from tests.test_newton import make_state, small_beam
from tests.test_solver_factory import (
    _contact_drop_mesh, _run_contact_drop, _step_n,
)


class TestOperator:
    def test_ml_matvec_symmetric_spd(self):
        mesh, V = small_beam(3, 2, 2)
        GwL = lap.laplacian_rows(mesh)
        rng = np.random.default_rng(0)
        nv, d = mesh.nv, mesh.dim
        fm = np.asarray(mesh.free_mask)[:, None]
        u = jnp.asarray(rng.standard_normal((nv, d))) * fm
        v = jnp.asarray(rng.standard_normal((nv, d))) * fm
        k = 0.73
        Au = lap.ml_matvec(mesh, GwL, k, u)
        Av = lap.ml_matvec(mesh, GwL, k, v)
        # symmetry
        np.testing.assert_allclose(
            float(jnp.vdot(v, Au)), float(jnp.vdot(u, Av)), rtol=1e-10
        )
        # positive definite on free dofs
        assert float(jnp.vdot(u, Au)) > 0

    def test_laplacian_matches_dense_rest_assembly(self):
        """L = sum_e GwL_e^T GwL_e equals the dense rest-state Gx W^-1 Gx^T
        (laplacian_preconditioner.h:40-57) assembled brute-force from the
        same factored rows."""
        mesh, V = small_beam(2, 2, 1)
        GwL = np.asarray(lap.laplacian_rows(mesh))  # (E, N, k, d)
        nv, d = mesh.nv, mesh.dim
        T = np.asarray(mesh.T)
        L = np.zeros((nv * d, nv * d))
        E, N, k, _ = GwL.shape
        for e in range(E):
            rows = GwL[e].reshape(N, k * d)
            Ae = rows.T @ rows
            idx = np.concatenate([T[e] * d + c for c in range(d)])
            idx = (T[e][:, None] * d + np.arange(d)[None, :]).reshape(-1)
            L[np.ix_(idx, idx)] += Ae
        u = np.random.default_rng(1).standard_normal((nv, d))
        u *= np.asarray(mesh.free_mask)[:, None]
        got = np.asarray(
            lap.ml_matvec(mesh, jnp.asarray(GwL), 1.0, jnp.asarray(u),
                          mass_scale=0.0)
        )
        want = (L @ u.reshape(-1)).reshape(nv, d)
        want *= np.asarray(mesh.free_mask)[:, None]
        np.testing.assert_allclose(got, want, atol=1e-10 * np.abs(want).max())


class TestChebyshev:
    def test_apply_approximates_inverse(self):
        """Degree-m Chebyshev on exact spectral bounds meets the classic
        error bound 2 ((sqrt(k)-1)/(sqrt(k)+1))^m (k = condition number):
        ~8% at degree 16, k = 100 — preconditioner quality."""
        rng = np.random.default_rng(2)
        n = 60
        degree, kappa = 16, 100.0
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        evals = np.linspace(10.0 / kappa, 10.0, n)
        A = jnp.asarray(Q @ np.diag(evals) @ Q.T)
        apply = lap.chebyshev_apply(
            lambda v: A @ v, 10.0 / kappa, 10.0, degree=degree
        )
        b = jnp.asarray(rng.standard_normal(n))
        z = apply(b)
        x = jnp.linalg.solve(A, b)
        rel = float(jnp.linalg.norm(z - x) / jnp.linalg.norm(x))
        rk = (np.sqrt(kappa) - 1.0) / (np.sqrt(kappa) + 1.0)
        bound = 2.0 * rk**degree
        assert rel < 1.05 * bound, (rel, bound)

    def test_power_lmax_upper_bounds(self):
        rng = np.random.default_rng(3)
        n = 40
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        evals = np.linspace(0.5, 7.0, n)
        A = jnp.asarray(Q @ np.diag(evals) @ Q.T)
        est = float(lap.power_lmax(lambda v: A @ v, (n,), jnp.float64))
        assert 7.0 <= est <= 7.0 * 1.1


class TestTrajectories:
    """eigen-pcg-dualascent under ACTIVE contact: the DA loop around the
    (M+kL)^{-1} core must still drive the same Newton trajectory (the
    preconditioner only shapes CG convergence; with a tight CG tolerance
    the solves agree)."""

    def test_dualascent_contact_drop_matches_direct(self):
        mesh, V, nfloor = _contact_drop_mesh()
        x_ref, nc = _run_contact_drop(mesh, V, nfloor, "eigen-llt")
        assert nc > 0
        x, _ = _run_contact_drop(
            mesh, V, nfloor, "eigen-pcg-dualascent", outer=6
        )
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=5e-5 * scale)

    def test_laplacian_requires_mixed(self):
        mesh, V = small_beam(2, 1, 1)
        from mixedfem_tpu.optimizer import newton

        config = SimConfig(
            solver="eigen-pcg-laplacian", dtype="float64",
            mixed_variables=(), variables=("stretch",),
        )
        state = make_state(mesh, config)
        with pytest.raises(NotImplementedError):
            newton.newton_step(mesh, config, (), state)
