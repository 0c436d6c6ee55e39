"""Multicolor Gauss-Seidel tests (solvers/gauss_seidel.py).

Reference: src/linear_solvers/preconditioners/gauss_seidel.h (GS sweeps
with Eigen iterative-solver semantics), registered as
"subspace-gauss_seidel" (linear_solver_factory.cpp:53-61)."""

import numpy as np
import jax.numpy as jnp

from mixedfem_tpu.solvers import gauss_seidel as gs

from tests.test_newton import small_beam
from tests.test_solver_factory import _step_n


class TestColoring:
    def test_coloring_is_proper(self):
        mesh, V = small_beam(3, 2, 2)
        plan = gs.build_gs_plan(mesh.T, mesh.nv, dtype=jnp.float64)
        colors = np.asarray(plan.masks).argmax(axis=0)
        T = np.asarray(mesh.T)
        for elem in T:
            cs = colors[elem]
            assert len(set(cs.tolist())) == len(elem), (
                "adjacent vertices share a color"
            )
        # every vertex has exactly one color
        np.testing.assert_allclose(np.asarray(plan.masks).sum(axis=0), 1.0)

    def test_sweep_is_exact_block_gs(self):
        """One multicolor sweep on a block system equals the explicit
        block-GS update in the same color order."""
        mesh, V = small_beam(2, 2, 1)
        plan = gs.build_gs_plan(mesh.T, mesh.nv, dtype=jnp.float64)
        rng = np.random.default_rng(0)
        nv, d = mesh.nv, mesh.dim
        n = nv * d
        M = rng.standard_normal((n, n))
        A_dense = M @ M.T + n * np.eye(n)
        # zero couplings between same-color vertices so the coloring is
        # valid for A_dense (GS exactness needs the color-block diagonal
        # to be the vertex-block diagonal)
        colors = np.asarray(plan.masks).argmax(axis=0)
        for u in range(nv):
            for v in range(nv):
                if u != v and colors[u] == colors[v]:
                    A_dense[u * d:(u + 1) * d, v * d:(v + 1) * d] = 0
                    A_dense[v * d:(v + 1) * d, u * d:(u + 1) * d] = 0
        A_dense = 0.5 * (A_dense + A_dense.T)
        b = rng.standard_normal((nv, d))

        def A(p):
            return (A_dense @ p.reshape(-1)).reshape(nv, d)

        blocks = np.stack([
            A_dense[v * d:(v + 1) * d, v * d:(v + 1) * d]
            for v in range(nv)
        ])
        binv = np.linalg.inv(blocks)

        def Binv(r):
            return jnp.einsum("nij,nj->ni", jnp.asarray(binv), r)

        x, it, err = gs.gs_solve(
            A, jnp.asarray(b), jnp.zeros((nv, d)), Binv, plan,
            max_iters=1, tol=0.0,
        )
        # explicit reference sweep
        xr = np.zeros((nv, d))
        for c in range(plan.ncolors):
            resid = b - (A_dense @ xr.reshape(-1)).reshape(nv, d)
            upd = np.einsum("nij,nj->ni", binv, resid)
            xr[colors == c] += upd[colors == c]
        np.testing.assert_allclose(np.asarray(x), xr, atol=1e-12)

    def test_gs_solve_converges(self):
        rng = np.random.default_rng(1)
        mesh, V = small_beam(2, 2, 1)
        plan = gs.build_gs_plan(mesh.T, mesh.nv, dtype=jnp.float64)
        nv, d = mesh.nv, mesh.dim
        n = nv * d
        M = rng.standard_normal((n, n))
        A_dense = 0.02 * (M @ M.T) + np.eye(n)  # diagonally dominant-ish
        b = rng.standard_normal((nv, d))

        def A(p):
            return (A_dense @ p.reshape(-1)).reshape(nv, d)

        blocks = np.stack([
            A_dense[v * d:(v + 1) * d, v * d:(v + 1) * d]
            for v in range(nv)
        ])
        binv = jnp.asarray(np.linalg.inv(blocks))

        def Binv(r):
            return jnp.einsum("nij,nj->ni", binv, r)

        x, it, err = gs.gs_solve(
            A, jnp.asarray(b), jnp.zeros((nv, d)), Binv, plan,
            max_iters=500, tol=1e-10,
        )
        assert float(err) <= 1e-10
        want = np.linalg.solve(A_dense, b.reshape(-1)).reshape(nv, d)
        np.testing.assert_allclose(np.asarray(x), want, atol=1e-8)


class TestTrajectory:
    def test_subspace_gauss_seidel_matches_direct(self):
        mesh, V = small_beam(3, 2, 2)
        ref = _step_n(mesh, "eigen-llt")
        out = _step_n(mesh, "subspace-gauss_seidel")
        x, x_ref = np.asarray(out.x), np.asarray(ref.x)
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=1e-6 * scale)
