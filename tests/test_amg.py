"""Smoothed-aggregation AMG on the dual system (the reference's
subspace-amgcl path, src/linear_solvers/amgcl_solver.h:20-85)."""

import numpy as np
import jax.numpy as jnp

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.integrators import bdf as bdfmod
from mixedfem_tpu.solvers import amg as amgmod
from mixedfem_tpu.solvers import minres as mrmod
from mixedfem_tpu.variables import mixed_stretch as ms

from tests.test_newton import make_state, small_beam


def _dual_system(nx=5, ny=3, nz=3):
    mesh, V = small_beam(nx, ny, nz)
    config = SimConfig(h=0.02, dtype="float64")
    state = make_state(mesh, config)
    dt = bdfmod.bdf_dt(state.bdf)
    # a deformed iterate so H isn't the rest-state one
    x = state.x + 0.01 * jnp.sin(jnp.arange(state.x.size)).reshape(
        state.x.shape
    )
    c = ms.update(mesh, x, state.s, dt)
    rhs = mrmod.kkt_rhs(mesh, state.bdf, c, x, state.s, state.la)
    return mesh, c, rhs


class TestAssembly:
    def test_dual_matrix_matches_matrix_free(self):
        """Assembled S agrees with solvers/dual.py's matrix-free S apply."""
        from mixedfem_tpu.solvers import dual as dualmod
        from mixedfem_tpu.mesh import mesh as meshmod
        from mixedfem_tpu.ops import sym

        mesh, c, rhs = _dual_system()
        S, C, mlinv_dof, blocks = amgmod.assemble_dual(mesh, c)
        E, N = rhs[1].shape

        rng = np.random.default_rng(0)
        dl = rng.normal(size=(E, N))
        got = (S @ dl.reshape(-1)).reshape(E, N)

        w = sym.sym_weights(mesh.dim, dtype=jnp.float64)
        ml_inv = jnp.where(mesh.mass_lumped > 0, 1.0 / mesh.mass_lumped, 0.0)
        vw = mesh.vols[:, None] * w
        t = meshmod.project_free(
            mesh,
            dualmod._Ct_apply(mesh, c, jnp.asarray(dl)) * ml_inv[:, None],
        )
        want = dualmod._C_apply(mesh, c, t) + vw * jnp.einsum(
            "eij,ej->ei", c.Hinv, vw * jnp.asarray(dl)
        ) / mesh.vols[:, None]
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-9,
                                   atol=1e-12)

    def test_spd(self):
        mesh, c, rhs = _dual_system(3, 2, 2)
        S, *_ = amgmod.assemble_dual(mesh, c)
        Sd = S.toarray()
        np.testing.assert_allclose(Sd, Sd.T, atol=1e-11)
        evals = np.linalg.eigvalsh(Sd)
        assert evals.min() > -1e-10 * evals.max()


class TestHierarchy:
    def test_builds_multiple_levels_and_vcycle_contracts(self):
        mesh, c, rhs = _dual_system(8, 3, 3)
        S, *_ = amgmod.assemble_dual(mesh, c)
        N = rhs[1].shape[1]
        amg = amgmod.SAAMG(S, block_size=N)
        assert len(amg.levels) >= 1
        # coarse level really is coarser
        assert amg.levels[0][1].shape[1] < S.shape[0]

        rng = np.random.default_rng(1)
        b = rng.normal(size=S.shape[0])
        x = amg.vcycle(b)
        # one V-cycle must contract the residual of S x = b
        assert np.linalg.norm(b - S @ x) < 0.9 * np.linalg.norm(b)

    def test_amg_cg_matches_direct(self):
        import scipy.sparse.linalg as spla

        mesh, c, rhs = _dual_system()
        S, *_ = amgmod.assemble_dual(mesh, c)
        N = rhs[1].shape[1]
        rng = np.random.default_rng(2)
        b = rng.normal(size=S.shape[0])
        x, it = amgmod.solve_amg_cg(S, b, block_size=N, tol=1e-12,
                                    maxiter=2000)
        x_ref = spla.spsolve(S.tocsc(), b)
        np.testing.assert_allclose(x, x_ref, atol=1e-7 * np.abs(x_ref).max())
        assert 0 < it < S.shape[0]


class TestDualSolve:
    def test_matches_matrix_free_dual_solve(self):
        """solve_dual_amg and solvers/dual.solve_dual produce the same
        (dx, ds, dlam) on the same rhs."""
        from mixedfem_tpu.solvers import dual as dualmod

        mesh, c, rhs = _dual_system()
        dx_a, ds_a, dl_a, it_a = amgmod.solve_dual_amg(
            mesh, c, rhs, tol=1e-12, maxiter=2000
        )
        dx_m, ds_m, dl_m, it_m, rel = dualmod.solve_dual(
            mesh, c, rhs, max_iters=20000, tol=1e-13
        )
        scale = np.abs(np.asarray(dx_m)).max()
        np.testing.assert_allclose(dx_a, np.asarray(dx_m),
                                   atol=1e-8 * scale)
        np.testing.assert_allclose(ds_a, np.asarray(ds_m), atol=1e-8)
        np.testing.assert_allclose(dl_a, np.asarray(dl_m),
                                   atol=1e-5 * np.abs(dl_m).max())
