"""Indefinite KKT path tests: MINRES on the full mixed system must agree
with the condensed SPD path (they are Schur complements of each other)."""

import numpy as np
import jax
import jax.numpy as jnp

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.integrators import bdf as bdfmod
from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.solvers import minres as mrmod
from mixedfem_tpu.solvers import operator as opmod
from mixedfem_tpu.solvers import pcg as pcgmod
from mixedfem_tpu.variables import displacement as disp
from mixedfem_tpu.variables import mixed_stretch as ms

from tests.test_newton import make_state, small_beam


class TestMinres:
    def test_minres_solves_spd(self):
        """Sanity: MINRES on a small SPD pytree system."""
        rng = np.random.default_rng(0)
        M = rng.standard_normal((20, 20))
        M = M @ M.T + np.eye(20)
        b = jnp.asarray(rng.standard_normal(20))
        Mj = jnp.asarray(M)
        x, it, rel = mrmod.minres(
            lambda v: Mj @ v, b, jnp.zeros_like(b), 200, 1e-12
        )
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(M, np.asarray(b)), atol=1e-8
        )

    def test_minres_solves_indefinite(self):
        rng = np.random.default_rng(1)
        M = rng.standard_normal((24, 24))
        M = M + M.T  # symmetric indefinite
        b = jnp.asarray(rng.standard_normal(24))
        Mj = jnp.asarray(M)
        x, it, rel = mrmod.minres(
            lambda v: Mj @ v, b, jnp.zeros_like(b), 500, 1e-12
        )
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(M, np.asarray(b)), atol=1e-6
        )


class TestKKT:
    def test_kkt_matches_condensed(self):
        """dx, ds, lambda from the full KKT solve == the condensed path."""
        mesh, V = small_beam(3, 2, 2)
        config = SimConfig(outer_steps=1, dtype="float64")
        state = make_state(mesh, config)
        dt = bdfmod.bdf_dt(state.bdf)
        # deformed iterate with nonzero multipliers
        x = state.x + meshmod.project_free(
            mesh, 0.02 * jax.random.normal(jax.random.PRNGKey(0), state.x.shape)
        )
        s = state.s * 1.01
        la = 0.1 * jax.random.normal(jax.random.PRNGKey(1), state.la.shape)

        coeffs = ms.update(mesh, x, s, dt)

        # condensed path
        b = -disp.gradient(mesh, state.bdf, x) + ms.rhs(mesh, coeffs, s)
        eye = jnp.eye(3, dtype=x.dtype)
        blocks = ms.diag_blocks(mesh, coeffs) + mesh.mass_diag[:, None, None] * eye
        Minv = pcgmod.block_jacobi_inv(blocks, mesh.free_mask)
        dx_c, _, _ = pcgmod.pcg(
            lambda p: opmod.element_matvec(mesh, p, ms_coeffs=coeffs),
            b, jnp.zeros_like(b), Minv, max_iters=5000, tol=1e-13,
        )
        ds_c, la_c = ms.local_solve(mesh, coeffs, s, dx_c)

        # full KKT path — note the condensed rhs folds the multiplier terms
        # differently: condensed b = -(inertia_grad) - vol G^T(H(Sv-s)+g),
        # which corresponds to eliminating (ds, dl) from THIS KKT system.
        A = mrmod.kkt_operator(mesh, coeffs)
        rhs = mrmod.kkt_rhs(mesh, state.bdf, coeffs, x, s, la)
        x0 = tuple(jax.tree.map(jnp.zeros_like, rhs))
        Mk = mrmod.kkt_block_diag_preconditioner(mesh, coeffs)
        u, it, rel = mrmod.minres(A, rhs, x0, max_iters=20000, tol=1e-13, Minv=Mk)
        dx_k, ds_k, dl_k = u
        la_k = la + dl_k

        assert float(rel) < 1e-10, (int(it), float(rel))
        scale = max(1e-12, float(jnp.abs(dx_c).max()))
        np.testing.assert_allclose(
            np.asarray(dx_k), np.asarray(dx_c), atol=2e-6 * scale
        )
        np.testing.assert_allclose(
            np.asarray(ds_k), np.asarray(ds_c), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(la_k), np.asarray(la_c), atol=1e-4
        )


class TestDualCondensed:
    def test_dual_satisfies_lumped_kkt(self):
        """The dual-condensed solution satisfies the lumped-mass KKT system."""
        from mixedfem_tpu.ops import sym as symmod
        from mixedfem_tpu.solvers import dual as dualmod

        mesh, V = small_beam(3, 2, 2)
        config = SimConfig(outer_steps=1, dtype="float64")
        state = make_state(mesh, config)
        dt = bdfmod.bdf_dt(state.bdf)
        x = state.x + meshmod.project_free(
            mesh, 0.02 * jax.random.normal(jax.random.PRNGKey(0), state.x.shape)
        )
        s = state.s * 1.01
        la = 0.1 * jax.random.normal(jax.random.PRNGKey(1), state.la.shape)
        coeffs = ms.update(mesh, x, s, dt)
        rhs = mrmod.kkt_rhs(mesh, state.bdf, coeffs, x, s, la)
        dx, ds, dl, it, rel = dualmod.solve_dual(
            mesh, coeffs, rhs, max_iters=5000, tol=1e-12
        )
        assert float(rel) < 1e-10

        # residuals of the lumped KKT rows
        w = symmod.sym_weights(3, dtype=x.dtype)
        r_x, r_s, r_l = rhs
        ml = mesh.mass_lumped[:, None]
        row_x = meshmod.project_free(mesh, ml * dx) + dualmod._Ct_apply(
            mesh, coeffs, dl
        ) - r_x
        row_s = mesh.vols[:, None] * jnp.einsum(
            "eij,ej->ei", coeffs.H, ds
        ) - mesh.vols[:, None] * (w * dl) - r_s
        row_l = dualmod._C_apply(mesh, coeffs, dx) - mesh.vols[:, None] * (
            w * ds
        ) - r_l
        for r, name in ((row_x, "x"), (row_s, "s"), (row_l, "l")):
            nrm = float(jnp.abs(r).max())
            assert nrm < 1e-7, (name, nrm)
