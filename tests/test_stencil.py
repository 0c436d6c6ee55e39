"""Structured-grid stencil fast path (ops/stencil.py).

Parity of the 27-point offset-form matvec, the pad-and-sum vector
scatter, and the full Newton trajectory against the generic element-wise
operator (reference semantics: SystemMatrixPD, linear_system.h:17-31)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixedfem_tpu.config import SimConfig, enu_to_lame
from mixedfem_tpu.integrators import bdf as bdfmod
from mixedfem_tpu.mesh import generators, mesh as meshmod
from mixedfem_tpu.ops import stencil as st
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.optimizer.newton import newton_step
from mixedfem_tpu.solvers import operator as opmod
from mixedfem_tpu.variables import mixed_stretch as ms


def _grid_setup(nx=4, ny=3, nz=2, dtype=jnp.float64):
    V, T = generators.box_tet_mesh(nx, ny, nz, size=(2.0, 1.0, 0.7))
    plan, perm = st.build_stencil_plan(
        T, len(V), (nx + 1, ny + 1, nz + 1)
    )
    assert plan is not None
    T = T[perm]
    la, mu = enu_to_lame(1e6, 0.45)
    is_fixed = np.zeros(len(V), bool)
    is_fixed[V[:, 0] < 1e-9] = True
    mesh = meshmod.build_mesh_data(
        V, T, density=np.full(len(T), 1000.0), mu=np.full(len(T), mu),
        lam=np.full(len(T), la), model_id=np.zeros(len(T), int),
        models=("Stable-Neohookean",), is_fixed=is_fixed,
        ext_force=np.tile(np.array([0.0, -9.8, 0.0]), (len(V), 1)),
        dtype=dtype,
    )
    return mesh, plan


class TestStencilPlan:
    def test_detects_box_grid(self):
        V, T = generators.box_tet_mesh(3, 2, 4)
        plan, perm = st.build_stencil_plan(T, len(V), (4, 3, 5))
        assert plan is not None and plan.nslots == 5
        assert len(plan.terms) == 2 * 5 * 16

    def test_rejects_non_grid(self):
        V, T = generators.box_tet_mesh(3, 2, 2)
        # permuted vertex ids break the lattice indexing contract
        plan, _ = st.build_stencil_plan(T, len(V), (3, 4, 3))
        assert plan is None
        plan, _ = st.build_stencil_plan(T[: len(T) - 2], len(V), (4, 3, 3))
        assert plan is None

    def test_matvec_matches_element_operator(self):
        mesh, plan = _grid_setup()
        state = newton.init_state(
            mesh, SimConfig(h=0.02, dtype="float64"), (),
            jnp.asarray(mesh.V0), jnp.zeros_like(mesh.V0),
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(mesh.V0) + 0.03 * jnp.asarray(
            rng.standard_normal(mesh.V0.shape)
        )
        coeffs = ms.update(mesh, x, state.s, bdfmod.bdf_dt(state.bdf))
        p = jnp.asarray(rng.standard_normal(mesh.V0.shape))
        ref = opmod.element_matvec(mesh, p, ms_coeffs=coeffs)
        ref = ref * mesh.free_mask[:, None]
        W = st.assemble_W(plan, coeffs.Gw, mesh.mass_coeff)
        y = st.stencil_matvec(plan, W, p * mesh.free_mask[:, None])
        y = y * mesh.free_mask[:, None]
        err = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
        assert err < 1e-12

    def test_scatter_vec_matches_segment_sum(self):
        mesh, plan = _grid_setup()
        rng = np.random.default_rng(1)
        rows = jnp.asarray(
            rng.standard_normal((mesh.T.shape[0], 4, 3))
        )
        got = st.scatter_vec(plan, rows)
        ref = jax.ops.segment_sum(
            rows.reshape(-1, 3), mesh.T.reshape(-1),
            num_segments=mesh.nv,
        )
        assert float(jnp.abs(got - ref).max()) < 1e-12 * float(
            jnp.abs(ref).max()
        )

    def test_diag_blocks_are_o0_plane(self):
        mesh, plan = _grid_setup()
        state = newton.init_state(
            mesh, SimConfig(h=0.02, dtype="float64"), (),
            jnp.asarray(mesh.V0), jnp.zeros_like(mesh.V0),
        )
        coeffs = ms.update(
            mesh, jnp.asarray(mesh.V0), state.s, bdfmod.bdf_dt(state.bdf)
        )
        W = st.assemble_W(plan, coeffs.Gw, mesh.mass_coeff)
        db = st.diag_blocks(plan, W)
        # stretch part must match the generic diag; mass part is the
        # consistent (not lumped) diagonal
        ref = ms.diag_blocks(mesh, coeffs)
        m = np.asarray(mesh.free_mask, bool)
        stretch_delta = np.asarray(db - ref)[m]
        # subtract the consistent-mass diagonal contribution
        mass_diag = st.scatter_vec(
            plan,
            jnp.einsum(
                "ekk->ek", mesh.mass_coeff
            )[..., None] * jnp.ones((1, 1, 3), mesh.vols.dtype),
        )
        for di in range(3):
            stretch_delta[:, di, di] -= np.asarray(mass_diag)[m][:, di]
        assert np.abs(stretch_delta).max() < 1e-10 * float(
            jnp.abs(ref).max()
        )


class TestStencilTrajectory:
    def test_newton_step_parity(self):
        mesh, plan = _grid_setup(nx=6, ny=4, nz=3)
        config = SimConfig(h=0.02, outer_steps=5, dtype="float64")
        x0 = jnp.asarray(mesh.V0)
        outs = {}
        for name, pl in [("none", None), ("stencil", plan)]:
            state = newton.init_state(
                mesh, config, (), x0, jnp.zeros_like(x0)
            )
            for _ in range(3):
                state = newton_step(
                    mesh, config, (), state, None, (), pl
                )
            assert bool(jnp.isfinite(state.x).all())
            outs[name] = np.asarray(state.x)
        assert np.abs(outs["none"] - outs["stencil"]).max() < 1e-8
