"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.mesh import generators, mesh as meshmod
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.parallel import sharding as shmod

from tests.test_newton import small_beam, make_state


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestSharding:
    def test_sharded_step_matches_single_device(self):
        mesh, V = small_beam(4, 2, 2)
        config = SimConfig(h=0.01, outer_steps=4, itr_tol=1e-10, dtype="float64")
        state = make_state(mesh, config)

        ref = newton.newton_step(mesh, config, (), state)

        jmesh = shmod.make_device_mesh(8)
        mesh_s, state_s = shmod.shard_simulation(mesh, state, jmesh)
        out = newton.newton_step(mesh_s, config, (), state_s)

        np.testing.assert_allclose(
            np.asarray(ref.x), np.asarray(out.x), atol=1e-9
        )
        it_ref = int(ref.stats.iterations)
        it_out = int(out.stats.iterations)
        assert it_ref == it_out
        np.testing.assert_allclose(
            np.asarray(ref.stats.energy)[:it_ref],
            np.asarray(out.stats.energy)[:it_out],
            rtol=1e-9,
        )

    def test_element_padding_is_inert(self):
        """Padded degenerate elements contribute nothing."""
        mesh, V = small_beam(3, 1, 1)  # 15 tets -> pads to 16 on 8 devices
        assert mesh.nelem % 8 != 0
        config = SimConfig(h=0.01, outer_steps=3, itr_tol=1e-10, dtype="float64")
        state = make_state(mesh, config)
        ref = newton.newton_step(mesh, config, (), state)

        jmesh = shmod.make_device_mesh(8)
        mesh_s, state_s = shmod.shard_simulation(mesh, state, jmesh)
        out = newton.newton_step(mesh_s, config, (), state_s)
        np.testing.assert_allclose(np.asarray(ref.x), np.asarray(out.x), atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestHaloMatvec:
    def test_halo_matvec_matches_global(self):
        """Vertex-partitioned halo-exchange matvec == single-device operator."""
        from mixedfem_tpu.integrators import bdf as bdfmod
        from mixedfem_tpu.parallel import halo as halomod
        from mixedfem_tpu.solvers import operator as opmod
        from mixedfem_tpu.variables import mixed_stretch as msmod

        mesh, V = small_beam(24, 3, 3)  # banded box ordering (bandwidth << block)
        config = SimConfig(h=0.01, outer_steps=1, dtype="float64")
        state = make_state(mesh, config)
        dt = bdfmod.bdf_dt(state.bdf)
        coeffs = msmod.update(mesh, state.x, state.s, dt)

        jmesh = shmod.make_device_mesh(8)
        plan = halomod.build_halo_plan(mesh, 8)

        rng = np.random.default_rng(0)
        p = rng.standard_normal((mesh.nv, 3))
        p_pad = np.zeros((plan.nv_pad, 3))
        p_pad[: mesh.nv] = p

        out = halomod.halo_matvec(
            mesh, plan, coeffs, jmesh, jnp.asarray(p_pad)
        )
        ref = opmod.element_matvec(mesh, jnp.asarray(p), ms_coeffs=coeffs)
        np.testing.assert_allclose(
            np.asarray(out)[: mesh.nv], np.asarray(ref), atol=1e-10
        )
