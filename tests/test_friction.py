"""Friction and vanilla-collision variable tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.optimizer import newton
from tests.test_collision import drop_scene


def _run(config_kwargs, dim=3, steps=20):
    from mixedfem_tpu.io.scene import Simulation

    mesh, config, n_slab = drop_scene(dim=dim)
    import dataclasses

    config = dataclasses.replace(config, **config_kwargs)
    x0 = jnp.asarray(mesh.V0)
    state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
    sim = Simulation(
        mesh=mesh, config=config, bc_specs=(), state=state,
        dim=dim, obj_slices=[],
    )
    for _ in range(steps):
        sim.step()
        assert np.isfinite(np.asarray(sim.state.x)).all()
    return sim, mesh, n_slab


class TestVanillaCollision:
    def test_drop_no_penetration(self):
        sim, mesh, n_slab = _run(
            dict(
                mixed_variables=("mixed-stretch",),
                variables=("collision",),
                kappa=1e5,
            )
        )
        X = np.asarray(sim.state.x)
        slab_top = float(np.asarray(mesh.V0)[:n_slab, 1].max())
        assert X[n_slab:, 1].min() > slab_top - 1e-4


class TestFriction:
    def test_friction_resists_sliding(self):
        """On a slab with friction, a block pushed sideways by an initial
        velocity slides LESS than without friction."""
        import dataclasses
        from mixedfem_tpu.io.scene import Simulation

        def run(mu):
            mesh, config, n_slab = drop_scene(dim=3)
            config = dataclasses.replace(
                config,
                variables=("friction",) if mu > 0 else (),
                contact_mu=mu,
                outer_steps=6,
            )
            x0 = jnp.asarray(mesh.V0)
            v0 = jnp.zeros_like(x0)
            nv_slab = n_slab
            v0 = v0.at[nv_slab:, 0].set(1.0)  # sideways kick to the block
            state = newton.init_state(mesh, config, (), x0, v0)
            sim = Simulation(
                mesh=mesh, config=config, bc_specs=(), state=state,
                dim=3, obj_slices=[],
            )
            for _ in range(25):
                sim.step()
            X = np.asarray(sim.state.x)
            return X[nv_slab:, 0].mean(), n_slab

        slide_nofric, n_slab = run(0.0)
        slide_fric, _ = run(0.9)
        assert np.isfinite(slide_fric) and np.isfinite(slide_nofric)
        assert slide_fric < slide_nofric - 1e-4, (slide_fric, slide_nofric)


class TestDirectWithFriction:
    def test_cholmod_friction_collision_matches_pcg(self):
        """A friction + vanilla-collision scene stepped by the cholmod
        (direct) path matches the pcg trajectory — the reference's direct
        solvers handle every variable set (linear_system.h:17-31)."""

        def run(solver):
            sim, mesh, n_slab = _run(
                dict(
                    mixed_variables=("mixed-stretch",),
                    variables=("collision", "friction"),
                    contact_mu=0.5,
                    kappa=1e5,
                    solver=solver,
                    itr_tol=1e-11,
                    max_iterative_solver_iters=20000,
                    outer_steps=3,
                ),
                steps=3,
            )
            return np.asarray(sim.state.x)

        x_pcg = run("eigen-pcg-block_jacobi")
        x_dir = run("cholmod")
        assert np.isfinite(x_dir).all()
        scale = np.abs(x_dir).max()
        # 2e-5: CG converges on a RELATIVE residual (||r|| <= tol ||b||),
        # so over 3 steps x 3 Newton solves the iterative trajectory
        # accumulates O(1e-5)-relative drift against the direct factors
        np.testing.assert_allclose(x_pcg, x_dir, atol=2e-5 * scale)
