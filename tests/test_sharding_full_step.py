"""Sharded FULL Newton step on the stencil path
(parallel/stencil_shard.sharded_newton_step) vs the single-chip
newton_step on the same box grid: trajectory parity over multiple
implicit steps on the virtual 8-device CPU mesh (VERDICT r4 item 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.ops import stencil as st
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.parallel import stencil_shard as ss
from mixedfem_tpu.solvers import coarse as cm
from tests.test_stencil import _grid_setup


def _n_devices(n=8):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices (got {len(devs)})")
    return devs[:n]


def _setup(nx=9, ny=4, nz=3, integrator="BDF1", coarse=False):
    mesh, plan = _grid_setup(nx=nx, ny=ny, nz=nz, dtype=jnp.float64)
    config = SimConfig(
        h=0.01,
        outer_steps=4,
        newton_tol=1e-12,
        max_iterative_solver_iters=300,
        itr_tol=1e-10,
        integrator=integrator,
        mixed_variables=("mixed-stretch",),
        dtype="float64",
        coarse_inverse_method="exact",
    )
    x0 = jnp.asarray(mesh.V0)
    state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
    cs = None
    if coarse:
        cs = cm.build_coarse_space_grid(
            np.asarray(mesh.V0), np.asarray(mesh.T),
            ~np.asarray(mesh.free_mask, bool),
            (plan.NI, plan.NJ, plan.NK), block=2, dtype=jnp.float64,
        )
    return mesh, plan, config, state, cs


@pytest.mark.parametrize("precond", ["bj", "two-level"])
def test_full_step_trajectory_parity(precond):
    devs = _n_devices(8)
    jmesh = Mesh(np.array(devs), ("x",))
    mesh, plan, config, state, cs = _setup(coarse=(precond == "two-level"))
    sp = ss.build_shard_plan(plan, 8)

    st_ref = state
    st_sh = state
    for k in range(3):
        st_ref = newton.newton_step(
            mesh, config, (), st_ref, cs, (), plan
        )
        st_sh = ss.sharded_newton_step(
            sp, jmesh, mesh, config, st_sh, coarse=cs
        )
        x_r, x_s = np.asarray(st_ref.x), np.asarray(st_sh.x)
        assert np.isfinite(x_s).all()
        scale = max(np.abs(x_r).max(), 1e-12)
        err = np.abs(x_s - x_r).max() / scale
        assert err < 1e-8, (k, err)
        s_err = np.abs(
            np.asarray(st_sh.s) - np.asarray(st_ref.s)
        ).max()
        assert s_err < 1e-8, (k, s_err)
        # same Newton iteration count; CG counts within the two-level
        # restrict/prolong roundoff band — except the LAST Newton solve,
        # whose rhs is ~0 (decrement ~1e-9) and whose count is pure
        # summation-order roundoff
        assert int(st_sh.stats.iterations) == int(st_ref.stats.iterations)
        it = int(st_ref.stats.iterations)
        cg_r = np.asarray(st_ref.stats.solver_iters)[: it - 1]
        cg_s = np.asarray(st_sh.stats.solver_iters)[: it - 1]
        assert np.abs(cg_r - cg_s).max() <= 2, (cg_r, cg_s)


def test_full_step_bdf2():
    devs = _n_devices(8)
    jmesh = Mesh(np.array(devs), ("x",))
    mesh, plan, config, state, _ = _setup(integrator="BDF2")
    sp = ss.build_shard_plan(plan, 8)

    st_ref, st_sh = state, state
    for k in range(3):
        st_ref = newton.newton_step(mesh, config, (), st_ref, None, (), plan)
        st_sh = ss.sharded_newton_step(sp, jmesh, mesh, config, st_sh)
        err = np.abs(np.asarray(st_sh.x) - np.asarray(st_ref.x)).max()
        assert err < 1e-8 * max(np.abs(np.asarray(st_ref.x)).max(), 1.0), (
            k, err,
        )


def test_local_mesh_padding_finite():
    """Uneven NI/D split: the last shard is pure padding — the step must
    stay finite through the polar/material pipeline (rest-extrapolated
    pad rows, tiled element data, zero vols)."""
    devs = _n_devices(8)
    jmesh = Mesh(np.array(devs), ("x",))
    # NI=8 vertex planes over 8 shards -> Si=1; NIc=7 cell planes, shard 7
    # holds only the spill-target plane and padding
    mesh, plan, config, state, _ = _setup(nx=7, ny=3, nz=3)
    sp = ss.build_shard_plan(plan, 8)
    st_sh = ss.sharded_newton_step(sp, jmesh, mesh, config, state)
    assert np.isfinite(np.asarray(st_sh.x)).all()
    st_ref = newton.newton_step(mesh, config, (), state, None, (), plan)
    err = np.abs(np.asarray(st_sh.x) - np.asarray(st_ref.x)).max()
    assert err < 1e-8
