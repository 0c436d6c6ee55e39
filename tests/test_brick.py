"""Fused brick matvec/scatter kernels (ops/brick.py) — interpret-mode
parity against the reference-semantics element_matvec / segment_sum.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mixedfem_tpu.config import enu_to_lame
from mixedfem_tpu.mesh import generators, mesh as meshmod
from mixedfem_tpu.ops import brick
from mixedfem_tpu.solvers.operator import (
    element_matvec,
    sort_elements_banded,
)
from mixedfem_tpu.variables import mixed_stretch as ms


def _beam(nx=6, ny=4, nz=3):
    V, T = generators.box_tet_mesh(nx, ny, nz, size=(4.0, 1.0, 1.0))
    T = T[sort_elements_banded(T)]
    la, mu = enu_to_lame(1e6, 0.45)
    is_fixed = np.zeros(len(V), bool)
    is_fixed[V[:, 0] < 1e-9] = True
    return meshmod.build_mesh_data(
        V, T,
        density=np.full(len(T), 1000.0),
        mu=np.full(len(T), mu),
        lam=np.full(len(T), la),
        model_id=np.zeros(len(T), int),
        models=("Stable-Neohookean",),
        is_fixed=is_fixed,
        ext_force=np.zeros_like(V),
        dtype=jnp.float32,
    )


class TestBrickKernels:
    def test_matvec_matches_element_matvec(self):
        mesh = _beam()
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            np.asarray(mesh.V0) + 0.01 * rng.standard_normal((mesh.nv, 3)),
            jnp.float32,
        )
        s, _ = ms.reset(mesh, x)
        coeffs = ms.update(mesh, x, s, 0.02)
        p = jnp.asarray(rng.standard_normal((mesh.nv, 3)), jnp.float32)

        ref = element_matvec(mesh, p, ms_coeffs=coeffs)

        plan = brick.build_brick_plan(np.asarray(mesh.T), mesh.nv, ce=128)
        assert plan is not None
        Gw_rows, m_rows = brick.element_rows(mesh, coeffs)
        Gw_rows = brick.pad_rows(plan, Gw_rows)
        m_rows = brick.pad_rows(plan, m_rows)
        pm = p * mesh.free_mask[:, None]
        out = brick.from_brick(
            brick.brick_matvec(
                plan, Gw_rows, m_rows, brick.to_brick(pm, plan.Hpad), 3,
                interpret=True,
            ),
            mesh.nv, 3,
        ) * mesh.free_mask[:, None]
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-6 * scale
        )

    def test_scatter_matches_segment_sum(self):
        mesh = _beam()
        rng = np.random.default_rng(1)
        plan = brick.build_brick_plan(np.asarray(mesh.T), mesh.nv, ce=128)
        vals = jnp.asarray(
            rng.standard_normal((mesh.nelem, 4, 3)), jnp.float32
        )
        out = brick.from_brick(
            brick.brick_scatter(plan, vals, interpret=True), mesh.nv, 3
        )
        ref = jax.ops.segment_sum(
            vals.reshape(-1, 3), mesh.T.reshape(-1), num_segments=mesh.nv
        )
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-6 * scale
        )

    def test_round_trip_layout(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1000, 3)), jnp.float32)
        b = brick.to_brick(x, 16)
        assert b.shape == (48, 128)
        np.testing.assert_array_equal(
            np.asarray(brick.from_brick(b, 1000, 3)), np.asarray(x)
        )

    def test_plan_rejects_wide_bandwidth(self):
        """A mesh whose banded window exceeds 128 sublanes falls back."""
        rng = np.random.default_rng(3)
        nv = 40000
        # random tets spanning the whole vertex range: bandwidth ~ nv
        T = rng.integers(0, nv, size=(500, 4)).astype(np.int32)
        assert brick.build_brick_plan(T, nv, ce=128) is None
