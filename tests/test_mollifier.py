"""EE-mollifier tests (collision/mollifier.py; the reference ships this
disabled — mixed_collision.cpp:149-165)."""

import numpy as np
import jax
import jax.numpy as jnp

from mixedfem_tpu.collision import mollifier as mol
from mixedfem_tpu.collision.distances import EE, PT
from mixedfem_tpu.config import SimConfig, enu_to_lame
from mixedfem_tpu.mesh import generators, mesh as meshmod
from mixedfem_tpu.optimizer import newton


class TestMollifierMath:
    def test_values(self):
        rest = jnp.asarray(
            np.array([[[0, 0, 0], [1, 0, 0], [0, 0, 1], [1, 0, 1.0]]])
        )
        epsx = mol.eps_x(rest)
        np.testing.assert_allclose(float(epsx[0]), 1e-3, rtol=1e-12)

        # perpendicular edges: c = 1 >> eps_x -> m = 1
        verts = jnp.asarray(
            np.array([[[0, 0, 0], [1, 0, 0], [0.5, -0.5, 0.3],
                       [0.5, 0.5, 0.3]]])
        )
        m = mol.mollifier(verts, jnp.asarray([EE]), epsx)
        np.testing.assert_allclose(float(m[0]), 1.0)

        # exactly parallel edges: c = 0 -> m = 0
        verts_p = jnp.asarray(
            np.array([[[0, 0, 0], [1, 0, 0], [0, 0.3, 0], [1, 0.3, 0.0]]])
        )
        m = mol.mollifier(verts_p, jnp.asarray([EE]), epsx)
        np.testing.assert_allclose(float(m[0]), 0.0, atol=1e-14)

        # non-EE types are always 1
        m = mol.mollifier(verts_p, jnp.asarray([PT]), epsx)
        np.testing.assert_allclose(float(m[0]), 1.0)

    def test_gradient_fd(self):
        rng = np.random.default_rng(0)
        # nearly-parallel edges inside the mollified region
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 0.1, 0.0], [1.0, 0.1, 0.012]]
        ) + 0.001 * rng.standard_normal((4, 3))
        rest = verts + 0.05 * rng.standard_normal((4, 3))
        epsx = mol.eps_x(jnp.asarray(rest[None]))
        ftype = jnp.asarray([EE])
        m0, g = mol.mollifier_grad(jnp.asarray(verts[None]), ftype, epsx)
        assert 0.0 < float(m0[0]) < 1.0, float(m0[0])  # inside the ramp
        h = 1e-7
        for k in range(4):
            for r in range(3):
                vp = verts.copy(); vp[k, r] += h
                vm = verts.copy(); vm[k, r] -= h
                fd = (
                    float(mol.mollifier(jnp.asarray(vp[None]), ftype, epsx)[0])
                    - float(mol.mollifier(jnp.asarray(vm[None]), ftype, epsx)[0])
                ) / (2 * h)
                np.testing.assert_allclose(
                    float(g[0, k, r]), fd, rtol=1e-4, atol=1e-6
                )


class TestMollifiedStep:
    def _near_parallel_scene(self):
        """Two slender bars crossing at a shallow angle: EE contacts near
        the mollified region."""
        V1, T1 = generators.box_tet_mesh(8, 1, 1, size=(1.0, 0.05, 0.05))
        V2, T2 = generators.box_tet_mesh(8, 1, 1, size=(1.0, 0.05, 0.05))
        # rotate bar 2 slightly about y and stack above bar 1
        th = 0.06
        Rm = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]]
        )
        V2 = V2 @ Rm.T + np.array([0.0, 0.058, 0.0])
        V = np.concatenate([V1, V2])
        T = np.concatenate([T1, T2 + len(V1)])
        la, mu = enu_to_lame(1e6, 0.40)
        is_fixed = np.zeros(len(V), bool)
        is_fixed[: len(V1)] = True
        ext = np.zeros_like(V)
        ext[:, 1] = -9.8
        mesh = meshmod.build_mesh_data(
            V, T,
            density=np.full(len(T), 1000.0),
            mu=np.full(len(T), mu),
            lam=np.full(len(T), la),
            model_id=np.zeros(len(T), int),
            models=("Stable-Neohookean",),
            is_fixed=is_fixed,
            ext_force=ext,
        )
        return mesh

    def test_mollified_step_stable_and_contact_active(self):
        from mixedfem_tpu.io.scene import Simulation

        mesh = self._near_parallel_scene()
        config = SimConfig(
            h=0.01, outer_steps=5, itr_tol=1e-9, dhat=1e-2, kappa=1e5,
            ee_mollifier=True,
            mixed_variables=("mixed-stretch", "mixed-collision"),
            dtype="float64",
        )
        x0 = jnp.asarray(mesh.V0)
        state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
        sim = Simulation(
            mesh=mesh, config=config, bc_specs=(), state=state,
            dim=3, obj_slices=[],
        )
        for _ in range(6):
            sim.step()
        X = np.asarray(sim.state.x)
        assert np.isfinite(X).all()
        # the upper bar must rest on the lower one, not fall through
        assert X[len(X) // 2 :, 1].min() > -0.02
