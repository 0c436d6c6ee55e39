"""Rod element end-to-end: the wired mixed-stretch path for k=2 segments.

The reference's RodMesh leaves deformation_gradient an unimplemented stub
(src/mesh/rod_mesh.h:30-34) — rods cannot simulate there. Here rods are a
first-class MeshData element type (mesh/mesh.py:build_rod_mesh_data)."""

import numpy as np
import jax.numpy as jnp

from mixedfem_tpu.config import SimConfig, enu_to_lame
from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.variables import mixed_stretch as ms


def chain_rod(n=9, length=1.0, ym=1e7):
    V = np.zeros((n, 3))
    V[:, 0] = np.linspace(0.0, length, n)
    E = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    la, mu = enu_to_lame(ym, 0.40)
    is_fixed = np.zeros(n, bool)
    is_fixed[0] = True
    ext = np.tile(np.array([0.0, -9.8, 0.0]), (n, 1))
    mesh = meshmod.build_rod_mesh_data(
        V, E,
        density=np.full(len(E), 1000.0),
        mu=np.full(len(E), mu),
        lam=np.full(len(E), la),
        model_id=np.zeros(len(E), int),
        models=("ARAP",),
        is_fixed=is_fixed,
        ext_force=ext,
        radius=5e-3,
    )
    return mesh, V


class TestRodKinematics:
    def test_wired_G_matches_fd(self):
        """G from the production ms.update == FD of the stretch sym-vec."""
        mesh, V = chain_rod(n=4)
        rng = np.random.default_rng(0)
        x = V + 0.05 * rng.standard_normal(V.shape)
        xj = jnp.asarray(x)
        s0, _ = ms.reset(mesh, xj)
        coeffs = ms.update(mesh, xj, s0, 0.01)
        G = np.asarray(coeffs.G)  # (E, 6, 2, 3)

        h = 1e-6
        for e in range(mesh.nelem):
            for kk in range(2):
                for r in range(3):
                    xp = x.copy()
                    xp[np.asarray(mesh.T)[e, kk], r] += h
                    xm = x.copy()
                    xm[np.asarray(mesh.T)[e, kk], r] -= h
                    Sp, _ = ms.stretch_of_x(mesh, jnp.asarray(xp))
                    Sm, _ = ms.stretch_of_x(mesh, jnp.asarray(xm))
                    fd = (np.asarray(Sp)[e] - np.asarray(Sm)[e]) / (2 * h)
                    np.testing.assert_allclose(
                        G[e, :, kk, r], fd, atol=2e-5,
                        err_msg=f"e={e} k={kk} r={r}",
                    )

    def test_rod_def_grad_rest_identityish(self):
        """At rest, F = t0 t0^T + N0 N0^T + B0 B0^T = I."""
        mesh, V = chain_rod(n=5)
        F = meshmod.def_grad(mesh, jnp.asarray(V))
        np.testing.assert_allclose(
            np.asarray(F), np.broadcast_to(np.eye(3), F.shape), atol=1e-12
        )


class TestRodDynamics:
    def test_hanging_rod_steps_stably(self):
        """A cantilevered rod under gravity: stable stepping, bounded
        stretch, monotone settling."""
        mesh, V = chain_rod(n=9, ym=1e7)
        config = SimConfig(
            h=0.01,
            outer_steps=6,
            itr_tol=1e-10,
            max_iterative_solver_iters=2000,
            mixed_variables=("mixed-stretch",),
            dtype="float64",
        )
        x0 = jnp.asarray(V)
        state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
        for _ in range(10):
            state = newton.newton_step(mesh, config, (), state)
        X = np.asarray(state.x)
        assert np.isfinite(X).all()
        # tip fell under gravity
        assert X[-1, 1] < -1e-4
        # pinned root stayed
        np.testing.assert_allclose(X[0], V[0], atol=1e-12)
        # segment lengths stay within 5% (stiff rod, small sag)
        E = np.asarray(mesh.T)
        L = np.linalg.norm(X[E[:, 1]] - X[E[:, 0]], axis=1)
        L0 = np.asarray(mesh.rod_L)
        assert np.abs(L / L0 - 1.0).max() < 0.05
        # Newton decrement dropped within the last step
        it = int(state.stats.iterations)
        dec = np.asarray(state.stats.decrement)[:it]
        assert dec[-1] < dec[0] or dec[-1] < 1e-8
