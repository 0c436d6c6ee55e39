"""Shell (3D membrane) tests: jacobian FD check and a cloth drape run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixedfem_tpu.config import SimConfig, enu_to_lame
from mixedfem_tpu.mesh import generators, mesh as meshmod
from mixedfem_tpu.optimizer import newton


def cloth(nx=4, ny=4, ym=1e5):
    V2, T = generators.grid_tri_mesh(nx, ny, size=(1.0, 1.0))
    V = np.concatenate([V2, np.zeros((len(V2), 1))], axis=1)  # z = 0 plane
    la, mu = enu_to_lame(ym, 0.40)
    is_fixed = np.zeros(len(V), bool)
    # pin two corners
    is_fixed[np.argmin(V[:, 0] + V[:, 1])] = True
    is_fixed[np.argmin(-V[:, 0] + V[:, 1])] = True
    ext = np.zeros_like(V)
    ext[:, 2] = -9.8  # gravity out of plane
    mesh = meshmod.build_mesh_data(
        V,
        T,
        density=np.full(len(T), 100.0),
        mu=np.full(len(T), mu),
        lam=np.full(len(T), la),
        model_id=np.zeros(len(T), int),
        models=("Stable-Neohookean",),
        is_fixed=is_fixed,
        ext_force=ext,
        shell=True,
        thickness=1e-3,
    )
    return mesh, V


class TestShellKinematics:
    def test_def_grad_identity_at_rest(self):
        mesh, V = cloth()
        F = np.asarray(meshmod.def_grad(mesh, jnp.asarray(V)))
        # at rest F = P_inplane + n N^T = I for a flat sheet with N = n
        np.testing.assert_allclose(
            F, np.tile(np.eye(3), (mesh.nelem, 1, 1)), atol=1e-10
        )

    def test_shell_jacobian_fd(self):
        """dF/dx from shell_def_grad_jacobian vs finite differences
        (the reference's re-linearization, tri_mesh.cpp:128-190)."""
        mesh, V = cloth(2, 2)
        rng = np.random.default_rng(0)
        x = V + 0.1 * rng.standard_normal(V.shape)
        JT = np.asarray(
            meshmod.shell_def_grad_jacobian(mesh, jnp.asarray(x))
        )  # (E, k, r, a, c)
        h = 1e-6
        T = np.asarray(mesh.T)
        for e in [0, mesh.nelem - 1]:
            for k in range(3):
                for r in range(3):
                    xp = x.copy()
                    xp[T[e, k], r] += h
                    xm = x.copy()
                    xm[T[e, k], r] -= h
                    Fp = np.asarray(meshmod.def_grad(mesh, jnp.asarray(xp)))[e]
                    Fm = np.asarray(meshmod.def_grad(mesh, jnp.asarray(xm)))[e]
                    fd = (Fp - Fm) / (2 * h)
                    np.testing.assert_allclose(
                        JT[e, k, r], fd, atol=1e-5,
                        err_msg=f"e={e} k={k} r={r}",
                    )

    def test_rigid_rotation_stretch_free(self):
        """A rigidly rotated flat sheet has S = I (no elastic energy)."""
        from mixedfem_tpu.ops import rotation, sym

        mesh, V = cloth()
        th = 0.7
        R = np.array(
            [
                [np.cos(th), 0, np.sin(th)],
                [0, 1, 0],
                [-np.sin(th), 0, np.cos(th)],
            ]
        )
        x = V @ R.T
        F = meshmod.def_grad(mesh, jnp.asarray(x))
        _, S = rotation.polar33(F)
        sv = np.asarray(sym.pack(S))
        expected = np.tile(np.array([1.0, 1, 1, 0, 0, 0]), (mesh.nelem, 1))
        np.testing.assert_allclose(sv, expected, atol=1e-7)


class TestClothDrape:
    def test_drape_under_gravity(self):
        mesh, V = cloth(6, 6)
        config = SimConfig(
            h=0.01,
            outer_steps=6,
            itr_tol=1e-8,
            mixed_variables=("mixed-stretch",),
            dtype="float64",
        )
        x0 = jnp.asarray(mesh.V0)
        state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
        for _ in range(15):
            state = newton.newton_step(mesh, config, (), state)
            X = np.asarray(state.x)
            assert np.isfinite(X).all()
        # cloth sags in z, pinned corners stay
        fixed = ~np.asarray(mesh.free_mask, bool)
        np.testing.assert_allclose(X[fixed], V[fixed], atol=1e-12)
        assert X[:, 2].min() < -0.05
        # membrane should not stretch wildly (inextensible-ish)
        from mixedfem_tpu.ops import rotation, sym

        F = meshmod.def_grad(mesh, jnp.asarray(X))
        _, S = rotation.polar33(F)
        sv = np.asarray(sym.pack(S))
        assert np.abs(sv[:, :3] - 1).max() < 0.5


class TestRod:
    def test_rod_def_grad_identity_at_rest(self):
        from mixedfem_tpu.mesh import rod as rodmod

        V = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0.5, 0]])
        E = np.array([[0, 1], [1, 2]], np.int32)
        t0, L, N0, B0 = rodmod.rod_rest_frames(V, E)
        F = np.asarray(
            rodmod.rod_def_grad(
                jnp.asarray(V), jnp.asarray(E), jnp.asarray(t0),
                jnp.asarray(N0), jnp.asarray(B0), jnp.asarray(L),
            )
        )
        np.testing.assert_allclose(F, np.tile(np.eye(3), (2, 1, 1)), atol=1e-7)

    def test_rod_rigid_rotation_stretch_free(self):
        from mixedfem_tpu.mesh import rod as rodmod
        from mixedfem_tpu.ops import rotation, sym

        V = np.array([[0.0, 0, 0], [1.0, 0, 0]])
        E = np.array([[0, 1]], np.int32)
        t0, L, N0, B0 = rodmod.rod_rest_frames(V, E)
        th = 0.6
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]]
        )
        x = V @ R.T
        F = rodmod.rod_def_grad(
            jnp.asarray(x), jnp.asarray(E), jnp.asarray(t0),
            jnp.asarray(N0), jnp.asarray(B0), jnp.asarray(L),
        )
        _, S = rotation.polar33(F)
        sv = np.asarray(sym.pack(S))
        np.testing.assert_allclose(
            sv, [[1, 1, 1, 0, 0, 0]], atol=1e-6
        )

    def test_rod_jacobian_fd(self):
        from mixedfem_tpu.mesh import rod as rodmod

        rng = np.random.default_rng(0)
        V = np.array([[0.0, 0, 0], [1.1, 0.2, -0.1]])
        E = np.array([[0, 1]], np.int32)
        t0, L, N0, B0 = rodmod.rod_rest_frames(V, E)
        x = V + 0.1 * rng.standard_normal(V.shape)
        args = (jnp.asarray(E), jnp.asarray(t0), jnp.asarray(N0),
                jnp.asarray(B0), jnp.asarray(L))
        JT = np.asarray(rodmod.rod_def_grad_jacobian(jnp.asarray(x), *args))
        h = 1e-6
        for k in range(2):
            for r in range(3):
                xp = x.copy(); xp[k, r] += h
                xm = x.copy(); xm[k, r] -= h
                Fp = np.asarray(rodmod.rod_def_grad(jnp.asarray(xp), *args))[0]
                Fm = np.asarray(rodmod.rod_def_grad(jnp.asarray(xm), *args))[0]
                np.testing.assert_allclose(
                    JT[0, k, r], (Fp - Fm) / (2 * h), atol=1e-5
                )
