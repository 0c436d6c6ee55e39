"""Mesh discretization tests (the reference's tests/test_jacobian.cpp style:
dF/dx == J by finite differences) plus mass-matrix physical checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixedfem_tpu.mesh import discretization as disc
from mixedfem_tpu.mesh import mesh as meshmod


def two_tets():
    V = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [1.0, 1.0, 1.0],
        ]
    )
    T = np.array([[0, 1, 2, 3], [1, 2, 3, 4]], dtype=np.int32)
    return V, T


def one_tri2d():
    V = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.2, 1.1]])
    T = np.array([[0, 1, 2], [1, 3, 2]], dtype=np.int32)
    return V, T


def _mesh_data(V, T):
    E = len(T)
    return meshmod.build_mesh_data(
        V,
        T,
        density=np.full(E, 1000.0),
        mu=np.full(E, 1e6),
        lam=np.full(E, 1e6),
        model_id=np.zeros(E, int),
        models=("Stable-Neohookean",),
        is_fixed=np.zeros(len(V), bool),
        ext_force=np.zeros_like(V),
    )


class TestDefGrad:
    @pytest.mark.parametrize("make", [two_tets, one_tri2d])
    def test_identity_at_rest(self, make):
        V, T = make()
        mesh = _mesh_data(V, T)
        F = np.asarray(meshmod.def_grad(mesh, jnp.asarray(V)))
        d = V.shape[1]
        np.testing.assert_allclose(F, np.tile(np.eye(d), (len(T), 1, 1)), atol=1e-13)

    @pytest.mark.parametrize("make", [two_tets, one_tri2d])
    def test_linear_map(self, make):
        """For x = A X, F must equal A for every element."""
        V, T = make()
        mesh = _mesh_data(V, T)
        d = V.shape[1]
        rng = np.random.default_rng(0)
        A = np.eye(d) + 0.3 * rng.standard_normal((d, d))
        x = V @ A.T
        F = np.asarray(meshmod.def_grad(mesh, jnp.asarray(x)))
        np.testing.assert_allclose(F, np.tile(A, (len(T), 1, 1)), atol=1e-12)

    @pytest.mark.parametrize("make", [two_tets, one_tri2d])
    def test_adjoint(self, make):
        """<def_grad(x), Y> == <x, def_grad_adjoint(Y)> (assembly transpose)."""
        V, T = make()
        mesh = _mesh_data(V, T)
        d = V.shape[1]
        rng = np.random.default_rng(1)
        x = rng.standard_normal(V.shape)
        Y = rng.standard_normal((len(T), d, d))
        lhs = np.sum(np.asarray(meshmod.def_grad(mesh, jnp.asarray(x))) * Y)
        rhs = np.sum(x * np.asarray(meshmod.def_grad_adjoint(mesh, jnp.asarray(Y))))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


class TestMass:
    def test_total_mass_tet(self):
        V, T = two_tets()
        mesh = _mesh_data(V, T)
        ones = jnp.ones((len(V), 3))
        Mx = np.asarray(meshmod.mass_matvec(mesh, ones))
        total = Mx[:, 0].sum()
        vols = disc.tet_volumes(V, T)
        np.testing.assert_allclose(total, 1000.0 * vols.sum(), rtol=1e-12)

    def test_total_mass_tri(self):
        V, T = one_tri2d()
        mesh = _mesh_data(V, T)
        ones = jnp.ones((len(V), 2))
        Mx = np.asarray(meshmod.mass_matvec(mesh, ones))
        areas = disc.tri_double_areas(V, T) / 2
        np.testing.assert_allclose(Mx[:, 0].sum(), 1000.0 * areas.sum(), rtol=1e-12)

    def test_mass_spd(self):
        V, T = two_tets()
        mesh = _mesh_data(V, T)
        n = len(V) * 3
        A = np.zeros((n, n))
        for i in range(n):
            e = np.zeros(n)
            e[i] = 1.0
            A[:, i] = np.asarray(
                meshmod.mass_matvec(mesh, jnp.asarray(e.reshape(-1, 3)))
            ).reshape(-1)
        np.testing.assert_allclose(A, A.T, atol=1e-12)
        w = np.linalg.eigvalsh(A)
        assert w.min() > 0


class TestBoundary:
    def test_boundary_facets_tet(self):
        V, T = two_tets()
        F = disc.boundary_facets(T)
        # two tets sharing a face: 8 faces total, 6 boundary
        assert len(F) == 6

    def test_boundary_edges_tri(self):
        V, T = one_tri2d()
        E = disc.boundary_facets(T)
        assert len(E) == 4
