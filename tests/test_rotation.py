"""Math-core tests: SVD/polar decomposition and rotation derivatives.

Mirrors the reference's finite-difference derivative test style
(reference: tests/test_dsvd.cpp — dR/dF vs FD of R(F) = U V^T)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixedfem_tpu.ops import rotation, sym, psd

# Jitted wrappers — eager per-op dispatch makes the fixed-sweep Jacobi loops
# slow in tests.
_jacobi = jax.jit(rotation.jacobi_eigh, static_argnames="sweeps")
_svd33 = jax.jit(rotation.svd33, static_argnames="sweeps")
_polar33 = jax.jit(rotation.polar33, static_argnames="sweeps")
_polar22 = jax.jit(rotation.polar22)
_svd22 = jax.jit(rotation.svd22)
_psd_fix = jax.jit(psd.psd_fix, static_argnames=("tol", "sweeps"))


def _rand_F(n, dim, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.eye(dim) + scale * rng.standard_normal((n, dim, dim)) * 0.5
    )


class TestJacobiEigh:
    @pytest.mark.parametrize("n", [3, 6])
    def test_matches_numpy(self, n):
        rng = np.random.default_rng(1)
        A = rng.standard_normal((32, n, n))
        A = A + np.swapaxes(A, -1, -2)
        w, V = _jacobi(jnp.asarray(A), sweeps=10)
        w, V = np.asarray(w), np.asarray(V)
        # Reconstruction
        rec = np.einsum("bik,bk,bjk->bij", V, w, V)
        np.testing.assert_allclose(rec, A, atol=1e-10)
        # Eigenvalues match numpy (sorted)
        w_np = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.sort(w, axis=-1), w_np, atol=1e-10)


class TestSVD33:
    def test_reconstruction_and_orthogonality(self):
        F = _rand_F(64, 3, seed=2)
        U, s, V = _svd33(F, sweeps=8)
        U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
        F = np.asarray(F)
        rec = np.einsum("bik,bk,bjk->bij", U, s, V)
        np.testing.assert_allclose(rec, F, atol=1e-9)
        eye = np.eye(3)
        np.testing.assert_allclose(
            np.einsum("bki,bkj->bij", U, U), np.tile(eye, (64, 1, 1)), atol=1e-12
        )
        np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=1e-12)
        # sign convention
        np.testing.assert_allclose(
            np.sign(s[:, 2]), np.sign(np.linalg.det(F)), atol=0
        )
        assert np.all(s[:, 0] >= s[:, 1]) and np.all(s[:, 1] >= np.abs(s[:, 2]) - 1e-12)

    def test_inverted_elements(self):
        F = np.asarray(_rand_F(16, 3, seed=3)).copy()
        F[:8, :, 0] *= -1.0  # reflections
        U, s, V = _svd33(jnp.asarray(F), sweeps=8)
        rec = np.einsum("bik,bk,bjk->bij", np.asarray(U), np.asarray(s), np.asarray(V))
        np.testing.assert_allclose(rec, F, atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(np.asarray(U)), 1.0, atol=1e-11)

    def test_degenerate(self):
        # Rank-deficient and near-identity cases
        F = np.tile(np.eye(3), (4, 1, 1))
        F[1, 2, 2] = 0.0       # rank 2
        F[2] = 0.0             # zero
        F[3] *= 1e-8           # tiny
        U, s, V = _svd33(jnp.asarray(F), sweeps=8)
        rec = np.einsum("bik,bk,bjk->bij", np.asarray(U), np.asarray(s), np.asarray(V))
        np.testing.assert_allclose(rec, F, atol=1e-8)


class TestPolar:
    def test_polar33_vs_scipy(self):
        from scipy.linalg import polar as scipy_polar

        F = np.asarray(_rand_F(16, 3, seed=4))
        R, S = _polar33(jnp.asarray(F), sweeps=8)
        R, S = np.asarray(R), np.asarray(S)
        for i in range(16):
            Rs, Ss = scipy_polar(F[i])
            if np.linalg.det(Rs) > 0:  # only compare non-inverted
                np.testing.assert_allclose(R[i], Rs, atol=1e-8)
                np.testing.assert_allclose(S[i], Ss, atol=1e-8)
        # R S = F always
        np.testing.assert_allclose(np.einsum("bij,bjk->bik", R, S), F, atol=1e-9)

    def test_polar22(self):
        rng = np.random.default_rng(5)
        F = np.eye(2) + 0.5 * rng.standard_normal((32, 2, 2))
        R, S = _polar22(jnp.asarray(F))
        R, S = np.asarray(R), np.asarray(S)
        np.testing.assert_allclose(np.einsum("bij,bjk->bik", R, S), F, atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
        np.testing.assert_allclose(S, np.swapaxes(S, -1, -2), atol=1e-12)

    def test_svd22(self):
        rng = np.random.default_rng(6)
        F = rng.standard_normal((32, 2, 2))
        U, s, V = _svd22(jnp.asarray(F))
        U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
        rec = np.einsum("bik,bk,bjk->bij", U, s, V)
        np.testing.assert_allclose(rec, F, atol=1e-12)
        np.testing.assert_allclose(np.sign(s[:, 1]), np.sign(np.linalg.det(F)))


class TestDsDF:
    """FD checks of ds/dF (the reference's hardest kernel, tests/test_dsvd.cpp)."""

    @pytest.mark.parametrize("dim", [2, 3])
    def test_dsdF_finite_difference(self, dim):
        n = 8
        F = np.asarray(_rand_F(n, dim, seed=7))  # (n, d, d)

        @jax.jit
        def s_of_F(Fm):
            R2, S2 = rotation.polar(Fm, dim, sweeps=10)
            return sym.pack(S2)

        R, S = rotation.polar(jnp.asarray(F), dim, sweeps=8)
        D = np.asarray(rotation.dsdF(R, S, dim))  # (n, N, d, d)

        # Vectorized central differences: one batch with all perturbations.
        h = 1e-6
        eye = np.eye(dim * dim).reshape(dim * dim, dim, dim)
        Fp = F[None, :] + h * eye[:, None]  # (d*d, n, d, d)
        Fm = F[None, :] - h * eye[:, None]
        sp = np.asarray(s_of_F(jnp.asarray(Fp.reshape(-1, dim, dim))))
        sm = np.asarray(s_of_F(jnp.asarray(Fm.reshape(-1, dim, dim))))
        nsym = sp.shape[-1]
        fd = (sp - sm).reshape(dim * dim, n, nsym) / (2 * h)
        # fd[rc, b, i] vs D[b, i, r, c]
        fd = fd.reshape(dim, dim, n, nsym).transpose(2, 3, 0, 1)
        np.testing.assert_allclose(D, fd, atol=5e-6)

    def test_dsdF_vs_autodiff(self):
        """Cross-check against jax.jacfwd through the polar decomposition."""
        F = _rand_F(4, 3, seed=8)

        def s_of_F(Fm):
            R2, S2 = rotation.polar33(Fm, sweeps=10)
            return sym.pack(S2)

        J = jax.jit(jax.vmap(jax.jacfwd(s_of_F)))(F)  # (n, 6, 3, 3)
        R, S = rotation.polar33(F, sweeps=10)
        D = rotation.dsdF33(R, S)
        np.testing.assert_allclose(np.asarray(J), np.asarray(D), atol=1e-7)


class TestPSD:
    def test_psd_fix(self):
        rng = np.random.default_rng(9)
        H = rng.standard_normal((16, 6, 6))
        H = H + np.swapaxes(H, -1, -2)  # indefinite
        Hf, Hi, me = _psd_fix(jnp.asarray(H), tol=1e-8, sweeps=10)
        Hf, Hi = np.asarray(Hf), np.asarray(Hi)
        w = np.linalg.eigvalsh(Hf)
        assert np.all(w >= 1e-9)
        np.testing.assert_allclose(
            np.einsum("bij,bjk->bik", Hf, Hi),
            np.tile(np.eye(6), (16, 1, 1)),
            atol=1e-6,
        )
        # PSD input passes through unchanged
        Hp = np.einsum("bij,bkj->bik", H, H) + 1e-3 * np.eye(6)
        Hf2, _, _ = _psd_fix(jnp.asarray(Hp), sweeps=10)
        np.testing.assert_allclose(np.asarray(Hf2), Hp, atol=1e-8)


class TestPallasScatter:
    def test_windowed_scatter_matches_segment_sum(self):
        """Pallas windowed segment-sum (interpret mode on CPU) == XLA."""
        from jax.experimental.pallas import tpu as pltpu

        from mixedfem_tpu.ops import pallas_scatter as psc

        rng = np.random.default_rng(3)
        nv, R, d = 500, 6000, 3
        seg = rng.integers(0, nv, R)
        vals = rng.standard_normal((R, d)).astype(np.float32)
        plan = psc.build_scatter_plan(seg, nv, chunk=512)
        with pltpu.force_tpu_interpret_mode():
            out = psc.scatter_add(plan, jnp.asarray(vals))
        ref = np.zeros((nv, d), np.float32)
        np.add.at(ref, seg, vals)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


class TestPlannedMatvec:
    def test_planned_matvec_matches_element_matvec(self):
        """Destination-sorted Pallas matvec == fused XLA-scatter matvec."""
        from jax.experimental.pallas import tpu as pltpu

        from mixedfem_tpu.solvers import operator as opmod
        from mixedfem_tpu.variables import mixed_stretch as ms

        from tests.test_newton import small_beam

        mesh, V = small_beam(4, 3, 3)
        x = jnp.asarray(V) * 1.02
        s, _ = ms.reset(mesh, jnp.asarray(V))
        coeffs = ms.update(mesh, x, s, 0.02)
        plan = opmod.build_matvec_plan(mesh, chunk=512)

        rng = np.random.default_rng(5)
        p = jnp.asarray(rng.standard_normal((mesh.nv, 3)))
        ref = opmod.element_matvec(mesh, p, ms_coeffs=coeffs)
        Gwp = opmod.permute_gw(plan, coeffs.Gw)
        with pltpu.force_tpu_interpret_mode():
            out = opmod.planned_matvec(mesh, plan, Gwp, coeffs.Gw, p)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-10
        )

    def test_banded_step_matches_default(self):
        """Full newton_step with the banded Pallas assembly plan (matvec +
        rhs + inertia + block-Jacobi blocks) == the XLA-scatter step."""
        from jax.experimental.pallas import tpu as pltpu

        from mixedfem_tpu.config import SimConfig
        from mixedfem_tpu.optimizer import newton
        from mixedfem_tpu.solvers import operator as opmod

        from tests.test_newton import small_beam, make_state

        mesh, V = small_beam(4, 2, 2)
        perm = opmod.sort_elements_banded(np.asarray(mesh.T))
        mesh = mesh.replace(
            T=mesh.T[perm], dphidX=mesh.dphidX[perm], vols=mesh.vols[perm],
            mass_coeff=mesh.mass_coeff[perm], mu=mesh.mu[perm],
            lam=mesh.lam[perm], model_id=mesh.model_id[perm],
        )
        config = SimConfig(
            h=0.02, outer_steps=3, itr_tol=1e-11,
            max_iterative_solver_iters=5000,
            mixed_variables=("mixed-stretch",), dtype="float64",
        )
        state = make_state(mesh, config)
        ref = newton.newton_step(mesh, config, (), state)
        plan = opmod.build_banded_plan(mesh, chunk=256)
        with pltpu.force_tpu_interpret_mode():
            out = newton.newton_step(mesh, config, (), state, None, (), plan)
        np.testing.assert_allclose(
            np.asarray(out.x), np.asarray(ref.x), atol=1e-10
        )
