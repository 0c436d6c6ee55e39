"""Material model tests: autodiff grad/Hessian vs finite differences, plus
reference-formula spot checks (transcribed by hand from the published energy
forms, matching src/energies/*.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixedfem_tpu.materials import models as mat

MU, LA = 3.0e5, 1.2e6


def _rand_s(n, nsym, seed=0):
    rng = np.random.default_rng(seed)
    s = 0.25 * rng.standard_normal((n, nsym))
    s[:, : (3 if nsym == 6 else 2)] += 1.0  # keep near identity (det > 0)
    return s


@pytest.mark.parametrize("name", mat.MATERIAL_NAMES)
@pytest.mark.parametrize("nsym", [3, 6])
class TestSSpace:
    def test_grad_fd(self, name, nsym):
        s = _rand_s(8, nsym, seed=1)
        mu = np.full(8, MU)
        la = np.full(8, LA)
        mid = np.zeros(8, np.int32)
        g = np.asarray(
            mat.grad_s_all(jnp.asarray(s), jnp.asarray(mu), jnp.asarray(la), mid, (name,))
        )
        h = 1e-6
        for j in range(nsym):
            sp = s.copy()
            sp[:, j] += h
            sm = s.copy()
            sm[:, j] -= h
            ep = np.asarray(
                mat.psi_s_all(jnp.asarray(sp), jnp.asarray(mu), jnp.asarray(la), mid, (name,))
            )
            em = np.asarray(
                mat.psi_s_all(jnp.asarray(sm), jnp.asarray(mu), jnp.asarray(la), mid, (name,))
            )
            fd = (ep - em) / (2 * h)
            np.testing.assert_allclose(
                g[:, j], fd, rtol=2e-4, atol=2e-2 * max(MU, LA) * 1e-6
            )

    def test_hess_symmetric(self, name, nsym):
        s = _rand_s(8, nsym, seed=2)
        mu = np.full(8, MU)
        la = np.full(8, LA)
        mid = np.zeros(8, np.int32)
        H = np.asarray(
            mat.hess_s_all(jnp.asarray(s), jnp.asarray(mu), jnp.asarray(la), mid, (name,))
        )
        np.testing.assert_allclose(H, np.swapaxes(H, -1, -2), atol=1e-8)

    def test_rest_state(self, name, nsym):
        """At S = I: ARAP/Corot/FixedCorot/SNH/NH have zero energy & gradient."""
        if name == "Fung":
            pytest.skip("Fung has nonzero rest energy by construction")
        sI = np.zeros((1, nsym))
        sI[:, : (3 if nsym == 6 else 2)] = 1.0
        mu = np.full(1, MU)
        la = np.full(1, LA)
        mid = np.zeros(1, np.int32)
        e = np.asarray(mat.psi_s_all(jnp.asarray(sI), jnp.asarray(mu), jnp.asarray(la), mid, (name,)))
        g = np.asarray(mat.grad_s_all(jnp.asarray(sI), jnp.asarray(mu), jnp.asarray(la), mid, (name,)))
        np.testing.assert_allclose(e, 0.0, atol=1e-9)
        np.testing.assert_allclose(g, 0.0, atol=1e-7)


class TestSpotChecks:
    """Hand-evaluated reference formulas at a fixed point (3D)."""

    def test_snh_energy_value(self):
        s = np.array([[1.1, 0.9, 1.05, 0.02, -0.03, 0.01]])
        S = np.array(
            [
                [1.1, 0.02, -0.03],
                [0.02, 0.9, 0.01],
                [-0.03, 0.01, 1.05],
            ]
        )
        det = np.linalg.det(S)
        n2 = (S**2).sum()
        expected = MU * (1 - det) + 0.5 * LA * (1 - det) ** 2 + 0.5 * MU * (n2 - 3)
        e = np.asarray(
            mat.psi_s_all(
                jnp.asarray(s),
                jnp.asarray([MU]),
                jnp.asarray([LA]),
                np.zeros(1, np.int32),
                ("Stable-Neohookean",),
            )
        )
        np.testing.assert_allclose(e[0], expected, rtol=1e-12)

    def test_arap_energy_value(self):
        s = np.array([[1.1, 0.9, 1.05, 0.02, -0.03, 0.01]])
        S = np.array(
            [[1.1, 0.02, -0.03], [0.02, 0.9, 0.01], [-0.03, 0.01, 1.05]]
        )
        expected = 0.5 * MU * ((S - np.eye(3)) ** 2).sum()
        e = np.asarray(
            mat.psi_s_all(
                jnp.asarray(s),
                jnp.asarray([MU]),
                jnp.asarray([LA]),
                np.zeros(1, np.int32),
                ("ARAP",),
            )
        )
        np.testing.assert_allclose(e[0], expected, rtol=1e-12)

    def test_heterogeneous_dispatch(self):
        """Two models in one mesh select per element correctly."""
        s = _rand_s(4, 6, seed=3)
        mu = np.full(4, MU)
        la = np.full(4, LA)
        mid = np.array([0, 1, 0, 1], np.int32)
        models = ("ARAP", "Stable-Neohookean")
        e = np.asarray(
            mat.psi_s_all(jnp.asarray(s), jnp.asarray(mu), jnp.asarray(la), mid, models)
        )
        e_arap = np.asarray(
            mat.psi_s_all(jnp.asarray(s), jnp.asarray(mu), jnp.asarray(la), np.zeros(4, np.int32), ("ARAP",))
        )
        e_snh = np.asarray(
            mat.psi_s_all(jnp.asarray(s), jnp.asarray(mu), jnp.asarray(la), np.zeros(4, np.int32), ("Stable-Neohookean",))
        )
        np.testing.assert_allclose(e[0], e_arap[0])
        np.testing.assert_allclose(e[1], e_snh[1])
        np.testing.assert_allclose(e[2], e_arap[2])
        np.testing.assert_allclose(e[3], e_snh[3])

    def test_nh_infeasible_guard(self):
        """Negative-determinant stretches give finite big energy, no NaN grads."""
        s = np.array([[-1.0, 1.0, 1.0, 0.0, 0.0, 0.0]])
        mu = np.asarray([MU])
        la = np.asarray([LA])
        mid = np.zeros(1, np.int32)
        e = np.asarray(mat.psi_s_all(jnp.asarray(s), mu, la, mid, ("Neohookean",)))
        g = np.asarray(mat.grad_s_all(jnp.asarray(s), mu, la, mid, ("Neohookean",)))
        assert np.isfinite(e).all() and e[0] >= 1e11
        assert np.isfinite(g).all()


class TestFSpace:
    @pytest.mark.parametrize("name", mat.MATERIAL_NAMES)
    @pytest.mark.parametrize("dim", [2, 3])
    def test_grad_fd(self, name, dim):
        rng = np.random.default_rng(4)
        F = np.eye(dim) + 0.2 * rng.standard_normal((4, dim, dim))
        mu = np.full(4, MU)
        la = np.full(4, LA)
        mid = np.zeros(4, np.int32)
        g = np.asarray(
            mat.grad_F_all(jnp.asarray(F), jnp.asarray(mu), jnp.asarray(la), mid, (name,))
        )
        h = 1e-6
        for r in range(dim):
            for c in range(dim):
                Fp = F.copy()
                Fp[:, r, c] += h
                Fm = F.copy()
                Fm[:, r, c] -= h
                ep = np.asarray(mat.psi_F_all(jnp.asarray(Fp), jnp.asarray(mu), jnp.asarray(la), mid, (name,)))
                em = np.asarray(mat.psi_F_all(jnp.asarray(Fm), jnp.asarray(mu), jnp.asarray(la), mid, (name,)))
                fd = (ep - em) / (2 * h)
                np.testing.assert_allclose(
                    g[:, r, c], fd, rtol=5e-4, atol=0.5,
                    err_msg=f"{name} dim={dim} r={r} c={c}",
                )
