"""Newton-Schulz coarse inverse (solvers/coarse.py coarse_inverse_ns).

The matmul-only replacement for jnp.linalg.inv in the two-level
preconditioner (VERDICT r2 item 6): cold start, warm start from a nearby
inverse, the zero-cache safeguard, and ill-conditioned behavior.
"""

import numpy as np
import jax.numpy as jnp

from mixedfem_tpu.solvers import coarse


def _spd(n, rng, cond=None):
    if cond is None:
        B = rng.standard_normal((n, n))
        return B @ B.T + 0.1 * np.eye(n)
    D = np.diag(np.logspace(0, np.log10(cond), n))
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return Q @ D @ Q.T


class TestNewtonSchulz:
    def test_cold_start_matches_inverse(self):
        rng = np.random.default_rng(0)
        A = _spd(96, rng)
        X = np.asarray(coarse.coarse_inverse_ns(jnp.asarray(A)))
        assert np.abs(X @ A - np.eye(96)).max() < 1e-8

    def test_warm_start_converges_fast(self):
        rng = np.random.default_rng(1)
        A = _spd(96, rng)
        X0 = coarse.coarse_inverse_ns(jnp.asarray(A))
        A2 = A * 1.03 + 0.01 * np.eye(96)  # mild drift between refreshes
        X = np.asarray(
            coarse.coarse_inverse_ns(jnp.asarray(A2), X0=X0, warm_iters=6)
        )
        assert np.abs(X @ A2 - np.eye(96)).max() < 1e-8

    def test_zero_cache_safeguard_falls_back_cold(self):
        """The zeros-initialized precond cache must not poison the warm
        start (sigma(E)=1 -> cold branch)."""
        rng = np.random.default_rng(2)
        A = _spd(64, rng)
        X = np.asarray(
            coarse.coarse_inverse_ns(
                jnp.asarray(A), X0=jnp.zeros((64, 64))
            )
        )
        assert np.abs(X @ A - np.eye(64)).max() < 1e-8

    def test_stale_warm_start_rejected(self):
        """A warm start from an unrelated matrix is rejected by the
        spectral safeguard instead of diverging."""
        rng = np.random.default_rng(3)
        A = _spd(64, rng)
        bogus = jnp.asarray(_spd(64, rng) * 50.0)
        X = np.asarray(coarse.coarse_inverse_ns(jnp.asarray(A), X0=bogus))
        assert np.isfinite(X).all()
        assert np.abs(X @ A - np.eye(64)).max() < 1e-6

    def test_ill_conditioned_preconditioner_quality(self):
        rng = np.random.default_rng(4)
        A = _spd(96, rng, cond=1e7)
        X = np.asarray(
            coarse.coarse_inverse_ns(jnp.asarray(A), cold_iters=50)
        )
        # preconditioner-grade accuracy on a cond=1e7 matrix
        assert np.abs(X @ A - np.eye(96)).max() < 1e-4
