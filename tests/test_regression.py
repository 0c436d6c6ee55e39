"""Golden-trajectory regression: catches silent behavior changes.

The reference's convergence harnesses serve as its end-to-end golden tests
(SURVEY §3.4); here a fixed 5-step f64 run of the standard cantilever beam
pins down the exact (within 1e-9 relative) trajectory of the current
implementation. If an intentional algorithm change shifts these values,
re-derive the constants and note it in the commit."""

import numpy as np
import jax.numpy as jnp

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.optimizer import newton

from tests.test_newton import make_state, small_beam

GOLDEN_E = [
    2.752071156272e-05,
    8.486527670604e-05,
    2.192290281843e-04,
    4.478062093004e-04,
    7.805897143729e-04,
]
GOLDEN_XSUM = [
    6.746439863715e01,
    6.739549995563e01,
    6.729585763331e01,
    6.716776549449e01,
    6.701302877851e01,
]


def test_cantilever_golden_trajectory():
    mesh, V = small_beam(4, 2, 2)
    config = SimConfig(h=0.01, outer_steps=6, itr_tol=1e-10, dtype="float64")
    state = make_state(mesh, config)
    for i in range(5):
        state = newton.newton_step(mesh, config, (), state)
        it = int(state.stats.iterations)
        E = float(np.asarray(state.stats.energy)[it - 1])
        xsum = float(np.asarray(state.x).sum())
        np.testing.assert_allclose(E, GOLDEN_E[i], rtol=1e-6, err_msg=f"step {i}")
        np.testing.assert_allclose(
            xsum, GOLDEN_XSUM[i], rtol=1e-9, err_msg=f"step {i}"
        )
