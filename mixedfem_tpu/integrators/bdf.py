"""BDF1-6 implicit time integrators as fixed-size history ring buffers.

Reference: src/time_integrators/BDF.cpp — x_tilde = sum_i a_i x_{n-i}
+ beta*h * sum_i a_i v_{n-i}, with effective dt = beta*h used as "h" in all
h^2 energy scaling. History is initialized with I copies of (x0, v0)
(BDF.h:20-26), so startup is full-order from the first step.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax.numpy as jnp

BDF_ORDERS = {f"BDF{i}": i for i in range(1, 7)}

_ALPHAS: Tuple[Tuple[float, ...], ...] = (
    (1.0,),
    (4.0 / 3.0, -1.0 / 3.0),
    (18.0 / 11.0, -9.0 / 11.0, 2.0 / 11.0),
    (48.0 / 25.0, -36.0 / 25.0, 16.0 / 25.0, -3.0 / 25.0),
    (300.0 / 137.0, -300.0 / 137.0, 200.0 / 137.0, -75.0 / 137.0, 12.0 / 137.0),
    (
        360.0 / 147.0,
        -450.0 / 147.0,
        400.0 / 147.0,
        -225.0 / 147.0,
        72.0 / 147.0,
        -10.0 / 147.0,
    ),
)

_BETAS = (1.0, 2.0 / 3.0, 6.0 / 11.0, 12.0 / 25.0, 60.0 / 137.0, 60.0 / 147.0)


@flax.struct.dataclass
class BDFState:
    x_hist: jnp.ndarray  # (I, nv, d) newest first
    v_hist: jnp.ndarray  # (I, nv, d)
    order: int = flax.struct.field(pytree_node=False)
    h: float = flax.struct.field(pytree_node=False)


def bdf_init(name: str, x0: jnp.ndarray, v0: jnp.ndarray, h: float) -> BDFState:
    order = BDF_ORDERS[name]
    x_hist = jnp.tile(x0[None], (order, 1, 1))
    v_hist = jnp.tile(v0[None], (order, 1, 1))
    return BDFState(x_hist=x_hist, v_hist=v_hist, order=order, h=h)


def bdf_dt(state: BDFState) -> float:
    """Effective dt = beta * h (BDF.cpp:11-14)."""
    return _BETAS[state.order - 1] * state.h


def _weighted(hist: jnp.ndarray, order: int):
    a = jnp.asarray(_ALPHAS[order - 1], dtype=hist.dtype)
    return jnp.einsum("i,ind->nd", a, hist)


def bdf_x_tilde(state: BDFState) -> jnp.ndarray:
    return _weighted(state.x_hist, state.order) + bdf_dt(state) * _weighted(
        state.v_hist, state.order
    )


def bdf_update(state: BDFState, x: jnp.ndarray) -> BDFState:
    """Push the accepted end-of-step positions (BDF.cpp:16-27)."""
    wx = _weighted(state.x_hist, state.order)
    v = (x - wx) / bdf_dt(state)
    x_hist = jnp.roll(state.x_hist, 1, axis=0).at[0].set(x)
    v_hist = jnp.roll(state.v_hist, 1, axis=0).at[0].set(v)
    return state.replace(x_hist=x_hist, v_hist=v_hist)
