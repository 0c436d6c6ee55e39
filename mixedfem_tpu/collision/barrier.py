"""IPC barrier function and derivatives.

Reference: ipc-toolkit's ipc::barrier family used by
src/variables/mixed_collision.cpp:37-47, 216-235. The standard IPC
log-barrier on the SQUARED distance t with threshold t_hat:

  b(t, t_hat) = -(t - t_hat)^2 * ln(t / t_hat)   for 0 < t < t_hat, else 0

The mixed-collision energy is kappa * b(d^2, dhat^2); its derivatives w.r.t.
the (unsquared) mixed distance d follow the chain rule exactly as the
reference does (mixed_collision.cpp:222-228):
  dpsi/dd   = kappa * 2 d b'(d^2)
  d2psi/dd2 = kappa * (4 d^2 b''(d^2) + 2 b'(d^2)),  clamped >= 1e-8.
"""

from __future__ import annotations

import jax.numpy as jnp


def barrier(t, t_hat):
    """b(t, t_hat); zero for t >= t_hat; +inf-free (caller guards t <= 0)."""
    ok = jnp.logical_and(t > 0, t < t_hat)
    ts = jnp.where(ok, t, t_hat)
    val = -((ts - t_hat) ** 2) * jnp.log(ts / t_hat)
    return jnp.where(ok, val, 0.0)


def barrier_gradient(t, t_hat):
    """db/dt. t is clamped to >= 1e-8 t_hat inside the 1/t terms: below
    that, t*t underflows f32 and the derivative overflows to inf, which
    then poisons masked frames via inf * 0 = NaN. The clamp only acts at
    distances < 1e-4 dhat where the barrier force is enormous either way."""
    ok = jnp.logical_and(t > 0, t < t_hat)
    ts = jnp.where(ok, jnp.maximum(t, 1e-8 * t_hat), t_hat)
    val = -2.0 * (ts - t_hat) * jnp.log(ts / t_hat) - (ts - t_hat) ** 2 / ts
    return jnp.where(ok, val, 0.0)


def barrier_hessian(t, t_hat):
    """d2b/dt2 (same relative clamp as barrier_gradient)."""
    ok = jnp.logical_and(t > 0, t < t_hat)
    ts = jnp.where(ok, jnp.maximum(t, 1e-8 * t_hat), t_hat)
    val = (
        -2.0 * jnp.log(ts / t_hat)
        - 4.0 * (ts - t_hat) / ts
        + (ts - t_hat) ** 2 / (ts * ts)
    )
    return jnp.where(ok, val, 0.0)


def mixed_barrier_grad_hess(d, dhat, kappa):
    """(dpsi/dd, d2psi/dd2) of psi(d) = kappa b(d^2, dhat^2), Hessian clamped
    (mixed_collision.cpp:222-228)."""
    d2 = d * d
    dh2 = dhat * dhat
    g = barrier_gradient(d2, dh2)
    grad = kappa * (2.0 * d * g)
    hess = kappa * (4.0 * d2 * barrier_hessian(d2, dh2) + 2.0 * g)
    return grad, jnp.maximum(hess, 1e-8)
