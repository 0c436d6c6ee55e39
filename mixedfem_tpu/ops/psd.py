"""PSD projection of per-element Hessians.

Reference: src/utils/psd_fix.h:9-36 (psd_fix_invert) — eigendecomposition,
clamp eigenvalues to >= tol, reconstruct both the fixed Hessian and its
inverse. Here it is a batched fixed-sweep Jacobi eigendecomposition over the
element axis (branch-free, vmappable over (E, N, N) blocks, N in {3, 6}).
"""

from __future__ import annotations

import jax.numpy as jnp

from mixedfem_tpu.ops.rotation import jacobi_eigh


def psd_fix(H: jnp.ndarray, tol: float = 1e-8, sweeps: int = 8):
    """Project (..., n, n) symmetric blocks to PSD by eigenvalue clamping.

    Returns (H_fixed, H_inv, max_eval):
      H_fixed = V clamp(w, tol) V^T
      H_inv   = V clamp(w, tol)^{-1} V^T
      max_eval = largest clamped eigenvalue (the reference stores this as the
                 per-element "stress", src/variables/mixed_stretch.cpp:200).
    """
    H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    w, V = jacobi_eigh(H, sweeps=sweeps)
    w = jnp.maximum(w, jnp.asarray(tol, H.dtype))
    Hf = jnp.einsum("...ik,...k,...jk->...ij", V, w, V)
    Hi = jnp.einsum("...ik,...k,...jk->...ij", V, 1.0 / w, V)
    return Hf, Hi, jnp.max(w, axis=-1)


def psd_fix_sqrt(H: jnp.ndarray, tol: float = 1e-8, sweeps: int = 8):
    """Like psd_fix but also returns the symmetric square root H^{1/2}
    (used to factor the condensed element stiffness A_e = W^T W with
    W = sqrt(vol) H^{1/2} G — halves the per-CG-iteration operand reads)."""
    H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    w, V = jacobi_eigh(H, sweeps=sweeps)
    w = jnp.maximum(w, jnp.asarray(tol, H.dtype))
    Hf = jnp.einsum("...ik,...k,...jk->...ij", V, w, V)
    Hi = jnp.einsum("...ik,...k,...jk->...ij", V, 1.0 / w, V)
    Hs = jnp.einsum("...ik,...k,...jk->...ij", V, jnp.sqrt(w), V)
    return Hf, Hi, Hs, jnp.max(w, axis=-1)
