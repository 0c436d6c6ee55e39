"""PSD projection of per-element Hessians.

Reference: src/utils/psd_fix.h:9-36 (psd_fix_invert) — eigendecomposition,
clamp eigenvalues to >= tol, reconstruct both the fixed Hessian and its
inverse. Here it is a batched fixed-sweep Jacobi eigendecomposition over the
element axis (branch-free, vmappable over (E, N, N) blocks, N in {3, 6}).
"""

from __future__ import annotations

import jax.numpy as jnp

from mixedfem_tpu.ops import smallops
from mixedfem_tpu.ops.rotation import jacobi_eigh


def _default_sweeps(dtype) -> int:
    """5 sweeps reach ~1e-6 relative on 6x6 blocks — enough for f32; f64
    oracle parity needs 8 (quadratic Jacobi convergence)."""
    return 8 if dtype == jnp.float64 else 5


def psd_fix(H: jnp.ndarray, tol: float = 1e-8, sweeps: int | None = None):
    """Project (..., n, n) symmetric blocks to PSD by eigenvalue clamping.

    Returns (H_fixed, H_inv, max_eval):
      H_fixed = V clamp(w, tol) V^T
      H_inv   = V clamp(w, tol)^{-1} V^T
      max_eval = largest clamped eigenvalue (the reference stores this as the
                 per-element "stress", src/variables/mixed_stretch.cpp:200).
    """
    H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    w, V = jacobi_eigh(H, sweeps=sweeps or _default_sweeps(H.dtype))
    w = jnp.maximum(w, jnp.asarray(tol, H.dtype))
    n = H.shape[-1]
    Vf = V.reshape(-1, n, n)
    wf = w.reshape(-1, n)
    Hf = smallops.sym_reconstruct(Vf, wf).reshape(H.shape)
    Hi = smallops.sym_reconstruct(Vf, 1.0 / wf).reshape(H.shape)
    return Hf, Hi, jnp.max(w, axis=-1)


def psd_fix_sqrt(H: jnp.ndarray, tol: float = 1e-8, sweeps: int | None = None):
    """Like psd_fix but also returns the symmetric square root H^{1/2}
    (used to factor the condensed element stiffness A_e = W^T W with
    W = sqrt(vol) H^{1/2} G — halves the per-CG-iteration operand reads)."""
    H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    w, V = jacobi_eigh(H, sweeps=sweeps or _default_sweeps(H.dtype))
    w = jnp.maximum(w, jnp.asarray(tol, H.dtype))
    batch = H.shape[:-2]
    n = H.shape[-1]
    Vf = V.reshape(-1, n, n)
    wf = w.reshape(-1, n)
    Hf = smallops.sym_reconstruct(Vf, wf).reshape(H.shape)
    Hi = smallops.sym_reconstruct(Vf, 1.0 / wf).reshape(H.shape)
    Hs = smallops.sym_reconstruct(Vf, jnp.sqrt(wf)).reshape(H.shape)
    return Hf, Hi, Hs, jnp.max(w, axis=-1)
