"""Symmetric-matrix vector conventions for the mixed stretch variable.

The mixed DOF s is the symmetric factor S of the polar decomposition
F = R.S stored as a vector:

  3D (N=6): s = [S00, S11, S22, S01, S02, S12]
  2D (N=3): s = [S00, S11, S01]

with off-diagonals averaged on packing (S01 := 0.5*(S01+S10)).

`Sym`/`Syminv` are the diagonal doubling weights used throughout the mixed
formulation (reference: src/variables/mixed_stretch.h:120-138): Sym doubles
the off-diagonal entries so that  u^T Sym v == <U, V>_F for symmetric U,V.
"""

from __future__ import annotations

import jax.numpy as jnp


def nsym(dim: int) -> int:
    return 6 if dim == 3 else 3


def sym_weights(dim: int, dtype=jnp.float64):
    """Diagonal of the Sym matrix ([1,1,1,2,2,2] in 3D, [1,1,2] in 2D)."""
    if dim == 3:
        return jnp.array([1.0, 1.0, 1.0, 2.0, 2.0, 2.0], dtype=dtype)
    return jnp.array([1.0, 1.0, 2.0], dtype=dtype)


def syminv_weights(dim: int, dtype=jnp.float64):
    if dim == 3:
        return jnp.array([1.0, 1.0, 1.0, 0.5, 0.5, 0.5], dtype=dtype)
    return jnp.array([1.0, 1.0, 0.5], dtype=dtype)


def ivec(dim: int, dtype=jnp.float64):
    """Identity matrix in sym-vec form (rest stretch)."""
    if dim == 3:
        return jnp.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0], dtype=dtype)
    return jnp.array([1.0, 1.0, 0.0], dtype=dtype)


def pack(S: jnp.ndarray) -> jnp.ndarray:
    """(..., d, d) symmetric (or near-symmetric) matrix -> (..., N) sym-vec.

    Off-diagonals are symmetrized by averaging, matching the reference's
    packing (src/variables/mixed_stretch.cpp:37-40, 76).
    """
    d = S.shape[-1]
    if d == 3:
        return jnp.stack(
            [
                S[..., 0, 0],
                S[..., 1, 1],
                S[..., 2, 2],
                0.5 * (S[..., 0, 1] + S[..., 1, 0]),
                0.5 * (S[..., 0, 2] + S[..., 2, 0]),
                0.5 * (S[..., 1, 2] + S[..., 2, 1]),
            ],
            axis=-1,
        )
    return jnp.stack(
        [
            S[..., 0, 0],
            S[..., 1, 1],
            0.5 * (S[..., 0, 1] + S[..., 1, 0]),
        ],
        axis=-1,
    )


def unpack(s: jnp.ndarray) -> jnp.ndarray:
    """(..., N) sym-vec -> (..., d, d) symmetric matrix."""
    n = s.shape[-1]
    if n == 6:
        row0 = jnp.stack([s[..., 0], s[..., 3], s[..., 4]], axis=-1)
        row1 = jnp.stack([s[..., 3], s[..., 1], s[..., 5]], axis=-1)
        row2 = jnp.stack([s[..., 4], s[..., 5], s[..., 2]], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2)
    row0 = jnp.stack([s[..., 0], s[..., 2]], axis=-1)
    row1 = jnp.stack([s[..., 2], s[..., 1]], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
