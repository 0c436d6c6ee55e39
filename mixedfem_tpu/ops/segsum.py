"""Gather / scatter-add helpers: the TPU replacement for sparse assembly.

The reference assembles global sparse matrices and vectors with a
precomputed CSR scatter (src/utils/sparse_utils.cpp:120-289, Assembler /
VecAssembler). On TPU everything is matrix-free: per-element contributions
are scattered to vertices with segment-sums, which XLA lowers to efficient
sorted scatters. Element->vertex index arrays are static, so these compile
to fixed gather/scatter patterns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_verts(x: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """x: (nv, d) vertex field, T: (E, k) element indices -> (E, k, d)."""
    return x[T]


def scatter_add_verts(contrib: jnp.ndarray, T: jnp.ndarray, nv: int) -> jnp.ndarray:
    """Scatter-add per-element per-corner values to vertices.

    contrib: (E, k, d), T: (E, k) -> (nv, d). Replaces VecAssembler's sorted
    segment-sum (src/utils/sparse_utils.cpp:173-289).
    """
    E, k, d = contrib.shape
    flat_idx = T.reshape(-1)
    flat_val = contrib.reshape(E * k, d)
    return jax.ops.segment_sum(flat_val, flat_idx, num_segments=nv)
