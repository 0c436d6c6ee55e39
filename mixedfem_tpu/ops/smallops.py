"""Unrolled per-element small-tensor contractions (lane-major form).

The hot coefficient builds contract tiny (6x6 / 6x4x3) tensors per element.
Expressed as jnp.einsum these lower to batched micro-matmuls whose minor
axes occupy 3-6 of the 128 VPU lanes (~5% utilization) — measured ~80-120ms
each at 100k elements on v5lite. Unrolling the small indices into explicit
multiply-add chains over (E,) vectors keeps the element axis on the lanes
and fuses into a single elementwise kernel (the same trick as the batched
Jacobi in ops/rotation.py). The reference's analog is its 4-wide SIMD SVD
batching (src/svd/svd3x3_sse.h); here the "SIMD width" is the whole element
batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _tr_kernel(in_ref, out_ref):
    out_ref[:, :] = in_ref[:, :].T


@functools.partial(jax.jit, static_argnames=("ce",))
def _pallas_interleave(s: jnp.ndarray, ce: int = 512) -> jnp.ndarray:
    """(m, Ep) -> (Ep, m) chunked VMEM transpose (TPU)."""
    from jax.experimental import pallas as pl

    m, Ep = s.shape
    return pl.pallas_call(
        _tr_kernel,
        grid=(Ep // ce,),
        in_specs=[pl.BlockSpec((m, ce), lambda c: (0, c))],
        out_specs=pl.BlockSpec((ce, m), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((Ep, m), s.dtype),
    )(s)


def interleave_cols(cols: list, E: int) -> jnp.ndarray:
    """Stack m scalar columns (E,) into a row-major (E, m) array.

    jnp.stack(cols, axis=1) materializes as an m-way strided column concat
    (4-byte writes on a 288-byte stride — measured 24 ms/step at E=100k,
    m=72 in the profile). On TPU: stack along the LEADING axis instead
    (m contiguous row writes), then transpose in VMEM chunks with a tiny
    Pallas kernel. The branch is selected at LOWERING time with
    lax.platform_dependent (a default_backend() check breaks jit'd CPU
    runs under an active TPU plugin: the Pallas call would trace into a
    CPU executable, which only supports interpret mode)."""
    m = len(cols)
    if (
        jax.default_backend() != "tpu"
        or m > 128
        or cols[0].dtype not in (jnp.float32, jnp.bfloat16)
    ):
        return jnp.stack(cols, axis=1)
    ce = 512
    mp = -(-m // 8) * 8
    Ep = -(-E // ce) * ce
    s = jnp.stack(cols, axis=0)

    def _tpu(s):
        sp = jnp.pad(s, ((0, mp - m), (0, Ep - E)))
        # keep the cheap row-major stack from re-fusing into the transpose
        sp = jax.lax.optimization_barrier(sp)
        return _pallas_interleave(sp, ce=ce)[:E, :m]

    def _plain(s):
        return s.T

    try:
        # selected at LOWERING time: a TPU session compiling a CPU-device
        # executable (the bench's CPU baseline) must not lower the Pallas
        # call into the CPU program
        return jax.lax.platform_dependent(s, tpu=_tpu, default=_plain)
    except ValueError:
        # tracing the pallas_call under shard_map trips the vma check
        # (no `vma` on its ShapeDtypeStruct) — use the plain transpose
        # inside sharded regions (parallel/vp_step.py)
        return _plain(s)


def contract_D_dphi(D: jnp.ndarray, dphi: jnp.ndarray) -> jnp.ndarray:
    """G[e,i,k,r] = sum_c D[e,i,r,c] * dphi[e,k,c].

    D: (E, N, d, d) ds/dF, dphi: (E, k, d) -> (E, N, k, d).
    Equivalent to einsum('eirc,ekc->eikr', D, dphi), unrolled.
    """
    E, N, d, _ = D.shape
    k = dphi.shape[1]
    dcols = [[dphi[:, kk, c] for c in range(d)] for kk in range(k)]
    out = []
    for i in range(N):
        for kk in range(k):
            for r in range(d):
                acc = D[:, i, r, 0] * dcols[kk][0]
                for c in range(1, d):
                    acc = acc + D[:, i, r, c] * dcols[kk][c]
                out.append(acc)
    return interleave_cols(out, E).reshape(E, N, k, d)


def contract_sym_G(Hs: jnp.ndarray, G: jnp.ndarray) -> jnp.ndarray:
    """Y[e,i,k,r] = sum_j Hs[e,i,j] * G[e,j,k,r].

    Hs: (E, N, N), G: (E, N, k, d) -> (E, N, k, d).
    Equivalent to einsum('eij,ejkr->eikr', Hs, G), unrolled.
    """
    E, N, k, d = G.shape
    Gf = G.reshape(E, N, k * d)
    cols = [[Gf[:, j, a] for a in range(k * d)] for j in range(N)]
    h = [[Hs[:, i, j] for j in range(N)] for i in range(N)]
    out = []
    for i in range(N):
        for a in range(k * d):
            acc = h[i][0] * cols[0][a]
            for j in range(1, N):
                acc = acc + h[i][j] * cols[j][a]
            out.append(acc)
    return interleave_cols(out, E).reshape(E, N, k, d)


def sym_reconstruct(V: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """V diag(w) V^T for (E, n, n) eigenvectors and (E, n) eigenvalues,
    unrolled over the symmetric output entries."""
    E, n, _ = V.shape
    vw = [[V[:, i, kk] * w[:, kk] for kk in range(n)] for i in range(n)]
    v = [[V[:, j, kk] for kk in range(n)] for j in range(n)]
    rows = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i, n):
            acc = vw[i][0] * v[j][0]
            for kk in range(1, n):
                acc = acc + vw[i][kk] * v[j][kk]
            rows[i][j] = acc
            rows[j][i] = acc
    return jnp.stack(
        [jnp.stack(rows[i], axis=-1) for i in range(n)], axis=-2
    )


def matvec_sym(H: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y[e,i] = sum_j H[e,i,j] x[e,j] for small n, unrolled.
    Equivalent to einsum('eij,ej->ei', H, x)."""
    E, n, _ = H.shape
    xs = [x[:, j] for j in range(n)]
    out = []
    for i in range(n):
        acc = H[:, i, 0] * xs[0]
        for j in range(1, n):
            acc = acc + H[:, i, j] * xs[j]
        out.append(acc)
    return jnp.stack(out, axis=-1)
