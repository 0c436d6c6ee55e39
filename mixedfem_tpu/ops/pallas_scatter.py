"""Pallas TPU kernel: windowed segment-sum (the FEM assembly scatter).

The element->vertex scatter-add is the single hottest op of the implicit
step (SURVEY §3.2 hot loop #3; ~3 ms per 400k rows via XLA's scatter on the
test slice). TPU has no efficient general scatter, but the FEM assembly
has structure: with contribution rows PRE-SORTED by destination vertex
(a static permutation — mesh topology is fixed), the rows of one chunk
target a tiny contiguous vertex window (~chunk/avg_degree vertices). Each
grid step then reduces its chunk with a small one-hot contraction in VMEM
and accumulates into a dynamic slice of the output:

  out[win_start_c : win_start_c + W] += onehot(lidx)^T @ chunk   (VPU)

The output block lives in VMEM across the sequential grid (constant index
map), so accumulation across overlapping windows is race-free.

Static plan (built once per mesh): sorted permutation, per-chunk window
starts, per-row local indices. Rows are padded to a chunk multiple with an
inert row targeting local index W-1 of the last window with zero value
(handled by padding the VALUE array with zeros).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class ScatterPlan(NamedTuple):
    perm: jnp.ndarray        # (Rp,) int32 source row for each sorted slot
    lidx: jnp.ndarray        # (Rp,) int32 local window index per sorted slot
    win_start: jnp.ndarray   # (nchunks,) int32 window start, in 128-lane units
    nrows: int               # original (unpadded) row count
    chunk: int               # rows per chunk
    W: int                   # window size (max distinct vertices per chunk + pad)
    nv: int


def build_scatter_plan(
    seg_ids: np.ndarray, nv: int, chunk: int = 2048, lane: int = 128
) -> ScatterPlan:
    """seg_ids: (R,) destination vertex per contribution row (static).

    Window starts are LANE-ALIGNED (multiples of 128): the kernel's output
    lives transposed as (d, nv_pad) with vertices on the lane axis — the
    natural (nv, d) layout would pad d=3 up to 128 lanes in VMEM (42x) and
    blow the scoped-vmem budget — and dynamic slicing on the lane axis
    requires aligned starts."""
    seg_ids = np.asarray(seg_ids, np.int64)
    R = len(seg_ids)
    order = np.argsort(seg_ids, kind="stable").astype(np.int32)
    sorted_ids = seg_ids[order]
    Rp = ((R + chunk - 1) // chunk) * chunk
    nchunks = Rp // chunk

    pad = Rp - R
    sorted_ids_p = np.concatenate(
        [sorted_ids, np.full(pad, sorted_ids[-1] if R else 0)]
    )
    # padded slots read the extra zero row appended to the value array
    perm_p = np.concatenate([order, np.full(pad, R, np.int32)])
    win_start = np.empty(nchunks, np.int32)
    W = 0
    for c in range(nchunks):
        lo = c * chunk
        ids = sorted_ids_p[lo : lo + chunk]
        v0 = (int(ids[0]) // lane) * lane   # lane-aligned window start
        win_start[c] = v0
        W = max(W, int(ids[-1] - v0) + 1)
    W = ((W + lane - 1) // lane) * lane
    nv_pad = ((max(nv, W) + lane - 1) // lane) * lane
    # clamp window starts so windows stay in-bounds (stays lane-aligned:
    # both nv_pad and W are lane multiples)
    win_start = np.minimum(win_start, nv_pad - W).astype(np.int32)
    lidx = np.empty(Rp, np.int32)
    for c in range(nchunks):
        lo = c * chunk
        lidx[lo : lo + chunk] = (
            sorted_ids_p[lo : lo + chunk] - win_start[c]
        ).astype(np.int32)
    assert lidx.min() >= 0 and lidx.max() < W
    assert (win_start % lane == 0).all()
    return ScatterPlan(
        perm=jnp.asarray(perm_p),
        lidx=jnp.asarray(lidx),
        win_start=jnp.asarray(win_start // lane),  # in LANE UNITS
        nrows=R,
        chunk=chunk,
        W=W,
        nv=nv,
    )


def _make_kernel(W: int, nv_pad: int, chunk: int, d: int):
    def kernel(ws_ref, vals_ref, lidx_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        # one-hot reduce as an MXU matmul: sums(d, W) = vals^T @ onehot.
        # The elementwise-multiply + cross-sublane jnp.sum form runs ~10x
        # slower on the VPU (reduction over the 2048-sublane axis); the
        # dot contracts over chunk on the systolic array. f32 inputs keep
        # exact 0/1 one-hot weights.
        lidx = lidx_ref[:, 0]  # (chunk,)
        vals = vals_ref[:, :]  # (chunk, d)
        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, W), 1)
        oh = (lidx[:, None] == cols).astype(vals.dtype)  # (chunk, W)
        sums = jax.lax.dot_general(
            vals, oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=vals.dtype,
            # DEFAULT precision lowers f32 MXU matmuls to single-pass bf16,
            # rounding the scattered VALUES to 8 mantissa bits (~4e-3 rel).
            # HIGHEST keeps the f32 algorithm; the one-hot side is exact.
            precision=jax.lax.Precision.HIGHEST,
        )  # (d, W)
        # win_start is stored in LANE UNITS; multiplying by 128 here lets
        # Mosaic statically prove the lane-axis slice is 128-aligned
        v0 = ws_ref[c] * 128
        cur = out_ref[:, pl.ds(v0, W)]
        out_ref[:, pl.ds(v0, W)] = cur + sums

    return kernel


@functools.partial(jax.jit, static_argnames=("plan_static",))
def _scatter_call(vals_sorted, lidx2d, win_start, plan_static):
    chunk, W, nv_pad, d, nchunks = plan_static
    kernel = _make_kernel(W, nv_pad, chunk, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((chunk, d), lambda c, ws: (c, 0)),
            pl.BlockSpec((chunk, 1), lambda c, ws: (c, 0)),
        ],
        out_specs=pl.BlockSpec((d, nv_pad), lambda c, ws: (0, 0)),
    )
    # output transposed (d, nv_pad): vertices on the 128-lane axis — the
    # (nv, d) layout would lane-pad d=3 to 128 in VMEM (42x memory)
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, nv_pad), vals_sorted.dtype),
    )(win_start, vals_sorted, lidx2d)
    return out_t.T


def scatter_add(plan: ScatterPlan, vals: jnp.ndarray) -> jnp.ndarray:
    """Segment-sum vals (R, d) by the planned segments -> (nv, d)."""
    R, d = vals.shape
    assert R == plan.nrows
    Rp = plan.perm.shape[0]
    if Rp > R:
        vals_pad = jnp.concatenate(
            [vals, jnp.zeros((1, d), vals.dtype)], axis=0
        )
        vs = vals_pad[plan.perm]
    else:
        vs = vals[plan.perm]
    return scatter_add_sorted(plan, vs)


def scatter_add_sorted(plan, vals_sorted: jnp.ndarray) -> jnp.ndarray:
    """Windowed segment-sum of ALREADY-SORTED rows (Rp, d) -> (nv, d).

    The fast path for producers that emit contributions directly in
    destination-sorted order (solvers/operator.py planned matvec) — skips
    the permutation gather entirely. `plan` needs lidx/win_start/chunk/W/nv
    (ScatterPlan or the MatvecPlan wrapper)."""
    Rp, d = vals_sorted.shape
    nchunks = Rp // plan.chunk
    nv_pad = ((max(plan.nv, plan.W) + 127) // 128) * 128
    out = _scatter_call(
        vals_sorted,
        plan.lidx[:, None],
        plan.win_start,
        (plan.chunk, plan.W, nv_pad, d, nchunks),
    )
    return out[: plan.nv] if nv_pad > plan.nv else out


def build_banded_scatter_plan(
    seg_ids: np.ndarray, nv: int, chunk: int = 2048, lane: int = 128
) -> ScatterPlan:
    """Windowed plan WITHOUT sorting: rows are consumed in their natural
    (element) order. Requires a banded row order — elements sorted by min
    vertex (see mesh build / parallel/reorder.py) — so that each chunk's
    destinations span a small window (~mesh bandwidth + chunk extent).
    Compared to the sorted plan this removes the runtime permutation
    entirely: the producer's element-order output IS the kernel input."""
    seg_ids = np.asarray(seg_ids, np.int64)
    R = len(seg_ids)
    Rp = ((R + chunk - 1) // chunk) * chunk
    nchunks = Rp // chunk
    pad = Rp - R
    ids_p = np.concatenate([seg_ids, np.full(pad, seg_ids[-1] if R else 0)])

    win_start = np.empty(nchunks, np.int32)
    W = 0
    for c in range(nchunks):
        ids = ids_p[c * chunk : (c + 1) * chunk]
        v0 = (int(ids.min()) // lane) * lane
        win_start[c] = v0
        W = max(W, int(ids.max() - v0) + 1)
    W = ((W + lane - 1) // lane) * lane
    nv_pad = ((max(nv, W) + lane - 1) // lane) * lane
    win_start = np.minimum(win_start, nv_pad - W).astype(np.int32)
    lidx = np.empty(Rp, np.int32)
    for c in range(nchunks):
        lo = c * chunk
        lidx[lo : lo + chunk] = (ids_p[lo : lo + chunk] - win_start[c]).astype(
            np.int32
        )
    assert lidx.min() >= 0 and lidx.max() < W
    assert (win_start % lane == 0).all()
    return ScatterPlan(
        perm=jnp.arange(Rp, dtype=jnp.int32),  # identity (rows unpermuted)
        lidx=jnp.asarray(lidx),
        win_start=jnp.asarray(win_start // lane),  # LANE UNITS
        nrows=R,
        chunk=chunk,
        W=W,
        nv=nv,
    )
