"""Fused condensed-system CG matvec as ONE Pallas TPU kernel ("brick" path).

The round-2 production matvec (solvers/operator.py banded_matvec) split the
work across XLA ops + a windowed scatter kernel and was bound by the
permutation row rate (~4 ms @ 100k tets, docs/GAPS.md). This kernel fuses
the ENTIRE matvec — vertex gather, per-element 12x12 block product, and
vertex scatter-add — into a single Pallas program so the vertex vector
never round-trips HBM and both the gather and the scatter run as windowed
one-hot MXU contractions:

  layout   vertex vectors live as "bricks" (d*Hpad, 128): component-major,
           vertex v at (sublane v//128, lane v%128). All CG vector algebra
           (axpy/dot/block-Jacobi) is dense elementwise in this layout.
  window   elements are sorted by min vertex (banded order, a free static
           reorder), so a chunk of CE elements touches a vertex window of
           ~bandwidth+chunk-span vertices = Wh<=16 sublanes at 100k tets.
  gather   pe[c] = onehot(hi_c) @ P_window  (MXU), then a lane one-hot
           multiply+reduce selects lane lo_c — no XLA gather anywhere.
  apply    y_e = A_e @ pe with the per-element condensed 12x12 block
           A_e = mass x I + sum_i Gw_i Gw_i^T streamed from HBM once per
           matvec (the only O(E) HBM traffic, ~58 MB @ 100k tets).
  scatter  out_window += onehot(hi_c)^T @ (onehot(lo_c) * val_c)  (MXU).

Replaces the reference's assembled-CSR SpMV (src/utils/sparse_utils.cpp:
120-171 + Eigen CG) — same math as SystemMatrixPD (linear_system.h:17-31),
reshaped for the MXU.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


@flax.struct.dataclass
class BrickPlan:
    """Static per-mesh-topology plan for the fused windowed kernels."""

    hilo: jnp.ndarray       # (Ep, 2k) int32: cols [0:k] window sublane
    #                         (hi), cols [k:2k] lane (lo) per corner
    hilo_cm: jnp.ndarray    # (k*Ep, 2) int32 corner-major per chunk:
    #                         rows [c*k*ce + corner*ce + e], cols (hi, lo)
    h0: jnp.ndarray         # (nchunks,) int32 window start sublane (8-mult)
    nv: int = flax.struct.field(pytree_node=False)
    E: int = flax.struct.field(pytree_node=False)   # real element count
    Ep: int = flax.struct.field(pytree_node=False)  # padded element count
    k: int = flax.struct.field(pytree_node=False)
    ce: int = flax.struct.field(pytree_node=False)  # elements per chunk
    Wh: int = flax.struct.field(pytree_node=False)  # window sublanes (8-mult)
    Hpad: int = flax.struct.field(pytree_node=False)  # brick sublanes/comp


def build_brick_plan(T, nv: int, ce: int = 512) -> BrickPlan | None:
    """Host-side plan. Requires banded element order (sorted by min vertex,
    solvers/operator.py sort_elements_banded). Returns None when the mesh's
    bandwidth exceeds the window capacity (fall back to banded_matvec)."""
    T = np.asarray(T)
    E, k = T.shape
    Ep = ((E + ce - 1) // ce) * ce
    Tp = np.concatenate([T, np.tile(T[-1:], (Ep - E, 1))], axis=0)
    Hpad = max((nv + LANE - 1) // LANE, 8)
    Hpad = ((Hpad + 7) // 8) * 8
    nchunks = Ep // ce
    h0 = np.empty(nchunks, np.int32)
    Wh = 0
    for c in range(nchunks):
        blk = Tp[c * ce : (c + 1) * ce]
        start = 8 * ((int(blk.min()) // LANE) // 8)
        h0[c] = start
        Wh = max(Wh, int(blk.max()) // LANE - start + 1)
    Wh = ((Wh + 7) // 8) * 8
    if Wh > 128:
        return None  # bandwidth too large for the windowed kernel
    # keep windows in-bounds
    Hpad = max(Hpad, Wh)
    h0 = np.minimum(h0, Hpad - Wh)
    hi = Tp // LANE - h0[:, None].repeat(ce, 1).reshape(-1, 1)
    lo = Tp % LANE
    assert hi.min() >= 0 and hi.max() < Wh
    # corner-major stacking per chunk (kernel v2 reads (hi, lo) columns
    # directly instead of concatenating (ce, 1) slices in-kernel, which
    # Mosaic cannot lower)
    hi_cm = (
        hi.reshape(-1, ce, k).transpose(0, 2, 1).reshape(-1, 1)
    )
    lo_cm = (
        lo.reshape(-1, ce, k).transpose(0, 2, 1).reshape(-1, 1)
    )
    return BrickPlan(
        hilo=jnp.asarray(
            np.concatenate([hi, lo], axis=1).astype(np.int32)
        ),
        hilo_cm=jnp.asarray(
            np.concatenate([hi_cm, lo_cm], axis=1).astype(np.int32)
        ),
        h0=jnp.asarray(h0),
        nv=nv, E=E, Ep=Ep, k=k, ce=ce, Wh=Wh, Hpad=Hpad,
    )


# ---------------------------------------------------------------------------
# layout conversion (XLA)
# ---------------------------------------------------------------------------

def to_brick(x: jnp.ndarray, Hpad: int) -> jnp.ndarray:
    """(nv, d) -> (d*Hpad, 128)."""
    nv, d = x.shape
    pad = Hpad * LANE - nv
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    return (
        xp.reshape(Hpad, LANE, d).transpose(2, 0, 1).reshape(d * Hpad, LANE)
    )


def from_brick(b: jnp.ndarray, nv: int, d: int) -> jnp.ndarray:
    """(d*Hpad, 128) -> (nv, d)."""
    Hpad = b.shape[0] // d
    return (
        b.reshape(d, Hpad, LANE).transpose(1, 2, 0).reshape(Hpad * LANE, d)
    )[:nv]


def element_rows(mesh, ms_coeffs) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Kernel-ready per-element coefficient rows: (Gw_rows (E, N*k*d),
    mass_rows (E, k*k)). Pure reshapes of the factored A_e = mass (x) I +
    Gw^T Gw data — NO precompute flops (an explicit (E,144) block einsum
    measured 579 ms @ 100k on the dev slice; this is free)."""
    E, k = mesh.T.shape
    Gw = ms_coeffs.Gw  # (E, N, k, d)
    return Gw.reshape(E, -1), mesh.mass_coeff.reshape(E, k * k)


def pad_rows(plan: BrickPlan, rows: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad per-element coefficient rows to the plan's Ep."""
    if plan.Ep > rows.shape[0]:
        rows = jnp.concatenate(
            [
                rows,
                jnp.zeros(
                    (plan.Ep - rows.shape[0], rows.shape[1]), rows.dtype
                ),
            ],
            axis=0,
        )
    return rows


# ---------------------------------------------------------------------------
# the fused matvec kernel
# ---------------------------------------------------------------------------

# PRECISION of the one-hot MXU contractions: DEFAULT lowers f32 matmuls to
# single-pass bf16, rounding the gathered/scattered VALUES to 8 mantissa
# bits (measured 3.3e-3 relative matvec error @ 100k tets) — unusable.
# HIGHEST (multi-pass f32) is exact but ~1.8x slower. The production
# scheme is a bf16 hi/lo SPLIT: v = bf16(v) + bf16(v - bf16(v)); both
# parts are exactly representable under the MXU's bf16 input rounding and
# the one-hot side is exact 0/1, so two DEFAULT-precision matmuls
# reconstruct the f32 product to ~2^-17 relative (measured ~1e-6 matvec
# error) at a fraction of HIGHEST's cost.


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _matvec_kernel(plan_static, h0_ref, hilo_ref, gw_ref, m_ref, p_ref,
                   out_ref):
    ce, k, d, N, Wh, Hpad, scheme = plan_static
    kd = k * d
    split = scheme == "split"
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    h0 = h0_ref[c]
    lanesW = jax.lax.broadcasted_iota(jnp.int32, (ce, Wh), 1)
    lanesL = jax.lax.broadcasted_iota(jnp.int32, (ce, LANE), 1)

    # per-component window splits (shared across corners), stacked along
    # the contraction dim: K = 2 Wh <= 128 keeps ONE MXU pass for BOTH
    # split halves ("bf16" scheme: single pass, K = Wh, values rounded)
    Pws = []
    for dc in range(d):
        Pw = p_ref[pl.ds(dc * Hpad + h0, Wh), :]           # (Wh, 128)
        if split:
            Pw_hi, Pw_lo = _bf16_split(Pw)
            Pw = jnp.concatenate([Pw_hi, Pw_lo], axis=0)   # (2 Wh, 128)
        Pws.append(Pw)

    # gather: pe (ce, k*d) with column corner*d+dc. The window-row copy is
    # a split one-hot matmul; the lane selection is an EXACT dynamic
    # gather (take_along_axis lowers to the TPU lane-gather).
    pe_cols = []
    ohh_list = []
    ohl_list = []
    for corner in range(k):
        hi = hilo_ref[:, corner : corner + 1]
        lo = hilo_ref[:, k + corner : k + corner + 1]
        ohh = (hi == lanesW).astype(gw_ref.dtype)          # (ce, Wh)
        ohl = (lo == lanesL).astype(gw_ref.dtype)          # (ce, 128)
        ohh_list.append(ohh)
        ohl_list.append(ohl)
        ohh2 = (
            jnp.concatenate([ohh, ohh], axis=1) if split else ohh
        )                                                  # (ce, (2) Wh)
        lob = jnp.broadcast_to(lo, (ce, LANE))
        for dc in range(d):
            tmp = jnp.dot(
                ohh2, Pws[dc], preferred_element_type=jnp.float32
            )
            sel = jnp.take_along_axis(tmp, lob, axis=1)
            pe_cols.append(sel[:, 0:1])
    pe = jnp.concatenate(pe_cols, axis=1)                  # (ce, kd)

    # factored stretch block: q = Gw pe (N), val = Gw^T q  (A_e = Gw^T Gw)
    qs = [
        jnp.sum(
            gw_ref[:, i * kd : (i + 1) * kd] * pe, axis=1, keepdims=True
        )
        for i in range(N)
    ]  # N x (ce, 1)
    # per-corner emission: stretch + consistent-mass parts (no in-place
    # updates — Pallas TPU has no scatter; build columns and concat)
    val_cols = []
    for corner in range(k):
        acc = None
        for i in range(N):
            Gic = gw_ref[:, i * kd + corner * d : i * kd + (corner + 1) * d]
            t = Gic * qs[i]
            acc = t if acc is None else acc + t
        for l in range(k):
            t = m_ref[:, corner * k + l : corner * k + l + 1] * pe[
                :, l * d : (l + 1) * d
            ]
            acc = acc + t
        val_cols.append(acc)                               # (ce, d)
    val = jnp.concatenate(val_cols, axis=1)                # (ce, kd)

    # scatter: out_window[dc] += sum_c onehot(hi_c)^T @ (onehot(lo_c)*val)
    # (bf16 hi/lo split of the values; the one-hot factors are exact.
    # "bf16" scheme: single pass on the rounded values)
    parts = _bf16_split(val) if split else (val,)
    for dc in range(d):
        contrib = None
        for corner in range(k):
            col = corner * d + dc
            for part_val in parts:
                S = ohl_list[corner] * part_val[:, col : col + 1]
                part = jax.lax.dot_general(
                    ohh_list[corner], S,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (Wh, 128)
                contrib = part if contrib is None else contrib + part
        idx = dc * Hpad + h0
        out_ref[pl.ds(idx, Wh), :] = out_ref[pl.ds(idx, Wh), :] + contrib


@functools.partial(jax.jit, static_argnames=("plan_static", "interpret"))
def _matvec_call(hilo, h0, Gw_rows, m_rows, p_brick, plan_static,
                 interpret=False):
    ce, k, d, N, Wh, Hpad, _scheme = plan_static
    nchunks = hilo.shape[0] // ce
    kernel = functools.partial(_matvec_kernel, plan_static)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((ce, 2 * k), lambda c, h0s: (c, 0)),
            pl.BlockSpec((ce, N * k * d), lambda c, h0s: (c, 0)),
            pl.BlockSpec((ce, k * k), lambda c, h0s: (c, 0)),
            pl.BlockSpec((d * Hpad, LANE), lambda c, h0s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((d * Hpad, LANE), lambda c, h0s: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d * Hpad, LANE), p_brick.dtype),
        interpret=interpret,
    )(h0, hilo, Gw_rows, m_rows, p_brick)


def brick_matvec(
    plan: BrickPlan,
    Gw_rows: jnp.ndarray,
    m_rows: jnp.ndarray,
    p_brick: jnp.ndarray,
    d: int,
    interpret: bool = False,
    scheme: str = "split",
) -> jnp.ndarray:
    """(d*Hpad, 128) brick -> (d*Hpad, 128) brick. Caller masks pins.

    Gw_rows/m_rows from element_rows(), padded with pad_rows().
    scheme: "split" = bf16 hi/lo compensated MXU products (~1e-6 relative
    matvec error); "bf16" = single-pass rounded values (~3e-3 relative,
    half the MXU passes) for inexact-Newton CG (see solve config)."""
    N = Gw_rows.shape[1] // (plan.k * d)
    return _matvec_call(
        plan.hilo, plan.h0, Gw_rows, m_rows, p_brick,
        (plan.ce, plan.k, d, N, plan.Wh, plan.Hpad, scheme),
        interpret=interpret,
    )


def _matvec_kernel2(plan_static, h0_ref, hilo_cm_ref, gw_ref, m_ref, p_ref,
                    out_ref):
    """Corner-stacked variant of _matvec_kernel: the k per-corner one-hot
    gather matmuls collapse into ONE (k*ce)-row matmul per component
    (indices come corner-major from the plan — Mosaic cannot lower in-
    kernel (ce, 1) sublane concats), and the 2*k*d scatter contractions
    collapse into k dots with components and bf16 halves lane-concatenated
    (N = 2*d*128). Same math, ~5x fewer MXU ops per chunk, so the fixed
    per-matmul pipeline overhead amortizes."""
    ce, k, d, N, Wh, Hpad = plan_static
    kd = k * d
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    h0 = h0_ref[c]
    kce = k * ce
    lanesW = jax.lax.broadcasted_iota(jnp.int32, (kce, Wh), 1)
    lanesL = jax.lax.broadcasted_iota(jnp.int32, (kce, LANE), 1)

    hi_all = hilo_cm_ref[:, 0:1]                           # (kce, 1)
    lo_all = hilo_cm_ref[:, 1:2]
    ohh = (hi_all == lanesW).astype(jnp.float32)           # (kce, Wh)
    ohl = (lo_all == lanesL).astype(jnp.float32)           # (kce, 128)
    ohh2 = jnp.concatenate([ohh, ohh], axis=1)             # (kce, 2Wh)
    lob = jnp.broadcast_to(lo_all, (kce, LANE))

    # gather: one split one-hot matmul + lane select per component
    pe_cols = [None] * kd
    for dc in range(d):
        Pw = p_ref[pl.ds(dc * Hpad + h0, Wh), :]           # (Wh, 128)
        Pw_hi, Pw_lo = _bf16_split(Pw)
        Pws = jnp.concatenate([Pw_hi, Pw_lo], axis=0)      # (2Wh, 128)
        tmp = jnp.dot(ohh2, Pws, preferred_element_type=jnp.float32)
        sel = jnp.take_along_axis(tmp, lob, axis=1)[:, 0:1]  # (kce, 1)
        for corner in range(k):
            pe_cols[corner * d + dc] = sel[
                corner * ce : (corner + 1) * ce, :
            ]
    pe = jnp.concatenate(pe_cols, axis=1)                  # (ce, kd)

    # factored stretch block: q = Gw pe (N), val = Gw^T q  (A_e = Gw^T Gw)
    qs = [
        jnp.sum(
            gw_ref[:, i * kd : (i + 1) * kd] * pe, axis=1, keepdims=True
        )
        for i in range(N)
    ]
    val_cols = []
    for corner in range(k):
        acc = None
        for i in range(N):
            Gic = gw_ref[:, i * kd + corner * d : i * kd + (corner + 1) * d]
            t = Gic * qs[i]
            acc = t if acc is None else acc + t
        for l in range(k):
            t = m_ref[:, corner * k + l : corner * k + l + 1] * pe[
                :, l * d : (l + 1) * d
            ]
            acc = acc + t
        val_cols.append(acc)                               # (ce, d)

    # scatter: ONE dot per corner — (dc, bf16-half) pairs lane-concatenated
    # into N = 2*d*128 output columns
    contrib = None
    for corner in range(k):
        ohl_c = ohl[corner * ce : (corner + 1) * ce, :]    # (ce, 128)
        ohh_c = ohh[corner * ce : (corner + 1) * ce, :]    # (ce, Wh)
        v_hi, v_lo = _bf16_split(val_cols[corner])         # (ce, d)
        S = jnp.concatenate(
            [
                ohl_c * part[:, dc : dc + 1]
                for dc in range(d)
                for part in (v_hi, v_lo)
            ],
            axis=1,
        )                                                  # (ce, 2d*128)
        part = jax.lax.dot_general(
            ohh_c, S,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (Wh, 2d*128)
        contrib = part if contrib is None else contrib + part
    for dc in range(d):
        idx = dc * Hpad + h0
        out_ref[pl.ds(idx, Wh), :] = (
            out_ref[pl.ds(idx, Wh), :]
            + contrib[:, (2 * dc) * LANE : (2 * dc + 1) * LANE]
            + contrib[:, (2 * dc + 1) * LANE : (2 * dc + 2) * LANE]
        )


@functools.partial(jax.jit, static_argnames=("plan_static", "interpret"))
def _matvec_call2(hilo_cm, h0, Gw_rows, m_rows, p_brick, plan_static,
                  interpret=False):
    ce, k, d, N, Wh, Hpad = plan_static
    nchunks = hilo_cm.shape[0] // (k * ce)
    kernel = functools.partial(_matvec_kernel2, plan_static)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((k * ce, 2), lambda c, h0s: (c, 0)),
            pl.BlockSpec((ce, N * k * d), lambda c, h0s: (c, 0)),
            pl.BlockSpec((ce, k * k), lambda c, h0s: (c, 0)),
            pl.BlockSpec((d * Hpad, LANE), lambda c, h0s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((d * Hpad, LANE), lambda c, h0s: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d * Hpad, LANE), p_brick.dtype),
        interpret=interpret,
    )(h0, hilo_cm, Gw_rows, m_rows, p_brick)


# ---------------------------------------------------------------------------
# fused windowed scatter (assembly): rows (E, k, m) -> brick (m*Hpad, 128)
# ---------------------------------------------------------------------------

def _scatter_kernel(plan_static, h0_ref, hilo_ref, vals_ref, out_ref):
    ce, k, m, Wh, Hpad = plan_static
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    h0 = h0_ref[c]
    lanesW = jax.lax.broadcasted_iota(jnp.int32, (ce, Wh), 1)
    lanesL = jax.lax.broadcasted_iota(jnp.int32, (ce, LANE), 1)
    vals_hi, vals_lo = _bf16_split(vals_ref[:, :])
    for corner in range(k):
        hi = hilo_ref[:, corner : corner + 1]
        lo = hilo_ref[:, k + corner : k + corner + 1]
        ohh = (hi == lanesW).astype(jnp.float32)
        ohl = (lo == lanesL).astype(jnp.float32)
        for mc in range(m):
            contrib = None
            col = corner * m + mc
            for part_val in (vals_hi, vals_lo):
                S = ohl * part_val[:, col : col + 1]
                part = jax.lax.dot_general(
                    ohh, S,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                contrib = part if contrib is None else contrib + part
            idx = mc * Hpad + h0
            out_ref[pl.ds(idx, Wh), :] = (
                out_ref[pl.ds(idx, Wh), :] + contrib
            )


@functools.partial(jax.jit, static_argnames=("plan_static", "interpret"))
def _scatter_call(hilo, h0, vals, plan_static, interpret=False):
    ce, k, m, Wh, Hpad = plan_static
    nchunks = hilo.shape[0] // ce
    kernel = functools.partial(_scatter_kernel, plan_static)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((ce, 2 * k), lambda c, h0s: (c, 0)),
            pl.BlockSpec((ce, k * m), lambda c, h0s: (c, 0)),
        ],
        out_specs=pl.BlockSpec((m * Hpad, LANE), lambda c, h0s: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m * Hpad, LANE), vals.dtype),
        interpret=interpret,
    )(h0, hilo, vals)


def brick_scatter(
    plan: BrickPlan, vals: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Scatter per-corner rows (E, k, m) into an m-component brick.

    Replaces jax.ops.segment_sum / the banded scatter for the
    once-per-Newton assemblies (rhs, inertia gradient, block-Jacobi
    diagonal blocks)."""
    E, k, m = vals.shape
    flat = vals.reshape(E, k * m)
    if plan.Ep > E:
        flat = jnp.concatenate(
            [flat, jnp.zeros((plan.Ep - E, k * m), flat.dtype)], axis=0
        )
    return _scatter_call(
        plan.hilo, plan.h0, flat, (plan.ce, k, m, plan.Wh, plan.Hpad),
        interpret=interpret,
    )
