"""Material models: energy densities in S-space (mixed) and F-space (vanilla).

The six models of the reference (registry names from
src/factories/material_model_factory.cpp:12-49): ARAP, Corot, FixedCorot,
Fung, Neohookean, Stable-Neohookean. The reference ships MATLAB-generated
closed-form gradients/Hessians (src/energies/*.cpp); here each model is a
scalar energy density and gradients/Hessians come from jax autodiff (traced
once, fused by XLA) — validated against the reference's closed forms in
tests/test_materials.py.

S-space conventions (see ops/sym.py): s = [S00,S11,S22,S01,S02,S12] (3D)
or [S00,S11,S01] (2D). Invariants:
  trS, |S|_F^2 = s0^2+s1^2+s2^2 + 2(s3^2+s4^2+s5^2), det(S).

Energy forms (matching src/energies/*.cpp exactly):
  ARAP   : mu/2 * |S - I|_F^2
  Corot  : la/2 (trS - d)^2 + mu |S - I|_F^2
  FixedCorot: la/2 (det S - 1)^2 + mu |S - I|_F^2
  SNH    : mu (1 - det S) + la/2 (1 - det S)^2 + mu/2 (|S|^2 - d)
  Neohookean: -mu log(det S) + la/2 log^2(det S) + mu/2 (|S|^2 - d)
  Fung (c=4): mu/2 (e^{c(|S|^2-d)/2} - 1) + mu/2 (|S|^2 - d)
              + la/2 ((mu + c mu)/la + 1 - det S)^2

Log/negative-determinant guards use the double-where pattern so that
autodiff stays NaN-free; infeasible states return a large finite energy so
the line search rejects them (mirroring the reference's -inf/NaN rejection).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from mixedfem_tpu.ops import rotation

MATERIAL_NAMES: Tuple[str, ...] = (
    "ARAP",
    "Corot",
    "FixedCorot",
    "Fung",
    "Neohookean",
    "Stable-Neohookean",
)

_FUNG_C = 4.0  # reference: src/energies/fung.cpp:7
_BIG = 1e12    # energy assigned to infeasible (det<=0) log-model states


def model_index(name: str) -> int:
    for i, n in enumerate(MATERIAL_NAMES):
        if n.lower() == name.lower():
            return i
    raise KeyError(f"unknown material model '{name}' (have {MATERIAL_NAMES})")


# ---------------------------------------------------------------------------
# S-space invariants
# ---------------------------------------------------------------------------

def _invariants_s(s: jnp.ndarray):
    """(tr, |S|^2, det, d) from a sym-vec s of length 6 (3D) or 3 (2D)."""
    if s.shape[-1] == 6:
        tr = s[0] + s[1] + s[2]
        n2 = s[0] ** 2 + s[1] ** 2 + s[2] ** 2 + 2.0 * (
            s[3] ** 2 + s[4] ** 2 + s[5] ** 2
        )
        det = (
            s[0] * s[1] * s[2]
            + 2.0 * s[3] * s[4] * s[5]
            - s[0] * s[5] ** 2
            - s[1] * s[4] ** 2
            - s[2] * s[3] ** 2
        )
        return tr, n2, det, 3.0
    tr = s[0] + s[1]
    n2 = s[0] ** 2 + s[1] ** 2 + 2.0 * s[2] ** 2
    det = s[0] * s[1] - s[2] ** 2
    return tr, n2, det, 2.0


def _norm_smi2(s: jnp.ndarray):
    """|S - I|_F^2 in sym-vec form."""
    if s.shape[-1] == 6:
        return (s[0] - 1.0) ** 2 + (s[1] - 1.0) ** 2 + (s[2] - 1.0) ** 2 + 2.0 * (
            s[3] ** 2 + s[4] ** 2 + s[5] ** 2
        )
    return (s[0] - 1.0) ** 2 + (s[1] - 1.0) ** 2 + 2.0 * s[2] ** 2


def _safe_log(det):
    ok = det > 0
    return jnp.where(ok, jnp.log(jnp.where(ok, det, 1.0)), 0.0), ok


# ---------------------------------------------------------------------------
# S-space energy densities psi(s, mu, la)
# ---------------------------------------------------------------------------

def _psi_arap(s, mu, la):
    return 0.5 * mu * _norm_smi2(s)


def _psi_corot(s, mu, la):
    tr, _, _, d = _invariants_s(s)
    return 0.5 * la * (tr - d) ** 2 + mu * _norm_smi2(s)


def _psi_fcr(s, mu, la):
    _, _, det, _ = _invariants_s(s)
    return 0.5 * la * (det - 1.0) ** 2 + mu * _norm_smi2(s)


def _psi_snh(s, mu, la):
    _, n2, det, d = _invariants_s(s)
    return mu * (1.0 - det) + 0.5 * la * (1.0 - det) ** 2 + 0.5 * mu * (n2 - d)


def _psi_nh(s, mu, la):
    _, n2, det, d = _invariants_s(s)
    logd, ok = _safe_log(det)
    e = -mu * logd + 0.5 * la * logd**2 + 0.5 * mu * (n2 - d)
    return jnp.where(ok, e, _BIG)


def _psi_fung(s, mu, la):
    _, n2, det, d = _invariants_s(s)
    c = _FUNG_C
    return (
        0.5 * mu * (jnp.exp(0.5 * c * (n2 - d)) - 1.0)
        + 0.5 * mu * (n2 - d)
        + 0.5 * la * ((mu + c * mu) / la + 1.0 - det) ** 2
    )


_PSI_S = (_psi_arap, _psi_corot, _psi_fcr, _psi_fung, _psi_nh, _psi_snh)
# order matches MATERIAL_NAMES


def psi_s(name: str):
    return _PSI_S[model_index(name)]


# ---------------------------------------------------------------------------
# Batched evaluation with heterogeneous per-element models
# ---------------------------------------------------------------------------

def _dispatch(fns_by_model, models, s, mu, la, model_id):
    """Evaluate per-element quantities under (possibly) mixed models.

    `models` is the static tuple of model names present in the mesh. When a
    single model is present (the common case) this is a straight vmap; with
    several, each model evaluates on the full batch and results are selected
    by mask (branch-free; heterogeneity per src/simulation_state.cpp:179-190).
    """
    if len(models) == 1:
        return fns_by_model[models[0]](s, mu, la)
    out = None
    for i, name in enumerate(models):
        val = fns_by_model[name](s, mu, la)
        mask = (model_id == i).astype(val.dtype)
        mask = mask.reshape(mask.shape + (1,) * (val.ndim - 1))
        out = val * mask if out is None else out + val * mask
    return out


@functools.partial(jax.jit, static_argnames="models")
def psi_s_all(s, mu, la, model_id, models):
    """(E, N) stretches -> (E,) energy densities."""
    fns = {n: jax.vmap(_PSI_S[model_index(n)]) for n in MATERIAL_NAMES}
    return _dispatch(fns, models, s, mu, la, model_id)


@functools.partial(jax.jit, static_argnames="models")
def grad_s_all(s, mu, la, model_id, models):
    """(E, N) -> (E, N) energy gradients dpsi/ds."""
    fns = {
        n: jax.vmap(jax.grad(_PSI_S[model_index(n)])) for n in MATERIAL_NAMES
    }
    return _dispatch(fns, models, s, mu, la, model_id)


@functools.partial(jax.jit, static_argnames="models")
def hess_s_all(s, mu, la, model_id, models):
    """(E, N) -> (E, N, N) energy Hessians d2psi/ds2."""
    fns = {
        n: jax.vmap(jax.hessian(_PSI_S[model_index(n)]))
        for n in MATERIAL_NAMES
    }
    return _dispatch(fns, models, s, mu, la, model_id)


# ---------------------------------------------------------------------------
# F-space energy densities psi(F, mu, la) for the vanilla (non-mixed)
# Stretch variable. F is a (d, d) matrix. Reference: the Vector9d/Vector4d
# overloads in src/energies/*.cpp. Rotation-dependent models (ARAP,
# FixedCorot) differentiate through the branch-free polar kernel.
# ---------------------------------------------------------------------------

def _rotation_of(F):
    d = F.shape[-1]
    if d == 3:
        R, _ = rotation.polar33(F[None], sweeps=8)
    else:
        R, _ = rotation.polar22(F[None])
    return R[0]


def _psiF_arap(F, mu, la):
    R = _rotation_of(F)
    return 0.5 * mu * jnp.sum((F - R) ** 2)


def _psiF_corot(F, mu, la):
    R = _rotation_of(F)
    S = R.T @ F
    d = F.shape[-1]
    tr = jnp.trace(S)
    return 0.5 * la * (tr - d) ** 2 + mu * jnp.sum((S - jnp.eye(d, dtype=F.dtype)) ** 2)


def _psiF_fcr(F, mu, la):
    # Reference F-space FixedCorot (fixed_corotational.cpp:215-223) keeps
    # only the mu-term in energy: mu/2 (|F|^2 - 2 tr(S) + 3) = mu/2 |F - R|^2,
    # plus the la (J-1)^2 volume term in gradient/hessian; we use the full
    # energy including the volume term for consistency.
    d = F.shape[-1]
    R = _rotation_of(F)
    J = jnp.linalg.det(F)
    return 0.5 * mu * jnp.sum((F - R) ** 2) + 0.5 * la * (J - 1.0) ** 2


def _psiF_snh(F, mu, la):
    d = F.shape[-1]
    J = jnp.linalg.det(F)
    return (
        mu * (1.0 - J)
        + 0.5 * la * (1.0 - J) ** 2
        + 0.5 * mu * (jnp.sum(F**2) - d)
    )


def _psiF_nh(F, mu, la):
    d = F.shape[-1]
    J = jnp.linalg.det(F)
    logJ, ok = _safe_log(J)
    e = -mu * logJ + 0.5 * la * logJ**2 + 0.5 * mu * (jnp.sum(F**2) - d)
    return jnp.where(ok, e, _BIG)


def _psiF_fung(F, mu, la):
    # Reference Fung has no F-space form (fung.cpp:96 returns 0); provide the
    # natural extension for completeness.
    d = F.shape[-1]
    J = jnp.linalg.det(F)
    n2 = jnp.sum(F**2)
    c = _FUNG_C
    return (
        0.5 * mu * (jnp.exp(0.5 * c * (n2 - d)) - 1.0)
        + 0.5 * mu * (n2 - d)
        + 0.5 * la * ((mu + c * mu) / la + 1.0 - J) ** 2
    )


_PSI_F = (_psiF_arap, _psiF_corot, _psiF_fcr, _psiF_fung, _psiF_nh, _psiF_snh)


def psi_F(name: str):
    return _PSI_F[model_index(name)]


@functools.partial(jax.jit, static_argnames="models")
def psi_F_all(F, mu, la, model_id, models):
    """(E, d, d) deformation gradients -> (E,) energy densities."""
    fns = {n: jax.vmap(_PSI_F[model_index(n)]) for n in MATERIAL_NAMES}
    return _dispatch(fns, models, F, mu, la, model_id)


@functools.partial(jax.jit, static_argnames="models")
def grad_F_all(F, mu, la, model_id, models):
    fns = {n: jax.vmap(jax.grad(_PSI_F[model_index(n)])) for n in MATERIAL_NAMES}
    return _dispatch(fns, models, F, mu, la, model_id)


@functools.partial(jax.jit, static_argnames="models")
def hess_F_all(F, mu, la, model_id, models):
    """(E, d, d) -> (E, d*d, d*d) Hessians in ROW-major flattened F order."""
    d = F.shape[-1]

    def flat_hess(name):
        psi = _PSI_F[model_index(name)]

        def f(Fv, mu, la):
            return psi(Fv.reshape(d, d), mu, la)

        return jax.vmap(jax.hessian(f))

    fns = {n: flat_hess(n) for n in MATERIAL_NAMES}
    return _dispatch(fns, models, F.reshape(F.shape[0], d * d), mu, la, model_id)
