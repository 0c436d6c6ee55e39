"""Simulation and material configuration.

Mirrors the reference scene/config vocabulary (reference: src/config.h:105-151)
as frozen dataclasses so they can be closed over by jitted step functions.
All fields that feed compiled code are Python scalars (static) or get baked
into arrays at state-build time.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


def enu_to_lame(ym: float, pr: float) -> Tuple[float, float]:
    """Young's modulus / Poisson ratio -> (lambda, mu).

    Reference: src/config.h:13-16 (Enu_to_lame).
    """
    la = (ym * pr) / ((1.0 + pr) * (1.0 - 2.0 * pr))
    mu = ym / (2.0 * (1.0 + pr))
    return la, mu


@dataclasses.dataclass(frozen=True)
class MaterialConfig:
    """Per-object material parameters (reference: src/config.h:143-151)."""

    model: str = "stable-neohookean"  # registry name, see materials/__init__.py
    ym: float = 1e6
    pr: float = 0.45
    density: float = 1000.0
    thickness: float = 1e-3  # shells only

    @property
    def la(self) -> float:
        return enu_to_lame(self.ym, self.pr)[0]

    @property
    def mu(self) -> float:
        return enu_to_lame(self.ym, self.pr)[1]


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Global simulation parameters (reference: src/config.h:105-140).

    Defaults match the reference's SimConfig defaults.
    """

    h: float = 0.034                 # timestep dt
    body_force: Tuple[float, float, float] = (0.0, -9.8, 0.0)
    timesteps: int = 300
    outer_steps: int = 5             # max Newton iterations per step
    ls_iters: int = 20               # max line-search iterations
    newton_tol: float = 1e-10
    inertia_blend_factor: float = 1.0

    # contact
    contact_mu: float = 0.5          # friction coefficient
    espv: float = 1e-3               # friction epsilon_v
    kappa: float = 10.0              # barrier stiffness
    enable_ccd: bool = False
    dhat: float = 1e-2
    max_contact_frames: int = 0      # static padded contact set size (0 = auto)
    # EE-mollifier (collision/mollifier.py): smooth the edge-edge barrier
    # near parallel edges. Off by default — the reference computes eps_x
    # but ships the application disabled (mixed_collision.cpp:149-165).
    ee_mollifier: bool = False

    # solver: an internal path name ('pcg' | 'pcg-block-jacobi' | 'pcg-diag'
    # | 'direct' | 'minres-kkt' | 'dual-cg') or any reference factory name
    # ('eigen-llt', 'cholmod', 'minres-indefinite-block', 'subspace-CG', ...)
    # — resolved by solvers/factory.py.
    solver: str = "pcg"
    # rebuild the two-level coarse preconditioner every N steps (it only
    # affects CG iteration counts; staleness across a few steps is benign)
    coarse_refresh_every: int = 1
    # "newton-schulz": matmul-only coarse inverse (MXU; warm-started from
    # the cached inverse). "lu": jnp.linalg.inv (exact, slow on TPU).
    coarse_inverse_method: str = "newton-schulz"
    max_iterative_solver_iters: int = 500
    itr_tol: float = 1e-4

    integrator: str = "BDF1"         # BDF1..BDF6
    optimizer: str = "newton"

    mixed_variables: Tuple[str, ...] = ("mixed-stretch", "mixed-collision")
    variables: Tuple[str, ...] = ()

    # numerics
    dtype: str = "float64"           # compute dtype ('float32' on TPU benches)
    # 'native' | 'float64': computes the Newton rhs, local solve and
    # line-search energies in f64 islands while the CG solve stays in
    # `dtype`. Lifts the f32 stall (decrement ~2e-5, set by catastrophic
    # cancellation in the force balance) down to ~1e-7+. Requires
    # jax_enable_x64; no-op for dtype='float64'.
    rhs_precision: str = "native"
    # Line-search acceptance: False (default) accepts trial energies within
    # the floating-point rounding band Ea < E + 16 eps |E| (needed so f32
    # Newton can contract past the merit's rounding noise; in f64 the band
    # is ~3.6e-15 relative — indistinguishable from strict). True uses the
    # reference's exact rule E(a) < E(0) (linesearch.h:104-109).
    ls_strict: bool = False
    # Warm-started Newton-Procrustes rotations: carry per-element R across
    # Newton iterations / steps as the polar seed (temporal branch tracking
    # through inversion, matching the reference's R_ cache). Off by default:
    # the stateless branch-free SVD is cheaper and equivalent away from
    # inversion.
    rotation_warm_start: bool = False
    # Precision scheme of the fused brick CG matvec on TPU (ops/brick.py):
    # 'split' (default) = compensated bf16 hi/lo MXU products, ~2.7e-6
    # relative matvec error; 'bf16' = single-pass rounded values, ~1.8e-3
    # relative with ~half the scatter MXU passes — inexact-Newton mode
    # (the merit/rhs stay exact, so Newton still converges; the search
    # direction solves a ~1e-3-perturbed system). No effect on the
    # stencil / XLA / CPU paths.
    matvec_scheme: str = "split"
    # Laplacian preconditioner (solver 'pcg-laplacian'/'pcg-dualascent',
    # the reference's eigen-pcg-laplacian / eigen-pcg-dualascent,
    # solvers/laplacian.py): Chebyshev degree of the (M + kL)^{-1} apply
    # (the TPU stand-in for the reference's SimplicialLLT solve) and the
    # dual-ascent alternation count under contact
    # (dual_ascent_preconditioner.h:217 max_iters_ = 10).
    lap_cheby_degree: int = 16
    da_iters: int = 10
    # ADMM solver ('admm-solver', solvers/admm.py): penalty auto-scale
    # multiplier (rho = admm_rho_scale * mean(vol |H|)/mean(vol^2 w^2);
    # the reference's fixed rho=0.02 documented there) and the inner
    # Jacobi-PCG sweep count for the (M + rho B^T B) x-solve.
    admm_rho_scale: float = 3.0
    admm_inner_iters: int = 30
    # minres-indefinite-admm: fixed ADMM sweeps per preconditioner apply
    admm_precond_sweeps: int = 2

    show_data: bool = True
    show_timing: bool = True
    save_substeps: bool = False

    # diagnostics: record the vanilla-FEM gradient norm at each Newton
    # iterate (the convergence-harness probe, apps/convergence.cpp:22-52)
    record_vanilla_gradient: bool = False
