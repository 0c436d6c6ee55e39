"""Linear-solver factory: the reference's scene vocabulary -> solve paths.

Reference: src/factories/linear_solver_factory.cpp:24-226 registers 13 live
names; scenes choose among them via the "linear_solver" JSON key. Each name
maps to one of this framework's solve paths:

  internal name      path
  ---------------    ----------------------------------------------------
  pcg                condensed SPD matrix-free PCG; two-level rigid-body
                     coarse preconditioner when available, else block-Jacobi
                     (solvers/pcg.py + solvers/coarse.py)
  pcg-block-jacobi   condensed PCG, per-vertex (d,d) block-Jacobi only
  pcg-diag           condensed PCG, scalar diagonal (Jacobi) preconditioner
  direct             host sparse factorization of the condensed system
                     (optimizer/newton_direct.py; scipy f64 — sparse
                     Cholesky does not map to TPU, so direct solves run on
                     host exactly like the reference's CPU path)
  minres-kkt         full indefinite KKT system, matrix-free MINRES
                     (solvers/minres.py)
  dual-cg            Schur complement onto the multipliers, CG
                     (solvers/dual.py)

Reference-name mapping (fidelity notes inline):
"""

from __future__ import annotations

INTERNAL_SOLVERS = (
    "pcg",
    "pcg-block-jacobi",
    "pcg-diag",
    "pcg-laplacian",
    "pcg-dualascent",
    "gauss-seidel",
    "direct",
    "pcg-ic",
    "amgcl",
    "minres-kkt",
    "minres-kkt-admm",
    "dual-cg",
    "admm",
)

# linear_solver_factory.cpp:24-226. Names the reference registers but whose
# exact algorithm has no TPU analog are routed to the nearest path:
#  - eigen-pcg-IC: TRUE port on the host path (like the reference's CPU
#    Eigen run): IC(0) with shift-retry breakdown handling in native C++
#    (csrc/native.cpp) preconditioning a CG on the host-assembled condensed
#    matrix, Eigen convergence semantics (solvers/direct.py solve_ic_pcg).
#    Incomplete factorization is inherently sequential, so — exactly like
#    the direct solvers — this path runs on the host, not the TPU.
#  - eigen-pcg-laplacian / eigen-pcg-dualascent: TRUE ports
#    (solvers/laplacian.py): rest-state M + k*L preconditioner with the
#    stress-rescaled k, applied as a fixed-degree Chebyshev polynomial
#    (the TPU-native stand-in for the reference's cached SimplicialLLT);
#    dualascent adds the alternating contact loop when frames are active.
#    The reference's LBFGS preconditioner (preconditioners/lbfgs.h) is
#    the identical M+kL algorithm (no quasi-Newton update exists in it)
#    and is unregistered in the factory — no name maps to it.
#  - admm-solver: TRUE port (solvers/admm.py): alternating x/s/lambda
#    sweeps on the full KKT with the rho-penalty factorizations; rho is
#    auto-scaled (the as-shipped fixed rho=0.02 stalls on vol-weighted
#    jacobians — deviations documented in that module).
#  - minres-indefinite-admm: MINRES on the full KKT with the SAME ADMM
#    iteration (fixed sweep count, zero start) as its preconditioner —
#    the reference's exact registration (Eigen MINRES +
#    ADMMPreconditioner, preconditioners.h:154-363).
#  - subspace-gauss_seidel: TRUE Gauss-Seidel sweeps
#    (solvers/gauss_seidel.py, multicolor — the parallel GS ordering),
#    run on the condensed primal system rather than the assembled dual
#    Schur complement (deviation documented in that module).
#  - subspace-amgcl: TRUE port (solvers/amg.py): smoothed-aggregation AMG
#    with SPAI(0) relaxation and block size N on the host-assembled dual
#    Schur matrix, as the preconditioner of an outer CG — amgcl's exact
#    configuration (amgcl_solver.h:40-75). Runs on the host like the
#    reference's amgcl (mixed-stretch dual only; contact scenes should use
#    subspace-CG, the coupled matrix-free Schur).
REFERENCE_SOLVER_MAP = {
    "eigen-llt": "direct",
    "eigen-ldlt": "direct",
    "eigen-lu": "direct",
    "cholmod": "direct",
    "eigen-pcg-diag": "pcg-diag",
    "eigen-pcg-IC": "pcg-ic",
    "eigen-pcg-laplacian": "pcg-laplacian",
    "eigen-pcg-dualascent": "pcg-dualascent",
    "eigen-pcg-block_jacobi": "pcg-block-jacobi",
    "admm-solver": "admm",
    "minres-indefinite-block": "minres-kkt",
    "minres-indefinite-admm": "minres-kkt-admm",
    "subspace-CG": "dual-cg",
    "subspace-amgcl": "amgcl",
    "subspace-gauss_seidel": "gauss-seidel",
    # affine-pcg appears in one scene but its registration is commented out
    # in the reference (linear_solver_factory.cpp:101-105) — route to pcg.
    "affine-pcg": "pcg",
}


def resolve_solver(name: str) -> str:
    """Reference or internal solver name -> internal solve-path name."""
    if name in INTERNAL_SOLVERS:
        return name
    if name in REFERENCE_SOLVER_MAP:
        return REFERENCE_SOLVER_MAP[name]
    raise ValueError(
        f"unknown linear_solver '{name}'; known: "
        f"{sorted(REFERENCE_SOLVER_MAP) + list(INTERNAL_SOLVERS)}"
    )
