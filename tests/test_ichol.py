"""IC(0) host preconditioner (the reference's "eigen-pcg-IC" path,
src/factories/linear_solver_factory.cpp:115-130: Eigen ConjugateGradient
with IncompleteCholesky on the assembled condensed SPD matrix)."""

import numpy as np
import scipy.sparse as sp
import pytest

from mixedfem_tpu.solvers import direct as directmod
from mixedfem_tpu.solvers.direct import (
    ICholPreconditioner,
    _ichol0_python,
    solve_ic_pcg,
)


def _spd_fem_like(n=120, seed=0):
    """Sparse SPD matrix with FEM-like banded structure."""
    rng = np.random.default_rng(seed)
    diags = [rng.uniform(0.1, 1.0, n - k) for k in (1, 2, 7)]
    A = sp.diags(
        diags + [np.zeros(n)] + [d for d in diags],
        [-1, -2, -7, 0, 1, 2, 7],
        format="csr",
    )
    A = A + sp.diags(np.asarray(np.abs(A).sum(axis=1)).ravel() + 1.0)
    return A.tocsr()


class TestICFactor:
    def test_exact_on_full_pattern(self):
        """On a matrix whose Cholesky factor fills nothing (tridiagonal),
        IC(0) IS the exact Cholesky: A == L L^T."""
        n = 50
        rng = np.random.default_rng(1)
        off = rng.uniform(0.1, 0.5, n - 1)
        A = sp.diags([off, 2.0 + np.arange(n) * 0.01, off], [-1, 0, 1]).tocsr()
        M = ICholPreconditioner(A)
        L = sp.csr_matrix((M._data, M._indices, M._indptr), shape=(n, n))
        np.testing.assert_allclose(
            (L @ L.T).toarray(), A.toarray(), atol=1e-12
        )
        assert M.shift == 0.0

    def test_preconditioner_apply_is_LLt_inverse(self):
        A = _spd_fem_like()
        M = ICholPreconditioner(A)
        n = A.shape[0]
        L = sp.csr_matrix((M._data, M._indices, M._indptr), shape=(n, n))
        r = np.random.default_rng(2).normal(size=n)
        x = M.apply(r)
        np.testing.assert_allclose((L @ (L.T @ x)), r, atol=1e-10)

    def test_python_fallback_matches_native(self):
        A = _spd_fem_like()
        M = ICholPreconditioner(A)  # native (or fallback if no compiler)
        Lf = sp.tril(A, format="csr")
        Lf.sort_indices()
        data = np.ascontiguousarray(Lf.data, np.float64)
        sigma = _ichol0_python(
            Lf.indptr.astype(np.int64), Lf.indices.astype(np.int64), data
        )
        assert sigma == M.shift
        np.testing.assert_allclose(data, M._data, atol=1e-13)

    def test_shift_retry_on_indefinite_diagonal(self):
        """A matrix whose IC(0) breaks down without a shift still factors
        (Eigen's IncompleteCholesky sigma-retry behavior)."""
        n = 30
        A = _spd_fem_like(n).tolil()
        # starve one pivot so the unshifted factorization breaks down
        A[5, 5] = 1e-3
        A = A.tocsr()
        M = ICholPreconditioner(A)
        assert M.shift > 0.0
        r = np.ones(n)
        assert np.isfinite(M.apply(r)).all()


class TestICPCG:
    def test_matches_direct_solve(self):
        A = _spd_fem_like(200)
        b = np.random.default_rng(3).normal(size=200)
        x, it = solve_ic_pcg(A, b, tol=1e-12, maxiter=1000)
        np.testing.assert_allclose(A @ x, b, atol=1e-9 * np.abs(b).max())
        assert 0 < it < 200

    def test_ic_beats_unpreconditioned_iterations(self):
        A = _spd_fem_like(300, seed=5)
        # worsen conditioning
        A = (A + sp.diags(np.linspace(0, 50, 300))).tocsr()
        b = np.ones(300)
        _, it_ic = solve_ic_pcg(A, b, tol=1e-10, maxiter=5000)

        # plain CG, same convergence rule
        x = np.zeros(300)
        r = b.copy()
        p = r.copy()
        rr = float(r @ r)
        thresh = 1e-20 * float(b @ b)
        it = 0
        while rr > thresh and it < 5000:
            Ap = A @ p
            al = rr / float(p @ Ap)
            x += al * p
            r -= al * Ap
            rr_new = float(r @ r)
            p = r + (rr_new / rr) * p
            rr = rr_new
            it += 1
        assert it_ic < it
