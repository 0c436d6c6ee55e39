"""Solver-factory wiring tests: every reference linear_solver name steps a
scene and the trajectories agree (reference vocabulary:
src/factories/linear_solver_factory.cpp:24-226)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.optimizer.newton_direct import newton_step_direct
from mixedfem_tpu.solvers.factory import (
    INTERNAL_SOLVERS,
    REFERENCE_SOLVER_MAP,
    resolve_solver,
)

from tests.test_newton import make_state, small_beam

ALL_REFERENCE_NAMES = sorted(REFERENCE_SOLVER_MAP)


def _step_n(mesh, solver, n=2, outer=4):
    config = SimConfig(
        h=0.02,
        outer_steps=outer,
        itr_tol=1e-11,
        max_iterative_solver_iters=20000,
        solver=solver,
        dtype="float64",
        mixed_variables=("mixed-stretch",),
    )
    state = make_state(mesh, config)
    gs_plan = None
    if resolve_solver(solver) == "gauss-seidel":
        from mixedfem_tpu.solvers.gauss_seidel import build_gs_plan

        gs_plan = build_gs_plan(mesh.T, mesh.nv, dtype=jnp.float64)
    for _ in range(n):
        if resolve_solver(solver) in ("direct", "pcg-ic", "amgcl"):
            state = newton_step_direct(mesh, config, (), state)
        else:
            state = newton.newton_step(
                mesh, config, (), state, gs_plan=gs_plan
            )
    return state


class TestResolution:
    def test_all_reference_names_resolve(self):
        for name in ALL_REFERENCE_NAMES:
            assert resolve_solver(name) in INTERNAL_SOLVERS

    def test_internal_names_pass_through(self):
        for name in INTERNAL_SOLVERS:
            assert resolve_solver(name) == name

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError):
            resolve_solver("not-a-solver")


class TestTrajectories:
    """One representative per solve path vs the exact direct trajectory."""

    @pytest.fixture(scope="class")
    def beam(self):
        mesh, V = small_beam(3, 2, 2)
        ref = _step_n(mesh, "eigen-llt")
        return mesh, np.asarray(ref.x)

    @pytest.mark.parametrize(
        "name",
        [
            "cholmod",               # -> direct (same exact path)
            "eigen-pcg-diag",        # -> pcg-diag
            "eigen-pcg-IC",          # -> pcg-ic (host IC(0)-CG)
            "eigen-pcg-block_jacobi",  # -> pcg-block-jacobi
            "eigen-pcg-laplacian",   # -> pcg
            "minres-indefinite-block",  # -> minres-kkt
        ],
    )
    def test_matches_direct(self, beam, name):
        mesh, x_ref = beam
        out = _step_n(mesh, name)
        x = np.asarray(out.x)
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=1e-6 * scale)

    def test_dual_cg_converges_to_same_point(self, beam):
        """subspace-CG uses the lumped-mass Schur complement — inexact
        Newton directions, same fixed point. More Newton iterations, looser
        per-step tolerance."""
        mesh, x_ref = beam
        out = _step_n(mesh, "subspace-CG", outer=12)
        x = np.asarray(out.x)
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=2e-3 * scale)

    def test_minres_admm_converges_to_same_point(self, beam):
        """minres-indefinite-admm: MINRES preconditioned by fixed ADMM
        sweeps. The ADMM apply is a NONSYMMETRIC linear operator (a fixed
        sweep count of an exact splitting iteration — like SOR vs SSOR),
        so MINRES's SPD-preconditioner assumption is violated; the
        reference ships the identical unsound pairing (Eigen MINRES +
        ADMMPreconditioner, linear_solver_factory.cpp). Per-solve
        directions are therefore inexact — test the Newton fixed point,
        as for the other inexact-direction paths above."""
        mesh, x_ref = beam
        out = _step_n(mesh, "minres-indefinite-admm", outer=12)
        x = np.asarray(out.x)
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=2e-3 * scale)

    def test_amgcl_converges_to_same_point(self, beam):
        """subspace-amgcl solves the same lumped-mass dual system as
        subspace-CG (inexact Newton directions, same fixed point), with
        the host SA-AMG-preconditioned CG."""
        mesh, x_ref = beam
        out = _step_n(mesh, "subspace-amgcl", outer=12)
        x = np.asarray(out.x)
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=2e-3 * scale)

    def test_dual_cg_rejects_nodal_hessians(self):
        """dual-cg structurally cannot fold nodal Hessians into the
        lumped-mass elimination (matching the reference's restriction)."""
        mesh, V = small_beam(2, 1, 1)
        config = SimConfig(
            solver="subspace-CG",
            dtype="float64",
            mixed_variables=("mixed-stretch",),
            variables=("stretch",),
        )
        state = make_state(mesh, config)
        with pytest.raises(NotImplementedError):
            newton.newton_step(mesh, config, (), state)


def _contact_drop_mesh():
    """A box dropping onto a pinned floor (shared contact fixture)."""
    from mixedfem_tpu.mesh import generators, mesh as meshmod
    from mixedfem_tpu.config import enu_to_lame

    Vf, Tf = generators.box_tet_mesh(3, 3, 1, size=(2.0, 2.0, 0.1))
    Vb, Tb = generators.box_tet_mesh(2, 2, 2, size=(0.4, 0.4, 0.4))
    Vb = Vb + np.array([0.8, 0.8, 0.12])
    V = np.concatenate([Vf, Vb])
    T = np.concatenate([Tf, Tb + len(Vf)])
    la, mu = enu_to_lame(1e5, 0.45)
    is_fixed = np.zeros(len(V), bool)
    is_fixed[: len(Vf)] = True
    ext = np.tile(np.array([0.0, 0.0, -9.8]), (len(V), 1))
    mesh = meshmod.build_mesh_data(
        V, T,
        density=np.full(len(T), 1000.0),
        mu=np.full(len(T), mu),
        lam=np.full(len(T), la),
        model_id=np.zeros(len(T), int),
        models=("Stable-Neohookean",),
        is_fixed=is_fixed,
        ext_force=ext,
    )
    return mesh, V, len(Vf)


def _contact_frames(mesh, x, margin=0.1, dtype=jnp.float64):
    from mixedfem_tpu.collision import broadphase as bp
    from mixedfem_tpu.variables.mixed_collision import ContactFrames

    F_srf = np.asarray(mesh.F_srf)
    E_srf = np.asarray(mesh.E_srf)
    surf = np.unique(F_srf.reshape(-1))
    frames, types = bp.candidates_3d(np.asarray(x), F_srf, E_srf, surf, margin)
    f, t, m = bp.pad_candidates(frames, types, 1 << int(
        np.ceil(np.log2(max(len(frames), 2)))
    ))
    return ContactFrames(
        frames=jnp.asarray(f), ftype=jnp.asarray(t),
        fmask=jnp.asarray(m, dtype),
    )


def _run_contact_drop(mesh, V, nfloor, solver, steps=3, outer=4):
    config = SimConfig(
        h=0.01, outer_steps=outer, itr_tol=1e-11,
        max_iterative_solver_iters=20000, solver=solver,
        dtype="float64", dhat=0.05, kappa=100.0,
    )
    v0 = np.zeros_like(V)
    v0[nfloor:, 2] = -1.0
    state = newton.init_state(mesh, config, (), jnp.asarray(V), jnp.asarray(v0))
    ncontact = 0
    for _ in range(steps):
        state = state.replace(contact=_contact_frames(mesh, state.x))
        if resolve_solver(solver) in ("direct", "pcg-ic", "amgcl"):
            state = newton_step_direct(mesh, config, (), state)
        else:
            state = newton.newton_step(mesh, config, (), state)
        ncontact = max(ncontact, int(state.contact.frames.shape[0]))
    return np.asarray(state.x), ncontact


class TestDirectWithContact:
    """The same contact drop stepped through EVERY solve path: direct,
    condensed pcg, full-KKT MINRES, and the coupled dual Schur — matching
    the reference's SystemMatrixIndefinite / DualCondensedSystem stacking
    all mixed variables (linear_system.h:65-239)."""

    @pytest.fixture(scope="class")
    def drop(self):
        mesh, V, nfloor = _contact_drop_mesh()
        x_ref, nc = _run_contact_drop(mesh, V, nfloor, "eigen-llt")
        assert nc > 0  # contact actually active
        return mesh, V, nfloor, x_ref

    @pytest.mark.parametrize(
        "solver", ["pcg-block-jacobi", "minres-indefinite-block"]
    )
    def test_contact_drop_matches_direct(self, drop, solver):
        mesh, V, nfloor, x_ref = drop
        x, _ = _run_contact_drop(mesh, V, nfloor, solver)
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=5e-6 * scale)

    def test_contact_drop_dual_cg(self, drop):
        """subspace-CG takes lumped-mass (inexact) Newton directions —
        same trajectory to a looser tolerance with more outer iterations."""
        mesh, V, nfloor, x_ref = drop
        x, _ = _run_contact_drop(
            mesh, V, nfloor, "subspace-CG", outer=12
        )
        assert np.isfinite(x).all()
        scale = np.abs(x_ref).max()
        np.testing.assert_allclose(x, x_ref, atol=5e-3 * scale)
