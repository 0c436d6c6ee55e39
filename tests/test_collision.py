"""Contact subsystem tests: distances (FD), barrier, broadphase, drop test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixedfem_tpu.collision import accd, barrier, broadphase, distances
from mixedfem_tpu.config import SimConfig, enu_to_lame
from mixedfem_tpu.mesh import generators, mesh as meshmod
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.variables.mixed_collision import ContactFrames


class TestDistances:
    def test_point_triangle_regions(self):
        t0 = jnp.array([0.0, 0.0, 0.0])
        t1 = jnp.array([1.0, 0.0, 0.0])
        t2 = jnp.array([0.0, 1.0, 0.0])
        # above interior
        d = distances.point_triangle(jnp.array([0.2, 0.2, 0.5]), t0, t1, t2)
        np.testing.assert_allclose(float(d), 0.5, atol=1e-12)
        # vertex region
        d = distances.point_triangle(jnp.array([-1.0, -1.0, 0.0]), t0, t1, t2)
        np.testing.assert_allclose(float(d), np.sqrt(2.0), atol=1e-12)
        # edge region
        d = distances.point_triangle(jnp.array([0.5, -1.0, 0.0]), t0, t1, t2)
        np.testing.assert_allclose(float(d), 1.0, atol=1e-12)

    def test_edge_edge(self):
        p0 = jnp.array([0.0, 0.0, 0.0])
        p1 = jnp.array([1.0, 0.0, 0.0])
        q0 = jnp.array([0.5, -0.5, 0.3])
        q1 = jnp.array([0.5, 0.5, 0.3])
        d = distances.edge_edge(p0, p1, q0, q1)
        np.testing.assert_allclose(float(d), 0.3, atol=1e-12)
        # disjoint: closest endpoints
        q0 = jnp.array([2.0, 0.0, 0.0])
        q1 = jnp.array([3.0, 0.0, 0.0])
        d = distances.edge_edge(p0, p1, q0, q1)
        np.testing.assert_allclose(float(d), 1.0, atol=1e-12)

    def test_distance_brute_force(self):
        """Clamped distances match dense sampling minima."""
        rng = np.random.default_rng(0)
        for _ in range(20):
            tri = rng.standard_normal((3, 3))
            p = rng.standard_normal(3)
            uv = rng.random((4000, 2))
            keep = uv.sum(axis=1) <= 1.0
            uv = uv[keep]
            pts = (
                tri[0]
                + uv[:, :1] * (tri[1] - tri[0])
                + uv[:, 1:] * (tri[2] - tri[0])
            )
            brute = np.linalg.norm(pts - p, axis=1).min()
            d = float(
                distances.point_triangle(
                    jnp.asarray(p), *(jnp.asarray(t) for t in tri)
                )
            )
            assert d <= brute + 1e-9
            assert d >= brute - 2e-2  # sampling resolution

    def test_gradients_fd(self):
        """frame_distance_grad vs finite differences for all types."""
        rng = np.random.default_rng(1)
        verts = rng.standard_normal((8, 4, 3))
        types = np.array([0, 0, 1, 1, 2, 2, 3, 3], np.int32)
        G = np.asarray(
            distances.frame_distance_grad(jnp.asarray(verts), jnp.asarray(types))
        )
        h = 1e-6
        for b in range(8):
            for k in range(4):
                for r in range(3):
                    vp = verts.copy()
                    vp[b, k, r] += h
                    vm = verts.copy()
                    vm[b, k, r] -= h
                    dp = float(
                        distances.frame_distance(
                            jnp.asarray(vp[b]), jnp.asarray(types[b])
                        )
                    )
                    dm = float(
                        distances.frame_distance(
                            jnp.asarray(vm[b]), jnp.asarray(types[b])
                        )
                    )
                    np.testing.assert_allclose(
                        G[b, k, r], (dp - dm) / (2 * h), atol=1e-5,
                        err_msg=f"b={b} k={k} r={r}",
                    )


class TestBarrier:
    def test_barrier_properties(self):
        dhat2 = 0.01
        t = jnp.linspace(1e-6, 0.02, 100)
        b = np.asarray(barrier.barrier(t, dhat2))
        assert (b[t >= dhat2] == 0).all()
        assert (b[np.asarray(t) < dhat2] > 0).all()
        # gradient FD
        h = 1e-9
        g = np.asarray(barrier.barrier_gradient(t, dhat2))
        fd = (
            np.asarray(barrier.barrier(t + h, dhat2))
            - np.asarray(barrier.barrier(t - h, dhat2))
        ) / (2 * h)
        inside = np.abs(np.asarray(t) - dhat2) > 1e-4
        np.testing.assert_allclose(g[inside], fd[inside], rtol=1e-4, atol=1e-3)


class TestBroadphase:
    def test_candidates_3d_two_cubes(self):
        V1, T1 = generators.box_tet_mesh(1, 1, 1)
        V2 = V1 + np.array([0.0, 1.005, 0.0])  # just above
        V = np.concatenate([V1, V2])
        T = np.concatenate([T1, T1 + len(V1)])
        from mixedfem_tpu.mesh import discretization as disc

        F = disc.boundary_facets(T)
        E = disc.edges(F)
        sv = np.unique(F.reshape(-1))
        frames, types = broadphase.candidates_3d(V, F, E, sv, margin=0.02)
        assert len(frames) > 0
        # no duplicate candidates under canonical ordering
        canon = frames.astype(np.int64).copy()
        ee = types == distances.EE
        a = np.sort(canon[ee, 0:2], axis=1)
        b = np.sort(canon[ee, 2:4], axis=1)
        swap = (a[:, 0] > b[:, 0]) | (
            (a[:, 0] == b[:, 0]) & (a[:, 1] > b[:, 1])
        )
        canon[ee] = np.where(
            swap[:, None],
            np.concatenate([b, a], axis=1),
            np.concatenate([a, b], axis=1),
        )
        pt = types == distances.PT
        canon[pt, 1:] = np.sort(canon[pt, 1:], axis=1)
        combined = np.concatenate([types[:, None], canon], axis=1)
        assert len(np.unique(combined, axis=0)) == len(combined)


def drop_scene(dim=3, dhat=1e-2, kappa=1e5):
    """A small cube dropped onto a pinned slab."""
    if dim == 3:
        V1, T1 = generators.box_tet_mesh(2, 1, 2, size=(1.0, 0.25, 1.0))
        V2, T2 = generators.box_tet_mesh(2, 1, 2, size=(0.4, 0.2, 0.4))
        V2 = V2 + np.array([0.3, 0.27, 0.3])
    else:
        V1, T1 = generators.grid_tri_mesh(4, 1, size=(1.0, 0.2))
        V2, T2 = generators.grid_tri_mesh(2, 1, size=(0.3, 0.15))
        V2 = V2 + np.array([0.35, 0.23])
    V = np.concatenate([V1, V2])
    T = np.concatenate([T1, T2 + len(V1)])
    la, mu = enu_to_lame(1e6, 0.40)
    is_fixed = np.zeros(len(V), bool)
    is_fixed[: len(V1)] = True  # slab fully pinned
    ext = np.zeros_like(V)
    ext[:, 1] = -9.8
    mesh = meshmod.build_mesh_data(
        V,
        T,
        density=np.full(len(T), 1000.0),
        mu=np.full(len(T), mu),
        lam=np.full(len(T), la),
        model_id=np.zeros(len(T), int),
        models=("Stable-Neohookean",),
        is_fixed=is_fixed,
        ext_force=ext,
    )
    config = SimConfig(
        h=0.01,
        outer_steps=8,
        itr_tol=1e-8,
        dhat=dhat,
        kappa=kappa,
        enable_ccd=True,
        mixed_variables=("mixed-stretch", "mixed-collision"),
        dtype="float64",
    )
    return mesh, config, len(V1)


class TestDrop:
    @pytest.mark.parametrize("dim", [3, 2])
    def test_drop_no_penetration(self, dim):
        from mixedfem_tpu.io.scene import Simulation

        mesh, config, n_slab = drop_scene(dim=dim)
        x0 = jnp.asarray(mesh.V0)
        state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
        sim = Simulation(
            mesh=mesh, config=config, bc_specs=(), state=state,
            dim=dim, obj_slices=[],
        )
        slab_top = float(np.asarray(mesh.V0)[:n_slab, 1].max())
        for _ in range(25):
            sim.step()
            X = np.asarray(sim.state.x)
            assert np.isfinite(X).all()
        # dropped object must stay above the slab top surface
        drop_min = X[n_slab:, 1].min()
        assert drop_min > slab_top - 1e-4, (drop_min, slab_top)
        # and must have fallen (gravity acted)
        assert drop_min < float(np.asarray(mesh.V0)[n_slab:, 1].min())


class TestCandidateStaleness:
    """The per-step candidate set must not miss contacts when the step's
    actual motion exceeds the velocity-predicted margin (the reference
    avoids this by rebuilding candidates every Newton iteration,
    mixed_collision.cpp:116-118; here Simulation.step detects the motion
    overshoot and re-runs the step with a wider margin)."""

    def _fast_drop(self):
        # FINE surface elements: the broadphase admission bound is
        # margin + primitive radius, so only small primitives can actually
        # be missed by a too-small margin. A gap of 0.14 clears the
        # admission bound (max top-surface EE radius sum ~0.08 + 0.031
        # margin) so the single-build candidate set genuinely has NO
        # crossing pairs. CCD is ON: with candidates present ACCD clamps
        # the 0.4-deep free-fall step; with stale candidates ACCD has
        # nothing to clamp against and the box tunnels through the slab —
        # exactly the miss the reference avoids by rebuilding candidates
        # inside the step (mixed_collision.cpp:116-118).
        V1, T1 = generators.box_tet_mesh(12, 2, 12, size=(1.0, 0.25, 1.0))
        V2, T2 = generators.box_tet_mesh(6, 6, 6, size=(0.4, 0.4, 0.4))
        V2 = V2 + np.array([0.3, 0.40, 0.3])  # gap 0.15 = 15*dhat
        V = np.concatenate([V1, V2])
        T = np.concatenate([T1, T2 + len(V1)])
        la, mu = enu_to_lame(1e6, 0.40)
        is_fixed = np.zeros(len(V), bool)
        is_fixed[: len(V1)] = True
        ext = np.zeros_like(V)
        ext[:, 1] = -40.0  # strong gravity: falls ~h^2*g = 0.4 in step 1
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
        config = SimConfig(
            h=0.1,
            outer_steps=8,
            itr_tol=1e-8,
            dhat=1e-2,
            kappa=1e5,
            enable_ccd=True,  # ACCD can only clamp against known candidates
            mixed_variables=("mixed-stretch", "mixed-collision"),
            dtype="float64",
        )
        return mesh, config, len(V1)

    def test_stale_candidates_miss_retry_catches(self):
        from mixedfem_tpu.io.scene import Simulation

        mesh, config, n_slab = self._fast_drop()
        slab_top = float(np.asarray(mesh.V0)[:n_slab, 1].max())
        x0 = jnp.asarray(mesh.V0)

        # (a) the old single-build path: candidates once, no retry -> the
        # box free-falls through the margin and penetrates the slab.
        state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
        sim = Simulation(
            mesh=mesh, config=config, bc_specs=(), state=state,
            dim=3, obj_slices=[],
        )
        sim._update_contact_candidates()
        sim.state = sim._one_step()
        bottom_stale = float(np.asarray(sim.state.x)[n_slab:, 1].min())
        assert bottom_stale < slab_top - 1e-3, (
            "fixture not sharp: single-build candidates did not miss"
        )

        # (b) the production path with the motion-overshoot retry.
        state = newton.init_state(mesh, config, (), x0, jnp.zeros_like(x0))
        sim = Simulation(
            mesh=mesh, config=config, bc_specs=(), state=state,
            dim=3, obj_slices=[],
        )
        for _ in range(2):
            sim.step()
        bottom = float(np.asarray(sim.state.x)[n_slab:, 1].min())
        assert np.isfinite(np.asarray(sim.state.x)).all()
        assert bottom > slab_top - 1e-4, (bottom, slab_top)
