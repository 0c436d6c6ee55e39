"""Mixed IPC contact on the vertex-partitioned Newton step
(parallel/vp_step.py `cf` path) vs the replicated single-device step:
contact-drop trajectory parity on the virtual 8-device CPU mesh
(VERDICT r4 item 5 — the flagship multi-chip configuration must cover
the flagship physics, contact included)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mixedfem_tpu.config import SimConfig, enu_to_lame
from mixedfem_tpu.mesh import generators, mesh as meshmod
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.parallel import vp_step as vp
from mixedfem_tpu.variables.mixed_collision import ContactFrames


def _n_devices(n=8):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices (got {len(devs)})")
    return devs[:n]


def _drop_mesh():
    """A long banded beam (vp-partitionable without reordering) with a
    small box dropping onto its middle: contact frames span the two
    objects' id ranges — exercising the no-locality psum frame gather."""
    Vb, Tb = generators.box_tet_mesh(24, 2, 2, size=(2.4, 0.2, 0.2))
    Vx, Tx = generators.box_tet_mesh(1, 1, 1, size=(0.12, 0.12, 0.12))
    Vx = Vx + np.array([1.14, 0.04, 0.225])
    V = np.concatenate([Vb, Vx])
    T = np.concatenate([Tb, Tx + len(Vb)])
    la, mu = enu_to_lame(1e5, 0.45)
    is_fixed = np.zeros(len(V), bool)
    is_fixed[V[:, 0] < 1e-9] = True
    is_fixed[np.abs(V[:, 0] - 2.4) < 1e-9] = True
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
    return mesh, V, len(Vb)


def _frames(mesh, x, margin=0.1):
    from mixedfem_tpu.collision import broadphase as bp

    F_srf = np.asarray(mesh.F_srf)
    E_srf = np.asarray(mesh.E_srf)
    surf = np.unique(F_srf.reshape(-1))
    frames, types = bp.candidates_3d(
        np.asarray(x), F_srf, E_srf, surf, margin
    )
    cap = 1 << int(np.ceil(np.log2(max(len(frames), 2))))
    f, t, m = bp.pad_candidates(frames, types, cap)
    return ContactFrames(
        frames=jnp.asarray(f), ftype=jnp.asarray(t),
        fmask=jnp.asarray(m, jnp.float64),
    )


def test_vp_contact_drop_matches_replicated():
    devs = _n_devices(8)
    mesh, V, nbeam = _drop_mesh()
    config = SimConfig(
        h=0.01, outer_steps=4, itr_tol=1e-11,
        max_iterative_solver_iters=20000,
        mixed_variables=("mixed-stretch", "mixed-collision"),
        dtype="float64", dhat=0.05, kappa=100.0,
    )
    x0 = jnp.asarray(V)
    v0 = np.zeros_like(V)
    v0[nbeam:, 2] = -1.0
    v0 = jnp.asarray(v0)

    # replicated reference
    state = newton.init_state(mesh, config, (), x0, v0)
    xs_ref = []
    n_active = 0
    for _ in range(3):
        cfr = _frames(mesh, state.x)
        state = state.replace(contact=cfr)
        state = newton.newton_step(mesh, config, (), state)
        xs_ref.append(np.asarray(state.x))
        n_active = max(
            n_active, int(np.sum(np.asarray(cfr.fmask) > 0))
        )
    assert n_active > 0, "fixture never produced contact candidates"

    # vertex-partitioned over the 8-device mesh, same per-step frames
    jmesh = Mesh(np.array(devs), ("e",))
    plan = vp.build_vp_plan(mesh, 8)
    x = vp.pad_vertex_field(plan, x0)
    v = vp.pad_vertex_field(plan, v0)
    s, la = vp.init_vp_state(plan, x)
    nv = mesh.nv
    for k in range(3):
        cfr = _frames(mesh, jnp.asarray(np.asarray(x)[:nv]))
        x, v, s, la, it, dec, _cg = vp.vp_newton_step(
            plan, config, jmesh, x, v, s, la, cf=cfr
        )
        xh = np.asarray(x)[:nv]
        assert np.isfinite(xh).all()
        scale = max(np.abs(xs_ref[k]).max(), 1e-12)
        err = np.abs(xh - xs_ref[k]).max() / scale
        assert err < 1e-6, (k, err)
    # the box actually fell and was stopped above the beam surface
    z_box = np.asarray(x)[nv - 8 : nv, 2]
    assert z_box.min() > 0.2 - config.dhat - 1e-3


def test_vp_contact_inert_frames_noop():
    """An all-masked (inert) frame set must not perturb the step."""
    devs = _n_devices(8)
    mesh, V, _ = _drop_mesh()
    config = SimConfig(
        h=0.01, outer_steps=2, itr_tol=1e-11,
        max_iterative_solver_iters=20000,
        mixed_variables=("mixed-stretch", "mixed-collision"),
        dtype="float64", dhat=0.05, kappa=100.0,
    )
    x0 = jnp.asarray(V)
    v0 = jnp.zeros_like(x0)
    jmesh = Mesh(np.array(devs), ("e",))
    plan = vp.build_vp_plan(mesh, 8)
    x = vp.pad_vertex_field(plan, x0)
    v = vp.pad_vertex_field(plan, v0)
    s, la = vp.init_vp_state(plan, x)
    inert = ContactFrames(
        frames=jnp.zeros((4, 4), jnp.int32),
        ftype=jnp.full((4,), 3, jnp.int32),
        fmask=jnp.zeros((4,), jnp.float64),
    )
    xa, *_ = vp.vp_newton_step(plan, config, jmesh, x, v, s, la, cf=inert)
    xb, *_ = vp.vp_newton_step(plan, config, jmesh, x, v, s, la)
    np.testing.assert_allclose(
        np.asarray(xa), np.asarray(xb), atol=1e-12
    )
