"""Lattice-slab sharded stencil CG (parallel/stencil_shard.py) vs the
single-device lattice CG, on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mixedfem_tpu.config import SimConfig
from mixedfem_tpu.integrators import bdf as bdfmod
from mixedfem_tpu.ops import stencil as st
from mixedfem_tpu.optimizer import newton
from mixedfem_tpu.parallel import stencil_shard as ss
from mixedfem_tpu.solvers import coarse as cm
from mixedfem_tpu.solvers import pcg as pcgmod
from mixedfem_tpu.variables import mixed_stretch as ms
from tests.test_stencil import _grid_setup


def _n_devices(n=8):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices (got {len(devs)})")
    return devs[:n]


def _setup(nx=9, ny=4, nz=3):
    mesh, plan = _grid_setup(nx=nx, ny=ny, nz=nz, dtype=jnp.float64)
    state = newton.init_state(
        mesh, SimConfig(h=0.02, dtype="float64"), (),
        jnp.asarray(mesh.V0), jnp.zeros_like(mesh.V0),
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(mesh.V0) + 0.02 * jnp.asarray(
        rng.standard_normal(mesh.V0.shape)
    )
    coeffs = ms.update(mesh, x, state.s, bdfmod.bdf_dt(state.bdf))
    b = jnp.asarray(rng.standard_normal(mesh.V0.shape))
    b = b * mesh.free_mask[:, None]
    return mesh, plan, coeffs, b


def _reference_solve(mesh, plan, coeffs, b, Minv_kind, cs=None, Aci=None):
    W = st.assemble_W(plan, coeffs.Gw, mesh.mass_coeff)
    fm = mesh.free_mask[:, None]
    blocks = st.diag_blocks(plan, W)
    eye = jnp.eye(mesh.dim, dtype=b.dtype)
    maskv = mesh.free_mask[:, None, None]
    binv = pcgmod._small_inv(
        blocks * maskv + eye * (1.0 - maskv)
    ) * maskv

    def A(p):
        return st.stencil_matvec(plan, W, p) * fm

    bj = lambda r: jnp.einsum("nij,nj->ni", binv, r)
    if Minv_kind == "two-level":
        tl = cm.two_level_preconditioner(cs, mesh.free_mask, bj, mesh.dim)
        Minv = lambda r: tl(r, Aci)
    else:
        Minv = bj
    x, it, rel = pcgmod.pcg(
        A, b, jnp.zeros_like(b), Minv, max_iters=400, tol=1e-10
    )
    return x, int(it), binv


@pytest.mark.parametrize("precond", ["bj", "two-level"])
def test_sharded_cg_matches_single_device(precond):
    devs = _n_devices(8)
    jmesh = Mesh(np.array(devs), ("x",))
    mesh, plan, coeffs, b = _setup()
    sp = ss.build_shard_plan(plan, 8)

    cs = Aci = None
    if precond == "two-level":
        cs = cm.build_coarse_space_grid(
            np.asarray(mesh.V0), np.asarray(mesh.T),
            ~np.asarray(mesh.free_mask, bool),
            (plan.NI, plan.NJ, plan.NK), block=2, dtype=jnp.float64,
        )
        Ac = cm.coarse_matrix(mesh, cs, coeffs)
        Aci = cm.coarse_inverse(Ac)

    x_ref, it_ref, binv = _reference_solve(
        mesh, plan, coeffs, b,
        "two-level" if precond == "two-level" else "bj", cs, Aci,
    )

    nv, d = b.shape
    Gw_sh = ss.shard_element_rows(sp, coeffs.Gw)
    mass_sh = ss.shard_element_rows(sp, mesh.mass_coeff)
    b_sh = ss.shard_vertex_field(sp, b)
    x0_sh = jnp.zeros_like(b_sh)
    fm_sh = ss.shard_vertex_field(
        sp, jnp.broadcast_to(mesh.free_mask[:, None], (nv, d)).astype(
            b.dtype
        )
    )
    binv_sh = ss.shard_vertex_field(
        sp, binv.reshape(nv, d * d)
    ).reshape(sp.D, d, d, -1)

    kw = {}
    if precond == "two-level":
        B = cm._vert_modes(cs, mesh.free_mask, d)  # (nv, d, 6)
        kw["coarse_B_sh"] = ss.shard_vertex_field(
            sp, B.reshape(nv, d * 6)
        ).reshape(sp.D, d, 6, -1)
        kw["coarse_agg_sh"] = ss.shard_vertex_ints(
            sp, cs.agg_id, cs.naggr
        )
        kw["naggr"] = cs.naggr
        kw["Ac_inv"] = Aci

    x_sh, it, rel = ss.sharded_pcg(
        sp, jmesh, Gw_sh, mass_sh, b_sh, x0_sh, fm_sh, binv_sh,
        max_iters=400, tol=1e-10, **kw,
    )
    x = ss.unshard_vertex_field(sp, x_sh)
    assert bool(jnp.isfinite(x).all())
    scale = float(jnp.abs(x_ref).max())
    err = float(jnp.abs(x - x_ref).max()) / scale
    assert err < 1e-8, (err, int(it), it_ref)
    # iteration counts agree (same operator, same preconditioner)
    assert abs(int(it) - it_ref) <= 2


def test_shard_roundtrip():
    _n_devices(8)
    mesh, plan, coeffs, b = _setup()
    sp = ss.build_shard_plan(plan, 8)
    back = ss.unshard_vertex_field(sp, ss.shard_vertex_field(sp, b))
    assert float(jnp.abs(back - b).max()) == 0.0
