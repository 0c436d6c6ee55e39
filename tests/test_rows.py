"""Parity tests: the feature-major rows pipeline (ops/rows.py) against the
element-major reference kernels it replaces on the hot stencil path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mixedfem_tpu.ops import psd, rotation, rows, smallops, stencil as stmod
from mixedfem_tpu.materials import models as mat
from mixedfem_tpu.mesh import generators, mesh as meshmod
from mixedfem_tpu.variables import mixed_stretch as ms
from mixedfem_tpu.config import enu_to_lame


def _rand_F(B, seed=0, scale=0.4):
    rng = np.random.default_rng(seed)
    F = np.eye(3)[None] + scale * rng.standard_normal((B, 3, 3))
    return jnp.asarray(F, jnp.float32)


def _rows_of(M):
    """(B, 3, 3) -> list of 9 rows."""
    return [M[:, r, c] for r in range(3) for c in range(3)]


class TestPolarRows:
    def test_polar_parity(self):
        F = _rand_F(257)
        R0, S0 = rotation.polar33(F)
        R, Sv = rows.polar33_rows(_rows_of(F))
        Rm = jnp.stack(R).reshape(3, 3, -1).transpose(2, 0, 1)
        np.testing.assert_allclose(Rm, R0, atol=2e-5)
        from mixedfem_tpu.ops import sym
        Sv0 = sym.pack(S0)
        for i in range(6):
            np.testing.assert_allclose(Sv[i], Sv0[:, i], atol=2e-5)

    def test_polar_inverted_elements(self):
        # det F < 0: signed-sigma convention must match
        F = _rand_F(64, seed=3, scale=1.5)
        R0, S0 = rotation.polar33(F)
        R, Sv = rows.polar33_rows(_rows_of(F))
        Rm = jnp.stack(R).reshape(3, 3, -1).transpose(2, 0, 1)
        np.testing.assert_allclose(Rm, R0, atol=5e-5)


class TestDsdFRows:
    def test_dsdf_parity(self):
        F = _rand_F(128, seed=1)
        R0, S0 = rotation.polar33(F)
        D0 = rotation.dsdF33(R0, S0)       # (B, 6, 3, 3)
        from mixedfem_tpu.ops import sym
        Sv0 = sym.pack(S0)
        D = rows.dsdF33_rows(_rows_of(R0), [Sv0[:, i] for i in range(6)])
        for i in range(6):
            for r in range(3):
                for c in range(3):
                    np.testing.assert_allclose(
                        D[9 * i + 3 * r + c], D0[:, i, r, c], atol=2e-5,
                        err_msg=f"D[{i},{r},{c}]")


class TestPsdRows:
    def test_psd_parity(self):
        rng = np.random.default_rng(5)
        A = rng.standard_normal((97, 6, 6)).astype(np.float32)
        H = jnp.asarray(A + A.transpose(0, 2, 1))
        Hf0, Hi0, Hs0, ev0 = psd.psd_fix_sqrt(H)
        hrows = [H[:, i, j] for (i, j) in rows._TRI6]
        Hf, Hi, Hs, ev = rows.psd6_rows(hrows)
        np.testing.assert_allclose(ev, ev0, rtol=2e-5)
        for (i, j) in rows._TRI6:
            k = rows.sym6_idx(i, j)
            np.testing.assert_allclose(Hf[k], Hf0[:, i, j], atol=2e-4)
            np.testing.assert_allclose(Hs[k], Hs0[:, i, j], atol=2e-4)
            np.testing.assert_allclose(
                Hi[k], Hi0[:, i, j], atol=2e-3, rtol=2e-3)


class TestMaterialRows:
    @pytest.mark.parametrize("model", mat.MATERIAL_NAMES)
    def test_grad_hess_parity(self, model):
        rng = np.random.default_rng(7)
        s = jnp.asarray(
            np.array([1, 1, 1, 0, 0, 0]) + 0.3 * rng.standard_normal((51, 6)),
            jnp.float32)
        mu = jnp.full((51,), 3.0e5, jnp.float32)
        la = jnp.full((51,), 1.0e6, jnp.float32)
        mid = jnp.zeros((51,), jnp.int32)
        srows = [s[:, i] for i in range(6)]
        g0 = mat.grad_s_all(s, mu, la, mid, (model,))
        g = rows.grad_rows(srows, mu, la, mid, (model,))
        for i in range(6):
            np.testing.assert_allclose(
                g[i], g0[:, i], rtol=2e-4, atol=2e-2)
        H0 = mat.hess_s_all(s, mu, la, mid, (model,))
        H = rows.hess_rows(srows, mu, la, mid, (model,))
        scale = float(jnp.max(jnp.abs(H0)))
        for (i, j) in rows._TRI6:
            np.testing.assert_allclose(
                H[rows.sym6_idx(i, j)], 0.5 * (H0[:, i, j] + H0[:, j, i]),
                rtol=2e-4, atol=2e-4 * scale)

    def test_heterogeneous(self):
        rng = np.random.default_rng(8)
        s = jnp.asarray(
            np.array([1, 1, 1, 0, 0, 0]) + 0.2 * rng.standard_normal((40, 6)),
            jnp.float32)
        mu = jnp.full((40,), 3.0e5, jnp.float32)
        la = jnp.full((40,), 1.0e6, jnp.float32)
        mid = jnp.asarray(rng.integers(0, 2, 40), jnp.int32)
        models = ("ARAP", "Stable-Neohookean")
        g0 = mat.grad_s_all(s, mu, la, mid, models)
        g = rows.grad_rows([s[:, i] for i in range(6)], mu, la, mid, models)
        for i in range(6):
            np.testing.assert_allclose(g[i], g0[:, i], rtol=1e-4, atol=1e-1)


class TestContractRows:
    def test_contract_parity(self):
        rng = np.random.default_rng(11)
        D0 = jnp.asarray(rng.standard_normal((64, 6, 3, 3)), jnp.float32)
        dphi0 = jnp.asarray(rng.standard_normal((64, 4, 3)), jnp.float32)
        G0 = smallops.contract_D_dphi(D0, dphi0)
        D = [D0[:, i, r, c] for i in range(6) for r in range(3)
             for c in range(3)]
        dphi = [dphi0[:, k, c] for k in range(4) for c in range(3)]
        G = rows.contract_D_dphi_rows(D, dphi)
        for i in range(6):
            for k in range(4):
                for r in range(3):
                    np.testing.assert_allclose(
                        G[12 * i + 3 * k + r], G0[:, i, k, r], atol=1e-5)
        Hs0 = jnp.asarray(rng.standard_normal((64, 6, 6)), jnp.float32)
        Hs0 = 0.5 * (Hs0 + Hs0.transpose(0, 2, 1))
        Y0 = smallops.contract_sym_G(Hs0, G0)
        hsr = [Hs0[:, i, j] for (i, j) in rows._TRI6]
        Y = rows.contract_sym6_rows(hsr, G)
        for i in range(6):
            for a in range(12):
                np.testing.assert_allclose(
                    Y[12 * i + a], Y0.reshape(64, 6, 12)[:, i, a],
                    atol=1e-4, rtol=1e-4)


def _grid_mesh(nx=4, ny=3, nz=3):
    V, T = generators.box_tet_mesh(nx, ny, nz, size=(2.0, 1.0, 1.0))
    plan, perm = stmod.build_stencil_plan(
        T, len(V), (nx + 1, ny + 1, nz + 1))
    assert plan is not None
    T = T[perm]
    la, mu = enu_to_lame(1e6, 0.45)
    is_fixed = np.zeros(len(V), bool)
    is_fixed[V[:, 0] < 1e-9] = True
    mesh = meshmod.build_mesh_data(
        V, T,
        density=np.full(len(T), 1000.0),
        mu=np.full(len(T), mu),
        lam=np.full(len(T), la),
        model_id=np.zeros(len(T), int),
        models=("Stable-Neohookean",),
        is_fixed=is_fixed,
        ext_force=np.tile(np.array([0.0, -9.8, 0.0]), (len(V), 1)),
        dtype=jnp.float32,
    )
    return mesh, plan


class TestLatticeGatherScatter:
    def test_gather_corners(self):
        mesh, plan = _grid_mesh()
        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.standard_normal((mesh.nv, 3)), jnp.float32)
        xe0 = x[mesh.T]                              # (E, k, 3)
        xe = stmod.gather_corners_lat(plan, stmod.to_lat(plan, x))
        for a in range(4):
            for c in range(3):
                np.testing.assert_allclose(
                    xe[3 * a + c], xe0[:, a, c], atol=1e-6)

    def test_scatter_rows(self):
        mesh, plan = _grid_mesh()
        rng = np.random.default_rng(14)
        contrib = jnp.asarray(
            rng.standard_normal((mesh.T.shape[0], 4, 3)), jnp.float32)
        ref = jax.ops.segment_sum(
            contrib.reshape(-1, 3), mesh.T.reshape(-1),
            num_segments=mesh.nv)
        rws = jnp.stack(
            [contrib[:, a, c] for a in range(4) for c in range(3)])
        out_l = stmod.scatter_rows_lat(plan, rws, 3)
        out = stmod.from_lat(plan, out_l)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_assemble_from_rows(self):
        mesh, plan = _grid_mesh()
        rng = np.random.default_rng(15)
        E = mesh.T.shape[0]
        Gw = jnp.asarray(rng.standard_normal((E, 6, 4, 3)), jnp.float32)
        W0 = stmod.assemble_W(plan, Gw, mesh.mass_coeff)
        Gw_rows = Gw.reshape(E, 72).T
        m_rows = mesh.mass_coeff.reshape(E, 16).T
        W = stmod.assemble_W_from_rows(plan, Gw_rows, m_rows)
        np.testing.assert_allclose(W, W0, atol=1e-5)


class TestUpdateRows:
    def test_update_parity(self):
        mesh, plan = _grid_mesh()
        rng = np.random.default_rng(17)
        x = jnp.asarray(
            np.asarray(mesh.V0) + 0.05 * rng.standard_normal((mesh.nv, 3)),
            jnp.float32)
        s0, _ = ms.reset(mesh, x)
        s = s0 + 0.02 * jnp.asarray(
            rng.standard_normal(s0.shape), jnp.float32)
        dt = 0.02
        c0 = ms.update(mesh, x, s, dt)

        xe = stmod.gather_corners_lat(plan, stmod.to_lat(plan, x))
        dphi_rows = mesh.dphidX.reshape(-1, 12).T
        F = [sum(xe[3 * k + r] * dphi_rows[3 * k + c] for k in range(4))
             for r in range(3) for c in range(3)]
        c = ms.update_rows(
            F, [s[:, i] for i in range(6)], dphi_rows, mesh.vols,
            mesh.mu, mesh.lam, mesh.model_id, mesh.models, dt)
        from mixedfem_tpu.ops import sym
        for i in range(6):
            np.testing.assert_allclose(
                c["Sv"][i], c0.Sv[:, i], atol=3e-5)
            np.testing.assert_allclose(
                c["g"][i], c0.g[:, i], rtol=1e-3, atol=1e-3 * float(
                    jnp.max(jnp.abs(c0.g))))
        scale_gw = float(jnp.max(jnp.abs(c0.Gw)))
        for i in range(6):
            for k in range(4):
                for r in range(3):
                    np.testing.assert_allclose(
                        c["Gw"][12 * i + 3 * k + r], c0.Gw[:, i, k, r],
                        atol=5e-3 * scale_gw,
                        err_msg=f"Gw[{i},{k},{r}]")
        np.testing.assert_allclose(
            c["max_evals"], c0.max_evals, rtol=1e-3)
