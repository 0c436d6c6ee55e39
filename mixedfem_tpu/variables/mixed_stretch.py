"""MixedStretch: the core mixed variable (per-element symmetric stretch).

TPU-native reimplementation of the reference MixedStretch<DIM>
(src/variables/mixed_stretch.{h,cpp}). State per element: mixed stretch
s (sym-vec), multiplier la. Per Newton iteration `update` produces the
coefficients of the condensed SPD system:

  G[e]  = ds/dF . dphi/dx          (N x k x d "constraint jacobian")
  H[e]  = psd_fix(h^2 psi''(s))    (N x N)
  g[e]  = h^2 psi'(s)              (N,)
  Sv[e] = sym-vec of S(x)          (N,)

The reference's weighted algebra (Sym/Syminv, W volume weights,
src/variables/mixed_stretch.cpp:188-292) collapses in the condensed path to:

  element stiffness   A_e  = vol_e * G^T H G        (== Aloc, :209-215)
  rhs                 b_e  = -vol_e * G^T (H (Sv - s) + g)   (== rhs(), :246-275)
  local solve         ds_e = (Sv - s) + G : dx_e             (== solve(), :278-292)
                      la_e = Syminv (H ds_e + g)

(the simplification is exact: Sym Syminv = I; derivation in docs/DESIGN.md).
All functions are pure and operate on the full element batch.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from mixedfem_tpu.materials import models as mat
from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.ops import psd, rotation, smallops, sym


@flax.struct.dataclass
class StretchCoeffs:
    """Per-Newton-iteration linearization data (all per-element)."""

    G: jnp.ndarray        # (E, N, k, d) ds/dx element jacobian
    Gw: jnp.ndarray       # (E, N, k, d) sqrt(vol) H^{1/2} G (A_e = Gw^T Gw)
    H: jnp.ndarray        # (E, N, N) PSD-fixed h^2 psi''
    Hinv: jnp.ndarray     # (E, N, N)
    g: jnp.ndarray        # (E, N) h^2 psi'
    Sv: jnp.ndarray       # (E, N) current stretch of F(x)
    R: jnp.ndarray        # (E, d, d) rotations
    max_evals: jnp.ndarray  # (E,) max clamped eigenvalue ("stress")


def stretch_of_x(mesh: meshmod.MeshData, x: jnp.ndarray):
    """Polar stretch sym-vec of the current deformation (E, N)."""
    F = meshmod.def_grad(mesh, x)
    R, S = rotation.polar(F, mesh.dim)
    return sym.pack(S), R


def coeffs_from_FG(F, G, R, Sv, s, vols, mu, lam, model_id, models, dt):
    """Coefficient build from precomputed (F, G): shared by the replicated
    path (update) and the vertex-partitioned shard-local path
    (parallel/vp_step.py)."""
    h2 = dt * dt
    Hraw = h2 * mat.hess_s_all(s, mu, lam, model_id, models)
    H, Hinv, Hs, evals = psd.psd_fix_sqrt(Hraw, tol=1e-8)
    g = h2 * mat.grad_s_all(s, mu, lam, model_id, models)
    Gw = jnp.sqrt(vols)[:, None, None, None] * smallops.contract_sym_G(
        Hs, G
    )
    return StretchCoeffs(
        G=G, Gw=Gw, H=H, Hinv=Hinv, g=g, Sv=Sv, R=R, max_evals=evals
    )


def update(
    mesh: meshmod.MeshData, x: jnp.ndarray, s: jnp.ndarray, dt,
    R_prev: jnp.ndarray | None = None,
):
    """Rotations + derivatives (reference update(), mixed_stretch.cpp:159-243).

    R_prev (E, 3, 3) enables the warm-started Newton-Procrustes polar
    (ops/rotation.py polar_warm) — temporal rotation-branch tracking
    through element inversion, matching the reference's per-element R_
    cache (newton_procrustes.h:108-189, mixed_stretch.cpp:18-53)."""
    F = meshmod.def_grad(mesh, x)
    if R_prev is not None and mesh.dim == 3:
        R, S = rotation.polar_warm(F, R_prev)
    else:
        R, S = rotation.polar(F, mesh.dim)
    Sv = sym.pack(S)
    D = rotation.dsdF(R, S, mesh.dim)                     # (E, N, d, d)
    if mesh.shell:
        # Re-linearized membrane jacobian (TriMesh::update_jacobian,
        # tri_mesh.cpp:128-190): dF/dx includes the normal derivative.
        JT = meshmod.shell_def_grad_jacobian(mesh, x)     # (E, k, r, a, c)
        G = jnp.einsum("eiac,ekrac->eikr", D, JT)
    elif mesh.rod:
        # Frame-augmented rod jacobian (mesh/rod.py; the reference's
        # RodMesh leaves this a stub, src/mesh/rod_mesh.h:30-34).
        from mixedfem_tpu.mesh import rod as rodmod

        JT = rodmod.rod_def_grad_jacobian(
            x, mesh.T,
            mesh.rod_frames[:, 0], mesh.rod_frames[:, 1],
            mesh.rod_frames[:, 2], mesh.rod_L,
        )                                                 # (E, k, r, a, c)
        G = jnp.einsum("eiac,ekrac->eikr", D, JT)
    else:
        G = smallops.contract_D_dphi(D, mesh.dphidX)      # (E, N, k, d)

    return coeffs_from_FG(
        F, G, R, Sv, s, mesh.vols, mesh.mu, mesh.lam, mesh.model_id,
        mesh.models, dt,
    )


def update_rows(F, s_rows, dphi_rows, vols, mu, lam, model_id, models, dt):
    """Feature-major update (ops/rows.py pipeline): F (9, E) rows,
    s_rows (6, E) list, dphi_rows (12, E) -> dict of row lists. Same math
    as update() for the 3D solid path, with the element batch on the lane
    axis end-to-end (no (E, N, k, d) tensors; parity-tested in
    tests/test_rows.py). Consumed by the stencil fast path in
    optimizer/newton.py."""
    from mixedfem_tpu.ops import rows as rowsmod

    h2 = dt * dt
    s_list = [s_rows[i] for i in range(6)]
    R, Sv = rowsmod.polar33_rows(F)
    D = rowsmod.dsdF33_rows(R, Sv)
    G = rowsmod.contract_D_dphi_rows(D, dphi_rows)
    Hraw = [h2 * h for h in rowsmod.hess_rows(
        s_list, mu, lam, model_id, models)]
    H, Hinv, Hs, evals = rowsmod.psd6_rows(Hraw, tol=1e-8)
    g = [h2 * gi for gi in rowsmod.grad_rows(
        s_list, mu, lam, model_id, models)]
    sq = jnp.sqrt(vols)
    Gw = [sq * y for y in rowsmod.contract_sym6_rows(Hs, G)]
    return {
        "R": R, "Sv": Sv, "G": G, "Gw": Gw, "H": H, "Hinv": Hinv,
        "g": g, "max_evals": evals,
    }


def rhs_contrib(mesh: meshmod.MeshData, c: StretchCoeffs, s: jnp.ndarray):
    """Per-element-corner rhs contributions (E, k, d) (pre-assembly)."""
    y = jnp.einsum("eij,ej->ei", c.H, c.Sv - s) + c.g       # (E, N)
    return -jnp.einsum("eikr,ei,e->ekr", c.G, y, mesh.vols)


def rhs(mesh: meshmod.MeshData, c: StretchCoeffs, s: jnp.ndarray):
    """Condensed-system right-hand side (nv, d), zero at pinned vertices."""
    contrib = rhs_contrib(mesh, c, s)
    out = jax.ops.segment_sum(
        contrib.reshape(-1, mesh.dim), mesh.T.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)


def matvec(mesh: meshmod.MeshData, c: StretchCoeffs, p: jnp.ndarray):
    """Stretch block of the condensed SPD operator in the factored form
    P (sum_e Gw^T Gw) P^T p, Gw = sqrt(vol) H^{1/2} G."""
    p = meshmod.project_free(mesh, p)
    pe = p[mesh.T]                                         # (E, k, d)
    q = jnp.einsum("eikr,ekr->ei", c.Gw, pe)               # (E, N)
    contrib = jnp.einsum("eikr,ei->ekr", c.Gw, q)
    out = jax.ops.segment_sum(
        contrib.reshape(-1, mesh.dim), mesh.T.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)


def diag_blocks_contrib(mesh: meshmod.MeshData, c: StretchCoeffs):
    """Per-corner (d, d) diagonal-block contributions (E, k, d, d)."""
    return jnp.einsum("eikr,eiks->ekrs", c.Gw, c.Gw)


def diag_blocks(mesh: meshmod.MeshData, c: StretchCoeffs):
    """Per-vertex (d, d) diagonal blocks of the stretch stiffness, for the
    block-Jacobi preconditioner (reference: preconditioners/block_jacobi.h)."""
    B = diag_blocks_contrib(mesh, c)
    return jax.ops.segment_sum(
        B.reshape(-1, mesh.dim, mesh.dim),
        mesh.T.reshape(-1),
        num_segments=mesh.nv,
    )


def local_solve(
    mesh: meshmod.MeshData, c: StretchCoeffs, s: jnp.ndarray, dx: jnp.ndarray
):
    """Recover (ds, la) from the displacement update dx (nv, d).

    Exact simplification of the reference solve() (mixed_stretch.cpp:278-292):
      ds = (S(x) - s) + G : dx
      la = Syminv (H ds + g)
    """
    dxe = dx[mesh.T]
    ds = (c.Sv - s) + jnp.einsum("eikr,ekr->ei", c.G, dxe)
    syminv = sym.syminv_weights(mesh.dim, dtype=s.dtype)
    la = syminv * (jnp.einsum("eij,ej->ei", c.H, ds) + c.g)
    return ds, la


def gradient_x(mesh: meshmod.MeshData, c: StretchCoeffs, la: jnp.ndarray):
    """grad_x = J^T W (dsdF^T Sym la) — the x-gradient of the constraint term
    (reference mixed_stretch.cpp:226-232). Used for diagnostics/KKT paths."""
    w = sym.sym_weights(mesh.dim, dtype=la.dtype)
    y = jnp.einsum("eikr,ei,e->ekr", c.G, w * la, mesh.vols)
    out = jax.ops.segment_sum(
        y.reshape(-1, mesh.dim), mesh.T.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)


def energy(mesh: meshmod.MeshData, s: jnp.ndarray):
    """Elastic energy sum_e vol psi(s_e) (reference mixed_stretch.cpp:94-107).

    NOTE: unscaled by h^2 — the optimizer applies h^2 (newton_optimizer.cpp:72)."""
    e = mat.psi_s_all(s, mesh.mu, mesh.lam, mesh.model_id, mesh.models)
    return jnp.sum(mesh.vols * e)


def constraint_value(
    mesh: meshmod.MeshData, x: jnp.ndarray, s: jnp.ndarray, la: jnp.ndarray,
    Sv: jnp.ndarray | None = None,
):
    """sum_e vol la^T Sym (S(x) - s) (reference mixed_stretch.cpp:110-156).

    Pass `Sv` when S(x) is already available (update() computed it at the
    same x) to skip the F rebuild + polar decomposition — the dominant
    cost of a merit evaluation."""
    if Sv is None:
        Sv, _ = stretch_of_x(mesh, x)
    w = sym.sym_weights(mesh.dim, dtype=s.dtype)
    return jnp.sum(mesh.vols * jnp.einsum("ei,ei->e", la, w * (Sv - s)))


def reset(mesh: meshmod.MeshData, x: jnp.ndarray):
    """Initial (s, la) from the initial positions (mixed_stretch.cpp:295-338)."""
    Sv, _ = stretch_of_x(mesh, x)
    return Sv, jnp.zeros_like(Sv)
