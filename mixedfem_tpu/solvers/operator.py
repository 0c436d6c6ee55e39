"""Fused condensed-system operator: one gather + one scatter per matvec.

The CG matvec is the hot kernel of the implicit step (SURVEY §3.2: sparse
solve is hot path #2). The mass, mixed-stretch and vanilla-stretch blocks
all act on the same element index set T, so their products share a single
vertex gather and a single scatter-add — on TPU the scatter is the dominant
cost (~3 ms per 400k rows at 100k tets), so fusing halves the matvec time
vs. per-variable products (the reference instead sums assembled CSR
matrices, linear_system.h:17-31).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mixedfem_tpu.mesh import mesh as meshmod
from mixedfem_tpu.variables.mixed_stretch import StretchCoeffs
from mixedfem_tpu.variables.stretch import VanillaCoeffs


def element_matvec(
    mesh: meshmod.MeshData,
    p: jnp.ndarray,
    ms_coeffs: Optional[StretchCoeffs] = None,
    v_coeffs: Optional[VanillaCoeffs] = None,
) -> jnp.ndarray:
    """(P M P^T + P K P^T) p with all element blocks fused."""
    p = meshmod.project_free(mesh, p)
    pe = p[mesh.T]                                       # (E, k, d) gather

    out_e = jnp.einsum("ekl,eld->ekd", mesh.mass_coeff, pe)

    if ms_coeffs is not None:
        # factored form A_e = Gw^T Gw (Gw = sqrt(vol) H^{1/2} G): one fewer
        # contraction and 25% less HBM traffic per CG iteration
        q = jnp.einsum("eikr,ekr->ei", ms_coeffs.Gw, pe)
        out_e = out_e + jnp.einsum("eikr,ei->ekr", ms_coeffs.Gw, q)

    if v_coeffs is not None:
        d = mesh.dim
        dF = jnp.einsum("ekr,ekc->erc", pe, mesh.dphidX)
        y = jnp.einsum(
            "eab,eb->ea", v_coeffs.H, dF.reshape(dF.shape[0], d * d)
        ).reshape(dF.shape)
        out_e = out_e + jnp.einsum("ekc,erc->ekr", mesh.dphidX, y)

    out = jax.ops.segment_sum(
        out_e.reshape(-1, mesh.dim), mesh.T.reshape(-1), num_segments=mesh.nv
    )
    return meshmod.project_free(mesh, out)
