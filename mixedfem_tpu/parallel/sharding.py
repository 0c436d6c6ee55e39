"""Multi-chip sharding: element-axis data parallelism over a device mesh.

The reference is single-node OpenMP (SURVEY §5: no distributed execution
anywhere); the TPU-native scaling story shards the ELEMENT axis across
devices (the FEM analog of sequence parallelism): per-element arrays
(T, dphidX, vols, mass blocks, material params, mixed DOFs s/la) are
sharded on axis 0, vertex-axis arrays are replicated, and XLA/GSPMD inserts
the all-reduces for the element->vertex segment-sum scatters (the only
cross-device communication in an elasticity step: the transpose J^T y and
the global reductions in energies/CG dot products — riding ICI).

This is the `jax.sharding` + jit recipe: annotate leaf shardings, let the
compiler place collectives. Vertex-axis partitioning with explicit halo
exchange (shard_map + ppermute) lives in parallel/halo.py for >8 chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mixedfem_tpu.mesh.mesh import MeshData
from mixedfem_tpu.optimizer.newton import SimState


def make_device_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, axis_names=("e",))


# MeshData leaves sharded along the element axis; everything else replicated.
_ELEM_FIELDS = {
    "T",
    "dphidX",
    "vols",
    "mass_coeff",
    "mu",
    "lam",
    "model_id",
}
_STATE_ELEM_FIELDS = {"s", "la"}


def _shard_arr(x, sharding):
    return jax.device_put(x, sharding)


def shard_mesh_data(mesh: MeshData, jmesh: Mesh, pad_to_multiple: bool = True):
    """Place MeshData on the device mesh (element axis sharded).

    Element arrays are padded to a multiple of the device count with
    degenerate zero-volume elements (vol = 0 => zero energy/stiffness;
    indices point at vertex 0)."""
    n = jmesh.size
    E = mesh.T.shape[0]
    pad = (-E) % n if pad_to_multiple else 0
    if pad:
        def pad_elem(x):
            pw = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pw)

        mesh = mesh.replace(
            T=pad_elem(mesh.T),           # padded rows gather vertex 0
            dphidX=pad_elem(mesh.dphidX),  # zero dphi -> zero F contribution
            vols=pad_elem(mesh.vols),
            mass_coeff=pad_elem(mesh.mass_coeff),
            mu=pad_elem(mesh.mu),
            lam=pad_elem(mesh.lam),
            model_id=pad_elem(mesh.model_id),
        )

    esh = NamedSharding(jmesh, P("e"))
    rsh = NamedSharding(jmesh, P())
    out = {}
    for f in mesh.__dataclass_fields__:
        v = getattr(mesh, f)
        if not isinstance(v, (jnp.ndarray, jax.Array)):
            out[f] = v
        elif f in _ELEM_FIELDS:
            out[f] = _shard_arr(v, esh)
        else:
            out[f] = _shard_arr(v, rsh)
    return MeshData(**out), pad


def shard_sim_state(state: SimState, jmesh: Mesh, pad: int) -> SimState:
    esh = NamedSharding(jmesh, P("e"))
    rsh = NamedSharding(jmesh, P())

    def pad_elem(x):
        if pad:
            pw = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, pw)
        return _shard_arr(x, esh)

    rest = jax.tree.map(
        lambda x: _shard_arr(x, rsh),
        state.replace(s=jnp.zeros(()), la=jnp.zeros(())),
    )
    return rest.replace(s=pad_elem(state.s), la=pad_elem(state.la))


def shard_simulation(mesh: MeshData, state: SimState, jmesh: Mesh):
    """Shard (mesh, state) over the device mesh. Returns (mesh', state')."""
    mesh2, pad = shard_mesh_data(mesh, jmesh)
    state2 = shard_sim_state(state, jmesh, pad)
    return mesh2, state2
