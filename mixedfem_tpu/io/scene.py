"""Scene loading: the reference's JSON scene vocabulary -> Simulation.

Reference: src/simulation_state.cpp:96-405 (SimState<DIM>::load). The JSON
schema is preserved: dt, body_force, time_integrator, linear_solver,
enable_ccd, dhat, kappa, max_newton_iterations, max_linesearch_iterations,
objects[{path, offset, transformation, initial_velocity, normalize,
material_index, material_ids, boundary_condition, external_force}],
material_models[{youngs_modulus, poissons_ratio, density, energy}],
mixed_variables, variables, initial_state{x_path, v_path}.

Multi-object scenes are concatenated into one global mesh (the reference's
Meshes composite).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mixedfem_tpu.bc.boundary_conditions import BCConfig, BCSpec, BCState, build_bc
from mixedfem_tpu.bc.external_force import ExtConfig, build_external_force
from mixedfem_tpu.config import MaterialConfig, SimConfig
from mixedfem_tpu.io import mesh_io
from mixedfem_tpu.materials.models import model_index
from mixedfem_tpu.mesh.mesh import MeshData, build_mesh_data
from mixedfem_tpu.optimizer.newton import SimState, init_state, newton_step


@dataclasses.dataclass
class Simulation:
    """A loaded scene: static data + initial state + step function."""

    mesh: MeshData
    config: SimConfig
    bc_specs: Tuple[BCSpec, ...]
    state: SimState
    dim: int
    # host-side metadata
    obj_slices: List[slice]
    coarse: object = None  # optional CoarseSpace (two-level preconditioner)
    press_specs: Tuple = ()
    skinning: Tuple = ()  # per-object (V_render, F_render, tet_id, bary)
    # banded-element-order Pallas matvec plan (TPU only; solvers/operator.py)
    matvec_plan: object = None
    # vertex coloring for the 'gauss-seidel' solve path
    gs_plan: object = None

    def skinned_surfaces(self):
        """Advect attached render meshes (reference skinning export,
        apps/sim3d.cpp:216-251)."""
        from mixedfem_tpu.utils.skinning import apply_skinning

        X = np.asarray(self.state.x)
        T = np.asarray(self.mesh.T)
        out = []
        for (Vr, Fr, tid, bary) in self.skinning:
            out.append((apply_skinning(X, T, tid, bary), Fr))
        return out

    def _one_step(self) -> SimState:
        from mixedfem_tpu.solvers.factory import resolve_solver

        if resolve_solver(self.config.solver) in (
            "direct", "pcg-ic", "amgcl",
        ):
            from mixedfem_tpu.optimizer.newton_direct import newton_step_direct

            return newton_step_direct(
                self.mesh, self.config, self.bc_specs, self.state,
                self.press_specs,
            )
        return newton_step(
            self.mesh, self.config, self.bc_specs, self.state,
            self.coarse, self.press_specs, self.matvec_plan,
            self.gs_plan,
        )

    def step(self) -> SimState:
        needs_contact = (
            "mixed-collision" in self.config.mixed_variables
            or "collision" in self.config.variables
            or "friction" in self.config.variables
        )
        if not needs_contact:
            self.state = self._one_step()
            return self.state

        # Candidate-staleness safety: the reference rebuilds the candidate
        # set every Newton iteration (mixed_collision.cpp:116-118); here the
        # set is fixed per step, built with a motion-inflated margin. If the
        # step's ACTUAL motion exceeded the budget the margin covered, the
        # candidates may have missed a contact — re-run the whole step from
        # the saved pre-step state with a margin covering the observed
        # motion (in-jit activation then catches every frame).
        pre_state = self.state
        budget = self._update_contact_candidates()
        for _attempt in range(4):
            self.state = self._one_step()
            moved = float(
                jnp.max(
                    jnp.linalg.norm(self.state.x - pre_state.x, axis=1)
                )
            )
            if moved <= budget:
                break
            self.state = pre_state
            budget = self._update_contact_candidates(min_motion=1.5 * moved)
        return self.state

    def attach_precond_cache(self):
        """Size the cached coarse inverse when coarse_refresh_every > 1."""
        if self.coarse is not None and self.config.coarse_refresh_every > 1:
            ncd = self.coarse.ncd
            self.state = self.state.replace(
                precond=jnp.zeros((ncd, ncd), jnp.dtype(self.config.dtype))
            )
        return self

    def enable_coarse_preconditioner(self, target_size: int = 64):
        from mixedfem_tpu.solvers.coarse import build_coarse_space

        self.coarse = build_coarse_space(
            np.asarray(self.mesh.V0),
            np.asarray(self.mesh.T),
            ~np.asarray(self.mesh.free_mask, bool),
            target_size=target_size,
            dtype=jnp.dtype(self.config.dtype),
        )
        return self.attach_precond_cache()

    def _update_contact_candidates(self, min_motion: float = 0.0) -> float:
        """Host broadphase once per step (reference rebuilds candidates every
        Newton iteration with margin 1.1*dhat, mixed_collision.cpp:116-118;
        here the margin additionally covers the expected step motion).
        Returns the per-vertex motion budget the margin covers — if the step
        moves any vertex further, Simulation.step retries with a wider
        margin."""
        import jax.numpy as jnp

        from mixedfem_tpu.collision import broadphase as bp
        from mixedfem_tpu.optimizer.newton import empty_contact
        from mixedfem_tpu.variables.mixed_collision import ContactFrames

        V = np.asarray(self.state.x)
        v = np.asarray(self.state.bdf.v_hist[0])
        motion = (
            np.linalg.norm(v, axis=1).max() * self.config.h if len(v) else 0.0
        )
        # always budget at least one dhat of unpredicted motion (covers
        # acceleration from rest, e.g. gravity onset)
        motion = max(motion, min_motion, self.config.dhat)
        margin = 1.1 * self.config.dhat + 2.0 * motion

        F_srf = np.asarray(self.mesh.F_srf)
        E_srf = np.asarray(self.mesh.E_srf)
        if self.dim == 3:
            surf_verts = np.unique(F_srf.reshape(-1))
            frames, types = bp.candidates_3d(V, F_srf, E_srf, surf_verts, margin)
        else:
            surf_verts = np.unique(E_srf.reshape(-1))
            frames, types = bp.candidates_2d(V, E_srf, surf_verts, margin)

        jdtype = jnp.dtype(self.config.dtype)
        if len(frames) == 0:
            self.state = self.state.replace(contact=empty_contact(jdtype, 0))
            return motion
        # power-of-two capacity bucketing to bound recompiles
        cap = self.config.max_contact_frames or max(
            256, 1 << int(np.ceil(np.log2(len(frames))))
        )
        f, t, m = bp.pad_candidates(frames, types, cap)
        self.state = self.state.replace(
            contact=ContactFrames(
                frames=jnp.asarray(f),
                ftype=jnp.asarray(t),
                fmask=jnp.asarray(m, jdtype),
            )
        )
        return motion

    def run(self, n: Optional[int] = None):
        for _ in range(n if n is not None else self.config.timesteps):
            self.step()
        return self.state


def _resolve_path(path: str, scene_dir: str) -> str:
    """Resolve model paths: the reference scenes use paths like
    '../models/x.mesh' relative to a build directory inside the repo root,
    i.e. relative to <scene_dir>/.. in practice. Try sensible candidates."""
    candidates = [
        path,
        os.path.join(scene_dir, path),
        os.path.join(scene_dir, "..", path),
        os.path.join(scene_dir, "..", "..", path),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(f"cannot resolve mesh path '{path}' from {scene_dir}")


def _load_object_mesh(path: str, dim: int, normalize: bool):
    if dim == 2:
        V, T = mesh_io.read_obj(path)
        V, T = mesh_io.remove_unreferenced(V, T)
        V = V[:, :2].copy()  # z-truncate (simulation_state.cpp:57-62)
    else:
        V, T, _ = mesh_io.read_mesh(path)
        if normalize:
            V = V / V.max()  # max-coeff normalization (:69-73)
    return V, T


def load_scene(
    path_or_dict,
    dim: int,
    *,
    dtype: Optional[str] = None,
    overrides: Optional[dict] = None,
) -> Simulation:
    """Load a scene JSON file (or dict) into a Simulation."""
    if isinstance(path_or_dict, dict):
        args = dict(path_or_dict)
        scene_dir = os.getcwd()
    else:
        with open(path_or_dict) as f:
            args = json.load(f)
        scene_dir = os.path.dirname(os.path.abspath(path_or_dict))
    if overrides:
        args.update(overrides)

    # ---- global config (load_params, simulation_state.cpp:381-405)
    cfg_kwargs = dict(
        h=args.get("dt", 0.034),
        body_force=tuple(args.get("body_force", (0.0, -9.8, 0.0))),
        enable_ccd=args.get("enable_ccd", False),
        dhat=args.get("dhat", 1e-2),
        kappa=args.get("kappa", 10.0),
        timesteps=args.get("timesteps", 300),
        inertia_blend_factor=args.get("inertia_blend_factor", 1.0),
        outer_steps=args.get("max_newton_iterations", 5),
        ls_iters=args.get("max_linesearch_iterations", 20),
        max_iterative_solver_iters=args.get("max_iterative_solver_iters", 500),
        itr_tol=args.get("iterative_solver_tolerance", 1e-4),
        integrator=args.get("time_integrator", "BDF1"),
        optimizer=args.get("optimizer", "newton"),
        mixed_variables=tuple(
            args.get("mixed_variables", ("mixed-stretch", "mixed-collision"))
        ),
        variables=tuple(args.get("variables", ())),
        show_data=args.get("print_stats", True),
        show_timing=args.get("print_timing", True),
    )
    # linear_solver vocabulary (linear_solver_factory.cpp:24-226) resolved
    # via solvers/factory.py: direct names -> the exact host sparse solve
    # (optimizer/newton_direct.py), minres-indefinite-* -> the matrix-free
    # KKT path, subspace-* -> the dual Schur CG, eigen-pcg-* -> condensed
    # PCG with the matching preconditioner. Scenes that omit the key get the
    # TPU production default (condensed PCG + two-level preconditioner); use
    # solver="direct" explicitly (or the reference's default "eigen-llt") to
    # force the host oracle.
    from mixedfem_tpu.solvers.factory import resolve_solver

    solver_name = args.get("linear_solver")
    cfg_kwargs["solver"] = (
        resolve_solver(solver_name) if solver_name is not None else "pcg"
    )
    if dtype is not None:
        cfg_kwargs["dtype"] = dtype
    config = SimConfig(**cfg_kwargs)
    jdtype = jnp.dtype(config.dtype)

    # ---- materials
    mat_cfgs: List[MaterialConfig] = []
    for m in args.get("material_models", [{}]):
        mat_cfgs.append(
            MaterialConfig(
                model=m.get("energy", "Stable-Neohookean"),
                ym=m.get("youngs_modulus", 1e6),
                pr=m.get("poissons_ratio", 0.45),
                density=m.get("density", 1000.0),
            )
        )
    if not mat_cfgs:
        mat_cfgs = [MaterialConfig()]

    # ---- objects
    Vs, Ts = [], []
    mu_e, la_e, rho_e, model_e = [], [], [], []
    is_fixed_list, ext_list = [], []
    bc_specs: List[BCSpec] = []
    bc_states: List[BCState] = []
    press_cfgs = []
    skinning_raw = []
    v0_list = []
    obj_slices: List[slice] = []
    bc_build_args = []  # deferred: need nv_total for global masks

    offset_v = 0
    for obj in args.get("objects", []):
        path = _resolve_path(obj["path"], scene_dir)
        normalize = obj.get("normalize", True)
        V, T = _load_object_mesh(path, dim, normalize)

        off = np.asarray(obj.get("offset", (0.0, 0.0, 0.0)))[:dim]
        V = V + off
        if "transformation" in obj:
            Tm = np.asarray(obj["transformation"], dtype=np.float64).reshape(
                dim, dim
            )
            centroid = V.mean(axis=0)
            V = (V - centroid) @ Tm.T + centroid

        # materials: per-tet ids or single index
        if "material_ids" in obj:
            ids = mesh_io.read_dmat(
                _resolve_path(obj["material_ids"], scene_dir)
            ).astype(int).reshape(-1)
        else:
            ids = np.full(len(T), int(obj.get("material_index", 0)))
        for i in ids:
            assert 0 <= i < len(mat_cfgs)
        mu_e.append(np.array([mat_cfgs[i].mu for i in ids]))
        la_e.append(np.array([mat_cfgs[i].la for i in ids]))
        rho_e.append(np.array([mat_cfgs[i].density for i in ids]))
        model_e.append(np.array([model_index(mat_cfgs[i].model) for i in ids]))

        # initial velocity
        iv = np.zeros((len(V), dim))
        if "initial_velocity" in obj:
            iv[:] = np.asarray(obj["initial_velocity"])[:dim]
        v0_list.append(iv)

        bc_cfg_raw = obj.get("boundary_condition", {})
        bc_cfg = BCConfig(
            type=bc_cfg_raw.get("type", "null"),
            ratio=bc_cfg_raw.get("ratio", 0.1),
            axis=bc_cfg_raw.get("axis", 0),
            velocity=bc_cfg_raw.get("velocity", 0.1),
            duration=bc_cfg_raw.get("duration", 1.0),
            flip=bc_cfg_raw.get("flip", False),
        )
        ext_raw = obj.get("external_force", {})
        ext_cfg = ExtConfig(
            type=ext_raw.get("type", "area"),
            is_body_force=ext_raw.get("is_body_force", True),
            force=tuple(ext_raw.get("force", config.body_force)),
            axis=ext_raw.get("axis", 0),
            ratio=ext_raw.get("ratio", 0.1),
            max_force=ext_raw.get("max_force", 100.0),
            target_velocity=ext_raw.get("target_velocity", 0.1),
            max_displacement=ext_raw.get("max_displacement", 0.3),
        )

        if "skinning_mesh" in obj:
            sk_path = _resolve_path(obj["skinning_mesh"], scene_dir)
            Vr, Fr = mesh_io.read_obj(sk_path)
            Vr = Vr / Vr.max()  # maxCoeff normalization (simulation_state.cpp:242-243)
            skinning_raw.append((Vr, Fr, V.copy(), T.copy(), offset_v))

        bc_build_args.append((V.copy(), bc_cfg, offset_v))
        ext_list.append(build_external_force(V, ext_cfg))
        if ext_cfg.type == "press":
            press_cfgs.append((ext_cfg, offset_v, len(V)))
        obj_slices.append(slice(offset_v, offset_v + len(V)))
        Vs.append(V)
        Ts.append(T)
        offset_v += len(V)

    nv_total = offset_v
    # Build BCs now that nv_total is known; BC init may deform V (scale etc.)
    all_fixed = []
    for i, (V_obj, bc_cfg, off_i) in enumerate(bc_build_args):
        spec, st, fixed, V_new = build_bc(
            V_obj, bc_cfg, nv_total, off_i, dtype=jdtype
        )
        bc_specs.append(spec)
        bc_states.append(st)
        all_fixed.append(fixed)
        Vs[i] = V_new

    # Concatenate into global mesh (Meshes composite, meshes.cpp:11-55)
    V = np.concatenate(Vs, axis=0)
    T = np.concatenate(
        [t + sl.start for t, sl in zip(Ts, obj_slices)], axis=0
    )
    obj_id = np.concatenate(
        [np.full(len(v), i) for i, v in enumerate(Vs)]
    )
    is_fixed = np.concatenate(all_fixed)
    ext_force = np.concatenate(ext_list, axis=0)
    v0 = np.concatenate(v0_list, axis=0)

    # initial_state resume (simulation_state.cpp:300-345)
    if "initial_state" in args:
        ist = args["initial_state"]
        if "x_path" in ist:
            V = mesh_io.read_dmat(_resolve_path(ist["x_path"], scene_dir))
        if "v_path" in ist:
            v0 = mesh_io.read_dmat(_resolve_path(ist["v_path"], scene_dir))

    # model name tuple: unique names present, in registry order
    from mixedfem_tpu.materials.models import MATERIAL_NAMES

    used = sorted(set(int(i) for arr in model_e for i in np.unique(arr)))
    models_present = tuple(MATERIAL_NAMES[i] for i in used)
    remap = {g: l for l, g in enumerate(used)}
    model_id = np.concatenate(
        [np.vectorize(remap.get)(arr) for arr in model_e]
    )

    mu_all = np.concatenate(mu_e)
    la_all = np.concatenate(la_e)
    rho_all = np.concatenate(rho_e)

    # On accelerators: banded element order enables the windowed Pallas
    # assembly kernel (solvers/operator.py banded_matvec). A pure static
    # reorder — permute all per-element arrays together. CPU keeps the
    # scene's natural order (bit-identical trajectories for the oracle
    # tests; the Pallas kernel is TPU-only anyway).
    import jax

    use_banded = jax.default_backend() != "cpu"
    elem_perm = None
    if use_banded:
        from mixedfem_tpu.solvers.operator import sort_elements_banded

        elem_perm = sort_elements_banded(T)
        T = T[elem_perm]
        mu_all = mu_all[elem_perm]
        la_all = la_all[elem_perm]
        rho_all = rho_all[elem_perm]
        model_id = model_id[elem_perm]

    mesh = build_mesh_data(
        V,
        T,
        density=rho_all,
        mu=mu_all,
        lam=la_all,
        model_id=model_id,
        models=models_present,
        is_fixed=is_fixed,
        ext_force=ext_force,
        obj_id=obj_id,
        dtype=jdtype,
    )

    x0 = jnp.asarray(V, jdtype)

    # Two-level preconditioner for anything beyond toy size (it only
    # changes CG iteration counts, not solutions).
    matvec_plan = None
    if use_banded and len(T) >= 2000:
        from mixedfem_tpu.solvers.operator import build_banded_plan

        matvec_plan = build_banded_plan(mesh)

    coarse = None
    if len(T) >= 2000 and config.solver == "pcg":
        from mixedfem_tpu.solvers.coarse import build_coarse_space

        coarse = build_coarse_space(
            V, T, is_fixed, target_size=48, dtype=jdtype
        )

    gs_plan = None
    from mixedfem_tpu.solvers.factory import resolve_solver as _resolve

    if _resolve(config.solver) == "gauss-seidel":
        from mixedfem_tpu.solvers.gauss_seidel import build_gs_plan

        gs_plan = build_gs_plan(T, nv_total, dtype=jdtype)

    # MechanicalPress controllers (press_force.h)
    from mixedfem_tpu.bc.boundary_conditions import boundary_groups
    from mixedfem_tpu.bc.press import PressSpec, press_init

    press_specs, press_states = [], []
    for ecfg, off_i, nvo in press_cfgs:
        V_obj = V[off_i : off_i + nvo]
        forced = np.zeros(nv_total)
        if ecfg.is_body_force:
            forced[off_i : off_i + nvo] = 1.0
            marker = off_i
        else:
            g0, g1 = boundary_groups(V_obj, ecfg.ratio, ecfg.axis)
            idx = np.nonzero(g1)[0]
            forced[off_i + idx] = 1.0
            marker = off_i + (idx[0] if len(idx) else 0)
        spec = PressSpec(
            forced=jnp.asarray(forced, jdtype),
            axis=ecfg.axis,
            marker=int(marker),
            target_velocity=ecfg.target_velocity,
            max_force=ecfg.max_force,
            max_displacement=ecfg.max_displacement,
        )
        press_specs.append(spec)
        press_states.append(press_init(spec, x0, ecfg.force[ecfg.axis]))

    state = init_state(
        mesh, config, tuple(bc_states), x0, jnp.asarray(v0, jdtype),
        press_states=tuple(press_states),
    )
    # skinning embeddings (utils/skinning.py; global tet ids)
    from mixedfem_tpu.utils.skinning import embed_in_tets

    inv_perm = None
    if elem_perm is not None:
        inv_perm = np.empty(len(elem_perm), np.int64)
        inv_perm[elem_perm] = np.arange(len(elem_perm))
    skinning = []
    for (Vr, Fr, V_obj, T_obj, off_i) in skinning_raw:
        tid, bary = embed_in_tets(Vr, V_obj, T_obj)
        # remap local tet ids to global element indices (pre-banded order)
        tet_offset = sum(len(t) for t, sl in zip(Ts, obj_slices) if sl.start < off_i)
        tid_g = tid + tet_offset
        if inv_perm is not None:
            tid_g = inv_perm[tid_g]
        skinning.append((Vr, Fr, tid_g, bary))

    return Simulation(
        mesh=mesh,
        config=config,
        bc_specs=tuple(bc_specs),
        state=state,
        dim=dim,
        obj_slices=obj_slices,
        coarse=coarse,
        press_specs=tuple(press_specs),
        skinning=tuple(skinning),
        matvec_plan=matvec_plan,
        gs_plan=gs_plan,
    )
