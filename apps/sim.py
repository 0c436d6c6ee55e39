"""Headless simulator CLI: the TPU-native counterpart of the reference's
sim2d/sim3d apps (minus the polyscope GUI; exports OBJ/.mesh/dmat instead).

Usage:
  python apps/sim.py <scene.json> --dim 3 [-n STEPS] [--out DIR]
      [--export-obj] [--save-substeps] [--dtype float64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--dim", type=int, default=3, choices=(2, 3))
    ap.add_argument("-n", "--steps", type=int, default=None)
    ap.add_argument("--out", default="output")
    ap.add_argument("--export-obj", action="store_true")
    ap.add_argument("--save-substeps", action="store_true",
                    help="export sim_x0_%%04d.dmat / sim_v_%%04d.dmat per step")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--timing-csv", default=None,
                    help="append per-step wall-clock rows (reference timing.csv format)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--solver", default=None,
                    help="override the scene's linear_solver (any reference "
                         "factory name or internal path name; e.g. 'pcg' to "
                         "run a cholmod scene on the TPU iterative path)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from mixedfem_tpu.io.scene import load_scene
    from mixedfem_tpu.io import mesh_io
    from mixedfem_tpu.integrators import bdf as bdfmod
    from mixedfem_tpu.mesh import discretization as disc
    from mixedfem_tpu.utils.timer import OptimizerData

    overrides = (
        {"linear_solver": args.solver} if args.solver is not None else None
    )
    sim = load_scene(
        args.scene, dim=args.dim, dtype=args.dtype, overrides=overrides
    )
    n = args.steps if args.steps is not None else sim.config.timesteps
    os.makedirs(args.out, exist_ok=True)

    data = OptimizerData()
    F_srf = np.asarray(sim.mesh.F_srf)

    for step in range(n):
        data.timer.start("step")
        sim.step()
        data.timer.stop("step")
        data.add_step_stats(sim.state.stats)
        if args.timing_csv:
            data.timer.write_csv(args.timing_csv, step)
            data.timer.clear()
        if sim.config.show_data:
            print(f"--- step {step}")
            data.print_data(sim.config.show_timing)
            data.clear()

        V = np.asarray(sim.state.x)
        if args.save_substeps:
            mesh_io.write_dmat(os.path.join(args.out, f"sim_x0_{step:04d}.dmat"), V)
            v = np.asarray(sim.state.bdf.v_hist[0])
            mesh_io.write_dmat(os.path.join(args.out, f"sim_v_{step:04d}.dmat"), v)
        if args.export_obj:
            for i, (Vr, Fr) in enumerate(sim.skinned_surfaces()):
                mesh_io.write_obj(
                    os.path.join(args.out, f"skin{i}_{step:04d}.obj"), Vr, Fr
                )
            if args.dim == 3:
                mesh_io.write_obj(
                    os.path.join(args.out, f"frame_{step:04d}.obj"), V, F_srf
                )
            else:
                mesh_io.write_obj(
                    os.path.join(args.out, f"frame_{step:04d}.obj"),
                    V,
                    np.asarray(sim.mesh.T),
                )

    print("final positions bbox:",
          np.asarray(sim.state.x).min(0), np.asarray(sim.state.x).max(0))


if __name__ == "__main__":
    main()
