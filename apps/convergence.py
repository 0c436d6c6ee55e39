"""Convergence harness: mixed-variable Newton vs vanilla-FEM gradient norm.

Reference: apps/convergence.cpp — runs the mixed optimizer for N steps and,
at every Newton iteration, evaluates the VANILLA-FEM gradient norm at the
mixed iterate; writes a (steps x max_iters) matrix to
<out>/convergence.dmat (rows padded with the final value).

Variants (reference apps/convergence_iterative.cpp, convergence_collision.cpp):
  --sweep-tol: repeat with iterative-solver tolerances 1e-1..1e-7
  --sweep-dhat: repeat with dhat in {1e-2 .. 1e-4} (contact scenes)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_convergence(scene, dim, steps, out_path, dtype=None, itr_tol=None,
                    dhat=None):
    from mixedfem_tpu.io.scene import load_scene
    from mixedfem_tpu.io import mesh_io

    overrides = {}
    sim = load_scene(scene, dim=dim, dtype=dtype, overrides=overrides)
    cfg = sim.config
    import dataclasses

    cfg = dataclasses.replace(cfg, record_vanilla_gradient=True)
    if itr_tol is not None:
        cfg = dataclasses.replace(cfg, itr_tol=itr_tol)
    if dhat is not None:
        cfg = dataclasses.replace(cfg, dhat=dhat)
    sim.config = cfg

    M = cfg.outer_steps
    rows = []
    for step in range(steps):
        sim.step()
        it = int(np.asarray(sim.state.stats.iterations))
        vg = np.asarray(sim.state.stats.vanilla_grad)[:it]
        row = np.empty(M)
        row[:it] = vg
        row[it:] = vg[-1] if it else 0.0  # pad (convergence.cpp:105-127)
        rows.append(row)
        print(f"step {step}: iters={it} grad_norms={vg}")
    Mx = np.stack(rows)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    mesh_io.write_dmat(out_path, Mx)
    print("wrote", out_path, Mx.shape)
    return Mx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--dim", type=int, default=2, choices=(2, 3))
    ap.add_argument("-n", "--steps", type=int, default=10)
    ap.add_argument("--out", default="output/convergence.dmat")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--sweep-tol", action="store_true")
    ap.add_argument("--sweep-dhat", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    if args.sweep_tol:
        # convergence_iterative.cpp:91-134 — 15 tolerances 1e-1..1e-7
        tols = np.logspace(-1, -7, 15)
        for i, tol in enumerate(tols):
            out = args.out.replace(".dmat", f"_tol{i:02d}.dmat")
            run_convergence(
                args.scene, args.dim, args.steps, out,
                dtype=args.dtype, itr_tol=float(tol),
            )
    elif args.sweep_dhat:
        # convergence_collision.cpp:88-130 — dhat in {1e-2 .. 1e-4} (8 values)
        dhats = np.logspace(-2, -4, 8)
        for i, dh in enumerate(dhats):
            out = args.out.replace(".dmat", f"_dhat{i:02d}.dmat")
            run_convergence(
                args.scene, args.dim, args.steps, out,
                dtype=args.dtype, dhat=float(dh),
            )
    else:
        run_convergence(args.scene, args.dim, args.steps, args.out, args.dtype)


if __name__ == "__main__":
    main()
