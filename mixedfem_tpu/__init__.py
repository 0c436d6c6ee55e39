"""mixedfem_tpu — TPU-native mixed variational FEM for deformable simulation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference C++ implementation of "Mixed Variational Finite Elements for
Implicit Simulation of Deformables" (Trusty et al., evouga/mixed-fem):

- nodal displacements x, per-element mixed symmetric stretch s (the
  symmetric factor of the polar decomposition F = R.S), and Lagrange
  multipliers la enforcing c(x,s) = Sym.(S(x) - s) = 0,
- implicit BDF1-6 stepping with a Newton/SQP outer loop, backtracking
  line search, and a condensed-SPD matrix-free PCG linear solve,
- six material models in S-space and F-space (autodiff grads/Hessians),
- IPC-style mixed collision + additive CCD (barrier on mixed distance),
- JSON scene files compatible with the reference scene vocabulary.

Everything is functional: state is a pytree, `step` is jittable, element
parallelism is vmapped/Pallas-batched, and multi-chip scaling shards the
element/vertex axes over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from mixedfem_tpu.config import SimConfig, MaterialConfig, enu_to_lame
