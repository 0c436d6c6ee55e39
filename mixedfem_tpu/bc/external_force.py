"""External (Neumann / body) forces.

Reference: src/boundary_conditions/external_force.h — per-vertex
acceleration vectors added to the inertia target as dt^2 * f. The default is
an AreaForce body force of (0, -9.8, 0) (gravity; ExternalForceConfig in
src/config.h:163-181). 'area' applies force to a boundary group (or all
vertices when is_body_force), 'stretch' applies +/-force to both groups.
The 'press' MechanicalPress controller is dynamic and handled separately.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from mixedfem_tpu.bc.boundary_conditions import boundary_groups

EXT_NAMES = ("area", "stretch", "press")


@dataclasses.dataclass(frozen=True)
class ExtConfig:
    type: str = "area"
    is_body_force: bool = True
    force: Tuple[float, float, float] = (0.0, -9.8, 0.0)
    axis: int = 0
    ratio: float = 0.1
    # mechanical press parameters
    max_force: float = 100.0
    target_velocity: float = 0.1
    max_displacement: float = 0.3
    flip: bool = False


def build_external_force(V_obj: np.ndarray, cfg: ExtConfig) -> np.ndarray:
    """(nv_obj, d) static per-vertex force for 'area'/'stretch' types."""
    nvo, d = V_obj.shape
    f = np.asarray(cfg.force[:d], dtype=np.float64)
    out = np.zeros((nvo, d))
    g0, g1 = boundary_groups(V_obj, cfg.ratio, cfg.axis)
    if cfg.type == "area":
        if cfg.is_body_force:
            out[:] = f
        else:
            out[g1] = f  # group 1 (external_force.h:55-80)
    elif cfg.type == "stretch":
        out[g0] = f
        out[g1] = -f
    elif cfg.type == "press":
        # dynamic controller; initial force 0 — driven per-step elsewhere
        pass
    else:
        raise KeyError(f"unknown external force '{cfg.type}' (have {EXT_NAMES})")
    return out
