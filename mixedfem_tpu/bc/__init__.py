from mixedfem_tpu.bc.boundary_conditions import (
    BCSpec,
    BCState,
    build_bc,
    bc_step,
    BC_NAMES,
)
from mixedfem_tpu.bc.external_force import build_external_force, EXT_NAMES
