from mixedfem_tpu.materials.models import (
    MATERIAL_NAMES,
    model_index,
    psi_s,
    psi_s_all,
    grad_s_all,
    hess_s_all,
    psi_F,
    psi_F_all,
)
