from mixedfem_tpu.optimizer.newton import SimState, StepStats, init_state, newton_step
