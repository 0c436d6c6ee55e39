from mixedfem_tpu.utils.timer import OptimizerData, Timer
