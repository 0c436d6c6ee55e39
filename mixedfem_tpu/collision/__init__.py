from mixedfem_tpu.collision import barrier, distances, broadphase, accd
