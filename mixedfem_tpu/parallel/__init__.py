from mixedfem_tpu.parallel.sharding import make_device_mesh, shard_simulation
