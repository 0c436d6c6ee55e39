from mixedfem_tpu.ops import sym, rotation, psd
