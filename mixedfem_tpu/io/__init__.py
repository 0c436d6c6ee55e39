from mixedfem_tpu.io.mesh_io import read_mesh, read_obj, read_dmat, write_dmat, write_obj
