from mixedfem_tpu.mesh.mesh import MeshData, build_mesh_data
from mixedfem_tpu.mesh import discretization
