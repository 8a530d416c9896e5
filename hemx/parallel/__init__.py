from hemx.parallel.mesh import make_mesh, data_sharding, replicated_sharding
from hemx.parallel.dp import shard_batch, jit_step
