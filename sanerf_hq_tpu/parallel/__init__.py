from .mesh import make_mesh, shard_rays, replicate, data_sharding
from .evaluate import make_sharded_eval_step, make_sharded_render
