from .mesh import (
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from .sharded_unet import (make_sharded_unet_forward, make_sharded_sampler,
                           make_sharded_dpm_sampler,
                           make_sharded_x0_sampler,
                           make_sharded_train_forward,
                           make_sharded_train_step)
