from mvsdet_tpu.parallel.mesh import make_mesh
from mvsdet_tpu.parallel.sharding import (batch_pspecs,
                                          make_sharded_train_step,
                                          shard_batch)
