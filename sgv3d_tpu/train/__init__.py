from sgv3d_tpu.train.optim import make_optimizer
from sgv3d_tpu.train.loop import TrainState, create_train_state, make_train_step
from sgv3d_tpu.train.sharding import make_mesh, shard_batch

__all__ = ["make_optimizer", "TrainState", "create_train_state",
           "make_train_step", "make_mesh", "shard_batch"]
