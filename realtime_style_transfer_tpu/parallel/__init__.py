from .mesh import make_mesh, batch_sharding, replicated, shard_batch, replicate, DATA_AXIS, SPATIAL_AXIS  # noqa: F401
from .train import DistributedTrainer  # noqa: F401
from .infer import DistributedStylizer  # noqa: F401
from . import distributed  # noqa: F401
