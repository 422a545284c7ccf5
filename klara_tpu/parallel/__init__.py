from klara_tpu.parallel.mesh import (
    chain_mesh,
    initialize_distributed,
    shard_chains,
)
from klara_tpu.parallel.param_shard import mesh2d, param_sharded_logreg_target

__all__ = [
    "chain_mesh",
    "initialize_distributed",
    "shard_chains",
    "mesh2d",
    "param_sharded_logreg_target",
]
