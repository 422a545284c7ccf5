from klara_tpu.parallel.mesh import (
    chain_mesh,
    initialize_distributed,
    shard_chains,
)

__all__ = ["chain_mesh", "initialize_distributed", "shard_chains"]
