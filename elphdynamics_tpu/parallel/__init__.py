from elphdynamics_tpu.parallel.chains import (
    chain_mesh,
    make_sharded_chain_step,
    shard_chain_tree,
    init_chain_states,
)

__all__ = [
    "chain_mesh",
    "make_sharded_chain_step",
    "shard_chain_tree",
    "init_chain_states",
]
