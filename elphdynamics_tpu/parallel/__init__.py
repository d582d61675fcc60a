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

from elphdynamics_tpu.parallel.multihost import (  # noqa: E402
    init_multihost,
    is_multihost,
    is_primary,
)

__all__ += ["init_multihost", "is_multihost", "is_primary"]
