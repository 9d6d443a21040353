from .sharding import (
    aux_pspecs,
    carry_pspecs,
    make_mesh,
    shard_gbp_factors,
    shard_map_solve,
    shard_problem,
    state_pspecs,
)
