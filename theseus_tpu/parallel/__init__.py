from .sharding import aux_pspecs, make_mesh, shard_problem, state_pspecs
