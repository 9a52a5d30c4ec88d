from scade_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    nerf_param_pspecs,
    replicate,
    shard_params,
    state_shardings,
)
