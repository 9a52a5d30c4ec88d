from scade_tpu.models.nerf import (
    NeRFConfig,
    nerf_apply,
    nerf_init,
    nerf_num_params,
)

__all__ = ["NeRFConfig", "nerf_apply", "nerf_init", "nerf_num_params"]
