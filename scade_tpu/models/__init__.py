from scade_tpu.models.nerf import (
    NeRFConfig,
    nerf_apply,
    nerf_init,
    nerf_num_params,
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)

__all__ = [
    "NeRFConfig",
    "nerf_apply",
    "nerf_init",
    "nerf_num_params",
    "params_from_torch_state_dict",
    "params_to_torch_state_dict",
]
