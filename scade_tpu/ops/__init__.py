"""Pure jnp math kernels for the SCADE pipeline.

Every function here is a pure array->array map: no IO, no global RNG, no
Python-level data-dependent control flow — safe to jit/vmap/shard.
"""

from scade_tpu.ops.embedding import Embedder, get_embedder, positional_encoding
from scade_tpu.ops.rays import (
    get_ray_dirs,
    get_rays,
    get_rays_at_coords,
    ndc_rays,
    pixel_grid_coords,
)
from scade_tpu.ops.volume import (
    compute_weights,
    perturb_z_vals,
    raw2depth,
    raw2outputs,
    stratified_z_vals,
)
from scade_tpu.ops.sampling import (
    draw_u,
    draw_u_sorted,
    merge_sorted,
    sample_pdf,
    sample_pdf_joint,
    sample_pdf_joint_return_u,
    sample_pdf_return_u,
)
from scade_tpu.ops.losses import (
    compute_depth_loss,
    compute_monosdf_styleloss,
    compute_scale_and_shift,
    compute_space_carving_loss,
    img2mse,
    is_not_in_expected_distribution,
    mse2psnr,
    precompute_quadratic_samples,
)
from scade_tpu.ops.metrics import compute_rmse, psnr_from_mse, ssim, to8b, to16b

__all__ = [
    "Embedder",
    "get_embedder",
    "positional_encoding",
    "get_ray_dirs",
    "get_rays",
    "get_rays_at_coords",
    "ndc_rays",
    "pixel_grid_coords",
    "compute_weights",
    "perturb_z_vals",
    "raw2depth",
    "raw2outputs",
    "stratified_z_vals",
    "draw_u",
    "draw_u_sorted",
    "merge_sorted",
    "sample_pdf",
    "sample_pdf_joint",
    "sample_pdf_joint_return_u",
    "sample_pdf_return_u",
    "compute_depth_loss",
    "compute_monosdf_styleloss",
    "compute_scale_and_shift",
    "compute_space_carving_loss",
    "img2mse",
    "is_not_in_expected_distribution",
    "mse2psnr",
    "precompute_quadratic_samples",
    "compute_rmse",
    "psnr_from_mse",
    "ssim",
    "to8b",
    "to16b",
]
