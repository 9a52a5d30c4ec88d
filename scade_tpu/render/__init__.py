from scade_tpu.render.renderer import (
    RenderConfig,
    SceneVars,
    make_render_config,
    render_image,
    render_ray_batch,
    render_rays,
)

__all__ = [
    "RenderConfig",
    "SceneVars",
    "make_render_config",
    "render_image",
    "render_ray_batch",
    "render_rays",
]
