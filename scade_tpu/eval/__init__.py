from scade_tpu.eval.evaluate import (  # noqa: F401
    render_images_with_metrics,
    render_video,
    write_images_with_metrics,
)
