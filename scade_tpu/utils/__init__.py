from scade_tpu.utils.logging import MeanTracker  # noqa: F401
