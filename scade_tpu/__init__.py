"""scade_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the SCADE framework.

SCADE (CVPR 2023) optimizes per-scene NeRFs with a space-carving loss that
matches the NeRF ray-termination distribution against K ambiguity-aware
monocular-depth hypotheses per training image.

This package re-designs the reference (mikacuy/scade, PyTorch/CUDA) as an
idiomatic JAX program:

- ``scade_tpu.ops``      — pure jnp math kernels (positional encoding, ray
  generation, volume rendering, inverse-CDF hierarchical sampling, losses,
  metrics). Everything is a pure function of arrays + explicit RNG.
- ``scade_tpu.models``   — the NeRF MLP as a functional params-pytree model,
  plus torch checkpoint translation.
- ``scade_tpu.render``   — the jitted rendering pipeline (coarse/fine/
  hypothesis sampling) with static-shape `lax.map` tiling in place of the
  reference's Python chunk loops.
- ``scade_tpu.train``    — single jitted train step (render + losses + optax
  updates for MLPs and per-image depth scale/shift), host loop around it.
- ``scade_tpu.data``     — host-side scene IO (transforms_*.json scenes,
  cIMLE hypothesis dumps) producing numpy arrays.
- ``scade_tpu.parallel`` — jax.sharding Mesh setup; ray batches shard over
  the data axis, params replicate, reductions ride psum over ICI.
- ``scade_tpu.prior``    — the ambiguity-aware cIMLE depth prior (ResNeXt +
  LeReS decoder + AdaIn noise injection) and the hypothesis dump tools.

The external contracts of the reference are kept drop-in compatible: CLI
(train|test|test_opt|video), transforms_*.json scene format, leres_cimle
hypothesis .npy layout, `.tar` checkpoint schema, and output layout.
"""

__version__ = "0.1.0"

from scade_tpu import ops  # noqa: F401

__all__ = [
    "ops", "models", "render", "train", "eval", "data", "parallel",
    "prior", "utils",
]
