"""The ambiguity-aware cIMLE depth prior, TPU-native.

Re-implements the reference's `ambiguity_aware_prior/` subsystem
(reference: lib/models/*, tools/*) in flax/JAX: a ResNeXt101-32x8d feature
pyramid with AdaIn(z) noise injection after conv1/layer1/layer2/layer3
(the shipped "enc" cIMLE variant — multi_depth_model_auxiv2.py:55,
Resnext_torch.py:336-508), the LeReS decoder (FTB→FFM×3→AO), the LeReS
loss suite, cIMLE training (AdaIn stat init + argmin-z recaching), and the
depth-hypothesis dump tool that bridges to the SCADE NeRF optimizer.

This subsystem is offline/batch: it trains the prior and dumps K depth
hypotheses per training image to `<scene>/train/leres_cimle/<dir>/<img>_<k>.npy`
(the only coupling to the NeRF side — SURVEY.md preamble).
"""

from scade_tpu.prior.model import (  # noqa: F401
    DepthModelCIMLE,
    PriorConfig,
    init_prior,
    prior_apply,
)
from scade_tpu.prior.spvcnn import (  # noqa: F401
    SPVCNNConfig,
    SparsePoints,
    SparseVoxels,
    init_spvcnn,
    spvcnn_apply,
)
