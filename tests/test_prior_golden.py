"""Numerical parity of the flax prior vs the reference torch model.

Builds the reference DepthModel_cIMLE (random init, CPU, pretrained-weight
download disabled, .cuda() no-op'd), translates its state_dict through
scade_tpu.prior.translate, and compares eval-mode forward outputs on the
same input. Skipped when /root/reference or torch is unavailable.

This is the strongest possible check on the architecture translation: it
exercises every conv/BN/AdaIn/FTB/FFM/AO and the exact upsampling and
padding semantics across ~43M parameters.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/ambiguity_aware_prior"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def reference_model():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    # the reference hard-codes .cuda() inside AdaIn.forward and friends —
    # no-op it for CPU execution
    torch.Tensor.cuda = lambda self, *a, **k: self

    # the reference imports torchvision only for unused pretrained helpers;
    # it's not in this image — stub it
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.transforms"] = tv.transforms

    from lib.configs.config import cfg

    cfg.MODEL.LOAD_IMAGENET_PRETRAINED_WEIGHTS = False
    cfg.MODEL.ENCODER = "resnext101_stride32x8d"

    from lib.models.multi_depth_model_auxiv2 import DepthModel_cIMLE

    torch.manual_seed(0)
    model = DepthModel_cIMLE(d_latent=8, version="v2")
    model.eval()
    return torch, model


def test_forward_parity_vs_reference(reference_model):
    torch, ref_model = reference_model

    from scade_tpu.prior.model import PriorConfig, init_prior, zero_shifts
    from scade_tpu.prior.translate import (
        check_translation,
        params_from_torch_state_dict,
    )

    cfg = PriorConfig(d_latent=8)  # full ResNeXt101 depth — matches reference
    model, variables = init_prior(jax.random.PRNGKey(0), cfg, image_size=(64, 64))

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params, batch_stats = params_from_torch_state_dict(sd, cfg)
    problems = check_translation(variables, params, batch_stats)
    assert problems == [], problems[:8]
    ours = {"params": params, "batch_stats": batch_stats}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    z = rng.standard_normal((1, 8)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(z),
        )
    ref_depth = np.transpose(ref_out.numpy(), (0, 2, 3, 1))

    from scade_tpu.prior.model import prior_apply

    our_depth = np.asarray(
        prior_apply(model, ours, zero_shifts(cfg), jnp.asarray(x), jnp.asarray(z))
    )
    assert our_depth.shape == ref_depth.shape
    err = np.abs(our_depth - ref_depth).max()
    scale = np.abs(ref_depth).max() + 1e-8
    assert err / scale < 2e-4, f"max rel err {err / scale}"


def test_adain_acts_parity_vs_reference(reference_model):
    torch, ref_model = reference_model

    from scade_tpu.prior.model import (
        PriorConfig,
        get_adain_init_act,
        init_prior,
        zero_shifts,
    )
    from scade_tpu.prior.translate import params_from_torch_state_dict

    cfg = PriorConfig(d_latent=8)
    model, variables = init_prior(jax.random.PRNGKey(0), cfg, image_size=(64, 64))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params, batch_stats = params_from_torch_state_dict(sd, cfg)
    ours = {"params": params, "batch_stats": batch_stats}

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    z = rng.standard_normal((1, 8)).astype(np.float32)

    with torch.no_grad():
        ref_acts = ref_model.get_adain_init_act(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(z),
        )
    our_acts = get_adain_init_act(
        model, ours, zero_shifts(cfg), jnp.asarray(x), jnp.asarray(z)
    )
    for ref_a, our_a in zip(ref_acts, our_acts):
        ref_np = np.transpose(ref_a.numpy(), (0, 2, 3, 1))
        our_np = np.asarray(our_a)
        err = np.abs(our_np - ref_np).max() / (np.abs(ref_np).max() + 1e-8)
        assert err < 2e-4, err
