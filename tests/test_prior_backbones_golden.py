"""Numerical parity of the round-2 prior additions vs the reference torch
code: the v3 (image-conditioned AdaIn_v2) encoder cIMLE variant, the plain
ResNet backbone family, the full non-cIMLE baseline (decoder + AuxiNetV2),
and the v1 AuxiNet.

Same harness as test_prior_golden.py: build the actual reference modules on
CPU (random init, pretrained downloads disabled, .cuda() no-op'd), translate
the state_dict through scade_tpu.prior.translate, compare eval-mode
forwards. Small layer counts keep the CPU cost low; every module class and
wiring path is still exercised in full.

Reference anchors: Resnext_torch.py:592-768 (ResNet_cIMLE_v3), :538-590
(AdaIn_v2), Resnet.py:27-156 (BasicBlock/Bottleneck/ResNet),
network_auxi.py:77-171 (AuxiNet/AuxiNetV2), multi_depth_model_auxiv2.py:
452-469 (DepthModel baseline wiring).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/ambiguity_aware_prior"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_env():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.transforms"] = tv.transforms
    from lib.configs.config import cfg

    cfg.MODEL.LOAD_IMAGENET_PRETRAINED_WEIGHTS = False
    return torch


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _rel_err(ours, ref):
    return np.abs(np.asarray(ours) - ref).max() / (np.abs(ref).max() + 1e-8)


def test_v3_encoder_cimle_forward_parity(ref_env):
    """ResNet_cIMLE_v3 (AdaIn_v2 taps) + Decoder — the
    RelDepthModel_cIMLE(version='v3') path. 448² input is required: the
    reference AdaIn_v2 MLP hard-codes the 8*7*7 flatten
    (Resnext_torch.py:555-560)."""
    torch = ref_env
    from lib.models import Resnext_torch, network_auxi

    import dataclasses

    from scade_tpu.prior.model import (
        DepthModelCIMLE,
        backbone_config,
        get_adain_init_act,
        zero_shifts,
    )
    from scade_tpu.prior.translate import check_translation, params_from_torch_state_dict

    torch.manual_seed(0)

    class RefV3(torch.nn.Module):
        # DepthModel_cIMLE wiring (multi_depth_model_auxiv2.py:471-504) at
        # layer count [1,1,1,1] to keep the CPU forward cheap
        def __init__(self):
            super().__init__()
            self.encoder_modules = Resnext_torch.ResNet_cIMLE_v3(
                Resnext_torch.Bottleneck, [1, 1, 1, 1],
                groups=32, width_per_group=8, d_latent=8,
            )
            self.decoder_modules = network_auxi.Decoder()

        def forward(self, x, z):
            return self.decoder_modules(self.encoder_modules(x, z), auxi=False)

    ref = RefV3()
    ref.eval()

    cfg = dataclasses.replace(backbone_config("resnext101_32x8d", d_latent=8),
                              layers=(1, 1, 1, 1))
    model = DepthModelCIMLE(cfg, version="v3")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 448, 448, 3)).astype(np.float32)
    z = rng.standard_normal((1, 8)).astype(np.float32)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(z),
        zero_shifts(cfg), train=False,
    )
    sd = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats = params_from_torch_state_dict(sd, cfg, version="v3")
    problems = check_translation(variables, params, batch_stats)
    assert problems == [], problems[:8]
    ours_vars = {"params": params, "batch_stats": batch_stats}

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(z)
        )
    ref_depth = _to_nhwc(ref_out)
    ours = model.apply(ours_vars, jnp.asarray(x), jnp.asarray(z),
                       zero_shifts(cfg), train=False)
    assert np.asarray(ours).shape == ref_depth.shape
    assert _rel_err(ours, ref_depth) < 2e-4

    # the 4 post-AdaIn_v2 activations (stat-init path, Resnext_torch.py:743-768)
    with torch.no_grad():
        ref_acts = ref.encoder_modules.get_adain_init_act(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(z)
        )
    our_acts = get_adain_init_act(
        model, ours_vars, zero_shifts(cfg), jnp.asarray(x), jnp.asarray(z)
    )
    for ra, oa in zip(ref_acts, our_acts):
        assert _rel_err(oa, _to_nhwc(ra)) < 2e-4


def test_resnet50_baseline_forward_parity(ref_env):
    """Plain bottleneck-ResNet backbone + Decoder + AuxiNetV2 — the
    DepthModel baseline with the resnet50_stride32 factory family
    (network_auxi.py:28-32, Resnet.py:59-137)."""
    torch = ref_env
    import dataclasses

    from lib.models import Resnet, network_auxi

    from scade_tpu.prior.model import DepthModelBaseline, backbone_config
    from scade_tpu.prior.translate import check_translation, params_from_torch_state_dict

    torch.manual_seed(1)

    class RefBaseline(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_modules = Resnet.ResNet(Resnet.Bottleneck, [1, 1, 1, 1])
            self.decoder_modules = network_auxi.Decoder()
            self.auxi_modules = network_auxi.AuxiNetV2()

        def forward(self, x):
            logit, auxi_in = self.decoder_modules(self.encoder_modules(x))
            return logit, self.auxi_modules(auxi_in)

    ref = RefBaseline()
    ref.eval()

    cfg = dataclasses.replace(backbone_config("resnet50", d_latent=8),
                              layers=(1, 1, 1, 1))
    model = DepthModelBaseline(cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    sd = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats = params_from_torch_state_dict(
        sd, cfg, adain=False, auxi=True
    )
    problems = check_translation(variables, params, batch_stats)
    assert problems == [], problems[:8]

    with torch.no_grad():
        ref_logit, ref_auxi = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    logit, auxi = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x), train=False
    )
    assert _rel_err(logit, _to_nhwc(ref_logit)) < 2e-4
    assert _rel_err(auxi, _to_nhwc(ref_auxi)) < 2e-4


def test_resnet18_basicblock_features_parity(ref_env):
    """BasicBlock backbone (resnet18) feature pyramid vs Resnet.py. Encoder
    only: the reference decoder crashes on basic-block channel counts
    (PARITY.md §known deviations #7)."""
    torch = ref_env
    from lib.models import Resnet

    from scade_tpu.prior.model import ResNeXtCIMLE, backbone_config
    from scade_tpu.prior.translate import params_from_torch_state_dict

    torch.manual_seed(2)
    ref = Resnet.ResNet(Resnet.BasicBlock, [2, 2, 2, 2])
    ref.eval()

    cfg = backbone_config("resnet18", d_latent=8)
    enc = ResNeXtCIMLE(cfg, use_adain=False)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), None, None,
                         train=False)

    sd = {"encoder_modules." + k: v for k, v in ref.state_dict().items()}
    params, batch_stats = params_from_torch_state_dict(
        sd, cfg, adain=False, decoder=False
    )
    # re-root: name_map emits full-model paths (encoder.*); the standalone
    # encoder module expects them at the tree root
    ours = {"params": params["encoder"], "batch_stats": batch_stats["encoder"]}

    with torch.no_grad():
        ref_feats = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    our_feats = enc.apply(ours, jnp.asarray(x), None, None, train=False)
    assert len(our_feats) == 4
    for rf, of in zip(ref_feats, our_feats):
        assert _rel_err(of, _to_nhwc(rf)) < 2e-4


@pytest.mark.parametrize("dec_version,size", [("v2", 64), ("v6", 448)])
def test_decoder_cimle_forward_parity(ref_env, dec_version, size):
    """Decoder-side cIMLE (DepthModel_cIMLE_v2 wiring,
    multi_depth_model_auxiv2.py:506-548): plain backbone + Decoder_cIMLE
    with z (v2) or image-conditioned (v6) AdaIn taps. v6 needs 448² input
    (AdaIn_v2's hard-coded 8*7*7 flatten)."""
    torch = ref_env
    import dataclasses

    from lib.models import Resnext_torch, network_auxi

    from scade_tpu.prior.model import (
        DepthModelCIMLEDec,
        backbone_config,
        zero_shifts_dec,
    )
    from scade_tpu.prior.translate import check_translation, params_from_torch_state_dict

    torch.manual_seed(4)

    class RefDec(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_modules = Resnext_torch.ResNet(
                Resnext_torch.Bottleneck, [1, 1, 1, 1],
                groups=32, width_per_group=8,
            )
            self.decoder_modules = network_auxi.Decoder_cIMLE(
                d_latent=8, version=dec_version
            )

        def forward(self, x, z):
            feats = self.encoder_modules(x)
            if dec_version == "v2":
                return self.decoder_modules(feats, z, auxi=False)
            return self.decoder_modules(feats, z, x, auxi=False)

    ref = RefDec()
    ref.eval()

    cfg = dataclasses.replace(backbone_config("resnext101_32x8d", d_latent=8),
                              layers=(1, 1, 1, 1))
    model = DepthModelCIMLEDec(cfg, version=dec_version)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    z = rng.standard_normal((1, 8)).astype(np.float32)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(z),
        zero_shifts_dec(cfg), train=False,
    )
    sd = {k: v for k, v in ref.state_dict().items()}
    params, batch_stats = params_from_torch_state_dict(
        sd, cfg, adain=False, dec_version=dec_version
    )
    problems = check_translation(variables, params, batch_stats)
    assert problems == [], problems[:8]

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(z)
        )
    ours = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), jnp.asarray(z), zero_shifts_dec(cfg), train=False,
    )
    assert _rel_err(ours, _to_nhwc(ref_out)) < 2e-4


def test_auxinet_v1_forward_parity(ref_env):
    """AuxiNet (v1, width 256, network_auxi.py:125-172) vs AuxiNetV1 on
    decoder-shaped intermediates."""
    torch = ref_env
    from lib.models import network_auxi

    from scade_tpu.prior.model import AuxiNetV1, backbone_config
    from scade_tpu.prior.translate import params_from_torch_state_dict

    torch.manual_seed(3)
    ref = network_auxi.AuxiNet()
    ref.eval()

    rng = np.random.default_rng(3)
    # [x_32x(512), x_32(256), x_16(256), x_8(256), x_4(256), x_2(256)]
    shapes = [(1, 4, 4, 512), (1, 4, 4, 256), (1, 8, 8, 256),
              (1, 16, 16, 256), (1, 32, 32, 256), (1, 64, 64, 256)]
    auxi_in = [rng.standard_normal(s).astype(np.float32) for s in shapes]

    model = AuxiNetV1()
    variables = model.init(
        jax.random.PRNGKey(0), [jnp.asarray(a) for a in auxi_in], train=False
    )
    cfg = backbone_config("resnext101_32x8d", d_latent=8)
    sd = {"auxi_modules." + k: v for k, v in ref.state_dict().items()}
    params, batch_stats = params_from_torch_state_dict(
        sd, cfg, encoder=False, decoder=False, auxi=True
    )
    # keep only the auxi subtree, re-rooted for the standalone module
    ours = {"params": params["auxi"], "batch_stats": batch_stats["auxi"]}
    del variables

    with torch.no_grad():
        ref_out = ref([
            torch.from_numpy(np.transpose(a, (0, 3, 1, 2))) for a in auxi_in
        ])
    out = model.apply(ours, [jnp.asarray(a) for a in auxi_in], train=False)
    assert _rel_err(out, _to_nhwc(ref_out)) < 2e-4
