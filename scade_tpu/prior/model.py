"""The cIMLE-conditioned monocular depth model.

Encoder: ResNeXt101-32x8d feature pyramid with AdaIn(z) injected after
conv1 / layer1 / layer2 / layer3 (the shipped "enc" variant — reference:
ambiguity_aware_prior/lib/models/Resnext_torch.py:336-508,
multi_depth_model_auxiv2.py:55-113, Resnext_torch.py:900-957:
groups=32, width_per_group=8, layers=[3, 4, 23, 3]).
Decoder: LeReS top-down refinement (network_auxi.py:173-231).

The AdaIn dataset-statistic recentering (mean/var shifts, computed once at
epoch 0 and stored in mean_var_adain.npy — tools/train_single.py:286-392)
enters as explicit arrays, not module state: `prior_apply(variables, shifts,
x, z)`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scade_tpu.prior.blocks import (
    AO,
    FFM,
    FTB,
    AdaIn,
    AdaInV2,
    AuxiBlock,
    BasicBlock,
    Bottleneck,
    upsample_bilinear_align_corners,
)


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    d_latent: int = 32
    layers: Sequence[int] = (3, 4, 23, 3)  # ResNeXt101
    groups: int = 32
    base_width: int = 8
    block: str = "bottleneck"  # "bottleneck" (50/101/152/X101) | "basic" (18/34)
    bottleneck_dims: Sequence[int] = (256, 512, 1024, 2048)
    lateral_out: Sequence[int] = (512, 256, 256, 256)  # cfg.MODEL.LATERAL_OUT
    small: bool = False  # tiny variant for tests

    @property
    def expansion(self) -> int:
        return 1 if self.block == "basic" else 4

    def with_small(self):
        """A shape-compatible tiny model for CI (layers [1,1,1,1], width/8)."""
        return dataclasses.replace(self, layers=(1, 1, 1, 1), small=True)


# The reference encoder zoo (network_auxi.py:16-50 factories + Resnet.py
# resnet18/34/50/101/152 + Resnext_torch.py resnext101_32x8d). Each entry:
# (layers, groups, base_width, block). The reference decoder hard-codes
# in-channels [256, 512, 1024, 2048] (cfg.MODEL.RESNET_BOTTLENECK_DIM), so
# its basic-block backbones (18/34, emitting [64, 128, 256, 512]) crash at
# the first decoder conv; our convs infer in-channels, so every zoo entry
# actually runs (documented deviation, PARITY.md).
_BACKBONES = {
    "resnet18": ((2, 2, 2, 2), 1, 64, "basic"),
    "resnet34": ((3, 4, 6, 3), 1, 64, "basic"),
    "resnet50": ((3, 4, 6, 3), 1, 64, "bottleneck"),
    "resnet101": ((3, 4, 23, 3), 1, 64, "bottleneck"),
    "resnet152": ((3, 8, 36, 3), 1, 64, "bottleneck"),
    "resnext101_32x8d": ((3, 4, 23, 3), 32, 8, "bottleneck"),
}


def backbone_config(name: str = "resnext101_32x8d", d_latent: int = 32,
                    **overrides) -> PriorConfig:
    """PriorConfig for a named reference backbone (the `resnet*_stride32` /
    `resnext101_stride32x8d` factory surface, network_auxi.py:16-50)."""
    layers, groups, base_width, block = _BACKBONES[name]
    exp = 1 if block == "basic" else 4
    dims = tuple(p * exp for p in (64, 128, 256, 512))
    return PriorConfig(
        d_latent=d_latent, layers=layers, groups=groups,
        base_width=base_width, block=block, bottleneck_dims=dims,
        **overrides,
    )


class ResNeXtCIMLE(nn.Module):
    """4-level feature pyramid with AdaIn taps (Resnext_torch.py:336-508).

    - use_adain=False: the plain backbone (z/shifts ignored) — used by the
      decoder-side cIMLE variant and the baseline model; with a plain-ResNet
      PriorConfig (block="basic"/groups=1) this is the reference Resnet.py
      backbone (Resnet.py:98-157).
    - adain_version="v2": z-only AdaIn MLP taps (ResNet_cIMLE,
      Resnext_torch.py:336-508).
    - adain_version="v3": image-conditioned AdaIn_v2 taps at the same four
      positions (ResNet_cIMLE_v3, Resnext_torch.py:592-768), reachable in
      the reference via RelDepthModel_cIMLE(version="v3") →
      resnext101_32x8d_cIMLE(version="v3") (Resnext_torch.py:920-935).
    """

    cfg: PriorConfig
    use_adain: bool = True
    adain_version: str = "v2"

    @nn.compact
    def __call__(self, x, z, shifts, train: bool = False, return_adain: bool = False):
        c = self.cfg
        input_image = x  # v3 AdaIn conditions on the raw input
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )

        def style(i, h, ch):
            if not self.use_adain:
                return h
            if self.adain_version == "v3":
                return AdaInV2(ch, name=f"style_mod{i}")(
                    h, z, input_image, shifts[f"mean{i}"], shifts[f"var{i}"]
                )
            return AdaIn(ch, name=f"style_mod{i}")(
                h, z, shifts[f"mean{i}"], shifts[f"var{i}"]
            )

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = style(0, x, 64)
        adain0 = x
        x = nn.relu(norm()(x))
        # maxpool(3, 2, padding=1)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )

        features = []
        adains = [adain0]
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        inplanes = 64
        for li in range(4):
            blocks = c.layers[li]
            stride = strides[li]
            out_ch = planes[li] * c.expansion
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != out_ch)
                if c.block == "basic":
                    x = BasicBlock(
                        planes=planes[li], stride=s, has_downsample=has_ds,
                        name=f"layer{li + 1}_{b}",
                    )(x, train)
                else:
                    x = Bottleneck(
                        planes=planes[li], stride=s, groups=c.groups,
                        base_width=c.base_width, has_downsample=has_ds,
                        name=f"layer{li + 1}_{b}",
                    )(x, train)
                inplanes = out_ch
            if li < 3:
                x = style(li + 1, x, out_ch)
                adains.append(x)
            features.append(x)

        if return_adain:
            return tuple(adains)
        return features  # 1/4, 1/8, 1/16, 1/32 resolution (NHWC)


class Decoder(nn.Module):
    """LeReS top-down decoder (network_auxi.py:173-231). With
    return_auxi=True also returns the 6 intermediate maps the auxi branch
    consumes (:216-220)."""

    cfg: PriorConfig

    @nn.compact
    def __call__(self, features, train: bool = False, return_auxi: bool = False):
        mid = list(self.cfg.lateral_out[::-1])  # [256, 256, 256, 512]

        x_32x = FTB(mid[3], name="conv")(features[3], train)
        x_32 = nn.Conv(mid[2], (3, 3), padding=[(1, 1), (1, 1)], name="conv1")(x_32x)
        x_16 = upsample_bilinear_align_corners(x_32, 2)
        x_8 = FFM(mid[2], mid[2], name="ffm2")(features[2], x_16, train)
        x_4 = FFM(mid[1], mid[1], name="ffm1")(features[1], x_8, train)
        x_2 = FFM(mid[0], mid[0], name="ffm0")(features[0], x_4, train)
        out = AO(mid[0], 1, 2, name="outconv")(x_2, train)
        if return_auxi:
            return out, [x_32x, x_32, x_16, x_8, x_4, x_2]
        return out


class DecoderCIMLE(nn.Module):
    """Decoder-side cIMLE (network_auxi.py:320-520): the plain decoder with
    AdaIn(z) injected at 4 taps — features[3], post-FTB x_32x, x_8, x_4
    (version "v2"; versions v3-v6 swap AdaIn for the image-conditioned
    AdaInV2 at progressively fewer taps)."""

    cfg: PriorConfig
    version: str = "v2"

    @nn.compact
    def __call__(self, features, z, shifts, input_image=None,
                 train: bool = False, return_adain: bool = False):
        mid = list(self.cfg.lateral_out[::-1])
        inch = list(self.cfg.bottleneck_dims)
        v = self.version
        n_taps = {"v2": 4, "v3": 4, "v4": 3, "v5": 2, "v6": 1}[v]
        dims = [inch[3], mid[3], mid[2], mid[1]]

        def style(i, x):
            if i >= n_taps:
                return x
            if v == "v2":
                return AdaIn(dims[i], name=f"style_mod{i}")(
                    x, z, shifts[f"mean{i}"], shifts[f"var{i}"]
                )
            # the decoder-side AdaIn_v2 applies 2x var/mean scales
            # (network_auxi.py:290,315) — unlike the encoder-side one
            return AdaInV2(dims[i], var_scale=2.0, mean_scale=2.0,
                           name=f"style_mod{i}")(
                x, z, input_image, shifts[f"mean{i}"], shifts[f"var{i}"]
            )

        f3 = style(0, features[3])
        x_32x = FTB(mid[3], name="conv")(f3, train)
        x_32x = style(1, x_32x)
        x_32 = nn.Conv(mid[2], (3, 3), padding=[(1, 1), (1, 1)], name="conv1")(x_32x)
        x_16 = upsample_bilinear_align_corners(x_32, 2)
        x_8 = FFM(mid[2], mid[2], name="ffm2")(features[2], x_16, train)
        x_8 = style(2, x_8)
        x_4 = FFM(mid[1], mid[1], name="ffm1")(features[1], x_8, train)
        x_4 = style(3, x_4)
        if return_adain:
            # Decoder_cIMLE.get_adain_init_act (network_auxi.py:570-616):
            # the 4 tap-position activations (styled where the version taps)
            return (f3, x_32x, x_8, x_4)
        x_2 = FFM(mid[0], mid[0], name="ffm0")(features[0], x_4, train)
        return AO(mid[0], 1, 2, name="outconv")(x_2, train)


class AuxiNetV2(nn.Module):
    """Auxi disparity branch over the decoder intermediates
    (network_auxi.py:77-124). The v1 AuxiNet (network_auxi.py:125-172) is
    the identical topology at width 256 — construct with width=256 (or use
    ``AuxiNetV1``)."""

    width: int = 128

    @nn.compact
    def __call__(self, auxi_in, train: bool = False):
        out = AuxiBlock(self.width, name="auxi_block1")(auxi_in[0], auxi_in[1], train)
        for i, lateral in enumerate(auxi_in[2:], start=2):
            out = AuxiBlock(self.width, name=f"auxi_block{i}")(out, lateral, train)
        return AO(self.width, 1, 2, name="out_conv")(out, train)


class AuxiNetV1(AuxiNetV2):
    """reference AuxiNet (v1): the 256-wide variant (network_auxi.py:125-172)."""

    width: int = 256


class DepthModelCIMLE(nn.Module):
    """encoder(x, z) → decoder → (B, H, W, 1) depth logit
    (multi_depth_model_auxiv2.py:471-504). ``version`` selects the encoder
    AdaIn flavor: "v2" (z-MLP AdaIn, the shipped path) or "v3"
    (image-conditioned AdaIn_v2) — the RelDepthModel_cIMLE(version=...)
    dispatch (multi_depth_model_auxiv2.py:55-58, Resnext_torch.py:931-935)."""

    cfg: PriorConfig
    version: str = "v2"

    @nn.compact
    def __call__(self, x, z, shifts, train: bool = False, return_adain: bool = False):
        feats = ResNeXtCIMLE(self.cfg, adain_version=self.version, name="encoder")(
            x, z, shifts, train, return_adain=return_adain
        )
        if return_adain:
            return feats  # the 4 post-AdaIn activations
        return Decoder(self.cfg, name="decoder")(feats, train)


def encoder_adain_dims(cfg: PriorConfig):
    """Channel dims at the 4 encoder AdaIn taps: post-conv1 (64) and the
    layer1/2/3 outputs (Resnext_torch.py:355-380)."""
    return (64,) + tuple(p * cfg.expansion for p in (64, 128, 256))


def zero_shifts(cfg: PriorConfig):
    out = {}
    for i, d in enumerate(encoder_adain_dims(cfg)):
        out[f"mean{i}"] = jnp.zeros((d,), jnp.float32)
        out[f"var{i}"] = jnp.zeros((d,), jnp.float32)
    return out


def zero_shifts_dec(cfg: PriorConfig):
    """AdaIn shift dims for the decoder-side variant (train_single.py:310-313:
    2048/512/256/256)."""
    dims = (cfg.bottleneck_dims[3], cfg.lateral_out[0],
            cfg.lateral_out[1], cfg.lateral_out[2])
    out = {}
    for i, d in enumerate(dims):
        out[f"mean{i}"] = jnp.zeros((d,), jnp.float32)
        out[f"var{i}"] = jnp.zeros((d,), jnp.float32)
    return out


class DepthModelCIMLEDec(nn.Module):
    """Decoder-side cIMLE: plain ResNeXt encoder + DecoderCIMLE
    (RelDepthModel_cIMLE_decoder / DepthModel_cIMLE_v2,
    multi_depth_model_auxiv2.py:115-178,506-548)."""

    cfg: PriorConfig
    version: str = "v2"

    @nn.compact
    def __call__(self, x, z, shifts, train: bool = False,
                 return_adain: bool = False):
        feats = ResNeXtCIMLE(self.cfg, use_adain=False, name="encoder")(
            x, z, shifts, train
        )
        return DecoderCIMLE(self.cfg, self.version, name="decoder")(
            feats, z, shifts, input_image=x, train=train,
            return_adain=return_adain,
        )


class DepthModelBaseline(nn.Module):
    """The plain (non-cIMLE) LeReS model with the auxi disparity branch
    (RelDepthModel / DepthModel, multi_depth_model_auxiv2.py:14-52,451-469).
    ``auxi_version``: "v2" (width 128, the wired-up default) or "v1"
    (width 256, network_auxi.py:125-172). The backbone follows cfg —
    the DepthNet factory surface resnet18/34/50/101/152_stride32 and
    resnext101_stride32x8d (network_auxi.py:16-50) maps to
    ``backbone_config(name)``."""

    cfg: PriorConfig
    auxi_version: str = "v2"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNeXtCIMLE(self.cfg, use_adain=False, name="encoder")(
            x, None, None, train
        )
        logit, auxi_in = Decoder(self.cfg, name="decoder")(
            feats, train, return_auxi=True
        )
        auxi_cls = AuxiNetV1 if self.auxi_version == "v1" else AuxiNetV2
        auxi = auxi_cls(name="auxi")(auxi_in, train)
        return logit, auxi


def zero_shifts_for(model):
    """Zero AdaIn shifts with the right dims for an enc- or dec-side model."""
    if isinstance(model, DepthModelCIMLEDec):
        return zero_shifts_dec(model.cfg)
    return zero_shifts(model.cfg)


def init_prior(key, cfg: PriorConfig, image_size=(448, 448), version: str = "v2",
               cimle_version: str = "enc"):
    """Initialize variables {'params', 'batch_stats'} + zero AdaIn shifts.

    cimle_version: "enc" (RelDepthModel_cIMLE — z into the encoder, the
    shipped path) or "dec" (RelDepthModel_cIMLE_decoder — z into the
    decoder; ``version`` then selects the Decoder_cIMLE tap schedule v2-v6).
    Reference dispatch: multi_depth_model_auxiv2.py:55-178."""
    if cimle_version == "dec":
        model = DepthModelCIMLEDec(cfg, version=version)
    else:
        if version not in ("v2", "v3"):
            # the encoder AdaIn only special-cases v3 and would silently
            # fall through to the v2 taps — an entire training run on the
            # wrong architecture; v4-v6 are decoder tap schedules
            raise ValueError(
                f"encoder cIMLE supports version v2/v3, got {version!r}; "
                "v4-v6 are Decoder_cIMLE schedules (use cimle_version='dec')"
            )
        model = DepthModelCIMLE(cfg, version=version)
    x = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
    z = jnp.zeros((1, cfg.d_latent), jnp.float32)
    variables = model.init(key, x, z, zero_shifts_for(model), train=False)
    return model, variables


def prior_apply(model, variables, shifts, x, z, train: bool = False):
    """Forward. x: (B, H, W, 3) normalized rgb; z: (B, d_latent).
    Returns (depth (B, H, W, 1)[, updated batch_stats])."""
    if train:
        return model.apply(
            variables, x, z, shifts, train=True, mutable=["batch_stats"]
        )
    return model.apply(variables, x, z, shifts, train=False)


def prior_inference(model, variables, shifts, x, z, rescaled: bool = False):
    """reference RelDepthModel_cIMLE.inference (:84-113): raw decoder logit;
    rescaled=True applies depth - min + 0.01."""
    depth = prior_apply(model, variables, shifts, x, z, train=False)
    if rescaled:
        depth = depth - depth.min() + 0.01
    return depth


def get_adain_init_act(model, variables, shifts, x, z):
    """The 4 post-AdaIn activations for stat init (Resnext_torch.py:486-508)."""
    return model.apply(variables, x, z, shifts, train=False, return_adain=True)
