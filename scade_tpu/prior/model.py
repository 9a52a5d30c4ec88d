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
    Bottleneck,
    upsample_bilinear_align_corners,
)


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    d_latent: int = 32
    layers: Sequence[int] = (3, 4, 23, 3)  # ResNeXt101
    groups: int = 32
    base_width: int = 8
    bottleneck_dims: Sequence[int] = (256, 512, 1024, 2048)
    lateral_out: Sequence[int] = (512, 256, 256, 256)  # cfg.MODEL.LATERAL_OUT
    small: bool = False  # tiny variant for tests

    def with_small(self):
        """A shape-compatible tiny model for CI (layers [1,1,1,1], width/8)."""
        return dataclasses.replace(self, layers=(1, 1, 1, 1))


class ResNeXtCIMLE(nn.Module):
    """4-level feature pyramid with AdaIn taps (Resnext_torch.py:336-508).
    With use_adain=False this is the plain ResNeXt backbone (z/shifts are
    ignored) used by the decoder-side cIMLE variant and the baseline model."""

    cfg: PriorConfig
    use_adain: bool = True

    @nn.compact
    def __call__(self, x, z, shifts, train: bool = False, return_adain: bool = False):
        c = self.cfg
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        if self.use_adain:
            x = AdaIn(64, name="style_mod0")(x, z, shifts["mean0"], shifts["var0"])
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
            out_ch = planes[li] * 4
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != out_ch)
                x = Bottleneck(
                    planes=planes[li], stride=s, groups=c.groups,
                    base_width=c.base_width, has_downsample=has_ds,
                    name=f"layer{li + 1}_{b}",
                )(x, train)
                inplanes = out_ch
            if li < 3:
                if self.use_adain:
                    x = AdaIn(out_ch, name=f"style_mod{li + 1}")(
                        x, z, shifts[f"mean{li + 1}"], shifts[f"var{li + 1}"]
                    )
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
                 train: bool = False):
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
            return AdaInV2(dims[i], name=f"style_mod{i}")(
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
        x_2 = FFM(mid[0], mid[0], name="ffm0")(features[0], x_4, train)
        return AO(mid[0], 1, 2, name="outconv")(x_2, train)


class AuxiNetV2(nn.Module):
    """Auxi disparity branch over the decoder intermediates
    (network_auxi.py:77-124)."""

    width: int = 128

    @nn.compact
    def __call__(self, auxi_in, train: bool = False):
        out = AuxiBlock(self.width, name="auxi_block1")(auxi_in[0], auxi_in[1], train)
        for i, lateral in enumerate(auxi_in[2:], start=2):
            out = AuxiBlock(self.width, name=f"auxi_block{i}")(out, lateral, train)
        return AO(self.width, 1, 2, name="out_conv")(out, train)


class DepthModelCIMLE(nn.Module):
    """encoder(x, z) → decoder → (B, H, W, 1) depth logit
    (multi_depth_model_auxiv2.py:471-504)."""

    cfg: PriorConfig

    @nn.compact
    def __call__(self, x, z, shifts, train: bool = False, return_adain: bool = False):
        feats = ResNeXtCIMLE(self.cfg, name="encoder")(
            x, z, shifts, train, return_adain=return_adain
        )
        if return_adain:
            return feats  # the 4 post-AdaIn activations
        return Decoder(self.cfg, name="decoder")(feats, train)


def zero_shifts(cfg: PriorConfig):
    dims = (64, 256, 512, 1024)
    out = {}
    for i, d in enumerate(dims):
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
    def __call__(self, x, z, shifts, train: bool = False):
        feats = ResNeXtCIMLE(self.cfg, use_adain=False, name="encoder")(
            x, z, shifts, train
        )
        return DecoderCIMLE(self.cfg, self.version, name="decoder")(
            feats, z, shifts, input_image=x, train=train
        )


class DepthModelBaseline(nn.Module):
    """The plain (non-cIMLE) LeReS model with the auxi disparity branch
    (RelDepthModel / DepthModel, multi_depth_model_auxiv2.py:14-52,451-469)."""

    cfg: PriorConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNeXtCIMLE(self.cfg, use_adain=False, name="encoder")(
            x, None, None, train
        )
        logit, auxi_in = Decoder(self.cfg, name="decoder")(
            feats, train, return_auxi=True
        )
        auxi = AuxiNetV2(name="auxi")(auxi_in, train)
        return logit, auxi


def init_prior(key, cfg: PriorConfig, image_size=(448, 448)):
    """Initialize variables {'params', 'batch_stats'} + zero AdaIn shifts."""
    model = DepthModelCIMLE(cfg)
    x = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
    z = jnp.zeros((1, cfg.d_latent), jnp.float32)
    variables = model.init(key, x, z, zero_shifts(cfg), train=False)
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
