"""Building blocks for the cIMLE depth prior (flax.linen).

Shapes/semantics match the reference modules (reference:
ambiguity_aware_prior/lib/models/network_auxi.py — AdaIn :233-264,
FTB :709, FFM :804, AO :851; Resnext_torch.py Bottleneck :84-130).
Data layout is NHWC (TPU-native; the reference is NCHW — translation
utilities transpose accordingly).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _interp_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """(out_size, in_size) align-corners bilinear interpolation matrix —
    2 nonzeros per row: out = M @ x. Built from static shapes only, so XLA
    constant-folds it."""
    if out_size == 1 or in_size == 1:
        m = jnp.zeros((out_size, in_size), jnp.float32)
        return m.at[:, 0].set(1.0)
    s = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    i0 = jnp.floor(s).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w = s - i0.astype(jnp.float32)
    cols = jnp.arange(in_size, dtype=jnp.int32)
    one0 = (i0[:, None] == cols).astype(jnp.float32)
    one1 = (i1[:, None] == cols).astype(jnp.float32)
    # where i0 == i1 (exact-hit rows, incl. the clip at in_size-1) the two
    # one-hots coincide and the weights sum to 1 — same value as the gather
    return one0 * (1.0 - w)[:, None] + one1 * w[:, None]


def resize_bilinear_align_corners(x, size):
    """torch F.interpolate(mode='bilinear', align_corners=True) to an
    arbitrary (oh, ow) in NHWC.

    jax.image.resize has no align_corners mode. The interpolation is two
    small matmuls with constant (out, in) matrices of 2 nonzeros per row —
    the gather formulation materialized ~500 MB copies per decoder
    upsample on TPU and dominated the prior train-step HBM footprint
    (BASELINE.md r3); the matmul form rides the MXU and fuses. Values
    match the gather form (each output is the same two-term lerp; the
    zero products contribute exactly 0 in f32) — precision=HIGHEST pins
    that equivalence even under jax_default_matmul_precision=bfloat16
    (the --precision bfloat16 fast path), where ambient precision would
    round the (1-w, w) weights and activations on the MXU while the
    gather+lerp form it replaced would not.
    """
    n, h, w, c = x.shape
    oh, ow = size
    R = _interp_matrix(h, oh)  # (oh, h)
    C = _interp_matrix(w, ow)  # (ow, w)
    hp = jax.lax.Precision.HIGHEST
    top = jnp.einsum("oh,nhwc->nowc", R, x, precision=hp)
    return jnp.einsum("pw,nowc->nopc", C, top, precision=hp)


def upsample_bilinear_align_corners(x, factor: int):
    """torch nn.Upsample(scale_factor=f, align_corners=True) in NHWC."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, (h * factor, w * factor))


class AdaIn(nn.Module):
    """z → per-channel (scale, shift); x·(scale+1−var_shift) + (shift−mean_shift)
    (reference network_auxi.py:233-264)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, z, mean_shift, var_shift):
        style = z
        for width in (512, 256, 128):
            style = nn.leaky_relu(nn.Dense(width)(style), negative_slope=0.01)
        style = nn.Dense(self.out_channels * 2)(style)  # (B, 2C)
        style = style.reshape(-1, 2, self.out_channels)
        mean = style[:, 1] - mean_shift  # (B, C)
        var = style[:, 0] + 1.0 - var_shift
        return x * var[:, None, None, :] + mean[:, None, None, :]


class GroupedConv3x3(nn.Module):
    """ResNeXt grouped 3x3 conv, bias-free. Parameter layout is identical
    to ``nn.Conv(features, (3, 3), feature_group_count=groups)``: kernel
    ``(3, 3, in_ch // groups, features)`` — checkpoints and the torch
    translation are unaffected.

    XLA's TPU lowering of feature_group_count convs is layout-bound at
    large spatial sizes (groups=32 leaves 8-16 of 128 MXU lanes live and
    forces whole-tensor relayouts around the op): a full bottleneck at
    112²x256 measured 9.1 ms with fgc vs 1.45 ms with the same math as a
    block-diagonal DENSE conv (BASELINE.md r3 grouped-conv attribution).
    When the input spatial area is >= ``_BLOCKDIAG_MIN_HW`` we therefore
    scatter the grouped kernel into an equivalent dense kernel (zeros off
    the block diagonal — a pure broadcast multiply by eye(groups), exact
    in f32) and run one dense conv: 32x the nominal MACs, full MXU lanes,
    measured 3.4x faster at 112² and 1.6x at 56², tying at 28² and losing
    below, hence the area threshold (fgc is kept for small feature maps,
    where the dense form's extra FLOPs dominate)."""

    features: int
    groups: int
    stride: int = 1

    # use the block-diagonal dense form at or above this input H*W
    # (56² — the production 448² crop hits 112² and 56² in layers 1-2)
    _BLOCKDIAG_MIN_HW = 56 * 56

    @nn.compact
    def __call__(self, x):
        cg = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cg, self.features), jnp.float32,
        )
        if x.shape[1] * x.shape[2] >= self._BLOCKDIAG_MIN_HW:
            g = self.groups
            ocg = self.features // g
            wr = kernel.reshape(3, 3, cg, g, ocg)  # [ky,kx,i,go,oc]
            eye = jnp.eye(g, dtype=kernel.dtype)
            dense = (eye[None, None, :, None, :, None]
                     * wr[:, :, None]).reshape(3, 3, cg * g, self.features)
            groups = 1
            w = dense
        else:
            groups = self.groups
            w = kernel
        return jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride), [(1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
            feature_group_count=groups,
        )


class Bottleneck(nn.Module):
    """torchvision ResNet-V1.5 bottleneck with grouped 3x3
    (Resnext_torch.py:84-130). width = planes * (base_width/64) * groups."""

    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 8
    has_downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion

        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, name="Conv_0")(x)
        y = nn.relu(norm()(y))
        # named Conv_1 so the param path matches the nn.Conv it replaces
        y = GroupedConv3x3(
            width, self.groups, stride=self.stride, name="Conv_1",
        )(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="Conv_2")(y)
        y = norm()(y)

        if self.has_downsample:
            identity = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            identity = norm()(identity)
        return nn.relu(y + identity)


class BasicBlock(nn.Module):
    """torchvision ResNet basic block, used by the reference's plain
    ResNet-18/34 backbones (reference:
    ambiguity_aware_prior/lib/models/Resnet.py:27-56): two 3x3 convs with
    BN, stride on the first, identity (or 1x1-conv) skip."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )
        identity = x
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False,
        )(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False)(y)
        y = norm()(y)
        if self.has_downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            identity = norm()(identity)
        return nn.relu(y + identity)


class FTB(nn.Module):
    """Feature-transfer block: conv → residual conv-BN-conv branch → relu
    (network_auxi.py:709-757).

    NOTE the reference's branch starts with ``ReLU(inplace=True)``, which
    mutates the residual tensor in place BEFORE the skip add executes
    (``x = x + self.conv_branch(x)``, :745) — so the effective residual is
    relu(conv1(x)), not conv1(x). Verified numerically against the torch
    module; replicated here.
    """

    midchannels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.midchannels, (3, 3), padding=[(1, 1), (1, 1)])(x)
        h = nn.relu(h)  # the in-place relu hits the residual too
        branch = nn.Conv(self.midchannels, (3, 3), padding=[(1, 1), (1, 1)])(h)
        branch = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(branch)
        branch = nn.relu(branch)
        branch = nn.Conv(self.midchannels, (3, 3), padding=[(1, 1), (1, 1)])(branch)
        return nn.relu(h + branch)


class FFM(nn.Module):
    """Feature-fusion: FTB(low) + high → FTB → 2x upsample
    (network_auxi.py:804-849)."""

    midchannels: int
    outchannels: int
    upfactor: int = 2

    @nn.compact
    def __call__(self, low_x, high_x, train: bool = False):
        x = FTB(self.midchannels)(low_x, train)
        x = x + high_x
        x = FTB(self.outchannels)(x, train)
        return upsample_bilinear_align_corners(x, self.upfactor)


class AdaInV2(nn.Module):
    """Image-conditioned AdaIn: a small conv net over [image ⊕ z-broadcast]
    pooled to 7x7 feeds the style MLP. Two reference definitions share the
    architecture but differ in the output transform:

    - encoder side (Resnext_torch.py:538-590, used by ResNet_cIMLE_v3):
      x·var + mean  → var_scale = mean_scale = 1
    - decoder side (network_auxi.py:266-318, used by Decoder_cIMLE v3-v6):
      x·(var·2) + mean·2 (the `shift_scale`/`mean_scale`=2.0 defaults at
      the :290 forward) → var_scale = mean_scale = 2
    """

    out_channels: int
    var_scale: float = 1.0
    mean_scale: float = 1.0

    @nn.compact
    def __call__(self, x, z, input_image, mean_shift, var_shift):
        B, H, W, _ = input_image.shape
        z_map = jnp.broadcast_to(z[:, None, None, :], (B, H, W, z.shape[-1]))
        h = jnp.concatenate([input_image, z_map], axis=-1)
        for ch in (32, 16, 8):
            h = nn.leaky_relu(
                nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)])(h),
                negative_slope=0.01,
            )
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 4, 4, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)],
            )
        # the reference flattens an 8x7x7 map (448-input assumption); for
        # other sizes, pool to a fixed 7x7 first
        if h.shape[1] != 7 or h.shape[2] != 7:
            h = resize_bilinear_align_corners(h, (7, 7))
        # flatten in the reference's NCHW (channel-major) order so the style
        # MLP weights translate 1:1 from torch (Resnext_torch.py:575-576)
        style = jnp.transpose(h, (0, 3, 1, 2)).reshape(B, -1)
        style = nn.leaky_relu(nn.Dense(128)(style), negative_slope=0.01)
        style = nn.leaky_relu(nn.Dense(128)(style), negative_slope=0.01)
        style = nn.Dense(self.out_channels * 2)(style).reshape(
            B, 2, self.out_channels
        )
        mean = style[:, 1] - mean_shift
        var = style[:, 0] + 1.0 - var_shift
        return (
            x * (var[:, None, None, :] * self.var_scale)
            + mean[:, None, None, :] * self.mean_scale
        )


class AuxiBlock(nn.Module):
    """Auxi fusion block (network_auxi.py:58-75): resize top to lateral,
    concat, 1x1 conv-BN-relu, 3x3 conv-BN-relu."""

    dim_out: int

    @nn.compact
    def __call__(self, top, lateral, train: bool = False):
        if top.shape[1:3] != lateral.shape[1:3]:
            top = resize_bilinear_align_corners(top, lateral.shape[1:3])
        out = jnp.concatenate([lateral, top], axis=-1)
        norm = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=0.5, epsilon=1e-5
        )
        out = nn.relu(norm()(nn.Conv(self.dim_out, (1, 1), use_bias=False)(out)))
        out = nn.relu(
            norm()(nn.Conv(self.dim_out, (3, 3), padding=[(1, 1), (1, 1)])(out))
        )
        return out


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (network_auxi.py:897-946): four
    parallel dilated convs (rates 1/6/12/18), each conv→relu→BN, concat."""

    planes: int = 128
    rates: tuple = (1, 6, 12, 18)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for rate in self.rates:
            k = 1 if rate == 1 else 3
            pad = 0 if rate == 1 else rate
            y = nn.Conv(
                self.planes, (k, k), padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(rate, rate),
            )(x)
            y = nn.relu(y)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(y)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


class AO(nn.Module):
    """Adaptive output: conv-BN-relu-conv → 2x upsample (network_auxi.py:851-895)."""

    inchannels: int
    outchannels: int = 1
    upfactor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.inchannels // 2, (3, 3), padding=[(1, 1), (1, 1)])(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        x = nn.Conv(self.outchannels, (3, 3), padding=[(1, 1), (1, 1)])(x)
        return upsample_bilinear_align_corners(x, self.upfactor)
