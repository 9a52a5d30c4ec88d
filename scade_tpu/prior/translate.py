"""Torch ↔ flax weight translation for the cIMLE prior.

Maps the reference's state_dict names (reference:
ambiguity_aware_prior/lib/models/Resnext_torch.py ResNet_cIMLE,
network_auxi.py Decoder/FTB/FFM/AO/AdaIn) onto the flax params/batch_stats
trees of scade_tpu.prior.model, so the official pretrained prior checkpoint
(res101 finetune / SCADE's cIMLE ckpts, loaded with ``strip_prefix_if_present``
semantics — lib/utils/net_tools.py:36-70) drops into the TPU build.

Conventions: torch Conv2d weight is (O, I, kH, kW) → flax (kH, kW, I, O);
torch Linear is (O, I) → flax (I, O); BatchNorm weight/bias/running_mean/
running_var → scale/bias + batch_stats mean/var. Grouped convs translate
the same way (flax feature_group_count matches torch groups).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from scade_tpu.prior.model import PriorConfig


def _conv_w(t):
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def _lin_w(t):
    return np.asarray(t, np.float32).T


def _strip(state_dict: dict) -> dict:
    """Remove 'module.' / 'depth_model.' style prefixes
    (net_tools.py strip_prefix_if_present :63-70)."""
    out = {}
    for k, v in state_dict.items():
        for prefix in ("module.", "depth_model.", "model."):
            while k.startswith(prefix):
                k = k[len(prefix):]
        # DepthNet_cIMLE nests the backbone one level deeper
        # (encoder_modules.encoder.*, network_auxi.py:655-697)
        k = k.replace("encoder_modules.encoder.", "encoder_modules.")
        out[k] = v
    return out


def _bottleneck_names(tli: int, tb: int, has_downsample: bool,
                      block: str = "bottleneck"):
    """torch layer{L}.{b}.* → (our module name, list of (torch, flax) pairs).
    block="basic" maps the 2-conv BasicBlock (Resnet.py:27-56)."""
    ours = f"encoder.layer{tli}_{tb}"
    base = f"encoder_modules.layer{tli}.{tb}"
    pairs = [
        (f"{base}.conv1", f"{ours}.Conv_0", "conv"),
        (f"{base}.bn1", f"{ours}.BatchNorm_0", "bn"),
        (f"{base}.conv2", f"{ours}.Conv_1", "conv"),
        (f"{base}.bn2", f"{ours}.BatchNorm_1", "bn"),
    ]
    n_bn = 2
    if block != "basic":
        pairs += [
            (f"{base}.conv3", f"{ours}.Conv_2", "conv"),
            (f"{base}.bn3", f"{ours}.BatchNorm_2", "bn"),
        ]
        n_bn = 3
    if has_downsample:
        pairs += [
            (f"{base}.downsample.0", f"{ours}.downsample_conv", "conv"),
            (f"{base}.downsample.1", f"{ours}.BatchNorm_{n_bn}", "bn"),
        ]
    return pairs


def _ftb_pairs(torch_base: str, our_base: str):
    return [
        (f"{torch_base}.conv1", f"{our_base}.Conv_0", "conv"),
        (f"{torch_base}.conv_branch.1", f"{our_base}.Conv_1", "conv"),
        (f"{torch_base}.conv_branch.2", f"{our_base}.BatchNorm_0", "bn"),
        (f"{torch_base}.conv_branch.4", f"{our_base}.Conv_2", "conv"),
    ]


def _adain_pairs(torch_base: str, our_base: str):
    """z-MLP AdaIn (network_auxi.py:233-264 / Resnext_torch.py AdaIn)."""
    return [
        (f"{torch_base}.mlp.{ti}", f"{our_base}.Dense_{fi}", "linear")
        for fi, ti in enumerate((0, 2, 4, 6))
    ]


def _adain_v2_pairs(torch_base: str, our_base: str):
    """Image-conditioned AdaIn_v2 (Resnext_torch.py:538-590): conv tower at
    Sequential indices 0/3/6, style MLP at indices 0/2/4."""
    pairs = [
        (f"{torch_base}.conv.{ti}", f"{our_base}.Conv_{fi}", "conv")
        for fi, ti in enumerate((0, 3, 6))
    ]
    pairs += [
        (f"{torch_base}.mlp.{ti}", f"{our_base}.Dense_{fi}", "linear")
        for fi, ti in enumerate((0, 2, 4))
    ]
    return pairs


def name_map(cfg: PriorConfig, version: str = "v2", adain: bool = True,
             auxi: bool = False, decoder: bool = True, encoder: bool = True,
             dec_version: str = None):
    """All (torch_name, flax_path, kind) triples for a full prior model.

    version: "v2" (AdaIn) or "v3" (AdaIn_v2) encoder taps.
    adain=False: the plain backbone (DepthModel baseline — no style_mod*).
    auxi=True: include the AuxiNetV2/V1 branch (auxi_modules.*).
    decoder=False / encoder=False: restrict to a sub-model.
    dec_version: decoder-side cIMLE (Decoder_cIMLE, network_auxi.py:320-436)
    — "v2" (z-MLP AdaIn) or "v3".."v6" (image-conditioned AdaIn_v2) taps at
    progressively fewer of the 4 decoder positions; implies adain=False on
    the encoder side (DepthModel_cIMLE_v2 uses the plain backbone)."""
    if dec_version is not None:
        adain = False  # decoder-cIMLE models have a plain encoder
    pairs = []
    if encoder:
        pairs += [
            ("encoder_modules.conv1", "encoder.conv1", "conv"),
            ("encoder_modules.bn1", "encoder.BatchNorm_0", "bn"),
        ]
        if adain:
            fn = _adain_v2_pairs if version == "v3" else _adain_pairs
            for i in range(4):
                pairs += fn(
                    f"encoder_modules.style_mod{i}", f"encoder.style_mod{i}"
                )
        planes = (64, 128, 256, 512)
        expansion = 1 if cfg.block == "basic" else 4
        inplanes = 64
        for li in range(4):
            stride = 1 if li == 0 else 2
            out_ch = planes[li] * expansion
            for b in range(cfg.layers[li]):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != out_ch)
                pairs += _bottleneck_names(li + 1, b, has_ds, cfg.block)
                inplanes = out_ch
    if dec_version is not None:
        n_taps = {"v2": 4, "v3": 4, "v4": 3, "v5": 2, "v6": 1}[dec_version]
        fn = _adain_pairs if dec_version == "v2" else _adain_v2_pairs
        for i in range(n_taps):
            pairs += fn(
                f"decoder_modules.style_mod{i}", f"decoder.style_mod{i}"
            )
    if decoder:
        pairs += _ftb_pairs("decoder_modules.conv", "decoder.conv")
        pairs += [("decoder_modules.conv1", "decoder.conv1", "conv")]
        for name in ("ffm2", "ffm1", "ffm0"):
            pairs += _ftb_pairs(
                f"decoder_modules.{name}.ftb1", f"decoder.{name}.FTB_0"
            )
            pairs += _ftb_pairs(
                f"decoder_modules.{name}.ftb2", f"decoder.{name}.FTB_1"
            )
        pairs += [
            ("decoder_modules.outconv.adapt_conv.0", "decoder.outconv.Conv_0", "conv"),
            ("decoder_modules.outconv.adapt_conv.1", "decoder.outconv.BatchNorm_0", "bn"),
            ("decoder_modules.outconv.adapt_conv.3", "decoder.outconv.Conv_1", "conv"),
        ]
    if auxi:
        # AuxiNetV2/V1 (network_auxi.py:77-172): 5 AuxiBlocks + AO out_conv
        for bi in range(1, 6):
            tb = f"auxi_modules.auxi_block{bi}"
            ob = f"auxi.auxi_block{bi}"
            pairs += [
                (f"{tb}.conv1", f"{ob}.Conv_0", "conv"),
                (f"{tb}.bn1", f"{ob}.BatchNorm_0", "bn"),
                (f"{tb}.conv2", f"{ob}.Conv_1", "conv"),
                (f"{tb}.bn2", f"{ob}.BatchNorm_1", "bn"),
            ]
        pairs += [
            ("auxi_modules.out_conv.adapt_conv.0", "auxi.out_conv.Conv_0", "conv"),
            ("auxi_modules.out_conv.adapt_conv.1", "auxi.out_conv.BatchNorm_0", "bn"),
            ("auxi_modules.out_conv.adapt_conv.3", "auxi.out_conv.Conv_1", "conv"),
        ]
    return pairs


def _set(tree: dict, path: str, leaf: str, value):
    node = tree
    for part in path.split("."):
        node = node.setdefault(part, {})
    node[leaf] = value


def params_from_torch_state_dict(state_dict: dict, cfg: PriorConfig,
                                 **map_kwargs):
    """Translate a reference prior state_dict → (params, batch_stats) trees.
    Accepts torch tensors or numpy arrays; missing keys raise KeyError with
    the torch name (so partial loads are explicit). ``map_kwargs`` select the
    model variant (see name_map: version/adain/auxi)."""
    sd = _strip(state_dict)

    def get(name):
        v = sd[name]
        return np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32
        )

    params: dict = {}
    batch_stats: dict = {}
    for torch_name, flax_path, kind in name_map(cfg, **map_kwargs):
        tn = torch_name
        if kind == "conv":
            _set(params, flax_path, "kernel", _conv_w(get(tn + ".weight")))
            if tn + ".bias" in sd:
                _set(params, flax_path, "bias", get(tn + ".bias"))
        elif kind == "linear":
            _set(params, flax_path, "kernel", _lin_w(get(tn + ".weight")))
            _set(params, flax_path, "bias", get(tn + ".bias"))
        elif kind == "bn":
            _set(params, flax_path, "scale", get(tn + ".weight"))
            _set(params, flax_path, "bias", get(tn + ".bias"))
            _set(batch_stats, flax_path, "mean", get(tn + ".running_mean"))
            _set(batch_stats, flax_path, "var", get(tn + ".running_var"))
    return params, batch_stats


def _get(tree: dict, path: str, leaf: str):
    node = tree
    for part in path.split("."):
        node = node[part]
    return np.asarray(node[leaf])


def params_to_torch_state_dict(params: dict, batch_stats: dict,
                               cfg: PriorConfig, **map_kwargs) -> dict:
    """Inverse translation: our flax trees → reference-name numpy state_dict
    (for exporting checkpoints the reference tooling can read)."""
    sd = {}
    for torch_name, flax_path, kind in name_map(cfg, **map_kwargs):
        if kind == "conv":
            sd[torch_name + ".weight"] = np.transpose(
                _get(params, flax_path, "kernel"), (3, 2, 0, 1)
            )
            try:
                sd[torch_name + ".bias"] = _get(params, flax_path, "bias")
            except KeyError:
                pass
        elif kind == "linear":
            sd[torch_name + ".weight"] = _get(params, flax_path, "kernel").T
            sd[torch_name + ".bias"] = _get(params, flax_path, "bias")
        elif kind == "bn":
            sd[torch_name + ".weight"] = _get(params, flax_path, "scale")
            sd[torch_name + ".bias"] = _get(params, flax_path, "bias")
            sd[torch_name + ".running_mean"] = _get(batch_stats, flax_path, "mean")
            sd[torch_name + ".running_var"] = _get(batch_stats, flax_path, "var")
    return sd


def check_translation(variables, params, batch_stats):
    """Verify translated trees are shape-compatible with model-initialized
    variables. Returns a list of mismatch strings (empty = ok)."""
    import jax

    problems = []

    def cmp(tree_a, tree_b, which):
        a_leaves = jax.tree_util.tree_leaves_with_path(tree_a)
        b = tree_b
        for path, leaf in a_leaves:
            node = b
            ok = True
            for p in path:
                k = getattr(p, "key", None)
                if k is None or k not in node:
                    ok = False
                    break
                node = node[k]
            if not ok:
                problems.append(f"{which}: missing {path}")
            elif tuple(np.shape(node)) != tuple(leaf.shape):
                problems.append(
                    f"{which}: shape {path}: {np.shape(node)} vs {leaf.shape}"
                )

    cmp(variables["params"], params, "params")
    cmp(variables["batch_stats"], batch_stats, "batch_stats")
    return problems
