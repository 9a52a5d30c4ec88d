#!/usr/bin/env python
"""Export LPIPS(alex) weights to the .npz scade_tpu.eval.lpips_jax loads.

Run this on any machine that has the `lpips` (and torch) package installed:

    python tools/export_lpips_weights.py [out.npz]

then place the file at ~/.cache/scade_tpu/lpips_alex.npz (or point
$SCADE_LPIPS_WEIGHTS at it). Without this file the eval pipeline reports
NaN for the lpips column and everything else works.

Keys written: conv{0..4}_{w,b} (torchvision AlexNet features convs, OIHW)
and lin{0..4}_w (the LPIPS learned 1x1 heads, shape (C,)).
"""

import os
import sys


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.expanduser(
        "~/.cache/scade_tpu/lpips_alex.npz"
    )
    try:
        import lpips
        import numpy as np
        import torch
    except ImportError as exc:
        sys.exit(f"needs the torch `lpips` package: {exc}")

    net = lpips.LPIPS(net="alex")
    data = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    conv_idx = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            data[f"conv{conv_idx}_w"] = m.weight.detach().numpy()
            data[f"conv{conv_idx}_b"] = m.bias.detach().numpy()
            conv_idx += 1
    assert conv_idx == 5, f"expected 5 convs, got {conv_idx}"
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        data[f"lin{i}_w"] = w.reshape(-1)

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    np.savez(out, **data)
    print(f"wrote {out}: {sorted(data.keys())}")


if __name__ == "__main__":
    main()
