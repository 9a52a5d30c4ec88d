"""Deterministic prior-loss parity vs the reference torch modules (the
sampling-based losses can't match bitwise across RNG regimes; these four
are deterministic and must match): ILNR, MSGIL, surface normals, and the
closed-form scale/shift recovery. Skipped without /root/reference."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scade_tpu.prior import losses as L

REF = "/root/reference/ambiguity_aware_prior"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def torch_ref():
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

    # ILNR/MSGIL construct tensors with .cuda() via torch.tensor(...).cuda()
    # handled by the no-op; the transform() path also calls .cuda() on stacked
    # tensors — same no-op.
    import importlib

    ILNR = importlib.import_module("lib.models.ILNR_loss")
    MSGIL = importlib.import_module("lib.models.MSGIL_loss")
    SN = importlib.import_module("lib.models.Surface_normal")
    MD = importlib.import_module("lib.models.multi_depth_model_auxiv2")
    return torch, ILNR, MSGIL, SN, MD


def _data(B=2, H=24, W=32, seed=0):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(0.3, 9.5, (B, H, W, 1)).astype(np.float32)
    gt[0, :6] = -1.0  # invalid region exercises the masks
    pred = rng.uniform(0.3, 9.5, (B, H, W, 1)).astype(np.float32)
    return pred, gt


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def test_ilnr_parity(torch_ref):
    torch, ILNR, *_ = torch_ref
    pred, gt = _data()
    ref = ILNR.MEADSTD_TANH_NORM_Loss(valid_threshold=-1e-8)(
        torch.from_numpy(_nchw(pred)), torch.from_numpy(_nchw(gt))
    ).numpy()
    ours = np.asarray(L.ilnr_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_msgil_parity(torch_ref):
    torch, _, MSGIL, *_ = torch_ref
    pred, gt = _data(seed=1)
    ref = MSGIL.MSGIL_NORM_Loss(scale=4, valid_threshold=-1e-8)(
        torch.from_numpy(_nchw(pred)), torch.from_numpy(_nchw(gt))
    ).numpy()
    ours = np.asarray(L.msgil_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_surface_normal_parity(torch_ref):
    torch, _, _, SN, _ = torch_ref
    rng = np.random.default_rng(2)
    depth = rng.uniform(0.5, 5.0, (1, 24, 32, 1)).astype(np.float32)
    focal = np.array([210.0], np.float32)
    mask = depth > 0
    ref = SN.surface_normal_from_depth(
        torch.from_numpy(_nchw(depth)), torch.from_numpy(focal),
        valid_mask=torch.from_numpy(_nchw(mask)),
    ).numpy()
    ours = np.asarray(
        L.surface_normal_from_depth(
            jnp.asarray(depth), jnp.asarray(focal), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(
        ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4
    )


def test_recover_scale_shift_parity(torch_ref):
    torch, *_, MD = torch_ref
    pred, gt = _data(seed=3)
    ref = MD.recover_scale_shift_depth(
        torch.from_numpy(_nchw(pred)), torch.from_numpy(_nchw(gt)),
        min_threshold=-1e-8, max_threshold=10.1,
    ).numpy()
    ours = np.asarray(
        L.recover_scale_shift_depth(jnp.asarray(pred), jnp.asarray(gt))
    )
    np.testing.assert_allclose(
        ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
    )
