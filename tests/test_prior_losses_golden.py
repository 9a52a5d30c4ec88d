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


def test_pwn_planes_parity(torch_ref):
    """Exact-value parity for the PWN-planes loss with sampling aligned on
    both sides: torch.randperm → arange makes the reference take the first
    3*groups valid pixels per plane in row-major order; masked_sample is
    monkeypatched to the same deterministic law. Pins the uvz-space filter,
    the |depth| xyz transform, the <2-groups plane gate, and the global
    denominator against the live reference module."""
    import importlib

    torch = pytest.importorskip("torch")
    PWN = importlib.import_module("lib.models.PWN_planes")

    B, H, W = 1, 32, 32
    f = 300.0
    groups = 16  # select_size 48 <= each plane's pixel count
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.4, 6.0, (B, H, W, 1)).astype(np.float32)
    pred[0, 5:7, 3:9, 0] *= -1.0  # negative region: exercises |depth| x/y
    planes = np.zeros((B, H, W), np.int32)
    planes[0, 2:10] = 1    # 256 px
    planes[0, 14:24] = 2   # 320 px (distinct size keys the perm map)

    # one fixed priority per pixel drives the "shuffle" on BOTH sides: the
    # reference permutes its row-major valid list, we argsort valid pixels
    # by the same priorities — identical groups. (A plain arange perm makes
    # every group 3 consecutive pixels → collinear → all filtered.)
    r_flat = rng.uniform(size=H * W).astype(np.float64)
    perm_by_n = {}
    for m in (1, 2):
        vidx = np.flatnonzero(planes[0].ravel() == m)
        perm_by_n[len(vidx)] = np.argsort(r_flat[vidx])

    # ---- reference side (torch, CPU, deterministic randperm) -------------
    ref_loss_mod = PWN.PWNPlanesLoss(
        focal_x=f, focal_y=f, input_size=(H, W), sample_groups=groups,
        xyz_mode="xyz",
    )
    orig_randperm = torch.randperm
    torch.randperm = lambda n, *a, **k: torch.from_numpy(perm_by_n[int(n)])
    try:
        pred_t = torch.from_numpy(pred[0].transpose(2, 0, 1))  # (1, H, W)
        mask_planes = torch.stack(
            [torch.from_numpy((planes[0] == m)[None]) for m in (1, 2)], 0
        )  # (x, 1, H, W)
        pw_groups, mask_valid = ref_loss_mod.select_points_groups(
            pred_t[None], mask_planes
        )
        ref_total, ref_count = 0.0, 0
        for j in range(2):
            l, n = ref_loss_mod.constrain_a_plane_loss(
                pw_groups[j], mask_valid[j]
            )
            ref_total += float(l)
            ref_count += int(n)
        ref_val = ref_total / (ref_count + 1e-8)
    finally:
        torch.randperm = orig_randperm

    # ---- our side (deterministic masked_sample: first-n valid, row-major)
    r_j = jnp.asarray(r_flat)

    def det_sample(key, mask_flat, n):
        score = jnp.where(mask_flat, r_j, 2.0)  # valid pixels by priority
        order = jnp.argsort(score)
        return order[:n], jnp.sum(mask_flat) > 0

    orig_sample = L.masked_sample
    L.masked_sample = det_sample
    try:
        # impl="cdf": the deterministic-sampling monkeypatch above routes
        # through masked_sample; the perm impl is pinned bit-identical to
        # cdf separately (tests/test_prior.py::test_pwn_planes_perm_matches_cdf)
        ours = float(jnp.sum(L.pwn_planes_loss(
            jax.random.PRNGKey(0), jnp.asarray(pred), jnp.asarray(pred),
            jnp.asarray(planes), jnp.full((B,), f), sample_groups=groups,
            max_planes=4, impl="cdf",
        )))
    finally:
        L.masked_sample = orig_sample

    assert ref_count > 0  # the comparison is non-vacuous
    np.testing.assert_allclose(ours, ref_val, rtol=0, atol=2e-5)

def test_pwn_edge_maps_parity(torch_ref):
    """The deterministic edge maps feeding pwn_edge_loss's pair sampling
    match the live reference: getEdge on rgb (red channel), getNormalEdge
    on the gt normals, the 5-px border zeroing, and the dilated gt-depth
    edge masking (PWN_edges.py:139-192)."""
    import importlib
    import torch.nn.functional as F

    torch, _, _, SN, _ = torch_ref
    PWN = importlib.import_module("lib.models.PWN_edges")

    H, W = 32, 40
    rng = np.random.default_rng(4)
    rgb = rng.normal(size=(1, H, W, 3)).astype(np.float32)
    gt = rng.uniform(0.3, 9.5, (1, H, W, 1)).astype(np.float32)
    gt[0, 10:14, 5:9] = -1.0  # invalid region
    focal = np.array([210.0], np.float32)

    # ---- reference side: getEdge/getNormalEdge + forward's masking block
    ref_loss = PWN.EdgeguidedNormalRegressionLoss()
    gt_t = torch.from_numpy(_nchw(gt))
    normals_t = SN.surface_normal_from_depth(
        gt_t, torch.from_numpy(focal), valid_mask=(gt_t > -1e-8)
    )
    e_img, t_img = ref_loss.getEdge(torch.from_numpy(_nchw(rgb)))
    e_nrm, t_nrm = ref_loss.getNormalEdge(normals_t)
    mask_border = torch.ones_like(e_nrm)
    mask_border[:, :, 5:-5, 5:-5] = 0
    e_nrm[mask_border.bool()] = 0
    e_dep, _ = ref_loss.getEdge(gt_t)
    dep_mask = e_dep.ge(e_dep.max() * 0.1)
    dil = torch.clamp(
        F.conv2d(dep_mask.float(), ref_loss.kernel, padding=(1, 1)), 0, 1
    ).bool()
    e_nrm[dil] = 0
    e_img[dil] = 0

    # ---- our side: same gt normals (normal parity is tested separately)
    n_g = jnp.asarray(np.transpose(normals_t.numpy(), (0, 2, 3, 1))[0])
    ours = L.pwn_edge_maps(jnp.asarray(rgb[0]), n_g, jnp.asarray(gt[0]))
    for o, r, tol, name in (
        (ours[0], e_img, 1e-4, "edges_img"),
        (ours[1], t_img, 1e-5, "thetas_img"),
        (ours[2], e_nrm, 1e-4, "edges_normal"),
        (ours[3], t_nrm, 1e-5, "thetas_normal"),
    ):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy()[0, 0], rtol=1e-4, atol=tol,
            err_msg=name,
        )
