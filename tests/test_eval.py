"""Eval-subsystem tests: LPIPS gating, camera-latent rendering +
test-time optimization, metrics writer layout."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scade_tpu.models.nerf import nerf_init
from scade_tpu.render.renderer import SceneVars, make_render_config, render_rays


def test_lpips_gated_to_nan_without_weights(tmp_path, monkeypatch):
    monkeypatch.setenv("SCADE_LPIPS_WEIGHTS", str(tmp_path / "missing.npz"))
    from scade_tpu.eval.lpips_jax import LPIPSAlex, available

    assert not available()
    fn = LPIPSAlex()
    assert not fn.ok
    assert np.isnan(fn(np.zeros((16, 16, 3)), np.ones((16, 16, 3))))


def test_lpips_forward_with_synthetic_weights(tmp_path, monkeypatch):
    # synthesize a weights file with the right shapes; checks the conv
    # pyramid + heads execute and produce a sane scalar
    rng = np.random.default_rng(0)
    chans = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
    data = {}
    for i, (o, c, k) in enumerate(chans):
        data[f"conv{i}_w"] = (rng.standard_normal((o, c, k, k)) * 0.05).astype(np.float32)
        data[f"conv{i}_b"] = np.zeros((o,), np.float32)
        data[f"lin{i}_w"] = np.abs(rng.standard_normal((o,))).astype(np.float32) * 0.1
    path = tmp_path / "lpips.npz"
    np.savez(path, **data)
    monkeypatch.setenv("SCADE_LPIPS_WEIGHTS", str(path))

    from scade_tpu.eval.lpips_jax import LPIPSAlex

    fn = LPIPSAlex()
    assert fn.ok
    img0 = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    same = fn(img0, img0)
    diff = fn(img0, 1.0 - img0)
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > same


def test_camera_latent_render_and_optimization():
    rc = make_render_config(
        multires=4, n_samples=8, n_importance=16, input_ch_cam=4
    )
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    scene = SceneVars(
        params_coarse=nerf_init(kc, rc.nerf_coarse),
        params_fine=nerf_init(kf, rc.nerf_fine),
        bb_center=jnp.zeros((3,)),
        bb_scale=jnp.float32(0.5),
        embedded_cam=jnp.zeros((4,), jnp.float32),
    )
    ko, kd = jax.random.split(jax.random.PRNGKey(1))
    rays_o = jax.random.normal(ko, (16, 3)) * 0.1
    rays_d = jax.random.normal(kd, (16, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    out0 = render_rays(scene, rc.test_mode(), rays_o, rays_d, 0.1, 8.0)
    scene2 = scene._replace(embedded_cam=jnp.ones((4,), jnp.float32))
    out1 = render_rays(scene2, rc.test_mode(), rays_o, rays_d, 0.1, 8.0)
    # the cam latent must affect the output (different latents → different rgb)
    assert float(jnp.abs(out0["rgb_map"] - out1["rgb_map"]).max()) > 0

    from scade_tpu.eval.evaluate import optimize_camera_embedding

    H = W = 8
    image = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (H, W, 3))
    )
    intr = np.array([8.0, 8.0, 4.0, 4.0], np.float32)
    pose = np.eye(4, dtype=np.float32)
    emb = optimize_camera_embedding(
        image, pose, H, W, intr, scene, rc, 0.1, 8.0,
        input_ch_cam=4, n_rand=16, steps=3, lr=0.1,
    )
    assert emb.shape == (4,)
    assert np.isfinite(np.asarray(emb)).all()


def test_embedded_cams_align_on_random_subset():
    """render_images_with_metrics(count=K) draws a random image subset;
    per-image camera latents must follow the image, not the loop counter —
    rendering image i with embedded_cams aligned to `indices` must give the
    same rgb whether i arrives via the full pass or the subset pass."""
    from scade_tpu.eval.evaluate import render_images_with_metrics

    rc = make_render_config(
        multires=2, n_samples=4, n_importance=8, input_ch_cam=4
    )
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    scene = SceneVars(
        params_coarse=nerf_init(kc, rc.nerf_coarse),
        params_fine=nerf_init(kf, rc.nerf_fine),
        bb_center=jnp.zeros((3,)),
        bb_scale=jnp.float32(0.5),
        embedded_cam=jnp.zeros((4,), jnp.float32),
    )
    H = W = 8
    n_img = 3
    rng0 = np.random.default_rng(0)
    images = rng0.uniform(0, 1, (n_img, H, W, 3)).astype(np.float32)
    depths = np.ones((n_img, H, W, 1), np.float32)
    valid = np.ones((n_img, H, W), bool)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_img, 1, 1))
    intr = np.tile(np.array([8.0, 8.0, 4.0, 4.0], np.float32), (n_img, 1))
    # distinct latents per image: misalignment changes the render
    cams = np.linspace(-1.0, 1.0, n_img * 4).astype(np.float32).reshape(n_img, 4)

    common = dict(
        indices=np.arange(n_img), images=images, depths=depths,
        valid_depths=valid, poses=poses, H=H, W=W, intrinsics=intr,
        scene=scene, rc=rc.test_mode(), near=0.1, far=8.0, chunk=256,
        verbose=False, embedded_cams=cams,
    )
    _, full = render_images_with_metrics(None, **common)
    # rng seeded so the subset is a strict shuffle/subsample of indices
    _, sub = render_images_with_metrics(
        2, rng=np.random.default_rng(7), **common
    )
    # recover which images the subset pass rendered by matching targets
    for k in range(2):
        tgt = sub["target_rgbs"][k]
        matches = [
            i for i in range(n_img)
            if np.array_equal(full["target_rgbs"][i], tgt)
        ]
        assert len(matches) == 1
        i = matches[0]
        np.testing.assert_array_equal(sub["rgbs"][k], full["rgbs"][i])
