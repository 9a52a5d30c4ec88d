"""Fused Pallas PE+MLP kernel parity vs the pure-jnp reference path.

Runs in Pallas interpret mode (CPU); the driver/bench exercise the compiled
TPU path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from scade_tpu.models.nerf import NeRFConfig, nerf_apply, nerf_init
from scade_tpu.ops import fused_mlp
from scade_tpu.ops.embedding import Embedder, positional_encoding


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setattr(fused_mlp.pl, "pallas_call", interp)


def make_setup(F=4, N=300):
    emb = Embedder(input_dims=3, num_freqs=F, max_freq_log2=float(F - 1))
    ncfg = NeRFConfig(
        D=8, W=256, input_ch=emb.out_dim, input_ch_views=3, use_viewdirs=True
    )
    params = nerf_init(jax.random.PRNGKey(0), ncfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    fcfg = fused_mlp.FusedCfg(8, 256, F, (4,))
    return emb, ncfg, params, pts, dirs, fcfg


def test_forward_parity_with_padding():
    emb, ncfg, params, pts, dirs, fcfg = make_setup()
    x = jnp.concatenate([positional_encoding(pts, emb), dirs], -1)
    ref = nerf_apply(params, ncfg, x)
    # N=300 is not a tile multiple — exercises the padding path
    out = fused_mlp.fused_nerf_apply(params, fcfg, pts, dirs, 256, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradient_parity():
    emb, ncfg, params, pts, dirs, fcfg = make_setup(N=128)
    x = jnp.concatenate([positional_encoding(pts, emb), dirs], -1)

    g_fused = jax.grad(
        lambda p: jnp.sum(
            fused_mlp.fused_nerf_apply(p, fcfg, pts, dirs, 128, jnp.float32) ** 2
        )
    )(params)
    g_ref = jax.grad(lambda p: jnp.sum(nerf_apply(p, ncfg, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_renderer_dispatch_parity():
    from scade_tpu.render.renderer import SceneVars, make_render_config, render_rays

    rc = make_render_config(multires=4, n_samples=8, n_importance=16)
    rc_fused = make_render_config(
        multires=4, n_samples=8, n_importance=16, use_fused=True, fused_tile=256
    )
    kc, kf, ko, kd = jax.random.split(jax.random.PRNGKey(0), 4)
    scene = SceneVars(
        params_coarse=nerf_init(kc, rc.nerf_coarse),
        params_fine=nerf_init(kf, rc.nerf_fine),
        bb_center=jnp.zeros((3,)),
        bb_scale=jnp.float32(0.5),
        embedded_cam=jnp.zeros((0,)),
    )
    rays_o = jax.random.normal(ko, (32, 3)) * 0.1
    rays_d = jax.random.normal(kd, (32, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    out_ref = render_rays(scene, rc.test_mode(), rays_o, rays_d, 0.1, 10.0)
    out_fused = render_rays(scene, rc_fused.test_mode(), rays_o, rays_d, 0.1, 10.0)
    np.testing.assert_allclose(
        np.asarray(out_fused["rgb_map"]), np.asarray(out_ref["rgb_map"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_fused["depth_map"]), np.asarray(out_ref["depth_map"]),
        atol=1e-4,
    )


def test_supports_fusion_gating():
    emb = Embedder(input_dims=3, num_freqs=4, max_freq_log2=3.0)
    emb_id = Embedder(input_dims=3, identity=True)
    ncfg = NeRFConfig(use_viewdirs=True)
    assert fused_mlp.supports_fusion(ncfg, emb, None, 0)
    assert not fused_mlp.supports_fusion(ncfg, emb_id, None, 0)
    assert not fused_mlp.supports_fusion(ncfg, emb, None, 4)  # cam latent
    ncfg_nv = NeRFConfig(use_viewdirs=False)
    assert not fused_mlp.supports_fusion(ncfg_nv, emb, None, 0)
