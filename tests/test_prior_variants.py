"""Decoder-side cIMLE variants + plain baseline + auxi loss branch."""

import numpy as np

import jax
import jax.numpy as jnp

from scade_tpu.prior.model import (
    DepthModelBaseline,
    DepthModelCIMLEDec,
    PriorConfig,
    zero_shifts_dec,
)

SMALL = PriorConfig(d_latent=8).with_small()


def test_decoder_cimle_versions():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    z1 = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
    z2 = jax.random.normal(jax.random.PRNGKey(2), (1, 8))
    sh = zero_shifts_dec(SMALL)
    for v in ("v2", "v3", "v6"):
        m = DepthModelCIMLEDec(SMALL, version=v)
        var = m.init(jax.random.PRNGKey(3), x, z1, sh)
        d1 = m.apply(var, x, z1, sh)
        d2 = m.apply(var, x, z2, sh)
        assert d1.shape == (1, 64, 64, 1)
        assert np.isfinite(np.asarray(d1)).all()
        # z must influence the decoder-injected output
        assert float(jnp.abs(d1 - d2).max()) > 0, v


def test_baseline_with_auxi_branch():
    m = DepthModelBaseline(SMALL)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    var = m.init(jax.random.PRNGKey(1), x)
    logit, auxi = m.apply(var, x)
    assert logit.shape == (1, 64, 64, 1)
    assert auxi.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(logit)).all()
    assert np.isfinite(np.asarray(auxi)).all()


def test_auxi_criterion():
    from scade_tpu.prior.losses import auxi_criterion

    rng = np.random.default_rng(0)
    B, H, W = 1, 24, 32
    disp = jnp.asarray(rng.uniform(0.1, 10, (B, H, W, 1)), jnp.float32)
    pred = disp + jnp.asarray(rng.normal(0, 0.2, (B, H, W, 1)), jnp.float32)
    batch = {
        "disp": disp,
        "rgb": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
    }
    lm = "_ranking-edge-auxi_msgil-normal-auxi_meanstd-tanh-auxi_"
    ld, total = auxi_criterion(jax.random.PRNGKey(0), pred, batch, lm)
    assert np.isfinite(np.asarray(total)).all()
    assert {"ranking-edge_auxiloss", "msg_normal_auxiloss",
            "meanstd-tanh_auxiloss", "total_loss"} <= set(ld)
    # no disp in batch → zero
    ld0, t0 = auxi_criterion(jax.random.PRNGKey(0), pred, {"rgb": batch["rgb"]}, lm)
    assert float(jnp.sum(t0)) == 0.0
