"""Data-parallel prior training (scade_tpu/prior/train.py
make_train_step_dp): one step on an 8-device mesh must equal the
single-device step — same global math, XLA inserts the gradient/BN psums
(the reference's prior trainer is single-GPU; its torch.distributed
helpers are runtime-dead, comm.py / train_dataparallel.py:217-219)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scade_tpu.parallel.mesh import make_mesh
from scade_tpu.prior.model import PriorConfig, init_prior, zero_shifts
from scade_tpu.prior.train import (
    PriorTrainConfig,
    make_prior_optimizer,
    make_train_step,
    make_train_step_dp,
)


@pytest.fixture(scope="module")
def setup():
    cfg = PriorConfig(d_latent=8).with_small()
    S = 32
    model, variables = init_prior(jax.random.PRNGKey(0), cfg,
                                  image_size=(S, S))
    tc = PriorTrainConfig(d_latent=8, mini_batch_size=2)
    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "depth": jnp.asarray(rng.uniform(0.5, 9.0, (B, S, S, 1)),
                             jnp.float32),
        "rgb": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.float32),
        "planes": jnp.asarray(rng.integers(0, 3, (B, S, S)), jnp.int32),
        "focal_length": jnp.full((B,), 250.0),
        "quality_flg": jnp.full((B,), 3, jnp.int32),
    }
    z = jnp.asarray(rng.normal(0, 1, (B, 8)), jnp.float32)
    shifts = zero_shifts(cfg)
    return model, variables, tc, batch, z, shifts


def _run(step_fn, variables, tc, batch, z, shifts, opt):
    params = jax.tree.map(jnp.copy, variables["params"])
    stats = jax.tree.map(jnp.copy, variables["batch_stats"])
    opt_state = opt.init(params)
    params, stats, opt_state, total, loss_dict = step_fn(
        params, stats, opt_state, shifts, batch, z, jax.random.PRNGKey(7))
    return params, stats, np.asarray(total), loss_dict


def test_dp_step_matches_single_device(setup):
    model, variables, tc, batch, z, shifts = setup
    opt = make_prior_optimizer(variables["params"], tc)

    single = make_train_step(model, tc, opt)
    p1, s1, t1, _ = _run(single, variables, tc, batch, z, shifts, opt)

    mesh = make_mesh()  # 8 virtual CPU devices (tests/conftest.py)
    assert mesh.devices.size == 8
    dp = make_train_step_dp(model, tc, opt, mesh)
    p8, s8, t8, _ = _run(dp, variables, tc, batch, z, shifts, opt)

    np.testing.assert_allclose(t8, t1, rtol=1e-5, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
    # BN batch stats (computed over the GLOBAL batch) must agree too
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s8)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def test_dp_step_output_shardings(setup):
    """Params come back replicated; a second step accepts them directly."""
    model, variables, tc, batch, z, shifts = setup
    opt = make_prior_optimizer(variables["params"], tc)
    mesh = make_mesh()
    dp = make_train_step_dp(model, tc, opt, mesh)
    params = jax.tree.map(jnp.copy, variables["params"])
    stats = jax.tree.map(jnp.copy, variables["batch_stats"])
    opt_state = opt.init(params)
    params, stats, opt_state, total, _ = dp(
        params, stats, opt_state, shifts, batch, z, jax.random.PRNGKey(1))
    params, stats, opt_state, total2, _ = dp(
        params, stats, opt_state, shifts, batch, z, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(total2))
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.sharding.is_fully_replicated


def test_mixed_precision_step_tracks_f32(setup):
    """compute_dtype=bfloat16 (f32 master params, bf16 fwd/bwd) must run,
    keep every state leaf f32, and produce a loss close to the f32 step's."""
    import dataclasses

    model, variables, tc, batch, z, shifts = setup
    opt = make_prior_optimizer(variables["params"], tc)
    p32, s32, total32, _ = _run(
        make_train_step(model, tc, opt), variables, tc, batch, z, shifts, opt)

    tc16 = dataclasses.replace(tc, compute_dtype="bfloat16")
    opt16 = make_prior_optimizer(variables["params"], tc16)
    p16, s16, total16, _ = _run(
        make_train_step(model, tc16, opt16), variables, tc16, batch, z,
        shifts, opt16)

    for leaf in jax.tree.leaves(p16) + jax.tree.leaves(s16):
        assert leaf.dtype == jnp.float32, leaf.dtype
    assert np.isfinite(total16)
    # bf16 has ~3 decimal digits; the losses must agree to a few percent
    assert abs(total16 - total32) / (abs(total32) + 1e-6) < 0.05, (
        total16, total32)
    # and the parameter update must move in (approximately) the same
    # direction: cosine similarity of the flattened updates
    d32 = np.concatenate([
        (np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(p32),
                        jax.tree.leaves(variables["params"]))])
    d16 = np.concatenate([
        (np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(p16),
                        jax.tree.leaves(variables["params"]))])
    cos = float(d32 @ d16 / (np.linalg.norm(d32) * np.linalg.norm(d16) + 1e-12))
    assert cos > 0.9, cos
