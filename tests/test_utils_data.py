"""Tests for auxiliary inventory modules: error sources, dataset sampling,
depth-completion helpers, extra losses, checkpoint roundtrip, profiling."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_error_sources(rng):
    from scade_tpu.data.error_sources import (
        add_missing_depth,
        add_quadratic_depth_noise,
    )

    depth = jnp.asarray(rng.uniform(1, 5, (64, 64)), jnp.float32)
    valid = jnp.ones((64, 64), bool)
    # top-up semantics (reference error_sources.py:3-15): from fully valid,
    # the invalid fraction lands at ~p
    out, new_valid = add_missing_depth(jax.random.PRNGKey(0), depth, valid, p=0.3)
    frac_zero = float(jnp.mean((out == 0).astype(jnp.float32)))
    assert 0.2 < frac_zero < 0.4
    # already sparser than p → no-op
    sparse_valid = jnp.zeros((64, 64), bool).at[::8, ::8].set(True)
    sparse_depth = jnp.where(sparse_valid, depth, 0.0)
    out2, v2 = add_missing_depth(
        jax.random.PRNGKey(0), sparse_depth, sparse_valid, p=0.3
    )
    assert bool(jnp.all(v2 == sparse_valid))
    assert bool(jnp.all(out2 == sparse_depth))

    noisy = add_quadratic_depth_noise(jax.random.PRNGKey(1), depth, valid)
    assert noisy.shape == depth.shape
    assert float(jnp.min(noisy)) >= 0.0
    # reference coefficients: std at d=1 is a+b+c ≈ 0.056
    err = jnp.abs(noisy - depth)
    assert 0.02 < float(err.mean()) < 0.5
    # invalid pixels untouched
    noisy2 = add_quadratic_depth_noise(jax.random.PRNGKey(1), sparse_depth, sparse_valid)
    assert bool(jnp.all(jnp.where(sparse_valid, True, noisy2 == sparse_depth)))


def test_create_random_subsets():
    from scade_tpu.data.dataset_sampling import create_random_subsets

    # reference random_split sizing (data/dataset_sampling.py:4-16): every
    # subset gets >= subset_size samples — no short runt tail (the call
    # site passes 2*N_rand as a minimum batch size)
    subsets = create_random_subsets(range(100), 32, np.random.default_rng(0))
    assert [len(s) for s in subsets] == [33, 33, 34]
    assert sorted(np.concatenate(subsets).tolist()) == list(range(100))
    # exact division: equal subsets, no +1 extras
    even = create_random_subsets(range(96), 32, np.random.default_rng(0))
    assert [len(s) for s in even] == [32, 32, 32]
    # subset_size > N clamps to one subset of everything
    one = create_random_subsets(range(10), 32, np.random.default_rng(0))
    assert [len(s) for s in one] == [10]


def test_depth_completion_helpers():
    from scade_tpu.data.scannet_dataset import (
        convert_depth_completion_scaling_to_m,
        convert_m_to_depth_completion_scaling,
        get_pretrained_normalize,
        resize_sparse_depth,
    )

    x = np.array([0.5])
    np.testing.assert_allclose(
        convert_m_to_depth_completion_scaling(
            convert_depth_completion_scaling_to_m(x)
        ),
        x,
    )
    norm, unnorm = get_pretrained_normalize()
    assert norm["rgb"][0].shape == (3,)
    assert norm["rgbd"][0].shape == (4,)

    # sparsity-preserving resize: valid count is conserved on upsample
    depth = np.zeros((1, 8, 8))
    valid = np.zeros((1, 8, 8), bool)
    depth[0, 2, 3] = 1.5
    valid[0, 2, 3] = True
    out, out_valid = resize_sparse_depth(depth, valid, (16, 16))
    assert out_valid.sum() == 1
    assert out.max() == 1.5
    assert out[0, 5, 7] == 1.5  # (2.5*2, 3.5*2)


def test_quadratic_samples_and_monosdf():
    from scade_tpu.ops.losses import (
        compute_monosdf_styleloss,
        precompute_quadratic_samples,
    )

    z = precompute_quadratic_samples(0.5, 8.0, 64)
    assert z.shape == (64,)
    assert float(z[0]) == pytest.approx(0.5)
    assert float(z[-1]) == pytest.approx(8.0, rel=1e-5)
    assert np.all(np.diff(np.asarray(z)) > 0)

    pred = jnp.asarray(np.random.default_rng(0).uniform(1, 5, (128,)), jnp.float32)
    target = pred * 2.0 + 1.0
    # scale/shift-invariant: affine-related depths give ~zero loss
    assert float(compute_monosdf_styleloss(pred, target)) < 1e-4


def test_checkpoint_roundtrip(tmp_path):
    from scade_tpu.render.renderer import make_render_config
    from scade_tpu.train.step import TrainConfig, create_train_state
    from scade_tpu.utils.ckpt import (
        find_checkpoints,
        load_params_from_checkpoint,
        restore_train_state,
        save_checkpoint,
    )

    rc = make_render_config(multires=4, n_samples=8, n_importance=16)
    tc = TrainConfig(n_rand=32)
    state = create_train_state(jax.random.PRNGKey(0), rc, tc, n_images=3)
    state = state._replace(step=jnp.asarray(1234, jnp.int32))
    path = os.path.join(tmp_path, "exp", "001234.tar")
    save_checkpoint(path, state, rc)

    assert find_checkpoints(str(tmp_path), "exp") == [path]
    params, step, raw = load_params_from_checkpoint(path, rc)
    assert step == 1234
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    state2 = create_train_state(jax.random.PRNGKey(1), rc, tc, n_images=3)
    state2 = restore_train_state(path, state2, rc)
    assert int(state2.step) == 1234
    np.testing.assert_allclose(np.asarray(state2.scales), np.asarray(state.scales))
    # full optax state restored from our own ckpt
    for a, b in zip(jax.tree.leaves(state2.opt_state), jax.tree.leaves(state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_reference_ckpt_fast_forwards_lr(tmp_path):
    """Resuming a reference-schema ckpt (no optax state) must fast-forward
    the Adam count so the staircase LR resumes at the decayed rate."""
    import torch

    from scade_tpu.models.nerf import params_to_torch_state_dict
    from scade_tpu.render.renderer import make_render_config
    from scade_tpu.train.step import TrainConfig, create_train_state
    from scade_tpu.utils.ckpt import restore_train_state

    rc = make_render_config(multires=4, n_samples=8, n_importance=16)
    tc = TrainConfig(n_rand=32)
    state = create_train_state(jax.random.PRNGKey(0), rc, tc, n_images=2)
    # emulate a reference checkpoint: torch state dicts only
    ref = {
        "global_step": 450000,
        "network_fn_state_dict": {
            k: torch.from_numpy(v)
            for k, v in params_to_torch_state_dict(state.params["coarse"]).items()
        },
        "network_fine_state_dict": {
            k: torch.from_numpy(v)
            for k, v in params_to_torch_state_dict(state.params["fine"]).items()
        },
        "depth_shifts": torch.zeros((2, 1)),
        "depth_scales": torch.ones((2, 1)),
    }
    path = os.path.join(tmp_path, "400000.tar")
    torch.save(ref, path)

    restored = restore_train_state(path, state, rc)
    assert int(restored.step) == 450000
    counts = [
        int(l) for l in jax.tree.leaves(restored.opt_state)
        if hasattr(l, "shape") and l.shape == () and l.dtype == jnp.int32
    ]
    assert counts and all(c == 450000 for c in counts)


def test_step_timer_and_mean_tracker():
    from scade_tpu.utils.logging import MeanTracker, make_image_grid
    from scade_tpu.utils.profiling import StepTimer

    mt = MeanTracker()
    mt.add({"a": 1.0})
    mt.add({"a": 3.0})
    assert mt.get("a") == 2.0
    assert mt.has("a") and not mt.has("b")

    t = StepTimer(total_steps=100, warmup=0)
    for i in range(3):
        t.tic()
        t.toc()
    assert t.average >= 0
    assert "eta" in t.eta_string(50)

    grid = make_image_grid(np.zeros((4, 8, 8, 3)))
    assert grid.shape == (32, 8, 3)
    grid4 = make_image_grid(np.zeros((2, 8, 8, 4)))
    assert grid4.shape == (16, 16, 3)


def test_make_image_grid_unnormalize_roundtrip():
    """make_image_grid applies Normalize semantics (x-mean)/std to the
    inverted params from get_pretrained_normalize()[1], so a normalized
    batch comes back to the original pixel values (reference passes the
    torchvision unnormalize transform, train_utils/logging.py:53-55)."""
    import numpy as np

    from scade_tpu.data.scannet_dataset import get_pretrained_normalize
    from scade_tpu.utils.logging import make_image_grid

    norm, unnorm = get_pretrained_normalize()
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
    mean, std = norm["rgb"]
    rgb_n = (rgb - mean) / std
    grid = make_image_grid(rgb_n, unnormalize=unnorm)
    np.testing.assert_allclose(grid, np.concatenate(list(rgb), axis=0),
                               rtol=0, atol=1e-5)

    # rgbd: depth column passes through untouched
    depth = rng.uniform(0, 1, (2, 4, 4, 1)).astype(np.float32)
    rgbd_n = np.concatenate([rgb_n, depth], axis=-1)
    grid4 = make_image_grid(rgbd_n, unnormalize=unnorm)
    np.testing.assert_allclose(grid4[:, :4], np.concatenate(list(rgb), 0),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(
        grid4[:, 4:], np.concatenate(list(np.repeat(depth, 3, -1)), 0),
        rtol=0, atol=1e-6)


def test_read_depth_missing_file_returns_none(tmp_path):
    """A missing/None depth path yields (None, None) instead of the
    reference's TypeError crash (data/scannet_dataset.py:53-54), so dataset
    __getitem__ can zero-fill the example."""
    from scade_tpu.data.scannet_dataset import read_depth

    d, v = read_depth(str(tmp_path / "nope.png"))
    assert d is None and v is None
    d2, v2 = read_depth(None)
    assert d2 is None and v2 is None
