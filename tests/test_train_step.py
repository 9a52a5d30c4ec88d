"""Train-step tests: shapes, finiteness, gating semantics, and the
multi-chip sharded path on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scade_tpu.parallel.mesh import data_sharding, make_mesh, replicate, state_shardings
from scade_tpu.render.renderer import make_render_config
from scade_tpu.train.step import (
    SceneTensors,
    TrainConfig,
    create_train_state,
    make_train_step,
    staircase_lr,
)

H = W = 16
N_TRAIN, N_REL, K = 2, 3, 4


def tiny_scene(rng):
    return SceneTensors(
        images=jnp.asarray(rng.uniform(size=(N_REL, H, W, 3)), jnp.float32),
        poses=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N_REL, 4, 4)),
        intrinsics=jnp.broadcast_to(
            jnp.asarray([8.0, 8.0, 8.0, 8.0], jnp.float32), (N_REL, 4)
        ),
        hyps=jnp.asarray(rng.uniform(1.0, 5.0, size=(N_TRAIN, K, H, W, 1)), jnp.float32),
        near=jnp.float32(0.1),
        far=jnp.float32(10.0),
        bb_center=jnp.zeros((3,), jnp.float32),
        bb_scale=jnp.float32(1.0),
    )


def make_setup(tc=None, n_samples=8, n_importance=16):
    rc = make_render_config(multires=4, n_samples=n_samples, n_importance=n_importance)
    tc = tc or TrainConfig(n_rand=32)
    state = create_train_state(jax.random.PRNGKey(0), rc, tc, n_images=N_REL)
    return rc, tc, state


def test_train_step_runs_and_updates(rng):
    rc, tc, state = make_setup()
    scene = tiny_scene(rng)
    step = make_train_step(rc, tc, H, W, N_TRAIN, donate=False)
    new_state, metrics = step(state, scene, jax.random.PRNGKey(1))

    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["psnr"]))
    # params actually moved
    delta = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
    )
    assert max(jax.tree.leaves(delta)) > 0.0


def test_scale_shift_receive_gradients(rng):
    # space-carving loss backprops into the per-image depth scales/shifts
    tc = TrainConfig(n_rand=32, scaleshift_lr=1e-2)
    rc, tc, state = make_setup(tc)
    scene = tiny_scene(rng)
    step = make_train_step(rc, tc, H, W, N_TRAIN, donate=False)
    new_state, _ = step(state, scene, jax.random.PRNGKey(1))
    assert float(jnp.max(jnp.abs(new_state.scales - state.scales))) > 0.0


def test_freeze_ss_stops_scale_shift(rng):
    tc = TrainConfig(n_rand=32, scaleshift_lr=1e-2, freeze_ss=1)
    rc, tc, state = make_setup(tc)
    scene = tiny_scene(rng)
    step = make_train_step(rc, tc, H, W, N_TRAIN, donate=False)
    new_state, _ = step(state, scene, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(new_state.scales), np.asarray(state.scales)
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.shifts), np.asarray(state.shifts)
    )


def test_warm_start_gates_space_carving(rng):
    # with warm_start > step, the sc loss must not contribute to the total
    tc_on = TrainConfig(n_rand=32)
    tc_off = TrainConfig(n_rand=32, warm_start_nerf=10)
    rc, _, state = make_setup(tc_on)
    scene = tiny_scene(rng)
    _, m_on = make_train_step(rc, tc_on, H, W, N_TRAIN, donate=False)(
        state, scene, jax.random.PRNGKey(1)
    )
    _, m_off = make_train_step(rc, tc_off, H, W, N_TRAIN, donate=False)(
        state, scene, jax.random.PRNGKey(1)
    )
    expected_off = float(m_off["img_loss"]) + float(m_off["img_loss0"])
    assert abs(float(m_off["loss"]) - expected_off) < 1e-6
    assert float(m_on["loss"]) > float(m_off["loss"])


def test_pixel_sampling_modes(rng):
    """stratified: distinct in-range pixels, one per stratum, uniform
    marginals; choice: the reference's exact no-replacement law."""
    from scade_tpu.train.step import sample_ray_batch, select_pixels

    scene = tiny_scene(rng)
    for mode in ("stratified", "choice", "iid"):
        tc = TrainConfig(n_rand=32, pixel_sampling=mode)

        out = sample_ray_batch(jax.random.PRNGKey(3), scene, H, W, N_TRAIN, tc)
        rays_o, rays_d, target_s, target_h = out[:4]
        assert rays_o.shape == (32, 3) and target_s.shape == (32, 3)
        assert target_h.shape == (K, 32, 1)

        _, k_pix = jax.random.split(jax.random.PRNGKey(3))
        pix = np.asarray(select_pixels(k_pix, H, W, tc))
        assert pix.min() >= 0 and pix.max() < H * W
        if mode != "iid":
            assert len(np.unique(pix)) == 32, mode
        if mode == "stratified":
            # exactly one pixel per stratum of size HW/32
            strata = pix // (H * W // 32)
            np.testing.assert_array_equal(np.sort(strata), np.arange(32))

    # stratified marginals are uniform: each pixel p has P = n/HW
    hits = np.zeros(H * W)
    tcs = TrainConfig(n_rand=32, pixel_sampling="stratified")
    for i in range(200):
        _, k_pix = jax.random.split(jax.random.PRNGKey(i))
        hits[np.asarray(select_pixels(k_pix, H, W, tcs))] += 1
    # E[hits] = 200*32/256 = 25; a loose 5-sigma band
    assert hits.min() > 25 - 5 * np.sqrt(25)
    assert hits.max() < 25 + 5 * np.sqrt(25)


def test_stratified_distinct_nonintegral_stride():
    """H*W % n_rand != 0 (stride 9.375 here): the integer-boundary strata
    must still yield n_rand DISTINCT in-range pixels, each inside its own
    stratum — the float-stride form could duplicate across a non-integral
    boundary (review r3 finding)."""
    from scade_tpu.train.step import select_pixels

    Hn, Wn, n = 15, 20, 32  # 300 pixels, stride 9.375
    tc = TrainConfig(n_rand=n, pixel_sampling="stratified")
    b = np.arange(n + 1, dtype=np.int64) * (Hn * Wn) // n
    for i in range(50):
        pix = np.asarray(select_pixels(jax.random.PRNGKey(i), Hn, Wn, tc))
        assert pix.shape == (n,)
        assert pix.min() >= 0 and pix.max() < Hn * Wn
        assert len(np.unique(pix)) == n, f"duplicates at key {i}"
        assert (pix >= b[:-1]).all() and (pix < b[1:]).all()


def test_staircase_lr():
    # optax count c corresponds to reference iteration i = c + 1; the decay
    # boundary must fire AT iteration decay_step like the reference's
    # get_learning_rate(i) (train_utils/hyperparameter_update.py:9-13)
    tc = TrainConfig(lrate=5e-4, decay_step=100, decay_rate=0.1)
    sched = staircase_lr(tc)
    assert float(sched(0)) == pytest.approx(5e-4)  # i=1
    assert float(sched(98)) == pytest.approx(5e-4)  # i=99
    assert float(sched(99)) == pytest.approx(5e-5)  # i=100: boundary
    assert float(sched(249)) == pytest.approx(5e-6)  # i=250


def test_multichip_sharded_step(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh(jax.devices()[:8], n_model=2)
    rc = make_render_config(multires=4, n_samples=8, n_importance=16)
    tc = TrainConfig(n_rand=32)  # 8 rays per data-shard
    state = create_train_state(jax.random.PRNGKey(0), rc, tc, n_images=N_REL)
    state = jax.device_put(state, state_shardings(state, mesh, shard_model=True))
    scene = jax.device_put(tiny_scene(rng), replicate(mesh))

    with mesh:
        step = make_train_step(
            rc, tc, H, W, N_TRAIN, data_spec=data_sharding(mesh), donate=False
        )
        new_state, metrics = step(state, scene, jax.random.PRNGKey(1))
        jax.block_until_ready(new_state)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_device_count_equivalence(rng):
    """Same seed ⇒ same loss trajectory on (1 device) vs (8-dev mesh,
    data-parallel) vs (8-dev mesh, 2-way tensor parallel): the sharded
    program is the SAME math, not an approximation. Mirrors the reference's
    DataParallel invariance (global-batch loss normalization,
    run_scade_scannet.py:438-466 / SURVEY §5.8)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    rc = make_render_config(multires=4, n_samples=8, n_importance=16)
    tc = TrainConfig(n_rand=32)
    scene = tiny_scene(rng)

    def run(mesh, shard_model):
        state = create_train_state(jax.random.PRNGKey(0), rc, tc, n_images=N_REL)
        losses = []
        if mesh is None:
            step = make_train_step(rc, tc, H, W, N_TRAIN, donate=False)
            sc = scene
        else:
            state = jax.device_put(
                state, state_shardings(state, mesh, shard_model=shard_model)
            )
            sc = jax.device_put(scene, replicate(mesh))
        ctx = mesh if mesh is not None else _nullcontext()
        with ctx:
            if mesh is not None:
                step = make_train_step(
                    rc, tc, H, W, N_TRAIN, data_spec=data_sharding(mesh),
                    donate=False,
                )
            for i in range(3):
                state, metrics = step(state, sc, jax.random.PRNGKey(100 + i))
                losses.append(float(metrics["loss"]))
        return losses

    class _nullcontext:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    single = run(None, False)
    dp = run(make_mesh(jax.devices()[:8], n_model=1), False)
    tp = run(make_mesh(jax.devices()[:8], n_model=2), True)
    np.testing.assert_allclose(single, dp, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(single, tp, rtol=2e-5, atol=2e-6)


def test_tp_equivalence_wide_mlp(rng):
    """n_model=1 vs n_model=2 loss equality at netwidth 512, where the TP
    specs genuinely shard the hidden kernels (256 features per shard)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from jax.sharding import PartitionSpec as P

    rc = make_render_config(
        multires=4, n_samples=8, n_importance=16, netwidth=512, netwidth_fine=512
    )
    tc = TrainConfig(n_rand=32)
    scene = tiny_scene(rng)

    def run(n_model):
        mesh = make_mesh(jax.devices()[:8], n_model=n_model)
        state = create_train_state(jax.random.PRNGKey(0), rc, tc, n_images=N_REL)
        shardings = state_shardings(state, mesh, shard_model=n_model > 1)
        if n_model > 1:
            # the TP specs must actually shard: hidden kernels + their Adam
            # moments carry a model-axis spec, scales/shifts replicate
            flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
            sharded = [s.spec for p, s in flat if s.spec != P()]
            assert len(sharded) > 0
            assert shardings.scales.spec == P()
            assert shardings.shifts.spec == P()
            n_param = len(jax.tree.leaves(
                jax.tree.map(lambda s: s.spec != P(), shardings.params)
            ))
            n_opt = sum(
                1 for _, s in jax.tree_util.tree_flatten_with_path(
                    shardings.opt_state
                )[0] if s.spec != P()
            )
            assert n_opt > 0  # Adam mu/nu mirror the param specs
        state = jax.device_put(state, shardings)
        sc = jax.device_put(scene, replicate(mesh))
        with mesh:
            step = make_train_step(
                rc, tc, H, W, N_TRAIN, data_spec=data_sharding(mesh), donate=False
            )
            losses = []
            for i in range(2):
                state, metrics = step(state, sc, jax.random.PRNGKey(100 + i))
                losses.append(float(metrics["loss"]))
        return losses

    np.testing.assert_allclose(run(1), run(2), rtol=2e-5, atol=2e-6)


def test_state_shardings_path_based_not_shape_based():
    """A non-param state leaf whose SHAPE matches a shardable kernel must
    still replicate — sharding is matched by tree path, not shape
    (VERDICT r2 weak #5)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from jax.sharding import PartitionSpec as P

    rc = make_render_config(multires=4, n_samples=8, n_importance=16)
    tc = TrainConfig(n_rand=32)
    state = create_train_state(jax.random.PRNGKey(0), rc, tc, n_images=N_REL)
    # a future (4, 256) state leaf in place of scales: the old heuristic
    # (any 2-D leaf with shape[1] % 128 == 0) would silently shard it
    state = state._replace(scales=jnp.zeros((4, 256), jnp.float32))
    mesh = make_mesh(jax.devices()[:8], n_model=2)
    shardings = state_shardings(state, mesh, shard_model=True)
    assert shardings.scales.spec == P()
    # while actual kernels (and their Adam moments) do shard
    kernel_specs = [
        s.spec
        for p, s in jax.tree_util.tree_flatten_with_path(shardings.params)[0]
        if "kernel" in str(p)
    ]
    assert any(s != P() for s in kernel_specs)


def test_graft_entry_contracts():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (1024, 3)

    if len(jax.devices()) >= 8:
        mod.dryrun_multichip(8)
