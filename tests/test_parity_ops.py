"""Golden parity tests: our jnp ops vs the reference's torch outputs
(pinned to tests/golden/*.npz by tools/gen_goldens.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import load_golden

from scade_tpu.ops import (
    compute_space_carving_loss,
    get_embedder,
    get_rays,
    positional_encoding,
    raw2outputs,
    sample_pdf,
)


@pytest.mark.parametrize("multires", [9, 10, 4, 0])
def test_embedding_parity(multires):
    g = load_golden(f"embed_multires{multires}")
    emb = get_embedder(multires, 0)
    y = positional_encoding(jnp.asarray(g["x"]), emb)
    assert y.shape == g["y"].shape
    np.testing.assert_allclose(np.asarray(y), g["y"], rtol=1e-5, atol=1e-5)


def test_embedding_identity():
    g = load_golden("embed_multires9")
    emb = get_embedder(9, -1)
    y = positional_encoding(jnp.asarray(g["x"]), emb)
    np.testing.assert_array_equal(np.asarray(y), g["x"])
    assert emb.out_dim == 3


def test_rays_parity():
    g = load_golden("rays")
    H, W = int(g["H"]), int(g["W"])
    ro, rd = get_rays(H, W, jnp.asarray(g["intr"]), jnp.asarray(g["c2w"]))
    np.testing.assert_allclose(np.asarray(ro), g["rays_o"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), g["rays_d"], rtol=1e-5, atol=1e-5)


def test_rays_at_coords_parity():
    g = load_golden("rays")
    H, W = int(g["H"]), int(g["W"])
    ro, rd = get_rays(
        H, W, jnp.asarray(g["intr"]), jnp.asarray(g["c2w"]),
        coords=jnp.asarray(g["coords"]),
    )
    np.testing.assert_allclose(np.asarray(ro), g["rays_o_c"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), g["rays_d_c"], rtol=1e-5, atol=1e-5)


def test_sample_pdf_parity():
    g = load_golden("sample_pdf")
    s = sample_pdf(jnp.asarray(g["bins"]), jnp.asarray(g["weights"]), jnp.asarray(g["u"]))
    np.testing.assert_allclose(np.asarray(s), g["samples"], rtol=1e-4, atol=1e-4)


def test_sample_pdf_det_parity():
    g = load_golden("sample_pdf")
    n_rays = g["bins"].shape[0]
    u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 64), (n_rays, 64))
    s = sample_pdf(jnp.asarray(g["bins"]), jnp.asarray(g["weights"]), u)
    np.testing.assert_allclose(np.asarray(s), g["samples_det"], rtol=1e-4, atol=1e-4)


def test_sample_pdf_joint_parity():
    g = load_golden("sample_pdf")
    s = sample_pdf(
        jnp.asarray(g["bins"]), jnp.asarray(g["weights"]), jnp.asarray(g["u_joint"])
    )
    np.testing.assert_allclose(np.asarray(s), g["samples_joint"], rtol=1e-4, atol=1e-4)


def test_sample_pdf_onehot_masked_bit_identical():
    """The MXU one-hot form and the VPU masked-reduction form of the
    inverse CDF must agree bitwise — values AND gradients (the P_depth
    draws backprop into the fine weights via the space-carving loss)."""
    import jax

    from scade_tpu.ops.sampling import sample_pdf_masked, sample_pdf_onehot

    g = load_golden("sample_pdf")
    bins = jnp.asarray(g["bins"])
    weights = jnp.asarray(g["weights"])
    for u in (jnp.asarray(g["u"]), jnp.asarray(g["u_joint"]),
              jnp.broadcast_to(jnp.linspace(0.0, 1.0, 64),
                               (bins.shape[0], 64))):
        a = np.asarray(sample_pdf_masked(bins, weights, u))
        b = np.asarray(sample_pdf_onehot(bins, weights, u))
        np.testing.assert_array_equal(a, b)

        ga = jax.grad(lambda w: jnp.sum(sample_pdf_masked(bins, w, u) ** 2))(
            weights
        )
        gb = jax.grad(lambda w: jnp.sum(sample_pdf_onehot(bins, w, u) ** 2))(
            weights
        )
        # grads agree up to subgradient tie choice (zero-weight bins make
        # exact cdf ties; max-VJP splits them, the one-hot picks one) and
        # accumulation order — tolerance scales with the gradient magnitude
        ga, gb = np.asarray(ga), np.asarray(gb)
        np.testing.assert_allclose(
            ga, gb, rtol=2e-5, atol=1e-5 * np.abs(ga).max()
        )

    # degenerate rows: all weight in one bin (u lands beyond cdf[-2]),
    # u exactly 0, u exactly on a cdf knot
    bins2 = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (3, 8))
    w2 = jnp.stack([
        jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]),
        jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        jnp.full((7,), 1.0 / 7.0),
    ])
    cdf_knot = float(np.asarray(
        (w2[2, 0] + 1e-5) / (jnp.sum(w2[2]) + 7e-5)
    ))
    u2 = jnp.stack([
        jnp.asarray([0.0, 0.5, 0.999999]),
        jnp.asarray([0.0, 0.5, 0.999999]),
        jnp.asarray([0.0, cdf_knot, 1.0 - 1e-7]),
    ])
    a = np.asarray(sample_pdf_masked(bins2, w2, u2))
    b = np.asarray(sample_pdf_onehot(bins2, w2, u2))
    np.testing.assert_array_equal(a, b)


def test_sample_pdf_bucketed_bit_identical():
    """The two-level bucketed inverse CDF must match the masked form
    bitwise at the shapes that matter: the P_depth site (M = 192 bins over
    the merged 64+128 z's) and the importance site (M = 63), plus
    non-multiple-of-bucket M, the all-true u=1.0 row, degenerate weights,
    and gradients."""
    import jax

    from scade_tpu.ops.sampling import sample_pdf_bucketed, sample_pdf_masked

    key = jax.random.key(7)
    for m, s_draws in ((192, 128), (191, 128), (63, 128), (100, 37), (17, 5)):
        k1, k2, k3, key = jax.random.split(key, 4)
        n = 33
        bins = jnp.sort(jax.random.uniform(k1, (n, m), minval=0.5, maxval=6.0),
                        axis=-1)
        weights = jax.random.uniform(k2, (n, m - 1)) ** 2
        # zero out some rows' weights to exercise the 1e-5-floor path
        weights = weights.at[:3].set(0.0)
        for u in (
            jax.random.uniform(k3, (n, s_draws)),
            jnp.broadcast_to(jnp.linspace(0.0, 1.0, s_draws), (n, s_draws)),
        ):
            a = np.asarray(sample_pdf_masked(bins, weights, u))
            b = np.asarray(sample_pdf_bucketed(bins, weights, u))
            np.testing.assert_array_equal(a, b, err_msg=f"M={m}")

        u = jax.random.uniform(k3, (n, s_draws))
        ga = jax.grad(lambda w: jnp.sum(sample_pdf_masked(bins, w, u) ** 2))(
            weights
        )
        gb = jax.grad(lambda w: jnp.sum(sample_pdf_bucketed(bins, w, u) ** 2))(
            weights
        )
        ga, gb = np.asarray(ga), np.asarray(gb)
        np.testing.assert_allclose(
            ga, gb, rtol=2e-5, atol=1e-5 * max(np.abs(ga).max(), 1e-30),
            err_msg=f"M={m}",
        )


def test_sample_pdf_monotone_bounds():
    g = load_golden("sample_pdf")
    s = np.asarray(
        sample_pdf(jnp.asarray(g["bins"]), jnp.asarray(g["weights"]), jnp.asarray(g["u"]))
    )
    assert (s >= g["bins"].min(-1, keepdims=True) - 1e-5).all()
    assert (s <= g["bins"].max(-1, keepdims=True) + 1e-5).all()


@pytest.mark.parametrize("is_joint", [False, True])
@pytest.mark.parametrize("threshold", [0.0, 0.5])
def test_space_carving_parity(is_joint, threshold):
    g = load_golden("space_carving")
    loss = compute_space_carving_loss(
        jnp.asarray(g["pred"]), jnp.asarray(g["hyp"]),
        is_joint=is_joint, threshold=threshold,
    )
    ref = g[f"loss_j{int(is_joint)}_t{threshold}"]
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("is_joint", [False, True])
def test_space_carving_mask_parity(is_joint):
    g = load_golden("space_carving")
    loss = compute_space_carving_loss(
        jnp.asarray(g["pred"]), jnp.asarray(g["hyp"]),
        is_joint=is_joint, mask=jnp.asarray(g["mask"]),
    )
    ref = g[f"loss_mask_j{int(is_joint)}"]
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5, atol=1e-6)


def test_raw2outputs_parity():
    g = load_golden("raw2outputs")
    rgb_map, disp_map, acc_map, weights, depth_map = raw2outputs(
        jnp.asarray(g["raw"]), jnp.asarray(g["z_vals"]), jnp.asarray(g["rays_d"])
    )
    np.testing.assert_allclose(np.asarray(weights), g["weights"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_map), g["rgb_map"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth_map), g["depth_map"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_map), g["acc_map"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(disp_map), g["disp_map"], rtol=1e-4, atol=1e-5)
