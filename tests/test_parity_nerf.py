"""NeRF MLP parity: load reference torch-init weights (pinned in goldens)
through our state_dict translator and compare forward outputs."""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import load_golden

from scade_tpu.models.nerf import (
    NeRFConfig,
    nerf_apply,
    nerf_init,
    nerf_num_params,
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)
from scade_tpu.ops import get_embedder, positional_encoding


def _golden_state_dict(g):
    return {
        k[len("sd__"):].replace("__", "."): g[k]
        for k in g.files
        if k.startswith("sd__")
    }


def _cfg():
    return NeRFConfig(
        D=8, W=256, input_ch=57, input_ch_views=3, input_ch_cam=0,
        output_ch=5, skips=(4,), use_viewdirs=True,
    )


def test_forward_parity():
    g = load_golden("nerf_forward")
    cfg = _cfg()
    params = params_from_torch_state_dict(_golden_state_dict(g), cfg)

    emb = get_embedder(9, 0)
    x = jnp.concatenate(
        [positional_encoding(jnp.asarray(g["pts"]), emb), jnp.asarray(g["dirs"])],
        axis=-1,
    )
    raw = nerf_apply(params, cfg, x)
    np.testing.assert_allclose(np.asarray(raw), g["raw"], rtol=2e-4, atol=2e-4)


def test_state_dict_roundtrip():
    g = load_golden("nerf_forward")
    cfg = _cfg()
    sd = _golden_state_dict(g)
    params = params_from_torch_state_dict(sd, cfg)
    sd2 = params_to_torch_state_dict(params)
    for k, v in sd.items():
        np.testing.assert_array_equal(sd2["module." + k], v)


def test_init_shapes_and_stats():
    cfg = _cfg()
    params = nerf_init(jax.random.key(0), cfg)
    # same parameter count as the reference architecture
    g = load_golden("nerf_forward")
    ref_count = sum(int(np.prod(g[k].shape)) for k in g.files if k.startswith("sd__"))
    assert nerf_num_params(params) == ref_count
    # xavier bounds: relu layer 1 kernel within gain*sqrt(6/(in+out))
    k = params["pts_linears"][1]["kernel"]
    bound = np.sqrt(2.0) * np.sqrt(6.0 / (256 + 256))
    assert float(jnp.max(jnp.abs(k))) <= bound + 1e-6
    assert float(jnp.std(k)) > 0.3 * bound  # roughly uniform, not collapsed
    assert float(jnp.abs(params["pts_linears"][0]["bias"]).max()) == 0.0


def test_bfloat16_compute_close():
    g = load_golden("nerf_forward")
    cfg = _cfg()
    params = params_from_torch_state_dict(_golden_state_dict(g), cfg)
    emb = get_embedder(9, 0)
    x = jnp.concatenate(
        [positional_encoding(jnp.asarray(g["pts"]), emb), jnp.asarray(g["dirs"])],
        axis=-1,
    )
    import dataclasses

    raw_bf16 = nerf_apply(
        params, dataclasses.replace(cfg, compute_dtype=jnp.bfloat16), x
    )
    raw_f32 = nerf_apply(params, cfg, x)
    # head outputs stay f32 even with bf16 hidden activations (r4): the
    # compositing/loss pipeline downstream is dtype-unchanged
    assert raw_bf16.dtype == jnp.float32
    assert raw_f32.dtype == jnp.float32
    # bf16 matmuls with f32 accumulation stay close on this depth of net
    assert float(jnp.max(jnp.abs(raw_bf16 - raw_f32))) < 0.15


def test_pad_input_lanes_matches():
    """cfg.pad_input_lanes widens K0 57→64 with zero input columns and zero
    kernel rows (VERDICT r4 #2). Mathematically 0·w adds +0.0f per
    accumulator; XLA:CPU however retiles the K=64 contraction and
    reassociates the f32 sum, so CPU asserts a ~1-ulp-per-term bound. The
    MXU contracts both widths in one identical 128-wide pass — bitwise
    identity on the chip is asserted in the on-chip A/B (BASELINE.md r5)."""
    import dataclasses

    import jax

    g = load_golden("nerf_forward")
    cfg = _cfg()
    params = params_from_torch_state_dict(_golden_state_dict(g), cfg)
    emb = get_embedder(9, 0)
    x = jnp.concatenate(
        [positional_encoding(jnp.asarray(g["pts"]), emb), jnp.asarray(g["dirs"])],
        axis=-1,
    )
    for cd, tol in ((jnp.float32, 3e-6), (jnp.bfloat16, 3e-2)):
        base = dataclasses.replace(cfg, compute_dtype=cd)
        padded = dataclasses.replace(base, pad_input_lanes=True)
        a = np.asarray(jax.jit(nerf_apply, static_argnums=1)(params, base, x))
        b = np.asarray(jax.jit(nerf_apply, static_argnums=1)(params, padded, x))
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol)
