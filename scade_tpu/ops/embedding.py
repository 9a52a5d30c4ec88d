"""Positional (Fourier-feature) encoding.

Semantics follow the reference Embedder (reference: model/run_nerf_helpers.py:142-189):
output is ``[x, sin(pi*f0*x), cos(pi*f0*x), sin(pi*f1*x), cos(pi*f1*x), ...]``
with ``f_k = 2**k`` for log-sampled bands (``f_k`` linearly spaced between
``2**0`` and ``2**max_freq`` otherwise). The feature ordering is
frequency-major, then (sin, cos), then input dim — this exact layout is what
pretrained reference checkpoints assume for the first MLP layer.

TPU-first design: the reference builds a Python list of lambda closures and
concatenates per-function results; here one broadcasted multiply + one
sin/cos pair + a reshape produce the same layout in a single fused XLA op.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Embedder:
    """Static config for a positional encoding. Hashable → safe as jit static arg."""

    input_dims: int = 3
    num_freqs: int = 10
    max_freq_log2: float = 9.0
    include_input: bool = True
    log_sampling: bool = True
    identity: bool = False  # i_embed == -1: pass inputs through untouched

    @property
    def out_dim(self) -> int:
        if self.identity:
            return self.input_dims
        d = self.input_dims if self.include_input else 0
        return d + 2 * self.num_freqs * self.input_dims

    @property
    def freq_bands(self) -> np.ndarray:
        if self.log_sampling:
            return 2.0 ** np.linspace(0.0, self.max_freq_log2, self.num_freqs)
        return np.linspace(2.0**0.0, 2.0**self.max_freq_log2, self.num_freqs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return positional_encoding(x, self)


@partial(jnp.vectorize, excluded=(1,), signature="(d)->(e)")
def _encode(x, emb: Embedder):
    freqs = jnp.asarray(emb.freq_bands, dtype=x.dtype)  # (F,)
    # (F, d). Order of operations matches the reference's `x * pi * freq`
    # (run_nerf_helpers.py:165): round x*pi once, then scale by the exact
    # power-of-two band — bitwise-identical arguments to sin/cos.
    xb = (x * np.pi)[None, :] * freqs[:, None]
    # (F, 2, d) → (F*2*d,): frequency-major, sin before cos, dim last
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=1).reshape(-1)
    if emb.include_input:
        return jnp.concatenate([x, enc])
    return enc


def positional_encoding(x: jnp.ndarray, emb: Embedder) -> jnp.ndarray:
    """Encode ``x[..., d]`` → ``[..., emb.out_dim]``."""
    if emb.identity or emb.num_freqs == 0:
        # multires == 0 collapses to include_input only (reference behavior:
        # empty freq_bands leave just the identity term) — and to an EMPTY
        # feature vector when include_input is also off, keeping the output
        # width equal to emb.out_dim for consumers that size layers from it
        if emb.num_freqs == 0 and not emb.identity and not emb.include_input:
            return x[..., :0]
        return x
    return _encode(x, emb)


def get_embedder(multires: int, i: int = 0, input_dims: int = 3) -> Embedder:
    """Build the standard SCADE embedder (reference: run_nerf_helpers.py:174-189).

    ``i == -1`` → identity (out_dim == input_dims).
    """
    if i == -1:
        return Embedder(input_dims=input_dims, identity=True)
    return Embedder(
        input_dims=input_dims,
        num_freqs=multires,
        max_freq_log2=float(multires - 1),
        include_input=True,
        log_sampling=True,
    )
