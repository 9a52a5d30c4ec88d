"""MultiDataset + interleaved sharded sampler + TrainingStats tests."""

import numpy as np

from scade_tpu.prior.multi_data import InterleavedShardedSampler, MultipleDataset as MultiDataset
from scade_tpu.utils.logging import SmoothedValue, TrainingStats


class FakeDS:
    def __init__(self, tag, n):
        self.tag, self.n = tag, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return (self.tag, i)


def test_multi_dataset_global_indexing():
    md = MultiDataset([FakeDS("a", 3), FakeDS("b", 5)])
    assert len(md) == 8
    assert md[0] == ("a", 0)
    assert md[2] == ("a", 2)
    assert md[3] == ("b", 0)
    assert md[7] == ("b", 4)


def test_sampler_interleaves_and_covers():
    md = MultiDataset([FakeDS("a", 4), FakeDS("b", 8)])
    s = InterleavedShardedSampler(md, rng=np.random.default_rng(0))
    idx = list(iter(s))
    # extended to 2 * max_len = 16 samples
    assert len(idx) == 16
    tags = [md[i][0] for i in idx]
    # round-robin: alternates a, b
    assert tags[0::2] == ["a"] * 8
    assert tags[1::2] == ["b"] * 8
    # small dataset repeats; each element appears exactly twice
    a_items = sorted(md[i][1] for i in idx if md[i][0] == "a")
    assert a_items == [0, 0, 1, 1, 2, 2, 3, 3]


def test_sampler_rank_sharding():
    md = MultiDataset([FakeDS("a", 4), FakeDS("b", 4)])
    rng_seed = 42
    shards = []
    for rank in range(2):
        s = InterleavedShardedSampler(
            md, num_replicas=2, rank=rank, rng=np.random.default_rng(rng_seed)
        )
        shards.append(list(iter(s)))
    assert len(shards[0]) == len(shards[1]) == 4
    # identical rng seed → the two ranks partition the same global order
    assert set(shards[0]) | set(shards[1]) == set(range(8))


def test_smoothed_value_median():
    sv = SmoothedValue(window_size=3)
    for v in (1.0, 100.0, 2.0):
        sv.AddValue(v)
    assert sv.GetMedianValue() == 2.0  # median suppresses the spike
    sv.AddValue(3.0)  # window slides: [100, 2, 3]
    assert sv.GetMedianValue() == 3.0
    assert sv.GetGlobalAverageValue() == (1 + 100 + 2 + 3) / 4


def test_training_stats_log(capsys):
    ts = TrainingStats(log_period=2, total_iters=100)
    for i in range(1, 5):
        ts.IterTic()
        ts.UpdateIterStats({"total_loss": float(i), "mse": float(i) / 2})
        ts.IterToc()
        ts.LogIterStats(i, 0, lr=1e-3)
    out = capsys.readouterr().out
    assert "total_loss" in out and "mse" in out and "eta" in out


def test_sampler_rejects_empty_member():
    """An empty member dataset would spin _extended_indices forever (size 0
    never fills max_len); the sampler must fail loudly naming the culprit
    (the reference dies with a bare ZeroDivisionError,
    load_dataset_distributed.py:146)."""
    import pytest

    md = MultiDataset([FakeDS("a", 3), FakeDS("b", 0)])
    with pytest.raises(ValueError, match="index \\[1\\]"):
        InterleavedShardedSampler(md, rng=np.random.default_rng(0))


def test_init_prior_rejects_enc_v456():
    """Encoder cIMLE only implements v2/v3 AdaIn taps; v4-v6 (decoder tap
    schedules) must raise instead of silently training the v2 model."""
    import jax
    import pytest

    from scade_tpu.prior.model import backbone_config, init_prior

    cfg = backbone_config("resnet18", d_latent=4).with_small()
    with pytest.raises(ValueError, match="v4-v6 are Decoder_cIMLE"):
        init_prior(jax.random.PRNGKey(0), cfg, image_size=(32, 32),
                   version="v5", cimle_version="enc")
