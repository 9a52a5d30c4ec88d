"""cIMLE prior training: AdaIn stat init, z-recaching, SGD epochs.

Reference semantics (ambiguity_aware_prior/tools/train_single.py — the
working variant; train_dataparallel.py's AdaIn init is dead code behind a
debug exit(), SURVEY.md §2.3):

- epoch 0: **AdaIn init** — over a 100-image subset, draw mini_batch_size=5
  z per image, record the spatial-mean of the 4 post-AdaIn activations,
  then channel-wise mean/var over the subset → ``mean_var_adain.npy``;
  those shifts recenter every later AdaIn application (:286-392).
- every ``refresh_z``=10 epochs: **z-recache** — per image draw
  num_samples=20 z in minibatches of 5, forward + loss, keep the argmin-
  total-loss z (:394-491). This is the cIMLE core: each image gets the
  latent that currently explains it best.
- each epoch: SGD(momentum=0.9, weight_decay 5e-4) over (image, cached z)
  with per-group LRs — encoder base_lr, decoder base_lr*SCALE_DECODER_LR,
  AdaIn style MLPs mlp_lr — and global grad-norm clip 10
  (multi_depth_model_auxiv2.py:385-450).

TPU design: the loss criterion + backward is ONE jitted step; z-recache
reuses a jitted forward+loss over a (B*mini, ...) batch.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scade_tpu.prior.losses import criterion
from scade_tpu.prior.model import PriorConfig, get_adain_init_act, prior_apply


@dataclasses.dataclass(frozen=True)
class PriorTrainConfig:
    base_lr: float = 1e-3  # cfg.TRAIN.BASE_LR (config.py:79)
    mlp_lr: float = 1e-3  # --mlp_lr flag
    scale_decoder_lr: float = 1.0  # cfg.TRAIN.SCALE_DECODER_LR (config.py:78)
    weight_decay: float = 5e-4
    grad_clip: float = 10.0
    num_samples: int = 20  # z draws per image for recaching
    mini_batch_size: int = 5
    refresh_z: int = 10
    # optional WarmupMultiStepLR (--use_scheduler in the reference trainer;
    # off by default for SCADE per-scene finetuning)
    use_scheduler: bool = False
    lr_milestones: tuple = (30000, 40000)
    lr_gamma: float = 0.1
    warmup_factor: float = 1.0 / 3.0
    warmup_iters: int = 500
    max_epoch: int = 60
    batch_size: int = 4
    d_latent: int = 32
    # Optional mixed-precision compute: forward/backward run with params,
    # activations, and gradients cast to this dtype while the OPTIMIZER
    # state and master params stay f32 (grads flow back through the cast).
    # flax BatchNorm computes batch statistics in f32 regardless
    # (normalization._compute_stats force_float32_reductions), and the
    # loss criterion runs on an f32-cast depth; the running-average BN
    # stats are stored back as f32 but their per-step update happens in
    # this dtype (~1e-3 relative noise — far below batch-to-batch stat
    # variance). None = full f32 (exact reference numerics).
    compute_dtype: Optional[str] = None
    loss_mode: str = (
        "_ranking-edge_pairwise-normal-regress-edge_msgil-normal_"
        "meanstd-tanh_pairwise-normal-regress-plane_"
    )  # train_single.py:38


def warmup_multistep_lr(base_lr: float, milestones, gamma: float = 0.1,
                        warmup_factor: float = 1.0 / 3.0,
                        warmup_iters: int = 500,
                        warmup_method: str = "linear"):
    """WarmupMultiStepLR as an optax schedule (reference:
    lib/utils/lr_scheduler_custom.py:14-55): linear/constant warmup to
    base_lr, then gamma decay at each milestone."""
    milestones = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if warmup_method == "constant":
            wf = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        else:
            alpha = count / max(warmup_iters, 1)
            wf = jnp.where(
                count < warmup_iters,
                warmup_factor * (1.0 - alpha) + alpha,
                1.0,
            )
        n_passed = jnp.sum((milestones <= count).astype(jnp.float32))
        return base_lr * wf * gamma**n_passed

    return schedule


def _param_label(path) -> str:
    names = [str(getattr(p, "key", "")) for p in path]
    if any("style_mod" in n for n in names):
        return "style"
    if names and names[0] == "encoder":
        return "encoder"
    return "decoder"


def make_prior_optimizer(params, tc: PriorTrainConfig,
                         fixed_backbone: bool = False):
    """SGD momentum 0.9 with per-group LRs + decoupled L2 + grad-norm clip 10
    (ModelOptimizer_AdaIn, multi_depth_model_auxiv2.py:385-450).

    torch SGD applies weight_decay by adding wd*param to the gradient
    BEFORE momentum — optax.sgd + add_decayed_weights ordering replicates
    that (add decayed weights first, then trace).

    fixed_backbone=True trains only the AdaIn style MLPs (the reference's
    PRETRAIN_MLP pretrain_optimizer, train_single.py:537-544 /
    multi_depth_model_auxiv2.py:430-436)."""
    labels = jax.tree_util.tree_map_with_path(lambda p, _: _param_label(p), params)

    def group(lr):
        if tc.use_scheduler:
            lr = warmup_multistep_lr(
                lr, tc.lr_milestones, tc.lr_gamma,
                tc.warmup_factor, tc.warmup_iters,
            )
        return optax.chain(
            optax.add_decayed_weights(tc.weight_decay),
            optax.sgd(learning_rate=lr, momentum=0.9),
        )

    if fixed_backbone:
        transforms = {
            "encoder": optax.set_to_zero(),
            "decoder": optax.set_to_zero(),
            "style": group(tc.mlp_lr),
        }
    else:
        transforms = {
            "encoder": group(tc.base_lr),
            "decoder": group(tc.base_lr * tc.scale_decoder_lr),
            "style": group(tc.mlp_lr),
        }
    opt = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.multi_transform(transforms, labels),
    )
    return opt


def compute_adain_stats(model, variables, batches: Iterable[dict], key,
                        d_latent: int, mini_batch_size: int = 5,
                        out_path: Optional[str] = None):
    """AdaIn stat init (train_single.py:286-392). `batches` yields dicts with
    'rgb' (1, H, W, 3). Returns shifts dict {mean0..3, var0..3}."""
    from scade_tpu.prior.model import zero_shifts_for

    zero = zero_shifts_for(model)

    # variables as a jit argument, not a closure: closed-over arrays bake
    # into the HLO and a full-model constant blob can overflow the axon
    # tunnel's remote_compile request size (HTTP 413 — see prior/dump.py).
    @jax.jit
    def acts_fn(variables, rgb, z):
        rgb_rep = jnp.repeat(rgb, mini_batch_size, axis=0)
        acts = get_adain_init_act(model, variables, zero, rgb_rep, z)
        # spatial mean per channel, then mean over the z minibatch (:336-348)
        return [a.mean(axis=(1, 2)).mean(axis=0) for a in acts]

    per_image = [[], [], [], []]
    for i, batch in enumerate(batches):
        key, k = jax.random.split(key)
        z = jax.random.normal(k, (mini_batch_size, d_latent), jnp.float32)
        means = acts_fn(variables, jnp.asarray(batch["rgb"][:1]), z)
        for j in range(4):
            per_image[j].append(np.asarray(means[j]))

    shifts = {}
    for j in range(4):
        stack = np.stack(per_image[j])  # (n_images, C)
        shifts[f"mean{j}"] = jnp.asarray(stack.mean(0), jnp.float32)
        # torch.var defaults to the unbiased estimator (:357-360); with a
        # single image that's 0/0 — fall back to zero variance shift
        ddof = 1 if stack.shape[0] > 1 else 0
        shifts[f"var{j}"] = jnp.asarray(stack.var(0, ddof=ddof), jnp.float32)

    if out_path is not None:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        np.save(
            out_path,
            {k: np.asarray(v) for k, v in shifts.items()},
        )
    return shifts


def load_mean_var_adain(path: str):
    """Read a reference-format mean_var_adain.npy sidecar
    (tools/utils.py:222-245)."""
    d = np.load(path, allow_pickle=True).item()
    return {k: jnp.asarray(np.asarray(v).squeeze(), jnp.float32) for k, v in d.items()}


def make_loss_fn(model, tc: PriorTrainConfig, train: bool):
    cd = jnp.dtype(tc.compute_dtype) if tc.compute_dtype else None

    def cast(t, to):
        return jax.tree.map(
            lambda a: a.astype(to)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, t)

    def loss_fn(params, batch_stats, shifts, batch, z, key):
        rgb = batch["rgb"]
        if cd is not None:
            # master params stay f32 in the caller; grads flow back
            # through these casts (standard mixed-precision)
            params_c = cast(params, cd)
            batch_stats_c = cast(batch_stats, cd)
            shifts_c = cast(shifts, cd)
            rgb, z = rgb.astype(cd), z.astype(cd)
        else:
            params_c, batch_stats_c, shifts_c = params, batch_stats, shifts
        variables = {"params": params_c, "batch_stats": batch_stats_c}
        if train:
            depth, mut = prior_apply(
                model, variables, shifts_c, rgb, z, train=True
            )
            new_stats = mut["batch_stats"]
            if cd is not None:
                new_stats = cast(new_stats, jnp.float32)
        else:
            depth = prior_apply(model, variables, shifts_c, rgb, z)
            new_stats = batch_stats
        # the loss suite runs in f32 whatever the compute dtype
        depth = depth.astype(jnp.float32)
        loss_dict, total_raw = criterion(key, depth, batch, tc.loss_mode)
        total = jnp.mean(total_raw)
        return total, (loss_dict, total_raw, new_stats)

    return loss_fn


def make_recache_step(model, tc: PriorTrainConfig):
    """One jitted forward+loss over (B*mini) replicated images → per-(image,
    draw) totals (train_single.py:394-491)."""
    loss_fn = make_loss_fn(model, tc, train=False)

    @jax.jit
    def step(params, batch_stats, shifts, batch, key):
        B = batch["rgb"].shape[0]
        k_z, k_loss = jax.random.split(key)
        z = jax.random.normal(
            k_z, (B * tc.mini_batch_size, tc.d_latent), jnp.float32
        )
        rep = lambda x: jnp.repeat(x, tc.mini_batch_size, axis=0)
        batch_rep = {k: rep(v) for k, v in batch.items()}
        _, (_, total_raw, _) = loss_fn(
            params, batch_stats, shifts, batch_rep, z, k_loss
        )
        return total_raw.reshape(B, tc.mini_batch_size), z.reshape(
            B, tc.mini_batch_size, -1
        )

    return step


def recache_z(model, variables, shifts, tc: PriorTrainConfig, batches, key):
    """Per-image argmin-loss z over num_samples draws. `batches` yields
    collated dicts; returns (n_images, d_latent) numpy."""
    step = make_recache_step(model, tc)
    # floor, NOT ceil: the reference recaches over num_sets*mini_batch_size
    # draws, explicitly flooring ("just take the floor",
    # train_single.py:276-277) — parity keeps that law here
    num_sets = tc.num_samples // tc.mini_batch_size
    selected = []
    for batch in batches:
        B = batch["rgb"].shape[0]
        losses, zs = [], []
        # upload once per batch: the host->device transfer is loop-invariant
        # over the num_sets z-draws (~12 MB/batch at 448² — re-sending it
        # per set costs seconds through the tunnel)
        batch_j = {k2: jnp.asarray(v) for k2, v in batch.items()}
        for _ in range(num_sets):
            key, k = jax.random.split(key)
            l, z = step(
                variables["params"], variables["batch_stats"], shifts, batch_j, k
            )
            losses.append(np.asarray(l))
            zs.append(np.asarray(z))
        losses = np.concatenate(losses, 1)  # (B, num_samples)
        zs = np.concatenate(zs, 1)
        best = np.argmin(losses, axis=1)
        selected.append(zs[np.arange(B), best])
    return np.concatenate(selected, 0)


def _train_step_body(loss_fn, opt):
    def step(params, batch_stats, opt_state, shifts, batch, z, key):
        (total, (loss_dict, _, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, shifts, batch, z, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, total, loss_dict

    return step


def make_train_step(model, tc: PriorTrainConfig, opt):
    loss_fn = make_loss_fn(model, tc, train=True)

    # params/batch_stats/opt_state are DONATED: without donation XLA
    # materializes a second copy of the ~1.4 GB (params + momentum) state
    # every step — measured +64 ms/step at B=5 bf16 on the chip
    # (tools/probe_prior_step.py: 301 → 237 ms). Callers must rebind to
    # the returned state (train_prior.py does).
    return functools.partial(jax.jit, donate_argnums=(0, 1, 2))(
        _train_step_body(loss_fn, opt)
    )


def make_train_step_dp(model, tc: PriorTrainConfig, opt, mesh):
    """Data-parallel train step over a `jax.sharding.Mesh`.

    The reference's prior trainer is single-GPU (its torch.distributed
    helpers are runtime-dead: comm.py world_size pinned 1,
    tools/train_dataparallel.py:217-219); this is the TPU-native scale-out
    for prior pretraining: the image batch and the z-codes shard over the
    mesh's data axis, state replicates, and the program is the SAME global
    math as `make_train_step` — XLA inserts the gradient/BN psums over ICI,
    so a DP step is bit-compatible with the single-device step up to
    reduction order (pinned by tests/test_prior_dp.py). The global batch
    size must be divisible by the data-axis size."""
    from scade_tpu.parallel.mesh import DATA_AXIS

    from jax.sharding import NamedSharding, PartitionSpec as P

    loss_fn = make_loss_fn(model, tc, train=True)
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        _train_step_body(loss_fn, opt),
        in_shardings=(rep, rep, rep, rep, dat, dat, rep),
        donate_argnums=(0, 1, 2),
    )
