"""Chained component/variant timing — the axon tunnel reports unreliable times
for independent async dispatches (probe2 measured >2x physical peak), so every
measurement here CHAINS each call's input on the previous call's output, like
the donated-state train step does. These numbers are real serial times.

Variants of the actual train step localize the cost:
  full         : semi, two_stage, BN, consistency hook (the bench config)
  no_hook      : semi, two_stage, BN, no hooks
  one_stage    : semi, single concat fwd (two_stage=False)
  ft           : labeled-only
  groupnorm    : full but GroupNorm
Plus chained fwd / fwd+bwd microbenches.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import BATCH_LABELED, BATCH_UNLABELED, SIZE, _synthetic_split
from contrastyou_tpu.data.device_cache import DeviceDataCache
from contrastyou_tpu.engine import ModelBundle, init_train_state
from contrastyou_tpu.engine.optim import create_optimizer
from contrastyou_tpu.engine.steps import build_cached_train_step
from contrastyou_tpu.hooks import ConsistencyTrainerHook
from contrastyou_tpu.models import UNet

N = 20


def step_variant(name, lab_cache, unlab_cache, *, norm="batchnorm",
                 hooks=True, two_stage=True, mode="semi"):
    model = UNet(input_dim=1, num_classes=4, max_channel=512,
                 dtype=jnp.bfloat16, norm=norm)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (SIZE, SIZE, 1))
    hook_list = [ConsistencyTrainerHook(weight=1.0)] if hooks else []
    optimizer, _ = create_optimizer(
        {"name": "radam", "lr": 1e-7, "weight_decay": 1e-5},
        {"multiplier": 300, "warmup_max": 10}, max_epoch=75,
        steps_per_epoch=200)
    state = init_train_state(bundle, hook_list, optimizer, jax.random.PRNGKey(1))
    step = build_cached_train_step(
        bundle, optimizer, hook_list, labeled_cache=lab_cache,
        unlabeled_cache=unlab_cache if mode == "semi" else None,
        labeled_batch=BATCH_LABELED, unlabeled_batch=BATCH_UNLABELED,
        unroll=1, two_stage=two_stage, mode=mode)
    epoch = jnp.int32(0)
    k = iter(range(10 ** 9))
    for _ in range(3):
        state, _ = step(state, jax.random.PRNGKey(next(k)), epoch)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    t0 = time.perf_counter()
    for _ in range(N):
        state, _ = step(state, jax.random.PRNGKey(next(k)), epoch)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    dt = (time.perf_counter() - t0) / N
    print(f"{name:24s} {dt * 1e3:8.2f} ms/step", flush=True)
    return dt


def chained(name, fn, x0, n=N):
    x = fn(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    labeled, unlabeled = _synthetic_split()
    lab_cache = DeviceDataCache.from_dataset(labeled, crop=SIZE)
    unlab_cache = DeviceDataCache.from_dataset(unlabeled, crop=SIZE)

    step_variant("full (bench config)", lab_cache, unlab_cache)
    step_variant("no_hook", lab_cache, unlab_cache, hooks=False)
    step_variant("one_stage", lab_cache, unlab_cache, two_stage=False)
    step_variant("ft (labeled only)", lab_cache, unlab_cache, mode="ft",
                 hooks=False)
    step_variant("groupnorm", lab_cache, unlab_cache, norm="groupnorm")

    # chained micro: forward-only and forward+backward of the bare model
    model = UNet(input_dim=1, num_classes=4, max_channel=512,
                 dtype=jnp.bfloat16)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (SIZE, SIZE, 1))
    params, stats = bundle.params, bundle.batch_stats
    B = BATCH_LABELED + BATCH_UNLABELED
    x0 = jnp.asarray(np.random.default_rng(0).random((B, SIZE, SIZE, 1),
                                                     np.float32))

    @jax.jit
    def fwd_chain(x):
        (logits, _), _ = bundle.apply_train(params, stats, x)
        return x + 1e-6 * logits.mean(axis=-1, keepdims=True)

    chained(f"fwd train (B={B})", fwd_chain, x0)

    @jax.jit
    def bwd_chain(x):
        def loss(p):
            (logits, _), _ = bundle.apply_train(p, stats, x)
            return (logits.astype(jnp.float32) ** 2).mean()
        g = jax.grad(loss)(params)
        return x + 1e-6 * jax.tree.leaves(g)[0].mean()

    chained(f"fwd+bwd (B={B})", bwd_chain, x0)

    from contrastyou_tpu.ops.affine import sample_geo_params, transform_image

    @jax.jit
    def aug_chain(x):
        key = jax.random.PRNGKey(0)
        out = transform_image(x, sample_geo_params(key, x.shape[0]), key)
        return 0.5 * x + 0.5 * out

    chained(f"augment (B={B})", aug_chain, x0)


if __name__ == "__main__":
    main()
