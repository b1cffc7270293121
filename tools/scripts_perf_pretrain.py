"""On-chip timing + trace attribution of the InfoNCE pretrain steps
(VERDICT r3 next #4: pretrain step ~88 ms -> target <= 75 ms).

Two production shapes (ref: semi_seg/trainers/pretrain.py:57-79 +
config/hooks/infonce*.yaml):
- encoder: INFONCEHook on Conv5, contrast_on=partition, forward truncated
  at Conv5 (feature_until_from_hooks), contrastive batch 48 (ACDC
  ContrastBatchSampler: 6 scans x 8 partitions), two total-freedom views.
- decoder: Conv5 (partition) + dense Up_conv2 (self, 16x16), full forward.

Methodology per BENCH_NOTES rules: donated chained state, fresh batch
contents per step, content read at the end. Set CONTRASTYOU_TRACE_DIR to
dump a profiler trace of the LAST selected variant and print top ops.
"""
import os
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.append(str(Path(__file__).resolve().parent.parent))

from contrastyou_tpu.engine import ModelBundle, init_train_state  # noqa: E402
from contrastyou_tpu.engine.optim import create_optimizer  # noqa: E402
from contrastyou_tpu.hooks.infonce import INFONCEHook  # noqa: E402
from contrastyou_tpu.models import UNet  # noqa: E402
from contrastyou_tpu.trainers.pretrain import (  # noqa: E402
    build_pretrain_step, feature_until_from_hooks)

B, H = 48, 224
INNER, CALLS, WARM = 4, 6, 1


def build_step(hooks, color_jitter=0.5):
    until = feature_until_from_hooks(*hooks)
    model = UNet(input_dim=1, num_classes=4, max_channel=512)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-4}, None,
                                    max_epoch=1, steps_per_epoch=1)
    state = init_train_state(bundle, hooks, optimizer, jax.random.PRNGKey(1))
    step = build_pretrain_step(bundle, optimizer, hooks, until=until,
                               total_freedom=True, color_jitter=color_jitter)

    rng = np.random.default_rng(0)
    base = {
        "image": jnp.asarray(rng.random((B, H, H, 1)), jnp.float32),
        "partition": jnp.asarray(rng.integers(0, 8, (B,)), jnp.int32),
        "scan_id": jnp.asarray(rng.integers(0, 6, (B,)), jnp.int32),
        "patient": jnp.asarray(rng.integers(0, 6, (B,)), jnp.int32),
        "cycle": jnp.zeros((B,), jnp.int32),
    }

    @partial(jax.jit, donate_argnums=0)
    def chain(st):
        def body(carry, i):
            s, acc = carry
            b = dict(base)
            b["image"] = base["image"] + 1e-4 * acc
            s, m = step(s, b, jax.random.fold_in(jax.random.PRNGKey(2), i),
                        jnp.int32(0))
            return (s, acc + m["reg_loss"] * 1e-6), None

        return jax.lax.scan(body, st, jnp.arange(INNER))[0]

    return chain, (state, jnp.float32(0.0))


def timed(name, chain, st):
    for _ in range(WARM):
        st = chain(st)
    float(st[1])
    t0 = time.perf_counter()
    for _ in range(CALLS):
        st = chain(st)
    float(st[1])
    per = (time.perf_counter() - t0) / (CALLS * INNER)
    print(f"{name:>28}: {per * 1e3:8.2f} ms/step")
    return per, st


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    variants = {
        "encoder": [INFONCEHook(name="infonce", feature_name="Conv5",
                                weight=1.0, contrast_on="partition")],
        "decoder": [INFONCEHook(name="infonce0", feature_name="Conv5",
                                weight=1.0, contrast_on="partition"),
                    INFONCEHook(name="infonce1", feature_name="Up_conv2",
                                weight=1.0, contrast_on="self",
                                spatial_size=(16, 16))],
    }
    sel = sys.argv[1:] or ["encoder", "decoder"]
    for tag in sel:
        chain, st = build_step(variants[tag])
        _, st = timed(f"infonce pretrain [{tag}]", chain, st)
        tdir = os.environ.get("CONTRASTYOU_TRACE_DIR")
        if tdir and tag == sel[-1]:
            from _trace_util import trace_chain
            trace_chain(chain, st, tdir)


if __name__ == "__main__":
    main()
