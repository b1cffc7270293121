"""On-chip timing + trace attribution of the heavy research configs
(VERDICT r4 #1): the steps the reference's papers actually run —

- ``udaiic``:    consistency + dense IIC at Up_conv2 (5 subheads, K=20,
                 padding=1) — ref semi_seg/hooks/discretemi.py:16-176
- ``nce_dense``: consistency + dense InfoNCE at Up_conv2 (16x16 grid,
                 contrast_on=self) — ref semi_seg/hooks/infonce.py:196-279

Both at the reference semi shape (batch 8 labeled + 8 unlabeled, 224²,
UNet-512 bf16, two-stage BN). Methodology per BENCH_NOTES rules: donated
chained state, fresh batch contents per step, content read at the end.
CONTRASTYOU_TRACE_DIR dumps a profiler trace of every selected variant
(analyze with tools/trace_cat.py <dir> 4).
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
from contrastyou_tpu.engine.steps import build_train_step  # noqa: E402
from contrastyou_tpu.hooks import (ConsistencyTrainerHook,  # noqa: E402
                                   DiscreteMITrainHook)
from contrastyou_tpu.hooks.infonce import INFONCEHook  # noqa: E402
from contrastyou_tpu.models import UNet  # noqa: E402

B, H = 8, 224
INNER, CALLS, WARM = 4, 6, 1


def build_step(hooks):
    model = UNet(input_dim=1, num_classes=4, max_channel=512)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-4}, None,
                                    max_epoch=1, steps_per_epoch=1)
    state = init_train_state(bundle, hooks, optimizer, jax.random.PRNGKey(1))
    step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                            mode="semi", raw=True)

    rng = np.random.default_rng(0)
    base = {
        "labeled_image": jnp.asarray(rng.random((B, H, H, 1)), jnp.float32),
        "labeled_target": jnp.asarray(rng.integers(0, 4, (B, H, H)),
                                      jnp.int32),
        "unlabeled_image": jnp.asarray(rng.random((B, H, H, 1)), jnp.float32),
        "unlabeled_partition": jnp.zeros((B,), jnp.int32),
        "unlabeled_scan_id": jnp.zeros((B,), jnp.int32),
        "unlabeled_patient": jnp.zeros((B,), jnp.int32),
        "unlabeled_cycle": jnp.zeros((B,), jnp.int32),
    }

    @partial(jax.jit, donate_argnums=0)
    def chain(st):
        def body(carry, i):
            s, acc = carry
            b = dict(base)
            b["unlabeled_image"] = base["unlabeled_image"] + 1e-4 * acc
            s, m = step(s, b, jax.random.fold_in(jax.random.PRNGKey(2), i),
                        jnp.int32(0))
            return (s, acc + m["total_loss"] * 1e-6), None

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
    tdir = os.environ.get("CONTRASTYOU_TRACE_DIR")
    if tdir:
        from _trace_util import trace_chain
        trace_chain(chain, st, tdir)
    return per


VARIANTS = {
    "udaiic": lambda: [
        ConsistencyTrainerHook(weight=1.0),
        DiscreteMITrainHook(name="iic", feature_name="Up_conv2",
                            weight=0.1, num_clusters=20, num_subheads=5,
                            padding=1)],
    "nce_dense": lambda: [
        ConsistencyTrainerHook(weight=1.0),
        INFONCEHook(name="infonce", feature_name="Up_conv2", weight=1.0,
                    contrast_on="self", spatial_size=(16, 16))],
}


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    sel = sys.argv[1:] or list(VARIANTS)
    for tag in sel:
        timed(f"semi step [{tag}]", *build_step(VARIANTS[tag]()))


if __name__ == "__main__":
    main()
