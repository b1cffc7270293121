"""On-chip timing of the udaiic-shaped step (IIC at Up_conv2, 5 subheads,
K=20, padding=1, + consistency) and its pieces — VERDICT r2 next #5.

Pieces timed separately (donated chained state, fresh contents, content
read): (a) full semi step with both hooks, (b) consistency-only step,
(c) the isolated dense-cluster pipeline (DenseClusterHead projection +
softmax + iid_segmentation_loss fwd+bwd) at the same tensor shapes.

Optionally set CONTRASTYOU_TRACE_DIR to dump a profiler trace of EVERY
selected variant (one capture per timed chain, attributed individually).
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


def dense_pipeline():
    """Isolated dense-cluster pipeline at the udaiic tensor shapes."""
    from contrastyou_tpu.losses.discrete_mi import iid_segmentation_loss
    from contrastyou_tpu.models.projectors import DenseClusterHead

    head = DenseClusterHead(num_clusters=20, num_subheads=5,
                            head_type="linear", T=1.0)
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.standard_normal((2 * B, H, H, 32)), jnp.bfloat16)
    params = head.init(jax.random.PRNGKey(0), feat)["params"]

    def loss(p, f):
        probs = head.apply({"params": p}, f)            # [S, 2B, H, W, K]
        p1, p2 = probs[:, :B], probs[:, B:]
        mi = jax.vmap(lambda a, b: iid_segmentation_loss(a, b, padding=1))(
            p1, p2)
        return mi.mean()

    grad = jax.value_and_grad(loss, argnums=1)

    @partial(jax.jit, donate_argnums=0)
    def chain(st):
        def body(carry, _):
            f, acc = carry
            val, df = grad(params, f)
            return (f + 1e-3 * df.astype(f.dtype), acc + val), None

        return jax.lax.scan(body, st, None, length=INNER)[0]

    return chain, (feat, jnp.float32(0.0))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    cons = [ConsistencyTrainerHook(weight=1.0)]
    iic = [ConsistencyTrainerHook(weight=1.0),
           DiscreteMITrainHook(name="iic", feature_name="Up_conv2",
                               weight=0.1, num_clusters=20, num_subheads=5,
                               padding=1)]
    # argv selects variants (default: the full original sweep); e.g.
    #   scripts_perf_iic.py 2pass-merged 2pass-cons 2pass-fusediic
    sel = sys.argv[1:] or ["2pass-cons", "2pass-vmapped", "2pass-merged",
                           "fused-cons", "fused-vmapped", "fused-merged"]
    for fused in ("0", "1"):
        os.environ["CONTRASTYOU_FUSED_TWOSTAGE"] = fused
        tag = "fused" if fused == "1" else "2pass"
        if f"{tag}-cons" in sel:
            timed(f"consistency step [{tag}]", *build_step(cons))
        for merged in ("0", "1", "kernel"):
            os.environ["CONTRASTYOU_IIC_MERGED"] = merged
            mtag = {"0": "vmapped", "1": "merged",
                    "kernel": "fusediic"}[merged]
            if f"{tag}-{mtag}" in sel:
                timed(f"udaiic step [{tag},{mtag}]", *build_step(iic))


if __name__ == "__main__":
    main()
