"""Trace the whole-model fwd+bwd probe under parity on/off and print the
top TPU ops for each — localizes the parity backward gap."""
import glob
import gzip
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from contrastyou_tpu.models import UNet  # noqa: E402

B, H = 10, 224
INNER = 4


def build(parity: str):
    os.environ["CONTRASTYOU_PALLAS_CONV"] = "1"
    os.environ["CONTRASTYOU_PLANE_PARITY"] = parity
    model = UNet(input_dim=1, num_classes=4, max_channel=512)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, H, 1)),
                     jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), x0, train=True)

    def loss(params, xx):
        (logits, _), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, xx,
            train=True, mutable=["batch_stats"])
        return jnp.mean(logits ** 2)

    grad = jax.value_and_grad(loss, argnums=1)

    @partial(jax.jit, donate_argnums=0)
    def chain(state):
        def body(carry, _):
            xx, acc = carry
            val, dx = grad(v["params"], xx)
            return (xx + 1e-3 * dx.astype(xx.dtype), acc + val), None
        return jax.lax.scan(body, state, None, length=INNER)[0]

    return chain, (x0, jnp.float32(0.0))


def top_ops(out_dir):
    files = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    by_name: dict = {}
    for e in events:
        name = e.get("name", "?")
        by_name[name] = by_name.get(name, 0.0) + e["dur"]
    return by_name


def main():
    assert jax.default_backend() == "tpu"
    for parity in sys.argv[1:] or ("0", "1"):
        chain, state = build(parity)
        for _ in range(2):
            state = chain(state)
        float(state[1])
        out = f"/tmp/parity_trace_{parity}"
        jax.profiler.start_trace(out)
        for _ in range(3):
            state = chain(state)
        float(state[1])
        jax.profiler.stop_trace()
        ops = top_ops(out)
        total = sum(ops.values())
        print(f"\n=== parity={parity}: total {total/1e3:.1f} ms "
              f"(12 steps traced) ===")
        for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{dur/12e3:9.3f} ms/step {100*dur/total:5.1f}%  "
                  f"{name[:100]}")


if __name__ == "__main__":
    main()
