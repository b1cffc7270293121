"""Parity-chain attribution probe: fwd-only vs fwd+bwd, parity on/off,
on-chip, honest chained timing (donated state, content read at the end).
Locates whether the parity gap lives in the forward kernels or the
backward (dx transpose + 36 quarter dk einsums)."""
import os
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.append(str(Path(__file__).resolve().parent.parent))

from contrastyou_tpu.models import UNet  # noqa: E402

B, H = 10, 224
INNER, CALLS, WARM = 4, 6, 1


def build(parity: str, what: str):
    os.environ["CONTRASTYOU_PALLAS_CONV"] = "1"
    os.environ["CONTRASTYOU_PARITY_NODK"] = (
        "1" if parity == "nodk" else "0")
    os.environ["CONTRASTYOU_PLANE_PARITY"] = "1" if parity == "nodk" else parity
    model = UNet(input_dim=1, num_classes=4, max_channel=512)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((B, H, H, 1)),
                     jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), x0, train=True)

    def loss(params, xx):
        (logits, _), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, xx,
            train=True, mutable=["batch_stats"])
        return jnp.mean(logits ** 2)

    if what == "fwd":
        def one(xx):
            val = loss(v["params"], xx)
            return xx + (1e-4 * val).astype(xx.dtype), val
    else:
        grad = jax.value_and_grad(loss, argnums=1)

        def one(xx):
            val, dx = grad(v["params"], xx)
            return xx + 1e-3 * dx.astype(xx.dtype), val

    @partial(jax.jit, donate_argnums=0)
    def chain(state):
        def body(carry, _):
            xx, acc = carry
            xx2, val = one(xx)
            return (xx2, acc + val), None
        return jax.lax.scan(body, state, None, length=INNER)[0]

    return chain, (x0, jnp.float32(0.0))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    combos = [(p, w) for w in ("fwd", "fwdbwd")
              for p in (sys.argv[1:] or ("0", "1"))]
    built = {}
    for key in combos:
        chain, state = build(*key)
        state = chain(state)
        built[key] = (chain, state)
    times = {k: [] for k in combos}
    for rnd in range(3):
        for key in combos:
            chain, state = built[key]
            for _ in range(WARM):
                state = chain(state)
            float(state[1])
            t0 = time.perf_counter()
            for _ in range(CALLS):
                state = chain(state)
            float(state[1])
            dt = time.perf_counter() - t0
            built[key] = (chain, state)
            times[key].append(dt / (CALLS * INNER))
    for key in combos:
        per = min(times[key])
        all_ms = " ".join(f"{t*1e3:.2f}" for t in times[key])
        print(f"parity={key[0]} {key[1]:>6}: best {per*1e3:7.2f} ms  "
              f"rounds [{all_ms}]")


if __name__ == "__main__":
    main()
