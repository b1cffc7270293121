"""On-chip A/B of the Pallas plane-conv stage vs the XLA ConvBlock path at
the DEEP U-Net levels (C in {128, 256, 512} at 56^2/28^2/14^2), fwd+bwd.

Timing shape per BENCH_NOTES.md: donated chained state with fresh contents
per step (x_{t+1} = x_t + eps * dx_t), a carried scalar accumulator, and a
final CONTENT read — block_until_ready alone lies on this backend.

Usage: python tools/scripts_perf_deep.py  (on the real TPU)
"""
import os
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# append (not PYTHONPATH/prepend): the repo's config/ and native/ dirs would
# otherwise shadow modules the axon PJRT plugin discovery imports
sys.path.append(str(Path(__file__).resolve().parent.parent))

from contrastyou_tpu.models.unet import ConvBlock  # noqa: E402

B = 10
INNER, CALLS, WARM = 8, 8, 2
LEVELS = [
    ("Conv3 56^2 64->128", 56, 64, 128),
    ("Conv4 28^2 128->256", 28, 128, 256),
    ("Conv5 14^2 256->512", 14, 256, 512),
    ("Up_conv5 28^2 512->256(skip)", 28, 256, 256),   # skip: 256+256 concat
    ("Up_conv4 56^2 256->128(skip)", 56, 128, 128),   # skip: 128+128 concat
]


def build(mode: str, H, cin, cout, skip_ch):
    os.environ["CONTRASTYOU_PALLAS_CONV"] = "1" if mode == "pallas" else "0"
    os.environ["CONTRASTYOU_PALLAS_DEEP"] = "1"
    block = ConvBlock(features=cout, momentum=0.1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, H, cin)), jnp.bfloat16)
    skip = (jnp.asarray(rng.standard_normal((B, H, H, skip_ch)),
                        jnp.bfloat16) if skip_ch else None)
    kw = {} if skip is None else {"skip": skip}
    v = block.init(jax.random.PRNGKey(0), x, train=True, **kw)

    def loss(params, xx):
        y, _ = block.apply({"params": params,
                            "batch_stats": v["batch_stats"]}, xx,
                           train=True, mutable=["batch_stats"], **kw)
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    grad = jax.value_and_grad(loss, argnums=1)

    @partial(jax.jit, donate_argnums=0)
    def chain(state):
        def body(carry, _):
            xx, acc = carry
            val, dx = grad(v["params"], xx)
            return (xx + 1e-3 * dx.astype(xx.dtype), acc + val), None

        return jax.lax.scan(body, state, None, length=INNER)[0]

    return chain, (x, jnp.float32(0.0))


def timed(chain, state, flop):
    for _ in range(WARM):
        state = chain(state)
    float(state[1])                                   # content read
    t0 = time.perf_counter()
    for _ in range(CALLS):
        state = chain(state)
    acc = float(state[1])                             # content read
    dt = time.perf_counter() - t0
    per = dt / (CALLS * INNER)
    print(f"  {per * 1e3:8.3f} ms/iter  {flop / per / 1e12:6.1f} TFLOP/s"
          f"  acc={acc:.3e}")
    return per


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    print(f"devices: {jax.devices()}")
    results = {}
    for name, H, cin, cout, in (LEVELS):
        skip_ch = cin if "skip" in name else 0
        cin_total = cin + skip_ch
        # fwd conv FLOPs x3 for fwd+bwd (dx + dw)
        flop = 3 * 2 * B * H * H * 9 * (cin_total * cout + cout * cout)
        print(f"{name}: {flop / 1e9:.1f} GFLOP/iter (fwd+bwd)")
        per = {}
        for mode in ("xla", "pallas"):
            chain, state = build(mode, H, cin, cout, skip_ch)
            print(f" {mode}:")
            per[mode] = timed(chain, state, flop)
        results[name] = per
        print(f"  -> pallas/xla speedup: {per['xla'] / per['pallas']:.2f}x")
    print("\nsummary:")
    for name, per in results.items():
        print(f"  {name}: {per['xla'] * 1e3:.2f} -> {per['pallas'] * 1e3:.2f}"
              f" ms ({per['xla'] / per['pallas']:.2f}x)")


if __name__ == "__main__":
    main()
