"""On-chip A/B: fused Pallas streaming SupCon kernel vs the eager XLA path
across anchor counts — resolves VERDICT r2 weak #3 (the kernel's 2N>=512
gate never fires in production: contrastive batches cap at 50 -> 2N=100,
dense hooks sample ~B*5 points).

Measures value+grad (the training shape), donated chained state with fresh
feature contents per step and a content read at the end (BENCH_NOTES rules).
"""
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.append(str(Path(__file__).resolve().parent.parent))

from contrastyou_tpu.losses.contrastive import sup_con_loss  # noqa: E402

D = 256
INNER, CALLS, WARM = 8, 8, 2


def build(n: int, fused: bool):
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
    target = jnp.asarray(rng.integers(0, 3, n), jnp.int32)

    def loss(f1):
        f1 = f1 / jnp.linalg.norm(f1, axis=1, keepdims=True)
        return sup_con_loss(f1, f1[::-1], target=target, fused=fused)

    grad = jax.value_and_grad(loss)

    @partial(jax.jit, donate_argnums=0)
    def chain(state):
        def body(carry, _):
            ff, acc = carry
            val, df = grad(ff)
            return (ff + 1e-3 * df, acc + val), None

        return jax.lax.scan(body, state, None, length=INNER)[0]

    return chain, (f, jnp.float32(0.0))


def timed(chain, state):
    for _ in range(WARM):
        state = chain(state)
    float(state[1])
    t0 = time.perf_counter()
    for _ in range(CALLS):
        state = chain(state)
    float(state[1])
    return (time.perf_counter() - t0) / (CALLS * INNER)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    print(f"{'anchors 2N':>10} {'eager ms':>9} {'fused ms':>9} {'ratio':>6}",
          flush=True)
    for n in (50, 128, 256, 512, 1024, 2048, 4096):
        per = {}
        for fused in (False, True):
            try:
                chain, state = build(n, fused)
                per[fused] = timed(chain, state)
            except Exception as e:  # e.g. VMEM OOM in the fused backward
                print(f"{2 * n:>10} [{'fused' if fused else 'eager'}] FAILED:"
                      f" {str(e).splitlines()[0][:120]}", flush=True)
                per[fused] = float("nan")
        print(f"{2 * n:>10} {per[False] * 1e3:>9.3f} {per[True] * 1e3:>9.3f}"
              f" {per[False] / per[True]:>6.2f}x", flush=True)


if __name__ == "__main__":
    main()
