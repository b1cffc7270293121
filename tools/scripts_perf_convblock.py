"""Honest on-chip A/B of the Pallas plane-conv stage vs XLA conv+BN+relu at
the U-Net hot shape ([10, 224, 224, 32->32] bf16, batch statistics).

Timing shape per BENCH_NOTES.md: donated chained state, fresh contents each
step (each step consumes the previous step's output), scalar accumulator
carried and printed, lax.scan inner loop to amortize dispatch.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from contrastyou_tpu.ops.pallas import convblock as cb

B, H, W, C = 10, 224, 224, 32
INNER, CALLS, WARM = 10, 12, 2
EPS = 1e-5

rng = np.random.default_rng(0)
k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * (2 / (9 * C)) ** 0.5,
                jnp.bfloat16)
scale = jnp.asarray(rng.uniform(0.9, 1.1, C), jnp.float32)
bias = jnp.asarray(rng.uniform(-0.05, 0.05, C), jnp.float32)
x0 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
count = float(B * H * W)
FLOP_PER_STEP = 2 * B * H * W * 9 * C * C


def timed(fn, state):
    for _ in range(WARM):
        state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(CALLS):
        state = fn(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    per = dt / (CALLS * INNER)
    print(f"  {per*1e3:8.3f} ms/step  {FLOP_PER_STEP/per/1e12:6.1f} TFLOP/s"
          f"  acc={float(state[1]):.3e}")
    return per


# --- XLA path: conv -> batch-stat BN -> relu, NHWC ---
@partial(jax.jit, donate_argnums=0)
def xla_chain(state):
    def body(carry, _):
        x, acc = carry
        p = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        pf = p.astype(jnp.float32)
        m = pf.mean((0, 1, 2))
        v = pf.var((0, 1, 2))
        a = scale * jax.lax.rsqrt(v + EPS)
        b = bias - a * m
        h = jnp.maximum(p * a.astype(p.dtype) + b.astype(p.dtype), 0)
        return (h, acc + m.sum()), None
    carry, _ = jax.lax.scan(body, state, None, length=INNER)
    return carry


# --- Pallas plane path: conv kernel (+stat partials) -> fold affine,
#     bn-apply fused into the NEXT iteration's tap loads ---
mask = cb.border_mask(H, W)
w2 = cb.fold_kernel(k)


@partial(jax.jit, donate_argnums=0)
def pallas_chain(state):
    def body(carry, _):
        (xp, a, b), acc = carry
        o, part = cb.conv_plane_geo(xp, w2, mask, H, W, apply_bn=True,
                                    a=a, b=b)
        s = part.sum((0, 1))
        a2, b2, mean, var = cb.bn_affine(s[0], s[1], count, scale,
                                         bias, EPS)
        return ((o, a2.reshape(C, 1), b2.reshape(C, 1)),
                acc + mean.sum()), None
    carry, _ = jax.lax.scan(body, state, None, length=INNER)
    return carry


def main():
    xp0 = cb.to_planes(x0)          # before xla_chain donates x0
    print("XLA conv+BN+relu chain:", flush=True)
    timed(xla_chain, (jnp.array(x0), jnp.float32(0)))
    print("Pallas plane stage chain:", flush=True)
    a0 = jnp.ones((C, 1), jnp.float32)
    b0 = jnp.zeros((C, 1), jnp.float32)
    timed(pallas_chain, ((xp0, a0, b0), jnp.float32(0)))


if __name__ == "__main__":
    main()
