"""On-chip A/B: plane-layout glue ops at the current row stride (W+2, lane-
unaligned) vs a 128-aligned row stride (256). Hypothesis from the round-3
step trace: plane_maxpool / interior-extract / re-pad cost ~8 ms/step
because every row reshape on the 226-lane-stride layout is a real relayout
copy; with a 256 stride the [B,C,(H+2)*256] <-> [B,C,H+2,256] reshape is a
free bitcast.

Timing shape per BENCH_NOTES.md: donated state, fresh contents per step
(each step consumes the previous output), scalar accumulator, scan inner.
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from contrastyou_tpu.ops.pallas import convblock as cb

INNER, CALLS, WARM = 20, 8, 2


def timed(label, fn, state):
    for _ in range(WARM):
        state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(CALLS):
        state = fn(state)
    _sync = float(state[1])  # content read: defeats the backend timing artifact
    per = (time.perf_counter() - t0) / (CALLS * INNER)
    print(f"  {label:34s} {per*1e3:8.3f} ms/call  acc={float(state[1]):.3e}")
    return per


RS = 256  # aligned row stride


def geo_al(H, W, mb):
    P = (H + 2) * RS
    ppad = ((P + mb - 1) // mb) * mb
    return cb.PlaneGeo(mb, cb.PAD, P, mb + ppad + mb, ppad // mb, RS)


def maxpool_al(xp, H, W, gi, go):
    """2x2/2 max-pool on the ALIGNED layout: bitcast row split, strided
    row/lane maxes, bitcast repack."""
    B, C, _ = xp.shape
    Ho, Wo = H // 2, W // 2
    v = xp[:, :, gi.mb:gi.mb + (H + 2) * RS].reshape(B, C, H + 2, RS)
    rows = jnp.maximum(v[:, :, 1:H + 1:2], v[:, :, 2:H + 2:2])
    cols = jnp.maximum(rows[:, :, :, 1:W + 1:2], rows[:, :, :, 2:W + 2:2])
    out = jnp.pad(cols, ((0, 0), (0, 0), (1, 1), (1, RS - Wo - 1)))
    out = out.reshape(B, C, (Ho + 2) * RS)
    return jnp.pad(out, ((0, 0), (0, 0),
                         (go.mb, go.lbuf - (Ho + 2) * RS - go.mb)))


def interior_al(xp, H, W, g):
    B, C, _ = xp.shape
    v = xp[:, :, g.mb:g.mb + (H + 2) * RS].reshape(B, C, H + 2, RS)
    return v[:, :, 1:H + 1, 1:W + 1]


def bench_maxpool(B, C, H, W):
    print(f"-- maxpool fwd+bwd  [{B},{C},{H}x{W}] bf16")
    rng = np.random.default_rng(0)
    gi, go = cb.pick_geometry(H, W, C), cb.pick_geometry(H // 2, W // 2, C)
    gia, goa = geo_al(H, W, gi.mb), geo_al(H // 2, W // 2, go.mb)

    def make(gin, pool, gout):
        x0 = jnp.asarray(rng.standard_normal((B, C, gin.lbuf)), jnp.bfloat16)

        @partial(jax.jit, donate_argnums=0)
        def step(state):
            def body(carry, _):
                x, acc = carry

                def f(x):
                    y = pool(x, H, W, gin, gout)
                    return (y.astype(jnp.float32) ** 2).mean()

                val, gx = jax.value_and_grad(f)(x)
                return (gx.astype(jnp.bfloat16), acc + val), None

            carry, _ = jax.lax.scan(body, state, None, length=INNER)
            return carry

        return step, (x0, jnp.float32(0))

    s, st = make(gi, cb.plane_maxpool, go)
    t226 = timed("stride-(W+2) plane_maxpool", s, st)
    s, st = make(gia, maxpool_al, goa)
    t256 = timed("stride-256  maxpool_al", s, st)
    print(f"  ratio {t226/t256:.2f}x")


def bench_interior(B, C, H, W):
    print(f"-- interior extract fwd+bwd  [{B},{C},{H}x{W}] bf16")
    rng = np.random.default_rng(1)
    gi = cb.pick_geometry(H, W, C)
    gia = geo_al(H, W, gi.mb)

    def make(gin, ext):
        x0 = jnp.asarray(rng.standard_normal((B, C, gin.lbuf)), jnp.bfloat16)

        @partial(jax.jit, donate_argnums=0)
        def step(state):
            def body(carry, _):
                x, acc = carry

                def f(x):
                    y = ext(x, H, W, gin)
                    return (y.astype(jnp.float32) ** 2).mean()

                val, gx = jax.value_and_grad(f)(x)
                return (gx.astype(jnp.bfloat16), acc + val), None

            carry, _ = jax.lax.scan(body, state, None, length=INNER)
            return carry

        return step, (x0, jnp.float32(0))

    s, st = make(gi, lambda x, H, W, g: cb._plane_interior(x, H, W, g))
    t226 = timed("stride-(W+2) interior", s, st)
    s, st = make(gia, interior_al)
    t256 = timed("stride-256  interior", s, st)
    print(f"  ratio {t226/t256:.2f}x")


def bench_roundtrip(B, C, H, W):
    """to_planes+from_planes round trip both strides (transpose dominates;
    checks the reshape share)."""
    print(f"-- to/from_planes round trip fwd  [{B},{C},{H}x{W}]")
    rng = np.random.default_rng(2)
    g = cb.pick_geometry(H, W, C)
    ga = geo_al(H, W, g.mb)

    def to_planes_al(x, dtype, g):
        B, H, W, C = x.shape
        xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, RS - W - 1),
                                       (0, 0)))
        xp = xp.transpose(0, 3, 1, 2).reshape(B, C, (H + 2) * RS)
        return jnp.pad(xp, ((0, 0), (0, 0),
                            (g.mb, g.lbuf - (H + 2) * RS - g.mb)))

    def from_planes_al(xp, H, W, g):
        B, C, _ = xp.shape
        v = xp[:, :, g.mb:g.mb + (H + 2) * RS].reshape(B, C, H + 2, RS)
        return v[:, :, 1:H + 1, 1:W + 1].transpose(0, 2, 3, 1)

    def make(to_p, from_p, gg):
        x0 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)

        @partial(jax.jit, donate_argnums=0)
        def step(state):
            def body(carry, _):
                x, acc = carry
                y = from_p(to_p(x, jnp.bfloat16, gg), H, W, gg)
                return (y + 1e-6, acc + y[0, 0, 0, 0].astype(jnp.float32)), None

            carry, _ = jax.lax.scan(body, state, None, length=INNER)
            return carry

        return step, (x0, jnp.float32(0))

    s, st = make(lambda x, d, gg: cb.to_planes(x, d, gg), cb.from_planes, g)
    t226 = timed("stride-(W+2) roundtrip", s, st)
    s, st = make(to_planes_al, from_planes_al, ga)
    t256 = timed("stride-256  roundtrip", s, st)
    print(f"  ratio {t226/t256:.2f}x")


if __name__ == "__main__":
    B = 10
    bench_maxpool(B, 32, 224, 224)
    bench_maxpool(B, 64, 112, 112)
    bench_interior(B, 32, 224, 224)
    bench_roundtrip(B, 32, 224, 224)
