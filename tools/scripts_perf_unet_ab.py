"""Whole-model A/B on chip: UNet-512 224^2 fwd+bwd (batch 10, batch-stats
mode) under three conv routings:
  all-xla       CONTRASTYOU_PALLAS_CONV=0
  plane-shallow CONTRASTYOU_PALLAS_CONV=1 (C<=64 levels, round-2 default)
  plane-deep    + CONTRASTYOU_PALLAS_DEEP=1 (every level)

Timing per BENCH_NOTES.md rules: donated chained state, fresh contents per
step, content read at the end. Motivated by the round-3 finding that
isolated deep ConvBlocks run 3x faster than their share of the full step —
this probe localizes composition/layout overhead at the model level.
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

from contrastyou_tpu.models import UNet  # noqa: E402

B, H = 10, 224
INNER, CALLS, WARM = 4, 6, 1


def build(mode: str):
    os.environ["CONTRASTYOU_PALLAS_CONV"] = "0" if mode == "all-xla" else "1"
    os.environ["CONTRASTYOU_PALLAS_DEEP"] = {
        "plane-deep": "1", "plane-deep128": "128",
        "plane-deep128-256": "128,256"}.get(mode, "0")
    os.environ["CONTRASTYOU_PLANE_CHAIN"] = (
        "0" if mode == "plane-nochain" else "1")
    os.environ["CONTRASTYOU_PLANE_UPCONV"] = {
        "plane-nochain": "0", "plane-noupconv": "0",
        "plane-up2": "up2", "plane-up3": "up3"}.get(mode, "up2")
    os.environ["CONTRASTYOU_PLANE_DYG"] = (
        "0" if mode == "plane-nodyg" else "1")
    # production default is align OFF (measured worse end-to-end);
    # "plane-align" opts in for re-measurement
    os.environ["CONTRASTYOU_PLANE_ALIGN"] = (
        "1" if mode == "plane-align" else "0")
    # two-phase interleave is the production default (measured 17.41 ->
    # 16.12 ms whole-model); "plane-noilv2" re-measures the 6-D transpose
    os.environ["CONTRASTYOU_PLANE_ILV2"] = (
        "0" if mode == "plane-noilv2" else "1")
    # scatter-free custom pool VJP (round-3); "plane-nopoolvjp" re-measures
    # the AD transpose (scatter-add fusion) backward
    os.environ["CONTRASTYOU_PLANE_POOLVJP"] = (
        "0" if mode == "plane-nopoolvjp" else "1")
    # "plane-dw" re-measures the Pallas weight-grad kernel (historically a
    # small net loss vs the sliced einsums once fused-opt landed)
    os.environ["CONTRASTYOU_PLANE_DW"] = ("1" if mode == "plane-dw" else "0")
    # parity-domain widest-level chain (round 3); "plane-noparity"
    # re-measures the interleaved plane chain
    os.environ["CONTRASTYOU_PLANE_PARITY"] = (
        "0" if mode.startswith("plane-noparity") or mode == "plane-nochain"
        else "1")
    # custom upconv-interleave transpose (round 3); "...-noupvjp"
    # re-measures the AD transpose of the two-phase zip
    os.environ["CONTRASTYOU_PLANE_UPVJP"] = (
        "0" if mode.endswith("noupvjp") else "1")
    # custom BN+ReLU apply backward (round 3, no f32 residual);
    # "...-nobnvjp" re-measures the autodiff form
    os.environ["CONTRASTYOU_PLANE_BNVJP"] = (
        "0" if mode.endswith("nobnvjp") else "1")
    # round-5 N-merged dyg dot; "...-nonmerge" re-measures the 3-dot form
    os.environ["CONTRASTYOU_PLANE_NMERGE"] = (
        "0" if mode.endswith("nonmerge") else "")
    # round-4 single-pass dx+dW backward: production default is OFF
    # (measured 15.56 vs 15.01 ms); "...-fusedbwd" re-measures it
    os.environ["CONTRASTYOU_PLANE_FUSEDBWD"] = (
        "1" if "fusedbwd" in mode and "nofusedbwd" not in mode else "0")
    # round-4 lbuf-weighted geometry cost: "...-gcH" (e.g. plane-gc1,
    # plane-shallow-gc05) sets CONTRASTYOU_PLANE_GEOCOST
    gc = "0"
    for part in mode.split("-"):
        if part.startswith("gc"):
            gc = part[2:].replace("_", ".")
            gc = {"05": "0.5"}.get(gc, gc)
    os.environ["CONTRASTYOU_PLANE_GEOCOST"] = gc
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


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    flop = None
    modes = sys.argv[1:] or ["all-xla", "plane-noupconv", "plane-shallow"]
    built = {}
    for mode in modes:
        chain, state = build(mode)
        if flop is None:
            flop = chain.lower(state).compile().cost_analysis()["flops"] / INNER
            print(f"cost analysis: {flop / 1e12:.3f} TFLOP per fwd+bwd")
        state = chain(state)   # force trace/compile while mode env is active
        built[mode] = (chain, state)
    # interleave timing rounds across modes to cancel machine/tunnel drift
    times = {m: [] for m in modes}
    for rnd in range(3):
        for mode in modes:
            chain, state = built[mode]
            for _ in range(WARM):
                state = chain(state)
            float(state[1])
            t0 = time.perf_counter()
            for _ in range(CALLS):
                state = chain(state)
            acc = float(state[1])
            dt = time.perf_counter() - t0
            built[mode] = (chain, state)
            times[mode].append(dt / (CALLS * INNER))
    for mode in modes:
        per = min(times[mode])
        all_ms = " ".join(f"{t*1e3:.2f}" for t in times[mode])
        print(f"{mode:>14}: best {per * 1e3:7.2f} ms  "
              f"{flop / per / 1e12:5.1f} TFLOP/s  rounds [{all_ms}]  "
              f"acc={acc:.3e}")


if __name__ == "__main__":
    main()
