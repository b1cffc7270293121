"""Micro A/B: the plane dW einsum formulation at pretrain batch 96
(r5: Up_conv2's dW einsums measured 22.7 ms/step — bf16 operands did not
move it, pointing at layout: contracting (b, m) needs m on the rhs
SUBLANES, so XLA re-transposes the cotangent inside every one of the 9
sliced einsums).

Forms measured (value-chained, fresh contents, content read):
  split-f32 : 9x einsum("bim,bom->io") on f32 upcasts (round-4 form)
  split-bf16: same on stored bf16 (current)
  hoistT    : ONE explicit [b,o,m]->[b,m,o] transpose + 9x
              einsum("bim,bmo->io") (MXU-ready layouts)
  pallas    : plane_conv_dw kernel (patches built in VMEM, taps merged
              into the dot's M dim)
"""
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.append(str(Path(__file__).resolve().parent.parent))

from contrastyou_tpu.ops.pallas import convblock as cb  # noqa: E402

B, C, H = 96, 32, 224
INNER, CALLS, WARM = 4, 4, 1


def build(form: str):
    geo = cb.pick_geometry(H, H, C)
    offs = cb.tap_offsets(geo.rs)
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((B, C, geo.lbuf)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, C, geo.lbuf)), jnp.bfloat16)

    def dw(xp, g):
        if form == "pallas":
            return cb.plane_conv_dw(xp, g, geo, offs)
        gs = g[:, :, geo.mb:geo.mb + geo.P]
        if form == "split-f32":
            gs = gs.astype(jnp.float32)
        elif form == "hoistT":
            gs = jnp.swapaxes(gs, 1, 2)          # [B, P, C] — one transpose
        dks = []
        for off in offs:
            xs = jax.lax.dynamic_slice_in_dim(xp, geo.mb + off, geo.P, 2)
            if form == "split-f32":
                xs = xs.astype(jnp.float32)
            if form == "hoistT":
                dks.append(jnp.einsum("bim,bmo->io", xs, gs,
                                      preferred_element_type=jnp.float32))
            else:
                dks.append(jnp.einsum("bim,bom->io", xs, gs,
                                      preferred_element_type=jnp.float32))
        return jnp.stack(dks, 0)

    @partial(jax.jit, donate_argnums=0)
    def chain(st):
        def body(carry, _):
            x, gg, acc = carry
            dk = dw(x, gg)
            s = jnp.sum(dk).astype(jnp.bfloat16)
            return (x + s * 1e-6, gg + s * 1e-6, acc + jnp.sum(dk)), None
        return jax.lax.scan(body, st, None, length=INNER)[0]

    return chain, (xp, g, jnp.float32(0.0))


def main():
    assert jax.default_backend() == "tpu"
    for form in (sys.argv[1:] or ["split-bf16", "hoistT", "pallas",
                                  "split-f32"]):
        chain, st = build(form)
        for _ in range(WARM):
            st = chain(st)
        float(st[2])
        t0 = time.perf_counter()
        for _ in range(CALLS):
            st = chain(st)
        float(st[2])
        per = (time.perf_counter() - t0) / (CALLS * INNER)
        print(f"{form:>12}: {per * 1e3:8.2f} ms per dW")


if __name__ == "__main__":
    main()
