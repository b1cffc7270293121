"""Scatter-free plane max-pool backward (CONTRASTYOU_PLANE_POOLVJP) ==
the AD transpose it replaces.

The custom VJP of ``plane_maxpool`` / ``plane_maxpool_to_nhwc``
(ops/pallas/convblock.py) rebuilds the input-plane cotangent with
pair-interleave stack/reshape instead of the stride-2 slice transposes XLA
lowers to scatter-add fusions (the round-3 post-fused-opt trace's ~1 ms/step
scatter + layout-copy storm). Balanced tie-splitting matches lax's
_balanced_eq, so gradients must be BIT-identical — including at exact ties.
Ref semantics: arch/unet.py:36-44 Maxpool levels of the reference U-Net.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import contrastyou_tpu.ops.pallas.convblock as cb

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)


def _grads(custom: bool, to_nhwc: bool, H, W, C, B=3, seed=0):
    os.environ["CONTRASTYOU_PLANE_POOLVJP"] = "1" if custom else "0"
    rng = np.random.default_rng(seed)
    gi = cb.pick_geometry(H, W, C, 2)
    # quantized values force EXACT ties inside 2x2 windows (the
    # balanced-eq half/half split path)
    x = jnp.asarray(np.round(rng.standard_normal((B, H, W, C)) * 2) / 2,
                    jnp.bfloat16)
    xp = cb.to_planes(x, jnp.bfloat16, gi)
    if to_nhwc:
        def f(p):
            o = cb.plane_maxpool_to_nhwc(p, H, W, gi)
            return jnp.sum(o.astype(jnp.float32) ** 2)
    else:
        go = cb.pick_geometry(H // 2, W // 2, C, 2)

        def f(p):
            o = cb.plane_maxpool(p, H, W, gi, go)
            return jnp.sum(o.astype(jnp.float32) ** 2)

    val, dx = jax.value_and_grad(f)(xp)
    return np.float32(val), np.asarray(jax.device_get(dx))


@pytest.mark.parametrize("to_nhwc", [False, True])
@pytest.mark.parametrize("H,W,C", [(16, 12, 8), (32, 32, 4)])
def test_pool_vjp_bit_identical(to_nhwc, H, W, C):
    try:
        v0, g0 = _grads(False, to_nhwc, H, W, C)
        v1, g1 = _grads(True, to_nhwc, H, W, C)
    finally:
        os.environ.pop("CONTRASTYOU_PLANE_POOLVJP", None)
    assert v0 == v1
    np.testing.assert_array_equal(g1, g0)


def test_pool_vjp_ties_split_evenly():
    """A constant input puts every 2x2 window at an exact 4-way tie: the
    cotangent must spread 1/4 to each input pixel (balanced-eq squared)."""
    os.environ["CONTRASTYOU_PLANE_POOLVJP"] = "1"
    try:
        H = W = 8
        gi = cb.pick_geometry(H, W, 8, 2)
        xp = cb.to_planes(jnp.ones((2, H, W, 8), jnp.bfloat16), jnp.bfloat16,
                          gi)
        dx = jax.grad(
            lambda p: jnp.sum(cb.plane_maxpool_to_nhwc(p, H, W, gi)
                              .astype(jnp.float32)))(xp)
        interior = cb.from_planes(dx, H, W, gi)
        np.testing.assert_allclose(np.float32(interior), 0.25)
    finally:
        os.environ.pop("CONTRASTYOU_PLANE_POOLVJP", None)
