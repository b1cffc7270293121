"""dy-grouped plane-conv kernel (CONTRASTYOU_PLANE_DYG) == 9-roll kernel.

The dy-grouped variant (ops/pallas/convblock.py ``_conv_plane_kernel_dyg``)
builds three kernel-row patches windows and combines three per-column
matmuls with shifted lanes — it must match the tap-major 9-roll kernel
bit-for-bit up to bf16 accumulation order, forward AND backward, including
the free BN stat partials. Ref semantics: arch/unet.py:16-31 _ConvBlock.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import contrastyou_tpu.ops.pallas.convblock as cb

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)


def _run(dyg: bool, H, W, cin, cout, seed=0):
    os.environ["CONTRASTYOU_PLANE_DYG"] = "1" if dyg else "0"
    cb._partitioned_conv.cache_clear()
    try:
        rng = np.random.default_rng(seed)
        geo = cb.pick_geometry(H, W, max(cin, cout), 2)
        x = jnp.asarray(rng.standard_normal((3, H, W, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2,
                        jnp.float32)
        mask = cb.border_mask(H, W, geo)
        xp = cb.to_planes(x, jnp.bfloat16, geo)

        def f(xp, k):
            o, s, sq = cb.plane_conv_stats(xp, k, mask, H, W, geo)
            return ((o.astype(jnp.float32) * mask[None]).sum()
                    + s.sum() + 0.1 * sq.sum())

        val, (dx, dk) = jax.value_and_grad(f, argnums=(0, 1))(xp, k)
        out, s, sq = cb.plane_conv_stats(xp, k, mask, H, W, geo)
        return (np.float32(out), np.asarray(s), np.asarray(sq),
                float(val), np.float32(dx), np.asarray(dk))
    finally:
        os.environ.pop("CONTRASTYOU_PLANE_DYG", None)
        cb._partitioned_conv.cache_clear()


@pytest.mark.parametrize("shape", [(16, 18, 4, 8),    # crep replication
                                   (12, 12, 16, 32),
                                   (10, 30, 32, 16)])  # W+2 even/odd mix
def test_dyg_matches_tapmajor(shape):
    H, W, cin, cout = shape
    ref = _run(False, H, W, cin, cout)
    got = _run(True, H, W, cin, cout)
    names = ("out", "ssum", "ssq", "val", "dx", "dk")
    # identical math reassociated: bf16 one-ulp on activations/cotangents,
    # f32 partials and dk reduce over identical masked terms
    tols = (2e-2, 5e-2, 5e-2, 5e-2, 1e-1, 1e-3)
    for name, r, g, tol in zip(names, ref, got, tols):
        err = np.max(np.abs(np.asarray(r, np.float32)
                            - np.asarray(g, np.float32)))
        assert err <= tol, (name, err)


def test_dyg_upconv_taps_use_generic_kernel():
    # non-3x3 tap sets (the parity-decomposed UpConv) must keep routing
    # through the generic kernel regardless of the dyg knob
    H, W, cin, cout = 12, 14, 8, 8
    rng = np.random.default_rng(1)
    geo = cb.pick_geometry(H, W, max(cin, 2 * cout), 2)
    xp = cb.to_planes(
        jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.bfloat16),
        jnp.bfloat16, geo)
    k3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.3,
                     jnp.float32)
    outs = []
    for knob in ("0", "1"):
        os.environ["CONTRASTYOU_PLANE_DYG"] = knob
        cb._partitioned_conv.cache_clear()
        try:
            o, s, sq = cb.upconv_plane(xp, k3.astype(jnp.bfloat16), H, W,
                                       geo, cb.pick_geometry(
                                           2 * H, 2 * W, cout, 2))
            outs.append((np.float32(o), np.asarray(s), np.asarray(sq)))
        finally:
            os.environ.pop("CONTRASTYOU_PLANE_DYG", None)
            cb._partitioned_conv.cache_clear()
    for r, g in zip(outs[0], outs[1]):
        np.testing.assert_allclose(r, g, atol=0, rtol=0)
