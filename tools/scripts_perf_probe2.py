"""Component timing: where do the 60 ms/step go?

Times each piece with FRESH inputs per call (defeats the tunnel result cache):
forward (train), forward+backward, the affine augmentation, BN-free variant,
and conv-only microbenches. All at the reference config (batch 5+5, 224^2,
UNet-512 bf16).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from contrastyou_tpu.engine import ModelBundle
from contrastyou_tpu.models import UNet
from contrastyou_tpu.ops.affine import (sample_geo_params, transform_image,
                                        transform_logits)

SIZE = 224
B = 10


def timed(name, fn, make_args, n=20, flops=None):
    args = make_args(0)
    out = fn(*args)
    jax.block_until_ready(out)
    outs = []
    argsets = [make_args(i + 1) for i in range(n)]
    t0 = time.perf_counter()
    for a in argsets:
        outs.append(fn(*a))
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / n
    extra = f", {flops / dt / 1e12:.1f} TFLOP/s" if flops else ""
    print(f"{name:36s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    def img(i, b=B):
        return jnp.asarray(rng.random((b, SIZE, SIZE, 1), np.float32))

    for norm in ("batchnorm", "groupnorm"):
        model = UNet(input_dim=1, num_classes=4, max_channel=512,
                     dtype=jnp.bfloat16, norm=norm)
        bundle = ModelBundle.create(model, jax.random.PRNGKey(0),
                                    (SIZE, SIZE, 1))
        params, stats = bundle.params, bundle.batch_stats

        fwd = jax.jit(lambda p, s, x: bundle.apply_train(p, s, x)[0][0])
        cost = fwd.lower(params, stats, img(0)).compile().cost_analysis()
        fl = float(cost.get("flops", 0))
        timed(f"fwd train {norm} (B={B})", fwd,
              lambda i: (params, stats, img(i)), flops=fl)

        def loss_fn(p, s, x):
            (logits, _), _ = bundle.apply_train(p, s, x)
            return (logits ** 2).mean()

        bwd = jax.jit(jax.grad(loss_fn))
        cost = bwd.lower(params, stats, img(0)).compile().cost_analysis()
        fl = float(cost.get("flops", 0))
        timed(f"fwd+bwd {norm} (B={B})", bwd,
              lambda i: (params, stats, img(i)), flops=fl)

    aug = jax.jit(lambda x, k: transform_image(
        x, sample_geo_params(k, x.shape[0]), k))
    timed("affine+gamma augment (B=10)", aug,
          lambda i: (img(i), jax.random.PRNGKey(i)))

    tl = jax.jit(lambda x, k: transform_logits(
        x, sample_geo_params(k, x.shape[0])))
    logits_shape = lambda i: (jnp.asarray(  # noqa: E731
        rng.random((B, SIZE, SIZE, 4), np.float32)), jax.random.PRNGKey(i))
    timed("affine logits transform (B=10)", tl, logits_shape)

    # MXU sanity: the biggest single conv of the net (Conv5 block @14^2x512)
    x5 = lambda i: (jnp.asarray(  # noqa: E731
        rng.random((B, 14, 14, 512), np.float32), ).astype(jnp.bfloat16),)
    import flax.linen as nn

    conv = nn.Conv(512, (3, 3), padding="SAME", dtype=jnp.bfloat16)
    cp = conv.init(jax.random.PRNGKey(0), x5(0)[0])
    cfn = jax.jit(lambda x: conv.apply(cp, x))
    fl = 2 * B * 14 * 14 * 9 * 512 * 512
    timed("conv 3x3 512ch @14^2 bf16", cfn, x5, flops=fl)

    # early layer: big spatial, small channels
    x1 = lambda i: (jnp.asarray(  # noqa: E731
        rng.random((B, 224, 224, 32), np.float32)).astype(jnp.bfloat16),)
    conv1 = nn.Conv(32, (3, 3), padding="SAME", dtype=jnp.bfloat16)
    cp1 = conv1.init(jax.random.PRNGKey(0), x1(0)[0])
    cfn1 = jax.jit(lambda x: conv1.apply(cp1, x))
    fl1 = 2 * B * 224 * 224 * 9 * 32 * 32
    timed("conv 3x3 32ch @224^2 bf16", cfn1, x1, flops=fl1)


if __name__ == "__main__":
    main()
