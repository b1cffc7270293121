"""fuse_small_leaves == plain optax, bit-for-bit.

The fused-small-leaf optimizer wrapper (engine/optim.py) ravels every
<=8192-element floating leaf into one per-dtype vector before the update —
a pure re-grouping of elementwise math (adam/radam/sgd + decoupled L2 +
global schedule), so updates must match the unwrapped transform exactly.
Ref parity target: torch RAdam semantics (contrastyou/optim/__init__.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.engine.optim import create_optimizer, fuse_small_leaves


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "conv": {"kernel": jnp.asarray(rng.standard_normal((3, 3, 8, 16)),
                                       jnp.float32)},
        "bn1": {"scale": jnp.asarray(rng.standard_normal(16), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(16), jnp.float32)},
        "bn2": {"scale": jnp.asarray(rng.standard_normal(32), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(32), jnp.float32)},
        "head": jnp.asarray(rng.standard_normal((16, 4)), jnp.float32),
    }


@pytest.mark.parametrize("name", ["radam", "adam", "sgd"])
def test_fused_updates_match_plain(name, monkeypatch):
    params = _tree(0)
    grads = jax.tree.map(lambda p: p * 0.1 + 0.01, params)

    monkeypatch.setenv("CONTRASTYOU_FUSED_OPT", "0")
    plain, _ = create_optimizer({"name": name, "lr": 1e-3,
                                 "weight_decay": 1e-4},
                                {"multiplier": 10, "warmup_max": 2},
                                max_epoch=5, steps_per_epoch=3)
    monkeypatch.setenv("CONTRASTYOU_FUSED_OPT", "1")
    fused, _ = create_optimizer({"name": name, "lr": 1e-3,
                                 "weight_decay": 1e-4},
                                {"multiplier": 10, "warmup_max": 2},
                                max_epoch=5, steps_per_epoch=3)

    sp, sf = plain.init(params), fused.init(params)
    p_plain, p_fused = params, params
    for i in range(4):
        g = jax.tree.map(lambda x: x * (1.0 + 0.3 * i), grads)
        up, sp = plain.update(g, sp, p_plain)
        uf, sf = fused.update(g, sf, p_fused)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            up, uf)
        p_plain = jax.tree.map(lambda p, u: p + u, p_plain, up)
        p_fused = jax.tree.map(lambda p, u: p + u, p_fused, uf)


def test_fused_wrapper_under_jit():
    params = _tree(1)
    grads = jax.tree.map(lambda p: p * 0.05, params)
    import optax
    tx = fuse_small_leaves(optax.adam(1e-3))
    state = tx.init(params)

    @jax.jit
    def step(g, s, p):
        return tx.update(g, s, p)

    up, state = step(grads, state, params)
    ref_tx = optax.adam(1e-3)
    ref_up, _ = ref_tx.update(grads, ref_tx.init(params), params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        up, ref_up)
