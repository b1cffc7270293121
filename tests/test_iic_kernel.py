"""Fused dense-IIC joints kernel (ops/pallas/iic.py) == merged XLA path:
raw joints, loss values, and grads wrt features/params. Runs in interpret
mode on CPU (CONTRASTYOU_IIC_MERGED=kernel forces the kernel path there);
tools/scripts_perf_iic.py is the on-chip A/B."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.losses.discrete_mi import (
    _merged_displacement_joints, iid_loss_from_raw_joints,
    iid_segmentation_loss_merged)
from contrastyou_tpu.models.projectors import dense_cluster_probs_merged
from contrastyou_tpu.ops.pallas.iic import (fused_dense_iic_raw_joints,
                                            pick_chunks)

pytestmark = pytest.mark.pallas  # interpret-mode kernel suite (slow on CPU)

S, K, C = 3, 20, 16


def _setup(B=2, H=16, W=12, seed=0):
    rng = np.random.default_rng(seed)
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, S * K)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((S * K,)) * 0.1, jnp.float32)
    return f1, f2, w, b


def _merged_raw(w, b, f1, f2, padding):
    params = {"Vmap_DenseSubHead_0": {"Conv_0": {
        "kernel": jnp.transpose(w.reshape(C, S, K),
                                (1, 0, 2)).reshape(S, 1, 1, C, K),
        "bias": b.reshape(S, K)}}}
    both = jnp.concatenate([f1, f2], 0)
    pm = dense_cluster_probs_merged(params, both, num_subheads=S,
                                    num_clusters=K)
    B = f1.shape[0]
    if padding > 0:
        return _merged_displacement_joints(pm[:B], pm[B:], S, K, padding)
    n = B * f1.shape[1] * f1.shape[2]
    a = pm[:B].reshape(n, S * K)
    bb = pm[B:].reshape(n, S * K)
    m = jnp.einsum("ni,nj->ij", a, bb)
    m4 = m.reshape(S, K, S, K)
    diag = jnp.arange(S)
    return m4[diag, :, diag, :][:, None, None]


@pytest.mark.parametrize("padding", [0, 1, 2])
def test_raw_joints_match_merged(padding):
    f1, f2, w, b = _setup()
    raw_k = fused_dense_iic_raw_joints(w, b, f1, f2, num_subheads=S,
                                       num_clusters=K, padding=padding)
    raw_m = _merged_raw(w, b, f1, f2, padding)
    np.testing.assert_allclose(np.asarray(raw_k), np.asarray(raw_m),
                               rtol=2e-5, atol=2e-5)


def test_multi_chunk_halo_rows():
    """An H that chunks into several row bands must still produce the
    single-image joints (cross-band displacement pairs ride the halo)."""
    f1, f2, w, b = _setup(B=1, H=48, W=8, seed=1)
    import contrastyou_tpu.ops.pallas.iic as iic
    old = iic._SCRATCH_BUDGET
    skp = S * ((K + 7) // 8 * 8)
    # just enough for an Lc=128 band (rh <= 10), forcing nch > 1 at H=48
    iic._SCRATCH_BUDGET = iic._LIVE_BUFFERS * skp * 128 * 4
    pick_chunks.cache_clear()
    try:
        nch, _ = pick_chunks(48, 8, S * 24)
        assert nch > 1, "budget override failed to force chunking"
        raw_k = fused_dense_iic_raw_joints(w, b, f1, f2, num_subheads=S,
                                           num_clusters=K, padding=1)
    finally:
        iic._SCRATCH_BUDGET = old
        pick_chunks.cache_clear()
    raw_m = _merged_raw(w, b, f1, f2, 1)
    np.testing.assert_allclose(np.asarray(raw_k), np.asarray(raw_m),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("padding", [0, 1])
def test_loss_and_grads_match_merged(padding):
    f1, f2, w, b = _setup(B=2, H=12, W=10, seed=2)
    B, H, W = f1.shape[0], f1.shape[1], f1.shape[2]

    def loss_kernel(w_, b_, f1_, f2_):
        raw = fused_dense_iic_raw_joints(w_, b_, f1_, f2_, num_subheads=S,
                                         num_clusters=K, padding=padding)
        return iid_loss_from_raw_joints(raw, padding=padding,
                                        count=B * H * W).mean()

    def loss_merged(w_, b_, f1_, f2_):
        params = {"Vmap_DenseSubHead_0": {"Conv_0": {
            "kernel": jnp.transpose(w_.reshape(C, S, K),
                                    (1, 0, 2)).reshape(S, 1, 1, C, K),
            "bias": b_.reshape(S, K)}}}
        both = jnp.concatenate([f1_, f2_], 0)
        pm = dense_cluster_probs_merged(params, both, num_subheads=S,
                                        num_clusters=K)
        return iid_segmentation_loss_merged(
            pm[:B], pm[B:], num_subheads=S, num_clusters=K,
            padding=padding).mean()

    vk, gk = jax.value_and_grad(loss_kernel, (0, 1, 2, 3))(w, b, f1, f2)
    vm, gm = jax.value_and_grad(loss_merged, (0, 1, 2, 3))(w, b, f1, f2)
    np.testing.assert_allclose(float(vk), float(vm), rtol=1e-5, atol=1e-6)
    for a, bb in zip(jax.tree.leaves(gk), jax.tree.leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=3e-4, atol=3e-5)


def test_hook_kernel_path_matches_merged(monkeypatch):
    """DiscreteMITrainHook with CONTRASTYOU_IIC_MERGED=kernel must produce
    the merged path's loss through the real hook plumbing."""
    from contrastyou_tpu.engine import ModelBundle
    from contrastyou_tpu.hooks import DiscreteMITrainHook
    from contrastyou_tpu.engine.hooks import StepContext
    from contrastyou_tpu.models import UNet

    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.float32)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (16, 16, 1))
    hook = DiscreteMITrainHook(name="iic", feature_name="Up_conv2",
                               weight=1.0, num_clusters=K, num_subheads=S,
                               padding=1)
    params, st = hook.init(jax.random.PRNGKey(1), bundle)
    rng = np.random.default_rng(3)
    dim = bundle.get_channel_dim("Up_conv2")
    feat = jnp.asarray(rng.standard_normal((2, 16, 16, dim)), jnp.float32)
    feat_tf = jnp.asarray(rng.standard_normal((2, 16, 16, dim)), jnp.float32)
    from contrastyou_tpu.ops.affine import identity_geo_params
    ctx = StepContext(
        rng=jax.random.PRNGKey(2), epoch=jnp.int32(0),
        unlabeled_taps={"Up_conv2": feat},
        unlabeled_tf_taps={"Up_conv2": feat_tf},
        geo_params=identity_geo_params(2))
    monkeypatch.setenv("CONTRASTYOU_IIC_MERGED", "kernel")
    lk, _, _ = hook.loss(ctx, params, st)
    monkeypatch.setenv("CONTRASTYOU_IIC_MERGED", "1")
    lm, _, _ = hook.loss(ctx, params, st)
    np.testing.assert_allclose(float(lk), float(lm), rtol=1e-5, atol=1e-6)


def test_bf16_features_match_f32(monkeypatch):
    """The hook's bf16 feature cast (round 3: taps are exact upcasts of
    bf16 activations, so the warp/chunk glue rides bf16 losslessly) —
    kernel joints from bf16 inputs must match the f32 run when the inputs
    are exactly bf16-representable."""
    f1, f2, w, b = _setup()
    f1 = f1.astype(jnp.bfloat16).astype(jnp.float32)   # snap to bf16 grid
    f2 = f2.astype(jnp.bfloat16).astype(jnp.float32)
    monkeypatch.setenv("CONTRASTYOU_IIC_MERGED", "kernel")
    raw32 = fused_dense_iic_raw_joints(w, b, f1, f2, num_subheads=S,
                                       num_clusters=K, padding=1)
    raw16 = fused_dense_iic_raw_joints(w, b, f1.astype(jnp.bfloat16),
                                       f2.astype(jnp.bfloat16),
                                       num_subheads=S, num_clusters=K,
                                       padding=1)
    np.testing.assert_allclose(np.asarray(raw16), np.asarray(raw32),
                               rtol=1e-5, atol=1e-5)


def test_hook_bf16_step_matches_f32(monkeypatch):
    """Full-step equivalence of the bf16 feature path (warp + chunk +
    kernel) vs the f32 arm on a bf16 model (CONTRASTYOU_IIC_BF16 A/B)."""
    from contrastyou_tpu.engine import ModelBundle, init_train_state
    from contrastyou_tpu.engine.optim import create_optimizer
    from contrastyou_tpu.engine.steps import build_train_step
    from contrastyou_tpu.hooks import DiscreteMITrainHook
    from contrastyou_tpu.models import UNet
    monkeypatch.setenv("CONTRASTYOU_IIC_MERGED", "kernel")
    B, H = 2, 16
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.bfloat16)
    bundle = ModelBundle.create(model, jax.random.PRNGKey(0), (H, H, 1))
    hooks = [DiscreteMITrainHook(name="iic", feature_name="Up_conv2",
                                 weight=0.1, num_clusters=5, num_subheads=2,
                                 padding=1)]
    optimizer, _ = create_optimizer({"name": "adam", "lr": 1e-3}, None,
                                    max_epoch=2, steps_per_epoch=2)
    rng = np.random.default_rng(0)
    batch = {
        "labeled_image": jnp.asarray(rng.random((B, H, H, 1), np.float32)),
        "labeled_target": jnp.asarray(rng.integers(0, 4, (B, H, H)),
                                      jnp.int32),
        "unlabeled_image": jnp.asarray(rng.random((B, H, H, 1), np.float32)),
        "unlabeled_partition": jnp.zeros((B,), jnp.int32),
        "unlabeled_scan_id": jnp.zeros((B,), jnp.int32),
        "unlabeled_patient": jnp.zeros((B,), jnp.int32),
        "unlabeled_cycle": jnp.zeros((B,), jnp.int32),
    }

    def run():
        state = init_train_state(bundle, hooks, optimizer,
                                 jax.random.PRNGKey(1))
        step = build_train_step(bundle, optimizer, hooks, two_stage=True,
                                mode="semi")
        _, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.int32(0))
        return float(metrics["iic/loss"])

    monkeypatch.setenv("CONTRASTYOU_IIC_BF16", "0")
    l0 = run()
    monkeypatch.setenv("CONTRASTYOU_IIC_BF16", "1")
    l1 = run()
    assert np.isfinite(l0) and np.isfinite(l1)
    np.testing.assert_allclose(l1, l0, rtol=2e-3, atol=2e-4)
