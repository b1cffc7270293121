"""Arch.pretrained_path offline warm start (VERDICT r2 missing #4 / next #8):
a LOCAL npz archive partially overlays the initialized variables with
torch ``load_state_dict(strict=False)`` semantics — the egress-free
equivalent of the reference's ImageNet encoder weights (arch/smp.py:15).
"""
import jax
import jax.numpy as jnp
import numpy as np

from contrastyou_tpu.models import ResUNet, UNet
from contrastyou_tpu.utils.torch_convert import (load_npz_tree,
                                                 merge_pretrained,
                                                 save_npz_tree)


def _leaves_equal(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_npz_roundtrip(tmp_path):
    tree = {"params": {"Conv1": {"kernel": np.arange(6.0).reshape(2, 3)}},
            "batch_stats": {"bn": {"mean": np.zeros(3)}}}
    path = str(tmp_path / "w.npz")
    save_npz_tree(path, tree)
    back = load_npz_tree(path)
    assert _leaves_equal(tree, back)
    assert list(back) == ["batch_stats", "params"] or set(back) == {
        "params", "batch_stats"}


def test_merge_pretrained_partial_and_mismatch():
    init = {"enc": {"k": np.zeros((3, 3)), "b": np.zeros(4)},
            "dec": {"k": np.zeros((2, 2))}}
    archive = {"enc": {"k": np.ones((3, 3)),        # loads
                       "b": np.ones(5)},            # shape mismatch -> skip
               "ghost": {"x": np.ones(1)}}          # absent in init -> ignore
    merged, loaded, skipped = merge_pretrained(init, archive)
    assert loaded == ["enc/k"] and skipped == ["enc/b"]
    assert np.array_equal(merged["enc"]["k"], np.ones((3, 3)))
    assert np.array_equal(merged["enc"]["b"], np.zeros(4))
    assert np.array_equal(merged["dec"]["k"], np.zeros((2, 2)))


def _tiny_trainer(model, tmp_path):
    from contrastyou_tpu.augment import CenterCrop, RandomCrop
    from contrastyou_tpu.data import (ACDCDataset, BatchLoader,
                                      InfiniteRandomSampler,
                                      synthesize_acdc_like)
    from contrastyou_tpu.trainers import FineTuneTrainer

    synthesize_acdc_like(tmp_path / "d", num_train_scans=2, num_val_scans=1,
                         slices_per_scan=4, size=32)
    tra = ACDCDataset(root_dir=str(tmp_path / "d"), mode="train",
                      transforms=RandomCrop(32))
    lab = BatchLoader(tra, sampler=InfiniteRandomSampler(len(tra), seed=0),
                      batch_size=2)
    return FineTuneTrainer(
        model=model, labeled_loader=lab, save_dir=str(tmp_path / "run"),
        max_epoch=1, num_batches=2, seed=0,
        config={"Optim": {"name": "adam", "lr": 1e-3}})


def test_trainer_encoder_warmstart(tmp_path):
    """Encoder-only archive: Conv1..Conv5 load, decoder stays fresh."""
    model = ResUNet(input_dim=1, num_classes=4, max_channel=128,
                    dtype=jnp.float32)
    # "pretrained" source: same arch, different seed
    src = model.init(jax.random.PRNGKey(42),
                     jnp.zeros((2, 32, 32, 1)), train=False)
    archive = {"params": {k: v for k, v in src["params"].items()
                          if k.startswith("Conv")},
               "batch_stats": {k: v for k, v in src["batch_stats"].items()
                               if k.startswith("Conv")}}
    path = str(tmp_path / "enc.npz")
    save_npz_tree(path, jax.tree.map(np.asarray, archive))

    trainer = _tiny_trainer(model, tmp_path)
    trainer.load_pretrained(path)
    trainer.init()
    got = trainer.state.params
    for name in ("Conv1", "Conv3", "Conv5"):
        assert _leaves_equal(got[name], src["params"][name]), name
    # decoder was NOT in the archive -> fresh init (seed 0) != source seed 42
    assert not _leaves_equal(got["Up_conv2"], src["params"]["Up_conv2"])
    for name in ("Conv1", "Conv5"):
        assert _leaves_equal(trainer.state.batch_stats[name],
                             src["batch_stats"][name]), name


def test_trainer_warmstart_unet_full(tmp_path):
    """Full-archive round trip on the plain UNet through the trainer path."""
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.float32)
    src = model.init(jax.random.PRNGKey(7), jnp.zeros((2, 32, 32, 1)),
                     train=False)
    path = str(tmp_path / "full.npz")
    save_npz_tree(path, jax.tree.map(np.asarray, dict(src)))
    trainer = _tiny_trainer(model, tmp_path)
    trainer.load_pretrained(path)
    trainer.init()
    assert _leaves_equal(trainer.state.params, src["params"])
    assert _leaves_equal(trainer.state.batch_stats, src["batch_stats"])


def test_resnet_encoder_conversion_mapping():
    """tools/convert_torch_weights.convert_resnet_encoder maps torchvision
    basic-block names onto the ResUNet tree and the result merges."""
    import sys
    from pathlib import Path
    sys.path.append(str(Path(__file__).resolve().parent.parent / "tools"))
    from convert_torch_weights import convert_resnet_encoder

    rng = np.random.default_rng(0)
    C = 16
    sd = {
        "conv1.weight": rng.standard_normal((64, 3, 7, 7)),  # stem: no match
        "layer1.0.conv1.weight": rng.standard_normal((C, C, 3, 3)),
        "layer1.0.bn1.weight": rng.standard_normal(C),
        "layer1.0.bn1.bias": rng.standard_normal(C),
        "layer1.0.bn1.running_mean": rng.standard_normal(C),
        "layer1.0.bn1.running_var": np.abs(rng.standard_normal(C)),
        "layer1.0.conv2.weight": rng.standard_normal((C, C, 3, 3)),
        "layer1.0.bn2.weight": rng.standard_normal(C),
        "layer1.0.bn2.bias": rng.standard_normal(C),
        "layer1.0.bn2.running_mean": rng.standard_normal(C),
        "layer1.0.bn2.running_var": np.abs(rng.standard_normal(C)),
    }
    tree = convert_resnet_encoder(sd)
    blk = tree["params"]["Conv2"]["ResidualBlock_0"]
    assert blk["Conv_0"]["kernel"].shape == (3, 3, C, C)
    assert blk["BatchNorm_1"]["scale"].shape == (C,)
    assert tree["batch_stats"]["Conv2"]["ResidualBlock_0"]["BatchNorm_0"][
        "mean"].shape == (C,)

    # merges onto a real ResUNet init (shape-matching subset loads)
    model = ResUNet(input_dim=1, num_classes=4, max_channel=256,
                    dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                      train=False)
    from contrastyou_tpu.utils.torch_convert import merge_pretrained
    _, loaded, _ = merge_pretrained(
        jax.tree.map(np.asarray, dict(init["params"])), tree["params"])
    # Conv2 of max_channel=256 has width 32 != 16 -> nothing loads here,
    # but the path machinery must run without error; with matching widths
    # (max_channel=128 -> Conv2 width 16) the same-shape tensors load
    # (conv2/bn* — conv1's input width differs across frameworks' stage
    # transitions, exactly the strict=False skip case)
    model2 = ResUNet(input_dim=1, num_classes=4, max_channel=128,
                     dtype=jnp.float32)
    init2 = model2.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                        train=False)
    _, loaded2, _ = merge_pretrained(
        jax.tree.map(np.asarray, dict(init2["params"])), tree["params"])
    assert any("Conv2/ResidualBlock_0/Conv_1" in p for p in loaded2)
    assert any("Conv2/ResidualBlock_0/BatchNorm_0" in p for p in loaded2)
