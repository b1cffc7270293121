"""Milestone-4 integration: InfoNCE encoder pretrain -> frozen-range check ->
fine-tune sweep over labeled ratios (SURVEY.md §7 build plan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastyou_tpu.augment import transform_zoo, RandomCrop
from contrastyou_tpu.data import ACDCDataset, synthesize_acdc_like
from contrastyou_tpu.hooks import INFONCEHook
from contrastyou_tpu.models import UNet
from contrastyou_tpu.trainers import PretrainEncoderTrainer
from contrastyou_tpu.trainers.pretrain import get_contrastive_loader

SIZE = 32
CONFIG = {"Optim": {"name": "adam", "lr": 1e-3}, "Scheduler": None}


@pytest.mark.slow
def test_pretrain_then_finetune(tmp_path):
    synthesize_acdc_like(tmp_path / "d", num_train_scans=4, num_val_scans=3,
                         slices_per_scan=6, size=SIZE)
    tra = ACDCDataset(root_dir=str(tmp_path / "d"), mode="train",
                      transforms=RandomCrop(SIZE))
    contrast_loader = get_contrastive_loader(tra, data_name="acdc",
                                             scan_sample_num=2, seed=0)
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.float32)
    hook = INFONCEHook(name="infonce/Conv5/partition", feature_name="Conv5",
                       weight=1.0, contrast_on="partition")
    trainer = PretrainEncoderTrainer(
        model=model, contrast_loader=contrast_loader,
        monitor_loader=contrast_loader,
        save_dir=str(tmp_path / "pretrain"), max_epoch=2, num_batches=3,
        config={"Optim": {"name": "adam", "lr": 1e-3}}, seed=0)
    trainer.register_hooks(hook)
    trainer.init()
    assert trainer.forward_until == "Conv5"

    params_before = jax.tree.map(jnp.array, trainer.state.params)
    trainer.start_training()
    params_after = trainer.state.params
    # encoder trained, decoder frozen
    enc_b = np.asarray(jax.tree.leaves(params_before["Conv3"])[0])
    enc_a = np.asarray(jax.tree.leaves(params_after["Conv3"])[0])
    dec_b = np.asarray(jax.tree.leaves(params_before["Up_conv2"])[0])
    dec_a = np.asarray(jax.tree.leaves(params_after["Up_conv2"])[0])
    assert not np.allclose(enc_b, enc_a)
    np.testing.assert_array_equal(dec_b, dec_a)
    assert (tmp_path / "pretrain" / "last").is_dir()
    df = trainer._storage.summary()
    assert any("reg_loss" in c for c in df.columns)
    # the no-update monitoring pass was metered each epoch
    assert any(c.startswith("monitor/") for c in df.columns)

    # --- fine-tune sweep with the pretrained weights -------------------
    import val as val_module
    base_config = {
        "Data": {"name": "acdc", "labeled_scan_num": 1, "order_num": 0},
        "LabeledLoader": {"batch_size": 3},
        "UnlabeledLoader": {"batch_size": 3},
        "Trainer": {"max_epoch": 1, "num_batches": 2,
                    "save_dir": str(tmp_path / "ft")},
        "Optim": {"name": "adam", "lr": 1e-3},
    }
    results = val_module.val(
        model=UNet(input_dim=1, num_classes=4, max_channel=128,
                   dtype=jnp.float32),
        pretrained_params=params_after,
        save_dir=str(tmp_path / "ft"), base_config=base_config,
        labeled_ratios=[1, 2], seed=0, root_dir=str(tmp_path / "d"))
    assert set(results.keys()) == {1, 2}
    assert all(np.isfinite(v) for v in results.values())
    assert (tmp_path / "ft" / "tra" / "num_labeled_scan_1" / ".success").exists()
