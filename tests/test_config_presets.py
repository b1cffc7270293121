"""Every shipped config/hooks preset must parse, build its hooks through the
creator, and initialize hook params/states against the model bundle."""
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from contrastyou_tpu.configure import Config, yaml_load
from contrastyou_tpu.configure.config import merge
from contrastyou_tpu.engine import ModelBundle
from contrastyou_tpu.engine.hooks import check_hook_names
from contrastyou_tpu.hooks import create_hook_from_config
from contrastyou_tpu.models import UNet

REPO = Path(__file__).resolve().parents[1]
PRESETS = sorted((REPO / "config" / "hooks").glob("*.yaml"))
PRETRAIN_PRESETS = {"infonce.yaml", "infonce_dense.yaml",
                    "infonce_encoder.yaml", "spinfonce.yaml",
                    "infonce_dense_superpixel.yaml",
                    "infonce_encoder_dense.yaml"}
NO_HOOK_OK = {"multicore.yaml"}  # trainer-level parameters, no hook sections
NO_HOOK_PRESETS = {"adv.yaml"}  # trainer-level config, no hook sections


@pytest.fixture(scope="module")
def bundle():
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 dtype=jnp.float32)
    return ModelBundle.create(model, jax.random.PRNGKey(0), (32, 32, 1))


@pytest.mark.parametrize("preset", PRESETS, ids=lambda p: p.name)
def test_preset_builds_hooks(preset, bundle):
    base = yaml_load(REPO / "config" / "base.yaml")
    config = merge(base, yaml_load(preset))
    config = merge(config, Config({"OPT": {"num_classes": 4, "input_dim": 1}}))
    is_pretrain = preset.name in PRETRAIN_PRESETS

    class FakeTrainer:
        def set_model4inference(self, hook):
            self.hook = hook

    hooks = create_hook_from_config(config, is_pretrain=is_pretrain,
                                    trainer=FakeTrainer())
    if preset.name in NO_HOOK_PRESETS | NO_HOOK_OK:
        assert hooks == []
        return
    assert hooks, f"{preset.name} produced no hooks"
    check_hook_names(hooks)
    rng = jax.random.PRNGKey(1)
    for hook in hooks:
        rng, sub = jax.random.split(rng)
        params, state = hook.init(sub, bundle)  # must not raise
