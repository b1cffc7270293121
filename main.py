"""Training entry point.

Capability match for the reference main.py:21-114 call stack:
``python main.py -o Trainer.name=semi Data.name=acdc -p config/base.yaml
config/hooks/mt.yaml`` — config layering -> arch -> data -> trainer -> hooks
-> train -> inference. (main_nd.py's determinism switch is the default here:
JAX is deterministic given fixed PRNG keys.)
"""
from __future__ import annotations

import os
from pathlib import Path

import jax

if os.environ.get("CONTRASTYOU_FORCE_CPU"):
    # the axon TPU plugin ignores JAX_PLATFORMS; force through jax.config
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from contrastyou_tpu import CONFIG_PATH, DATA_PATH, OPT_PATH
from contrastyou_tpu.configure import ConfigParser, yaml_load
from contrastyou_tpu.configure.config import merge
from contrastyou_tpu.data import get_data
from contrastyou_tpu.engine.checkpoint import extract_model_params
from contrastyou_tpu.hooks import create_hook_from_config
from contrastyou_tpu.loggers import logger
from contrastyou_tpu.models import get_arch
from contrastyou_tpu.trainers import trainer_zoo
from contrastyou_tpu.trainers.pretrain import get_contrastive_loader
from contrastyou_tpu.utils import fix_all_seed


def find_checkpoint(save_dir: str) -> str | None:
    """Auto-resume from last checkpoint in save_dir (ref utils.py:63-68)."""
    last = Path(save_dir) / "last"
    return str(last) if (last / "train_state.msgpack").exists() else None


def main(argv=None) -> float:
    parser = ConfigParser(default_yaml=Path(CONFIG_PATH) / "base.yaml")
    config = parser.parse(argv)
    print(parser.summary())

    seed = int(config.get("RandomSeed", 10))
    fix_all_seed(seed)

    # config-file perf routing (Perf.* section; env vars stay overrides) —
    # apply BEFORE any model/step code reads the knobs at trace time
    from contrastyou_tpu import perf
    perf.apply_config(config.get("Perf"))

    data_name = config["Data"]["name"]
    opt_file = Path(OPT_PATH) / f"{data_name}.yaml"
    if opt_file.exists():
        config = merge(config, {"OPT": yaml_load(opt_file).to_dict()})

    trainer_name = config["Trainer"]["name"]
    is_pretrain = trainer_name in ("pretrain", "pretrain_decoder")
    num_classes = int(config.get("OPT", {}).get("num_classes", 4))
    input_dim = int(config.get("OPT", {}).get("input_dim", 1))

    arch_params = dict(config.get("Arch", {}))
    arch_params.pop("true_num_classes", None)
    checkpoint = arch_params.pop("checkpoint", None)
    pretrained_path = arch_params.pop("pretrained_path", None)
    multicore_kwargs = {}
    model_num_classes = num_classes
    if trainer_name == "multicore":
        # model predicts true_classes * multiplier prototype channels
        # (ref main_multicore.py:50-65; only criterion name "naive" is
        # runnable in the reference too)
        mc = config.get("MulticoreParameters", {})
        crit_name = mc.get("name", "naive")
        if crit_name != "naive":
            raise RuntimeError(f"MulticoreParameters.name={crit_name!r} "
                               "(only 'naive' is supported, as upstream)")
        multiplier = int(mc.get("multiplier", 2))
        model_num_classes = num_classes * multiplier
        multicore_kwargs = dict(true_num_classes=num_classes,
                                multiplier=multiplier)
    model = get_arch(arch_params.pop("name", "unet"), input_dim=input_dim,
                     num_classes=model_num_classes, dtype=jnp.bfloat16,
                     **arch_params)

    labeled_loader, unlabeled_loader, val_loader, test_loader = get_data(
        config["Data"], config.get("LabeledLoader", {}),
        config.get("UnlabeledLoader", {}), root_dir=DATA_PATH,
        pretrain=is_pretrain, order_num=int(config["Data"].get("order_num", 0)))

    trainer_params = {k: v for k, v in config["Trainer"].items()
                     if k not in ("name", "device")}
    trainer_cls = trainer_zoo[trainer_name]
    kwargs = dict(model=model, labeled_loader=labeled_loader,
                  unlabeled_loader=unlabeled_loader, val_loader=val_loader,
                  test_loader=test_loader, config=config.to_dict(), seed=seed,
                  **multicore_kwargs, **trainer_params)
    if is_pretrain:
        clp = dict(config.get("ContrastiveLoaderParams", {}))
        clp.pop("num_workers", None)
        kwargs["contrast_loader"] = get_contrastive_loader(
            labeled_loader.dataset, data_name=data_name, seed=seed, **clp)
        kwargs["val_loader"] = None
        kwargs["test_loader"] = None
    trainer = trainer_cls(**kwargs)

    hooks = create_hook_from_config(config, is_pretrain=is_pretrain,
                                    trainer=trainer)
    trainer.register_hooks(*hooks)
    if pretrained_path:
        # offline pretrained warm start (ref arch/smp.py:15 ImageNet
        # encoder): a local npz archive, partial-merge semantics
        trainer.load_pretrained(pretrained_path)
    trainer.init()

    if checkpoint:
        trainer.load_model_params(
            extract_model_params(checkpoint, trainer.state.params))
    resume = config.get("trainer_checkpoint") or find_checkpoint(trainer.save_dir)
    if resume:
        trainer.resume_from_path(resume)

    best = trainer.start_training()
    if not is_pretrain and hasattr(trainer, "inference"):
        best_ckpt = Path(trainer.save_dir) / "best"
        trainer.inference(checkpoint=str(best_ckpt)
                          if best_ckpt.exists() else None)
    logger.info(f"training finished, best score: {best}")
    return best


if __name__ == "__main__":
    main()
