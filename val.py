"""Fine-tune sweep: after contrastive pretraining, fine-tune the pretrained
weights at each labeled-data ratio and record the dice trajectory
(ref: val.py:25-75 + main_pretrain_encoder.py)."""
from __future__ import annotations

import copy
import os
from pathlib import Path
from typing import Any, Dict, List

from contrastyou_tpu import DATA_PATH, success
from contrastyou_tpu.data import get_data
from contrastyou_tpu.loggers import logger
from contrastyou_tpu.trainers import FineTuneTrainer


def val(*, model, pretrained_params, save_dir: str, base_config: Dict[str, Any],
        labeled_ratios: List[int], seed: int = 10,
        root_dir: str | None = None) -> Dict[int, float]:
    """Fine-tune ``pretrained_params`` at each labeled scan count; returns
    {labeled_scan_num: best val dice}."""
    results: Dict[int, float] = {}
    for ratio in labeled_ratios:
        config = copy.deepcopy(dict(base_config))
        config["Data"]["labeled_scan_num"] = int(ratio)
        labeled_loader, unlabeled_loader, val_loader, test_loader = get_data(
            config["Data"], config.get("LabeledLoader", {}),
            config.get("UnlabeledLoader", {}),
            root_dir=root_dir or DATA_PATH,
            order_num=int(config["Data"].get("order_num", 0)))
        n_scans = len(labeled_loader.dataset.get_scan_list())
        run_dir = os.path.join(save_dir, "tra", f"num_labeled_scan_{n_scans}")
        trainer_params = {k: v for k, v in config["Trainer"].items()
                          if k not in ("name", "device", "save_dir")}
        trainer = FineTuneTrainer(
            model=model, labeled_loader=labeled_loader,
            unlabeled_loader=unlabeled_loader, val_loader=val_loader,
            test_loader=test_loader, save_dir=run_dir, config=config,
            seed=seed, **trainer_params)
        trainer.init()
        trainer.load_model_params(copy.deepcopy(pretrained_params))
        last = Path(trainer.save_dir) / "last"
        if (last / "train_state.msgpack").exists():
            trainer.resume_from_path(str(last))
        best = trainer.start_training()
        success(trainer.save_dir)
        results[n_scans] = best
        logger.info(f"ratio {n_scans}: best dice {best:.4f}")
    return results
