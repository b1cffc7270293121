"""Semi-supervised trainer (ref: semi_seg/trainers/trainer.py:27-122
``SemiTrainer`` driving ``SemiSupervisedEpocher``): labeled + unlabeled
two-view batches, supervised KL + hook regularizers, scan-grouped inference
with dice + ASD written to inference_result.json."""
from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..engine.trainer import Trainer
from ..loggers import logger
from ..meters import AverageValueMeter, MeterInterface, SurfaceMeter, UniversalDice


class SemiTrainer(Trainer):
    train_mode = "semi"
    activate_hooks = True

    def inference(self, scan_loader=None, checkpoint: str | None = None,
                  save_predictions: bool = False,
                  tta: bool | None = None) -> dict:
        """Scan-batched inference: 3D dice + average surface distance
        (ref: trainer.py:71-122, epochers/epocher.py:174-204); optional
        per-slice PNG prediction dumps (ref InferenceSaver).

        ``tta`` (or config ``Inference.tta``): average probabilities over
        the 4 axis flips (engine/steps.py tta_probs — TPU-build extra)."""
        assert self._initialized
        if tta is None:
            tta = bool(self._config.get("Inference", {}).get("tta", False))
        if checkpoint is not None:
            self.resume_from_path(checkpoint)
        loader = scan_loader if scan_loader is not None else self._test_loader
        saver = None
        if save_predictions:
            from .savers import InferenceSaver
            saver = InferenceSaver(self._save_dir)
        num_classes = self.num_classes
        meters = MeterInterface(default_focus="inference")
        meters.register_meter("loss", AverageValueMeter())
        dice = meters.register_meter("dice", UniversalDice(
            num_classes, report_axis=range(1, num_classes)))
        asd = meters.register_meter("asd", SurfaceMeter(
            num_classes, report_axis=range(1, num_classes), metername="asd"))
        params, batch_stats = self._inference_state()
        eval_step = self._eval_step
        if tta:
            from ..engine.steps import build_eval_step
            eval_step = build_eval_step(
                self._bundle, prob_transform=self._prob_transform,
                target_num_classes=self._target_num_classes, tta=True)
        from ..data.wire import pack_array as pk
        with meters:
            for batch in loader:
                loss, pred, inter, union = eval_step(
                    params, batch_stats, jnp.asarray(pk(batch["image"])),
                    jnp.asarray(pk(batch["target"])),
                    jnp.asarray(batch["mask"]))
                meters.add("loss", loss)
                dice.add_counts(inter, union, group_name=batch["scan"])
                asd.add(np.asarray(pred), batch["target"],
                        group_name=batch["scan"])
                if saver is not None:
                    saver.save_batch(image=batch["image"],
                                     target=batch["target"],
                                     pred=np.asarray(pred),
                                     filenames=batch["filename"],
                                     mask=batch["mask"])
        result = {g: v for g, v in meters.statistics()}["inference"]
        out = {"dice": result["dice"], "asd": result["asd"],
               "loss": float(result["loss"])}
        with open(Path(self._save_dir) / "inference_result.json", "w") as f:
            json.dump(out, f, indent=2)
        logger.info(f"inference: {out['dice']}")
        return out
