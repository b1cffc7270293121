"""Visualize decoder-pretrain cluster assignments.

Capability match for /root/reference/plot_pretrain_cluster.py:24-111: run a
(short) decoder pretraining with cluster-producing hooks, then dump per-slice
cluster-assignment maps (png + npy), a Hungarian-aligned cluster-vs-label
accuracy, and a tSNE plot of pooled decoder features — the artifacts the
reference produced through its ``contrast_save_flag`` env plumbing.

Usage (reference argv semantics):
    python plot_pretrain_cluster.py -p config/base.yaml config/hooks/udaiic.yaml \
        -o Trainer.save_dir=plot_cluster Trainer.max_epoch=2 ...
"""
from __future__ import annotations

import os
from pathlib import Path

import jax

if os.environ.get("CONTRASTYOU_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from contrastyou_tpu import CONFIG_PATH, DATA_PATH, OPT_PATH
from contrastyou_tpu.configure import ConfigParser, yaml_load
from contrastyou_tpu.configure.config import merge
from contrastyou_tpu.data import get_data
from contrastyou_tpu.hooks import create_hook_from_config
from contrastyou_tpu.loggers import logger
from contrastyou_tpu.models import get_arch
from contrastyou_tpu.postprocess.cluster import (cluster_alignment,
                                                 hungarian_match)
from contrastyou_tpu.postprocess.tsne import plot_tsne
from contrastyou_tpu.trainers import PretrainDecoderTrainer
from contrastyou_tpu.trainers.pretrain import get_contrastive_loader
from contrastyou_tpu.utils import fix_all_seed


def _cluster_hooks(hooks):
    """Hooks owning a dense projector over a named feature tap."""
    return [h for h in hooks
            if getattr(h, "_projector", None) is not None
            and getattr(h, "_feature_name", None)
            and not getattr(h, "_on_logits", False)]


def dump_cluster_maps(trainer, loader, out_dir: Path, max_batches: int = 8
                      ) -> dict:
    """Per-slice argmax cluster maps + npy dumps + Hungarian accuracy."""
    out_dir.mkdir(parents=True, exist_ok=True)
    hooks = _cluster_hooks(trainer._hooks)
    assert hooks, "no cluster-producing hook registered (need a dense " \
                  "projector hook, e.g. udaiic/ccblocks presets)"
    bundle = trainer.bundle
    params = trainer.state.params
    batch_stats = trainer.state.batch_stats
    results = {}
    for hook in hooks:
        taps = (hook._feature_name,)
        proj_params = trainer.state.hook_params[hook.name]
        clusters_all, labels_all, feats_all, parts_all = [], [], [], []
        for bi, batch in enumerate(loader):
            if bi >= max_batches:
                break
            image = jnp.asarray(batch["image"])
            (_, tap_dict), _ = bundle.apply_train(
                params, batch_stats, image, taps=taps, update_stats=False)
            feat = tap_dict[hook._feature_name]
            dists = hook._projector.apply({"params": proj_params}, feat)
            # [S, B, h, w, K] -> first subhead
            assign = np.asarray(jnp.argmax(dists[0], axis=-1))  # [B, h, w]
            clusters_all.append(assign)
            labels_all.append(np.asarray(batch["target"]))
            feats_all.append(np.asarray(feat.mean(axis=(1, 2))))
            parts_all.append(np.asarray(batch["partition"]))
            np.save(out_dir / f"{hook.name.replace('/', '_')}_b{bi}.npy",
                    assign)
            _save_pngs(np.asarray(image), assign, out_dir, hook.name, bi)
        clusters = np.concatenate(clusters_all)
        labels = np.concatenate(labels_all)
        # Hungarian match cluster ids -> label ids at the cluster resolution
        sub = _downsample_labels(labels, clusters.shape[1:])
        flat_c, flat_r = clusters.reshape(-1), sub.reshape(-1)
        k = int(max(flat_c.max(), flat_r.max()) + 1)
        mapping = hungarian_match(flat_c, flat_r, k)
        aligned = cluster_alignment(flat_c, flat_r, num_clusters=k)
        results[hook.name] = {"cluster_acc": float((aligned == flat_r).mean()),
                              "mapping": {int(a): int(b)
                                          for a, b in mapping.items()}}
        plot_tsne(np.concatenate(feats_all), np.concatenate(parts_all),
                  out_dir / f"{hook.name.replace('/', '_')}_tsne.png")
    return results


def _downsample_labels(labels: np.ndarray, hw) -> np.ndarray:
    h, w = hw
    H, W = labels.shape[1:]
    ys = (np.arange(h) * H // h)
    xs = (np.arange(w) * W // w)
    return labels[:, ys][:, :, xs]


def _save_pngs(images, assigns, out_dir: Path, hook_name: str, bi: int
               ) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    n = min(4, images.shape[0])
    fig, axes = plt.subplots(2, n, figsize=(3 * n, 6))
    for i in range(n):
        axes[0, i].imshow(images[i, ..., 0], cmap="gray")
        axes[0, i].axis("off")
        axes[1, i].imshow(assigns[i], cmap="tab20")
        axes[1, i].axis("off")
    fig.tight_layout()
    fig.savefig(out_dir / f"{hook_name.replace('/', '_')}_b{bi}.png", dpi=80)
    plt.close(fig)


def main(argv=None) -> dict:
    parser = ConfigParser(default_yaml=Path(CONFIG_PATH) / "base.yaml")
    config = parser.parse(argv)
    seed = int(config.get("RandomSeed", 10))
    fix_all_seed(seed)

    data_name = config["Data"]["name"]
    opt_file = Path(OPT_PATH) / f"{data_name}.yaml"
    if opt_file.exists():
        config = merge(config, {"OPT": yaml_load(opt_file).to_dict()})
    num_classes = int(config.get("OPT", {}).get("num_classes", 4))
    input_dim = int(config.get("OPT", {}).get("input_dim", 1))

    arch_params = dict(config.get("Arch", {}))
    arch_params.pop("true_num_classes", None)
    arch_params.pop("checkpoint", None)
    model = get_arch(arch_params.pop("name", "unet"), input_dim=input_dim,
                     num_classes=num_classes, dtype=jnp.bfloat16,
                     **arch_params)

    labeled_loader, unlabeled_loader, val_loader, _ = get_data(
        config["Data"], config.get("LabeledLoader", {}),
        config.get("UnlabeledLoader", {}), root_dir=DATA_PATH,
        pretrain=True, order_num=int(config["Data"].get("order_num", 0)))

    trainer_params = {k: v for k, v in config["Trainer"].items()
                      if k not in ("name", "device")}
    clp = dict(config.get("ContrastiveLoaderParams", {}))
    clp.pop("num_workers", None)
    trainer = PretrainDecoderTrainer(
        model=model, labeled_loader=labeled_loader,
        unlabeled_loader=unlabeled_loader, val_loader=None, test_loader=None,
        contrast_loader=get_contrastive_loader(
            labeled_loader.dataset, data_name=data_name, seed=seed, **clp),
        config=config.to_dict(), seed=seed, **trainer_params)
    # hooks are created with is_pretrain=False like the reference script
    # (plot_pretrain_cluster.py:81) — mi/cc hooks drive the clustering while
    # the decoder-pretrain trainer provides the truncated two-view loop
    hooks = create_hook_from_config(config, is_pretrain=False, trainer=trainer)
    trainer.register_hooks(*hooks)
    trainer.init()
    trainer.start_training()

    out_dir = Path(trainer.save_dir) / "cluster_plots"
    results = dump_cluster_maps(trainer, val_loader, out_dir)
    logger.info(f"cluster plots -> {out_dir}: {results}")
    import json
    (out_dir / "cluster_metrics.json").write_text(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
