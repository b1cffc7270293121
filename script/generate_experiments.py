"""Experiment script generator — emits `python main.py ...` command lines (or
sbatch scripts) for hyperparameter grids per method.

Unified capability match for the reference's 24 ``script/script_generator_*``
files (script/, 4306 LoC): each method entry below reproduces one generator's
hook preset + grid; `--submit` wraps commands with the SlurmSubmitter.

Usage:
  python script/generate_experiments.py --method mt --data acdc \
      --labeled-scans 1 2 4 --save-dir runs/mt_sweep [--submit|--dry-run]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from contrastyou_tpu.submitter import SlurmSubmitter, grid_search  # noqa: E402

CONFIG = Path(__file__).resolve().parents[1] / "config"

METHODS = {
    "baseline": {"hooks": [], "trainer": "ft",
                 "grid": {}},
    "mt": {"hooks": ["mt.yaml"], "trainer": "mt",
           "grid": {"MeanTeacherParameters.weight": [0.1, 1, 10]}},
    "uamt": {"hooks": ["uamt.yaml"], "trainer": "mt",
             "grid": {"UAMeanTeacherParameters.weight": [0.1, 1, 10]}},
    "ict": {"hooks": ["ict.yaml"], "trainer": "mt",
            "grid": {"ICTMeanTeacherParameters.weight": [0.1, 1, 10]}},
    "entmin": {"hooks": ["entmin.yaml"], "trainer": "semi",
               "grid": {"EntropyMinParameters.weight": [0.0001, 0.001, 0.01]}},
    "pseudolabel": {"hooks": ["pseudolabel.yaml"], "trainer": "semi",
                    "grid": {"PsuedoLabelParams.weight": [0.01, 0.1, 1]}},
    "consistency": {"hooks": ["consistency.yaml"], "trainer": "semi",
                    "grid": {"ConsistencyParameters.weight": [1, 5, 10]}},
    "iid": {"hooks": ["iid.yaml"], "trainer": "semi",
            "grid": {"IIDSegParameters.weight": [0.01, 0.1]}},
    "udaiic": {"hooks": ["udaiic.yaml"], "trainer": "semi",
               "grid": {"DiscreteMIConsistencyParams.consistency_weight": [1, 5]}},
    "mixup": {"hooks": ["mixup.yaml"], "trainer": "mixup",
              "grid": {"MixUpParams.weight": [0.1, 1]}},
    "adv": {"hooks": ["adv.yaml"], "trainer": "adv",
            "grid": {"Trainer.reg_weight": [0.001, 0.01]}},
    "dmt": {"hooks": ["dmt.yaml"], "trainer": "dmt",
            "grid": {"DifferentiableMeanTeacherParameters.method_name":
                     ["method1", "method2", "method3", "method4"]}},
    "infonce_pretrain": {"hooks": ["infonce_encoder.yaml"],
                         "trainer": "pretrain", "pretrain": True,
                         "grid": {"InfonceParams.contrast_ons":
                                  ["partition", "patient", "self"]}},
    "spinfonce_pretrain": {"hooks": ["spinfonce.yaml"], "trainer": "pretrain",
                           "pretrain": True,
                           "grid": {"SPInfonceParams.begin_values": [100, 10000],
                                    "SPInfonceParams.mode": ["soft", "hard"]}},
    "ccblocks": {"hooks": ["ccblocks2.yaml"], "trainer": "semi",
                 "grid": {"CrossCorrelationParameters.num_clusters": [10, 20, 40],
                          "CrossCorrelationParameters.hooks.rr.alpha":
                          [0.0, 0.5, 1.0]}},
    "superpixel_pretrain": {"hooks": ["infonce_dense_superpixel.yaml"],
                            "trainer": "pretrain_decoder", "pretrain": True,
                            "grid": {}},
}


def build_commands(method: str, data: str, labeled_scans, save_dir: str,
                   max_epoch: int | None = None):
    spec = METHODS[method]
    configs = [str(CONFIG / "base.yaml")]
    if spec.get("pretrain"):
        configs.append(str(CONFIG / "pretrain.yaml"))
    configs += [str(CONFIG / "hooks" / h) for h in spec["hooks"]]
    commands = []
    for scans in labeled_scans:
        for i, grid_point in enumerate(grid_search(**spec["grid"]) if
                                       spec["grid"] else [{}]):
            opts = [f"Trainer.name={spec['trainer']}", f"Data.name={data}",
                    f"Data.labeled_scan_num={scans}",
                    f"Trainer.save_dir={save_dir}/{method}/{data}/"
                    f"scan{scans}/run{i}"]
            if max_epoch:
                opts.append(f"Trainer.max_epoch={max_epoch}")
            opts += [f"{k}={v}" for k, v in grid_point.items()]
            commands.append(
                "python main.py -p " + " ".join(configs) + " -o " + " ".join(opts))
    return commands


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", required=True, choices=sorted(METHODS))
    parser.add_argument("--data", default="acdc")
    parser.add_argument("--labeled-scans", type=int, nargs="+", default=[1])
    parser.add_argument("--save-dir", default="runs/sweep")
    parser.add_argument("--max-epoch", type=int, default=None)
    parser.add_argument("--submit", action="store_true")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    commands = build_commands(args.method, args.data, args.labeled_scans,
                              args.save_dir, args.max_epoch)
    if args.submit or args.dry_run:
        sub = SlurmSubmitter(work_dir=str(Path.cwd()), dry_run=args.dry_run)
        for cmd in commands:
            sub.submit(cmd)
    else:
        print("\n".join(commands))


if __name__ == "__main__":
    main()
