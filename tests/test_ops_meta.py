"""Ops/meta layer: report CLI, submitter, grid search."""
from pathlib import Path

import pandas as pd

from contrastyou_tpu.report import main as report_main
from contrastyou_tpu.submitter import SlurmSubmitter, grid_search


def _write_storage(run_dir: Path, values):
    run_dir.mkdir(parents=True, exist_ok=True)
    df = pd.DataFrame({"val/eval/dice/DSC_mean": values,
                       "tra/tra/sup_loss": [1.0 / (v + 0.1) for v in values]})
    df.to_csv(run_dir / "storage.csv")


def test_report_cli(tmp_path):
    _write_storage(tmp_path / "run_a", [0.1, 0.5, 0.4])
    _write_storage(tmp_path / "run_b", [0.2, 0.3, 0.9])
    out = report_main(["-t", str(tmp_path), "--classes", "DSC_mean",
                       "--save_dir", str(tmp_path / "summary")])
    assert len(out) == 2
    assert (tmp_path / "summary" / "summary.csv").exists()
    best = dict(zip(out["folder"], out["best_epoch"]))
    assert best[str(tmp_path / "run_a")] == 1
    assert best[str(tmp_path / "run_b")] == 2


def test_grid_search():
    grid = list(grid_search(lr=[1, 2], weight=[0.1, 0.2, 0.3]))
    assert len(grid) == 6
    assert {"lr": 1, "weight": 0.1} in grid


def test_submitter_dry_run():
    sub = SlurmSubmitter(work_dir="/tmp", dry_run=True,
                         account_list=["acct1", "acct2"], time=2)
    sub.configure_environment(["export FOO=1"])
    script1 = sub.submit("python main.py -o Trainer.name=semi")
    script2 = sub.submit("python main.py -o Trainer.name=ft")
    assert "#SBATCH --account=acct1" in script1
    assert "#SBATCH --account=acct2" in script2
    assert "export FOO=1" in script1
    assert "python main.py" in script1
    assert len(sub.submitted) == 2
