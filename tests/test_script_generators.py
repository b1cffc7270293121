"""Experiment-generator + ops-utility scripts (ref script/ — the 24
script_generator_* files, create_superpixel.py, delete_failed_runs.py)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "script"))

from generate_experiments import (METHODS, build_chained_commands,  # noqa: E402
                                  build_commands)


def test_all_methods_emit_commands():
    for method in METHODS:
        cmds = build_commands(method, "acdc", [1], "runs/x", max_epoch=2)
        assert cmds, method
        for c in cmds:
            assert c.startswith("python main.py -p "), c
            assert "Trainer.save_dir=" in c


def test_method_surface_covers_reference_families():
    # one entry per reference generator family (script/*.py + comparison/)
    for fam in ("mt", "uamt", "ict", "entmin", "pseudolabel", "adv", "dmt",
                "mixup", "iid", "udaiic", "imsat", "multicore",
                "multicore_mt", "infonce_pretrain", "spinfonce_pretrain",
                "infonce_ed_pretrain", "pretrain_cc",
                "infonce_e_cc_d_pretrain", "pretrain_clusters",
                "superpixel_pretrain", "ccblocks", "consistency", "baseline"):
        assert fam in METHODS, fam


def test_grid_cross_product():
    cmds = build_commands("multicore", "acdc", [1, 2], "runs/x")
    # 3 iic weights x 4 consistency weights x 2 scan counts
    assert len(cmds) == 24


def test_chained_pretrain_ft_structure():
    jobs = build_chained_commands("infonce_ed_pretrain", "acdc", "runs/x",
                                  per_class=True, max_epoch=2,
                                  max_epoch_pretrain=3)
    assert len(jobs) == 4  # 2 weights x 2 spatial sizes
    first = jobs[0].split(" && \\\n")
    assert "Trainer.name=pretrain_decoder" in first[0]
    assert "pretrain.yaml" in first[0]
    # acdc labeled_ratios[:-1] = [1,2,4,174] x 3 classes + 1 pretrain job
    assert len(first) == 1 + 4 * 3
    for ft in first[1:]:
        assert "Trainer.name=ft" in ft
        assert "Arch.checkpoint=runs/x/infonce_ed_pretrain/acdc/run0/pretrain/last" in ft
        assert any(f"Data.name=acdc_{c}" in ft for c in ("lv", "rv", "myo"))
    # lr read from opt/acdc.yaml
    assert "Optim.lr=0.0000005000" in first[0]
    assert "Optim.lr=0.0000001000" in first[1]


def test_chained_rejects_non_pretrain():
    import pytest
    with pytest.raises(ValueError):
        build_chained_commands("mt", "acdc", "runs/x")


def test_delete_failed_runs(tmp_path):
    ok = tmp_path / "sweep" / "run0"
    bad = tmp_path / "sweep" / "run1"
    for d in (ok, bad):
        d.mkdir(parents=True)
        (d / "config.yaml").write_text("Trainer: {}\n")
        (d / "storage.csv").write_text("a,b\n")
    (ok / ".success").touch()
    out = subprocess.run(
        [sys.executable, str(REPO / "script" / "delete_failed_runs.py"),
         str(tmp_path / "sweep")],
        capture_output=True, text=True, check=True)
    assert "2 experiments, 1 failed" in out.stdout
    assert (ok / "storage.csv").exists()
    assert not (bad / "storage.csv").exists()


def test_create_superpixel_cli(tmp_path):
    img_dir = tmp_path / "ACDC_contrast" / "train" / "img"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name in ("patient001_00_0.png", "patient001_00_1.png"):
        Image.fromarray(rng.integers(0, 255, (64, 64), dtype=np.uint8)
                        ).save(img_dir / name)
    out = subprocess.run(
        [sys.executable, str(REPO / "script" / "create_superpixel.py"),
         str(tmp_path / "ACDC_contrast"), "--n-segments", "8"],
        capture_output=True, text=True, check=True)
    assert "wrote 2 superpixel maps" in out.stdout
    sp_dir = tmp_path / "ACDC_contrast" / "train" / "superpixel"
    maps = sorted(sp_dir.iterdir())
    assert [m.name for m in maps] == ["patient001_00_0.png",
                                      "patient001_00_1.png"]
    labels = np.asarray(Image.open(maps[0]))
    assert labels.shape == (64, 64) and len(np.unique(labels)) > 1
