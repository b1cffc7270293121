"""tools/ingest_real.py — turnkey real-archive ingest (VERDICT r4 #7).

The machinery (md5, extract, layout/info validation) is fully exercised on
a zipped synthetic archive; the final test runs against a REAL archive and
auto-skips until one exists locally (set CONTRASTYOU_REAL_ARCHIVE to the
archive path and CONTRASTYOU_REAL_DATA_NAME to its dataset key)."""
import os
import sys
import zipfile
from pathlib import Path

import pytest

sys.path.append(str(Path(__file__).resolve().parent.parent / "tools"))

from ingest_real import extract_archive, md5_file, validate  # noqa: E402

from contrastyou_tpu.data.synthetic import synthesize_dataset  # noqa: E402


def _zip_tree(src: Path, archive: Path) -> None:
    with zipfile.ZipFile(archive, "w") as z:
        for p in sorted(src.rglob("*")):
            z.write(p, p.relative_to(src))


@pytest.fixture(scope="module")
def fake_archive(tmp_path_factory):
    """A zipped realistic-fake ACDC archive + its md5."""
    stage = tmp_path_factory.mktemp("ingest_stage")
    synthesize_dataset(stage, "acdc", num_train_scans=4, num_val_scans=2)
    archive = tmp_path_factory.mktemp("ingest_zip") / "ACDC_contrast.zip"
    _zip_tree(stage, archive)
    return archive


def test_ingest_extract_validate(fake_archive, tmp_path):
    digest = md5_file(fake_archive)
    assert len(digest) == 32
    extract_archive(fake_archive, tmp_path)
    summary = validate(tmp_path, "acdc")
    assert summary["train"]["scans"] == 4
    assert summary["val"]["scans"] == 2
    assert summary["train"]["info_file"]
    assert summary["train"]["partitions"] == [0, 1, 2]


def test_ingest_cli_end_to_end(fake_archive, tmp_path):
    from ingest_real import main
    rc = main(["--archive", str(fake_archive), "--data-name", "acdc",
               "--root", str(tmp_path), "--md5", md5_file(fake_archive)])
    assert rc == 0


def test_ingest_md5_mismatch_rejected(fake_archive, tmp_path):
    from ingest_real import main
    rc = main(["--archive", str(fake_archive), "--data-name", "acdc",
               "--root", str(tmp_path), "--md5", "0" * 32])
    assert rc == 3


def test_ingest_wrong_layout_detected(fake_archive, tmp_path):
    """An archive that extracts to the WRONG folder name must be reported
    with what was actually found."""
    extract_archive(fake_archive, tmp_path / "x")
    (tmp_path / "x" / "ACDC_contrast").rename(tmp_path / "x" / "wrong_name")
    with pytest.raises(FileNotFoundError, match="wrong_name"):
        validate(tmp_path / "x", "acdc")


def test_ingest_info_count_mismatch_detected(fake_archive, tmp_path):
    """Corrupt the *_info.npy slice counts — validation must flag the
    disagreement with what is on disk."""
    import numpy as np
    extract_archive(fake_archive, tmp_path)
    info_path = tmp_path / "ACDC_contrast" / "acdc_info.npy"
    info = np.load(info_path, allow_pickle=True).item()
    info[next(iter(info))] += 1
    np.save(info_path, info)
    with pytest.raises(RuntimeError, match="disagree"):
        validate(tmp_path, "acdc")


@pytest.mark.skipif(
    not os.environ.get("CONTRASTYOU_REAL_ARCHIVE"),
    reason="no real archive present (no network egress); set "
           "CONTRASTYOU_REAL_ARCHIVE=/path/to/archive.zip and "
           "CONTRASTYOU_REAL_DATA_NAME to run")
def test_ingest_real_archive(tmp_path):
    """THE real-data test (auto-skipped until an archive exists): extract,
    validate layout + info metadata, decode real pixels."""
    archive = os.environ["CONTRASTYOU_REAL_ARCHIVE"]
    data_name = os.environ.get("CONTRASTYOU_REAL_DATA_NAME", "acdc")
    extract_archive(archive, tmp_path)
    summary = validate(tmp_path, data_name)
    assert summary["train"]["slices"] > 0
