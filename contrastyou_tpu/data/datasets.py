"""Concrete dataset registry.

Capability match for contrastyou/data/dataset/{acdc,prostate,mmwhs,...}.py and
semi_seg/data/dataset.py: per-dataset folder layout, scan-grouping regex,
anatomical partition counts, and gdrive auto-download. This environment has no
network egress, so downloads are gated: if the folder tree is missing, a clear
error points at ``synthesize`` (tests/bench use the synthetic generator which
writes the identical layout).
"""
from __future__ import annotations

from pathlib import Path

from .base import SliceDataset

__all__ = ["ACDCDataset", "ProstateDataset", "ProstateMDDataset", "mmWHSCTDataset",
           "mmWHSMRDataset", "SpleenDataset", "HippocampusDataset", "data_zoo",
           "dataset_spec"]


class ACDCDataset(SliceDataset):
    folder_name = "ACDC_contrast"
    download_link = "https://drive.google.com/uc?id=1SMAS6R46BOafLKE9T8MDSVGAiavXPV-E"
    group_re = r"patient\d+_\d+"
    partition_num = 3
    num_classes = 4
    sub_folders = ("img", "gt")

    def __init__(self, *, root_dir: str, mode: str, transforms=None):
        root = Path(root_dir) / self.folder_name
        if not root.exists():
            raise FileNotFoundError(
                f"{self.__class__.__name__}: {root} missing. No network egress in "
                f"this environment — place the extracted archive there or use "
                f"contrastyou_tpu.data.synthetic.synthesize('{self.folder_name}', ...)")
        super().__init__(root_dir=str(root), mode=mode,
                         sub_folders=list(self.sub_folders),
                         sub_folder_types=["image"] + ["gt"] * (len(self.sub_folders) - 1),
                         transforms=transforms)


class ACDCSuperPixelDataset(ACDCDataset):
    """ACDC with precomputed superpixel maps (ref acdc.py:12 sub_folders)."""
    sub_folders = ("img", "gt", "superpixel")

    def __init__(self, *, root_dir: str, mode: str, transforms=None):
        SliceDataset.__init__(
            self, root_dir=str(Path(root_dir) / self.folder_name), mode=mode,
            sub_folders=list(self.sub_folders),
            sub_folder_types=["image", "gt", "gt"], transforms=transforms)


class ProstateDataset(SliceDataset):
    folder_name = "ProstateDK"
    group_re = r"Case\d+"
    partition_num = 8
    num_classes = 2

    def __init__(self, *, root_dir: str, mode: str, transforms=None):
        super().__init__(root_dir=str(Path(root_dir) / self.folder_name),
                         mode=mode, transforms=transforms)


class ProstateMDDataset(SliceDataset):
    folder_name = "Prostate_MD"
    group_re = r"prostate_\d+"
    partition_num = 4
    num_classes = 2

    def __init__(self, *, root_dir: str, mode: str, transforms=None):
        super().__init__(root_dir=str(Path(root_dir) / self.folder_name),
                         mode=mode, transforms=transforms)


class mmWHSCTDataset(SliceDataset):
    folder_name = "MMWHS"
    group_re = r"ct_train_\d+"
    partition_num = 5
    num_classes = 5

    def __init__(self, *, root_dir: str, mode: str, transforms=None):
        super().__init__(root_dir=str(Path(root_dir) / self.folder_name),
                         mode=mode, transforms=transforms)


class mmWHSMRDataset(mmWHSCTDataset):
    group_re = r"mr_train_\d+"


class SpleenDataset(SliceDataset):
    folder_name = "Spleen"
    group_re = r"spleen_\d+"
    partition_num = 5
    num_classes = 2

    def __init__(self, *, root_dir: str, mode: str, transforms=None):
        super().__init__(root_dir=str(Path(root_dir) / self.folder_name),
                         mode=mode, transforms=transforms)


class HippocampusDataset(SliceDataset):
    folder_name = "Hippocampus"
    group_re = r"hippocampus_\d+"
    partition_num = 3
    num_classes = 3

    def __init__(self, *, root_dir: str, mode: str, transforms=None):
        super().__init__(root_dir=str(Path(root_dir) / self.folder_name),
                         mode=mode, transforms=transforms)


data_zoo = {
    "acdc": ACDCDataset, "acdc_lv": ACDCDataset, "acdc_rv": ACDCDataset,
    "acdc_myo": ACDCDataset, "acdc_superpixel": ACDCSuperPixelDataset,
    "prostate": ProstateDataset, "prostate_md": ProstateMDDataset,
    "mmwhsct": mmWHSCTDataset, "mmwhsmr": mmWHSMRDataset,
    "spleen": SpleenDataset, "hippocampus": HippocampusDataset,
}


def dataset_spec(name: str) -> dict:
    """Static metadata (classes, partitions) without instantiating."""
    cls = data_zoo[name]
    return {"num_classes": cls.num_classes, "partition_num": cls.partition_num,
            "folder_name": cls.folder_name, "group_re": cls.group_re}
