from .base import SliceDataset, extract_sub_dataset_based_on_scan_names, get_stem
from .creator import (create_tra_test_dataset, create_val_loader, get_data,
                      split_dataset, split_dataset_with_predefined_filenames)
from .datasets import (ACDCDataset, HippocampusDataset, ProstateDataset,
                       ProstateMDDataset, SpleenDataset, data_zoo, dataset_spec,
                       mmWHSCTDataset, mmWHSMRDataset)
from .loader import BatchLoader, collate
from .sampler import ContrastBatchSampler, InfiniteRandomSampler, ScanBatchSampler
from .synthetic import make_synthetic_root, synthesize_acdc_like

__all__ = ["SliceDataset", "extract_sub_dataset_based_on_scan_names", "get_stem",
           "create_tra_test_dataset", "create_val_loader", "get_data",
           "split_dataset", "split_dataset_with_predefined_filenames",
           "ACDCDataset", "HippocampusDataset", "ProstateDataset",
           "ProstateMDDataset", "SpleenDataset", "data_zoo", "dataset_spec",
           "mmWHSCTDataset", "mmWHSMRDataset", "BatchLoader", "collate",
           "ContrastBatchSampler", "InfiniteRandomSampler", "ScanBatchSampler",
           "make_synthetic_root", "synthesize_acdc_like"]
