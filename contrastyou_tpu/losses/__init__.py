from .contrastive import (SelfPacedSupConLoss, SupConLoss, pair_masks_from_target,
                          self_paced_sup_con_loss, sup_con_loss)
from .cross_correlation import CCLoss, windowed_ncc_loss
from .dice import BinaryDiceLoss, DiceLoss, binary_dice_loss, dice_loss
from .discrete_mi import (IIDLoss, IIDSegmentationLoss, IIDSegmentationSmallPathLoss,
                          IMSATLoss, compute_joint, compute_joint_2d,
                          compute_joint_2d_with_padding_zeros, iid_loss,
                          iid_segmentation_loss, imsat_loss)
from .kl import Entropy, JSDiv, KLDiv, entropy_loss, jsd_div, kl_div
from .multicore import MultiCoreKL, scale_grad
from .pica import pui_loss, pui_seg_loss
from .redundancy import RedundancyCriterion, redundancy_criterion

__all__ = [
    "SelfPacedSupConLoss", "SupConLoss", "pair_masks_from_target",
    "self_paced_sup_con_loss", "sup_con_loss", "CCLoss", "windowed_ncc_loss",
    "BinaryDiceLoss", "DiceLoss", "binary_dice_loss", "dice_loss", "IIDLoss",
    "IIDSegmentationLoss", "IIDSegmentationSmallPathLoss", "IMSATLoss",
    "compute_joint", "compute_joint_2d", "compute_joint_2d_with_padding_zeros",
    "iid_loss", "iid_segmentation_loss", "imsat_loss", "Entropy", "JSDiv", "KLDiv",
    "entropy_loss", "jsd_div", "kl_div", "MultiCoreKL", "scale_grad", "pui_loss",
    "pui_seg_loss", "RedundancyCriterion", "redundancy_criterion",
]
