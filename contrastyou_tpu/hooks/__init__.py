from .autoencoder import DenoisingAutoEncoderTrainerHook
from .consistency import ConsistencyTrainerHook
from .discretemi import DiscreteIMSATTrainHook, DiscreteMITrainHook
from .entmin import EntropyMinTrainerHook
from .infonce import INFONCEHook, SelfPacedINFONCEHook, SuperPixelInfoNCEHook
from .midl import IIDSegmentationTrainerHook, IMSATTrainHook
from .mixup import MixUpTrainHook
from .mt import (ICTMeanTeacherTrainerHook, MeanTeacherTrainerHook,
                 UAMeanTeacherTrainerHook, ema_update)
from .orthogonal import OrthogonalTrainerHook
from .pseudolabel import PseudoLabelTrainerHook

__all__ = ["DenoisingAutoEncoderTrainerHook", "ConsistencyTrainerHook",
           "DiscreteIMSATTrainHook", "DiscreteMITrainHook",
           "EntropyMinTrainerHook", "INFONCEHook", "SelfPacedINFONCEHook",
           "SuperPixelInfoNCEHook", "IIDSegmentationTrainerHook",
           "IMSATTrainHook", "MixUpTrainHook", "ICTMeanTeacherTrainerHook",
           "MeanTeacherTrainerHook", "UAMeanTeacherTrainerHook", "ema_update",
           "OrthogonalTrainerHook", "PseudoLabelTrainerHook"]
