from .autoencoder import DenoisingAutoEncoderTrainerHook
from .ccblock import CrossCorrelationHook, create_cross_correlation_hook
from .consistency import ConsistencyTrainerHook
from .creator import create_hook_from_config
from .dmt import DifferentiableMeanTeacherTrainerHook
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
           "CrossCorrelationHook", "create_cross_correlation_hook",
           "create_hook_from_config", "DifferentiableMeanTeacherTrainerHook",
           "DiscreteIMSATTrainHook", "DiscreteMITrainHook",
           "EntropyMinTrainerHook", "INFONCEHook", "SelfPacedINFONCEHook",
           "SuperPixelInfoNCEHook", "IIDSegmentationTrainerHook",
           "IMSATTrainHook", "MixUpTrainHook", "ICTMeanTeacherTrainerHook",
           "MeanTeacherTrainerHook", "UAMeanTeacherTrainerHook", "ema_update",
           "OrthogonalTrainerHook", "PseudoLabelTrainerHook"]
