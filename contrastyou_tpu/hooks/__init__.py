from .consistency import ConsistencyTrainerHook
from .entmin import EntropyMinTrainerHook
from .pseudolabel import PseudoLabelTrainerHook

__all__ = ["ConsistencyTrainerHook", "EntropyMinTrainerHook",
           "PseudoLabelTrainerHook"]
