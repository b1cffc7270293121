from .averages import (AverageValueDictionaryMeter, AverageValueListMeter,
                       AverageValueMeter)
from .dice import UniversalDice
from .interface import MeterInterface
from .metric import Metric
from .storage import HistoricalContainer, Storage
from .surface import SurfaceMeter

__all__ = ["AverageValueDictionaryMeter", "AverageValueListMeter", "AverageValueMeter",
           "UniversalDice", "MeterInterface", "Metric", "HistoricalContainer",
           "Storage", "SurfaceMeter"]
