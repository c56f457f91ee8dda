from finporter_spark.importers.base import DetectResult, Importer
from finporter_spark.importers.prospector import Prospector, ProspectResult
from finporter_spark.importers.tabular import PositionsImporter


def default_prospector() -> Prospector:
    return Prospector([PositionsImporter()])


__all__ = [
    "Importer",
    "DetectResult",
    "Prospector",
    "ProspectResult",
    "PositionsImporter",
    "default_prospector",
]
