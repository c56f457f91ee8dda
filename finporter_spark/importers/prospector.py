"""Prospector: importer registry + inverted format index + detect fan-out.

Reference: /root/reference/Sources/Core/FINprospector.swift:24-60.
- ``source_map`` inverts format -> [importer] (:33-37) to prune the fan-out.
- ``prospect`` runs ``detect`` over eligible importers, collecting non-empty
  results; detect errors are SOFT — logged to stderr and skipped (:54-58),
  per SURVEY §2C-6 — while decode errors stay hard.
- ``get`` looks an importer up by id (:40-42).

Everything here is driver-side Python over a few KB of prefix — by design
(SURVEY §4: prefix-only sniffing avoids a full parse; no Spark job).
"""

from __future__ import annotations

import sys
from typing import Iterable, Mapping, Sequence

from finporter_spark.importers.base import DetectResult, Importer
from finporter_spark.model import AllocFormat


ProspectResult = Mapping[Importer, DetectResult]


class Prospector:
    def __init__(self, importers: Iterable[Importer]):
        self.importers: list[Importer] = list(importers)
        # Inverted index format -> [importer] (FINprospector.swift:33-37).
        self.source_map: dict[AllocFormat, list[Importer]] = {}
        for imp in self.importers:
            for fmt in imp.source_formats:
                self.source_map.setdefault(fmt, []).append(imp)

    def get(self, importer_id: str) -> Importer | None:
        """Lookup by id (FINprospector.swift:40-42)."""
        for imp in self.importers:
            if imp.id_ == importer_id:
                return imp
        return None

    def prospect(
        self,
        data_prefix: bytes,
        source_formats: Sequence[AllocFormat] = (AllocFormat.CSV,),
    ) -> dict[Importer, DetectResult]:
        """Fan detect out over format-eligible importers
        (FINprospector.swift:45-60); errors are logged, not raised."""
        out: dict[Importer, DetectResult] = {}
        seen: set[Importer] = set()
        for fmt in source_formats:
            for imp in self.source_map.get(fmt, []):
                if imp in seen:
                    continue
                seen.add(imp)
                try:
                    detected = imp.detect(data_prefix)
                except Exception as e:  # soft per :54-58
                    print(f"prospect: {imp.id_} detect failed: {e}", file=sys.stderr)
                    continue
                if detected:
                    out[imp] = detected
        return out


def default_prospector() -> Prospector:
    """Registry with every built-in importer (the engine's out-of-box
    surface; users append their own Importer subclasses)."""
    from finporter_spark.importers.allocdata import (
        AllocDataImporter,
        BrokerTransactionsImporter,
    )
    from finporter_spark.importers.tabular import PositionsImporter

    return Prospector(
        [AllocDataImporter(), BrokerTransactionsImporter(), PositionsImporter()]
    )
