"""`format("finport")` — a real Spark 4 Python DataSource for the
standardized AllocData HOLDING export (the "Detect-as-DataSource"
candidate from SURVEY §4, now implemented).

A user points `spark.read.format("finport").load(dir)` at a directory of
AllocData holding CSVs (header = the declared attribute order,
`FINporter.swift:62,66`; typed-decode rules per field mirroring
`importers/allocdata._typed_column`) and gets the typed DataFrame with
no driver-side handler involved:

- **one InputPartition per file** — files decode in parallel on
  executors, scaling with the file count exactly like Spark's native
  CSV source (partition-local pure-Python parse: executors have no
  SparkSession, so the importer's DataFrame decode cannot run there —
  a connector re-expresses decode row-locally by design);
- **filter pushdown** (`pushFilters`): EqualTo / IsNotNull /
  In on any column are absorbed and applied during the partition read,
  so filtered rows never cross the Python→JVM Arrow boundary; every
  other predicate is returned to Spark to evaluate;
- header verification per file: a file whose first line is not the
  declared HOLDING header raises (the detect contract — wrong-entity
  files must fail loudly, not decode garbage).

Decode rules (same semantics as the Spark-side importer):
required string keys decode empty fields to "" (never null); doubles
via try-float (invalid → null); timestamps accept ISO
`yyyy-MM-dd'T'HH:mm:ss` and bare `yyyy-MM-dd` (midnight).
"""

from __future__ import annotations

import csv
import io
import os
from datetime import datetime

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

HOLDING_FIELDS = [
    ("accountID", StringType(), False),
    ("securityID", StringType(), False),
    ("lotID", StringType(), False),
    ("shareCount", DoubleType(), True),
    ("shareBasis", DoubleType(), True),
    ("acquiredAt", TimestampType(), True),
]
_HEADER = [n for n, _, _ in HOLDING_FIELDS]
_REQUIRED_STR = {n for n, t, nullable in HOLDING_FIELDS if not nullable}
_DOUBLE = {n for n, t, _ in HOLDING_FIELDS if isinstance(t, DoubleType)}
_TS = {n for n, t, _ in HOLDING_FIELDS if isinstance(t, TimestampType)}


def _parse_ts(s: str):
    s = s.strip()
    if not s:
        return None
    # ISO-Z first (what the golden encoder and the finport writer emit),
    # then zoneless ISO, then bare date at midnight — the same
    # precedence as importers/allocdata._typed_column
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def _parse_double(s: str):
    s = s.strip()
    if not s:
        return None
    try:
        return float(s)
    except ValueError:
        return None


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FinportReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("finport: .load(path) directory is required")
        self._pushed: list = []

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, (EqualTo, In, IsNotNull)) and len(
                f.attribute
            ) == 1 and f.attribute[0] in _HEADER:
                self._pushed.append(f)
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".csv") and not f.startswith(("_", "."))
        )
        if not files:
            raise FileNotFoundError(
                f"finport: no .csv files under {self.path}"
            )
        return [_FilePartition(p) for p in files]

    def _keep(self, row: dict) -> bool:
        for f in self._pushed:
            v = row[f.attribute[0]]
            if isinstance(f, EqualTo):
                if v != f.value:
                    return False
            elif isinstance(f, In):
                if v not in f.value:
                    return False
            elif isinstance(f, IsNotNull):
                if v is None:
                    return False
        return True

    def read(self, partition):
        with io.open(partition.path, newline="", encoding="utf-8") as fh:
            rdr = csv.reader(fh)
            header = next(rdr, None)
            if header != _HEADER:
                raise ValueError(
                    f"finport: {partition.path} first line is not the "
                    f"declared HOLDING header (detect contract): {header}"
                )
            for rec in rdr:
                if not rec:
                    continue
                row = {}
                for name, raw in zip(_HEADER, rec):
                    if name in _DOUBLE:
                        row[name] = _parse_double(raw)
                    elif name in _TS:
                        row[name] = _parse_ts(raw)
                    elif name in _REQUIRED_STR:
                        # invert the golden escape (every '"' was written
                        # as '\"' — DelimitedEncoder.swift:135 — so the
                        # replacement is the exact inverse and makes
                        # write∘read lossless, unlike Spark's CSV reader
                        # which only unescapes inside quoted fields)
                        row[name] = (
                            raw.replace('\\"', '"')
                            if raw is not None
                            else ""
                        )
                    else:
                        row[name] = raw.replace('\\"', '"') if isinstance(
                            raw, str
                        ) else raw
                for name in _HEADER[len(rec):]:  # short row: trailing nulls
                    row[name] = "" if name in _REQUIRED_STR else None
                if self._keep(row):
                    yield tuple(row[n] for n in _HEADER)


class FinportDataSource(DataSource):
    """Register with ``spark.dataSource.register(FinportDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "finport"

    def schema(self) -> StructType:
        # all fields declared nullable at the Spark boundary (required
        # string keys are still never null — the reader fills ""), the
        # same convention as Spark's own file sources
        return StructType(
            [StructField(n, t, True) for n, t, _ in HOLDING_FIELDS]
        )

    def reader(self, schema):
        return FinportReader(self.options)

    def writer(self, schema, overwrite: bool):
        return FinportWriter(self.options, overwrite)

    def simpleStreamReader(self, schema):
        return FinportStreamReader(self.options)


# ---------------------------------------------------------------------
# Write path: df.write.format("finport").mode(...).save() — the golden
# FINporter encoding as a distributed sink with a two-phase commit
# ---------------------------------------------------------------------


def _golden_field(v, delimiter: str = ",") -> str:
    """Pure-Python mirror of ``encoder.format_field`` (DelimitedEncoder
    semantics: escape " as \\" always, quote only when the field contains
    the delimiter; nil -> empty; doubles shortest-roundtrip; timestamps
    ISO-Z; booleans true/false)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    s = str(v).replace('"', '\\"')
    if delimiter in s:
        return f'"{s}"'
    return s


@dataclass
class _PartFile(WriterCommitMessage):
    tmp_path: str
    rows: int


class FinportWriter(DataSourceWriter):
    """Per-task: encode rows under the golden rules into a TEMP file;
    driver commit renames every temp to its final ``part-NNNNN.csv``
    name and aborts delete temps — torn outputs are never visible
    (the same two-phase protocol Spark's file sinks use). Each part
    file carries the declared header line, so the finport READER reads
    the writer's output directly (full connector roundtrip)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("finport: .save(path) directory is required")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.csv")
        n = 0
        with io.open(tmp, "w", encoding="utf-8", newline="") as fh:
            fh.write(",".join(_HEADER) + "\n")
            for row in iterator:
                fh.write(
                    ",".join(_golden_field(v) for v in row) + "\n"
                )
                n += 1
        return _PartFile(tmp_path=tmp, rows=n)

    def commit(self, messages):
        import glob

        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.csv")):
                os.remove(old)
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.replace(
                m.tmp_path,
                os.path.join(self.path, f"part-{i:05d}.csv"),
            )

    def abort(self, messages):
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.tmp_path)
                except OSError:
                    pass


# ---------------------------------------------------------------------
# Streaming read path: spark.readStream.format("finport") — a directory
# tail with exactly-once file-granular offsets
# ---------------------------------------------------------------------


class FinportStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch source over a growing directory of holding CSVs.

    Offset = the sorted list of files already consumed (file-granular,
    the same unit as Spark's own file stream source). ``read(start)``
    decodes every not-yet-consumed file with the SAME typed rules as the
    batch reader and advances the offset; ``readBetweenOffsets`` replays
    a recorded batch deterministically after restart (exactly-once on
    top of the checkpoint log: the file set between two offsets never
    changes, so replay = re-decode those files)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("finport: .load(path) directory is required")
        self._batch_reader = FinportReader(options)

    def _files(self):
        return sorted(
            f
            for f in os.listdir(self.path)
            if f.endswith(".csv") and not f.startswith(("_", "."))
        )

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _decode(self, names):
        # a LIST, not a generator: Spark's prefetching cache copies the
        # returned iterator for checkpoint replay (generators can't be
        # copied); batch sizes are bounded by the files-per-trigger cut
        rows: list = []
        for name in names:
            rows.extend(
                self._batch_reader.read(
                    _FilePartition(os.path.join(self.path, name))
                )
            )
        return rows

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        fresh = [f for f in self._files() if f not in seen]
        end = {"seen": sorted(seen | set(fresh))}
        return iter(self._decode(fresh)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        fresh = sorted(
            set(end.get("seen", [])) - set(start.get("seen", []))
        )
        return iter(self._decode(fresh))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: source files are immutable inputs
