"""format("allocdata") Python DataSource: detect-by-header, per-file
partitions, typed decode parity with the column-expression importer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finporter_spark.sources.datasource import AllocDataSource

def _drain(rdr, part):
    """Consume FinportReader.read (Arrow RecordBatches) into row tuples."""
    rows = []
    for batch in rdr.read(part):
        rows += [tuple(d.values()) for d in batch.to_pylist()]
    return rows


HOLDINGS = (
    "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    "acc1,VTI,,10.25,175.5,2021-03-01T00:00:00Z\n"
    "acc1,BND,lot9,5.0,,2020-10-31\n"
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(AllocDataSource)
    return spark


def test_detects_entity_and_types(registered, tmp_path):
    (tmp_path / "h.csv").write_text(HOLDINGS)
    df = registered.read.format("allocdata").load(str(tmp_path))
    assert df.schema.simpleString() == (
        "struct<accountID:string,securityID:string,lotID:string,"
        "shareCount:double,shareBasis:double,acquiredAt:timestamp>"
    )
    rows = {r.securityID: r for r in df.collect()}
    assert rows["VTI"].lotID == ""  # required key: empty, not null
    assert rows["BND"].shareBasis is None  # optional empty -> null
    assert rows["BND"].acquiredAt.hour == 0  # bare date, default tod


def test_partition_per_file(registered, tmp_path):
    (tmp_path / "a.csv").write_text(HOLDINGS)
    (tmp_path / "b.csv").write_text(HOLDINGS)
    df = registered.read.format("allocdata").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 4


def test_tod_tz_options(registered, tmp_path):
    (tmp_path / "h.csv").write_text(HOLDINGS)
    df = (
        registered.read.format("allocdata")
        .option("schema", "allocHolding")
        .option("tod", "13:00:00")
        .option("tz", "America/New_York")
        .load(str(tmp_path))
    )
    bnd = df.filter(F.col("securityID") == "BND").first()
    # 2020-10-31 13:00 EDT == 17:00 UTC
    assert (bnd.acquiredAt.hour, bnd.acquiredAt.minute) == (17, 0)


def test_matches_expression_importer(registered, tmp_path):
    from finporter_spark.importers.allocdata import AllocDataImporter

    (tmp_path / "h.csv").write_text(HOLDINGS)
    via_ds = registered.read.format("allocdata").load(str(tmp_path))
    via_exprs, _bad = AllocDataImporter().decode(registered, str(tmp_path))
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, via_exprs.collect())
    )


def test_quarantine_cache_released_after_transform(spark, tmp_path):
    """quarantine_split caches the corrupt-channel parse; handle_transform
    must release it after export so repeated CLI transforms don't
    accumulate executor storage (caching.owns_cache/release_caches)."""
    from finporter_spark.caching import _ATTR, release_caches
    from finporter_spark.sources import quarantine_split, read_delimited

    p = tmp_path / "a.csv"
    p.write_text("strategyID,title\ns1,Sixty Forty\ns2,All Weather\n")
    raw = read_delimited(spark, str(p), all_string=True)
    good, bad = quarantine_split(raw, required_keys=["strategyID"])
    cached = getattr(good, _ATTR)
    assert cached, "corrupt-channel decode should tag its cache"
    good.count()
    assert cached[0].storageLevel.useMemory  # materialized + cached
    release_caches(good, bad, blocking=True)
    assert not cached[0].storageLevel.useMemory  # freed
    assert getattr(good, _ATTR) == []
    # released frames still compute correctly (recompute, uncached)
    assert good.count() == 2


def test_finport_reader_pushdown_and_contract(tmp_path):
    """Reader-level contract: supported filters (EqualTo/In/IsNotNull on
    real columns) are absorbed and applied during read; unsupported
    ones are yielded back for Spark to evaluate; a wrong header fails
    loudly (detect contract); short rows pad with ''/null."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNotNull,
    )

    from finporter_spark.sources.finport_datasource import (
        FinportReader,
        _FilePartition,
    )

    d = tmp_path / "holdings"
    d.mkdir()
    (d / "a.csv").write_text(
        "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
        "acct-1,S1,L1,10.0,100.5,2021-03-01\n"
        "acct-2,S2,,5.0,,2021-03-01T12:30:00\n"
        "acct-1,S3\n"  # short row: trailing fields pad
    )
    rdr = FinportReader({"path": str(d)})
    unsupported = list(
        rdr.pushFilters(
            [
                EqualTo(("accountID",), "acct-1"),
                GreaterThan(("shareCount",), 1.0),  # not absorbed
                In(("securityID",), ("S1", "S3")),
                IsNotNull(("lotID",)),
            ]
        )
    )
    assert [type(f).__name__ for f in unsupported] == ["GreaterThan"]
    parts = rdr.partitions()
    assert len(parts) == 1
    rows = _drain(rdr, parts[0])
    # acct-1 ∩ {S1,S3} ∩ lotID not null -> S1 (full) and S3 (padded '')
    assert [r[1] for r in rows] == ["S1", "S3"]
    s3 = rows[1]
    assert s3[2] == "" and s3[3] is None and s3[5] is None
    import datetime

    assert rows[0][5] == datetime.datetime(2021, 3, 1, 0, 0)

    (d / "b.csv").write_text("wrong,header\nx,y\n")
    rdr2 = FinportReader({"path": str(d)})
    bad = [p for p in rdr2.partitions() if p.path.endswith("b.csv")]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="declared HOLDING header"):
        list(rdr2.read(bad[0]))


def test_finport_writer_bytes_match_golden_encoder(spark, tmp_path):
    """One part file written by the finport sink must be byte-identical
    to encode_to_string over the same rows (header + golden
    escape/quote/double/timestamp rules) — the connector write path IS
    the golden encoder, distributed."""
    import datetime

    from pyspark.sql import Row

    from finporter_spark.encoder import encode_to_string
    from finporter_spark.sources.finport_datasource import (
        FinportDataSource,
    )

    rows = [
        Row(
            accountID='ac"me',
            securityID="S,1",  # delimiter: must quote
            lotID="",
            shareCount=10.25,
            shareBasis=0.1,  # shortest repr, not 0.10000000000000001
            acquiredAt=datetime.datetime(2021, 3, 1, 12, 30, 0),
        ),
        Row(
            accountID="a2",
            securityID="S2",
            lotID="L1",
            shareCount=None,
            shareBasis=None,
            acquiredAt=None,
        ),
    ]
    df = spark.createDataFrame(rows).coalesce(1)
    try:
        spark.dataSource.register(FinportDataSource)
    except Exception:
        pass
    out = str(tmp_path / "out")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df.write.format("finport").mode("overwrite").option(
        "path", out
    ).save()
    import os

    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    written = open(os.path.join(out, parts[0]), encoding="utf-8").read()
    assert written == encode_to_string(df)
    # and the reader round-trips it exactly
    back = (
        spark.read.format("finport").option("path", out).load().collect()
    )
    assert sorted(map(tuple, back)) == sorted(map(tuple, df.collect()))


def test_finport_writer_abort_leaves_no_partial_output(spark, tmp_path):
    """A failing task must leave NO visible part files (two-phase
    commit: temps are renamed only on driver commit)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from finporter_spark.sources.finport_datasource import (
        FinportDataSource,
    )

    try:
        spark.dataSource.register(FinportDataSource)
    except Exception:
        pass
    out = str(tmp_path / "out")

    @F.udf("double")
    def boom(x):
        raise RuntimeError("induced task failure")

    df = spark.range(10).select(
        F.lit("a").alias("accountID"),
        F.lit("s").alias("securityID"),
        F.lit("l").alias("lotID"),
        boom(F.col("id").cast("double")).alias("shareCount"),
        F.lit(None).cast("double").alias("shareBasis"),
        F.lit(None).cast("timestamp").alias("acquiredAt"),
    )
    with _pytest.raises(Exception):
        df.write.format("finport").mode("overwrite").option(
            "path", out
        ).save()
    visible = (
        [f for f in os.listdir(out) if f.startswith("part-")]
        if os.path.isdir(out)
        else []
    )
    assert visible == []


def test_finport_stream_reader_incremental_offsets(tmp_path):
    """Offset semantics without a Spark session: read() consumes only
    bytes not covered by the start offset, offsets are cumulative,
    readBetweenOffsets replays exactly the recorded byte ranges (the
    checkpoint-recovery contract), and an empty tick yields no rows."""
    from finporter_spark.sources.finport_datasource import (
        FinportStreamReader,
    )

    d = tmp_path / "stream"
    d.mkdir()
    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    (d / "a.csv").write_text(hdr + "a1,S1,L1,1.0,,\n")
    rdr = FinportStreamReader({"path": str(d)})

    o0 = rdr.initialOffset()
    rows1, o1 = rdr.read(o0)
    assert [r[1] for r in rows1] == ["S1"]
    assert set(o1["seen"]) == {"a.csv"}
    assert o1["seen"]["a.csv"] == (d / "a.csv").stat().st_size

    # nothing new: empty batch, offset unchanged
    rows2, o2 = rdr.read(o1)
    assert list(rows2) == [] and o2 == o1

    # a new file arrives: only it is read
    (d / "b.csv").write_text(hdr + "a2,S2,L2,2.0,,\na3,S3,L3,3.0,,\n")
    rows3, o3 = rdr.read(o1)
    assert [r[1] for r in rows3] == ["S2", "S3"]
    assert set(o3["seen"]) == {"a.csv", "b.csv"}

    # checkpoint replay: exactly the delta between two offsets
    replay = list(rdr.readBetweenOffsets(o1, o3))
    assert [r[1] for r in replay] == ["S2", "S3"]
    assert [r[1] for r in rdr.readBetweenOffsets(o0, o1)] == ["S1"]


def test_finport_stream_tails_growing_file(tmp_path):
    """ADVICE (low): a file an external producer is still appending to
    must not be half-consumed-then-replayed-differently. The offset is
    byte-granular and cut at complete-record boundaries: a torn final
    line is NOT consumed, the bytes that complete it arrive as a later
    batch, and readBetweenOffsets replays the recorded ranges
    deterministically even after the file has since grown."""
    from finporter_spark.sources.finport_datasource import (
        FinportStreamReader,
    )

    d = tmp_path / "stream"
    d.mkdir()
    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    # producer cut mid-row: the second record has no trailing newline
    (d / "a.csv").write_text(hdr + "a1,S1,L1,1.0,,\na2,S2,L2,2.")
    rdr = FinportStreamReader({"path": str(d)})

    rows1, o1 = rdr.read(rdr.initialOffset())
    assert [r[1] for r in rows1] == ["S1"]  # torn row NOT consumed
    stable1 = o1["seen"]["a.csv"]
    assert stable1 == len(hdr + "a1,S1,L1,1.0,,\n")

    # the producer finishes the row and appends another
    with open(d / "a.csv", "a") as fh:
        fh.write("5,,\na3,S3,L3,3.0,,\n")
    rows2, o2 = rdr.read(o1)
    assert [(r[1], r[3]) for r in rows2] == [("S2", 2.5), ("S3", 3.0)]

    # replay of batch 1 after the file grew: still exactly batch 1
    assert [r[1] for r in rdr.readBetweenOffsets(rdr.initialOffset(), o1)] \
        == ["S1"]
    assert [r[1] for r in rdr.readBetweenOffsets(o1, o2)] == ["S2", "S3"]


def test_finport_reader_quote_plus_delimiter_roundtrip(tmp_path):
    """ADVICE (medium): a field containing BOTH a quote and the
    delimiter ('a"b,c' → '"a\\"b,c"') must decode losslessly with later
    columns intact — csv.reader cannot parse this dialect (it shifts
    every later column); the golden-inverse state machine can. Also:
    embedded newline in a quoted field, and escaped quotes in unquoted
    fields."""
    from finporter_spark.sources.finport_datasource import (
        FinportReader,
        _FilePartition,
        _golden_field,
    )

    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    values = [
        ('a"b,c', 'S"1', "plain", 1.5, None, None),
        ('x,y', 'q"', 'both",here', 2.0, 3.0, None),
        ("line1\nline2", "S3", "", None, None, None),
    ]
    lines = [
        ",".join(_golden_field(v) for v in row) + "\n" for row in values
    ]
    (tmp_path / "f.csv").write_text(hdr + "".join(lines))
    rdr = FinportReader({"path": str(tmp_path)})
    rows = _drain(rdr, _FilePartition(str(tmp_path / "f.csv")))
    assert [tuple(r[:3]) for r in rows] == [tuple(v[:3]) for v in values]
    assert rows[0][3] == 1.5 and rows[1][4] == 3.0


def test_finport_reader_raises_on_overwide_row(tmp_path):
    """ADVICE (medium): a row with MORE fields than the header is
    malformed input — raise loudly instead of silently dropping or
    shifting columns."""
    import pytest as _pytest

    from finporter_spark.sources.finport_datasource import (
        FinportReader,
        _FilePartition,
    )

    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    (tmp_path / "f.csv").write_text(hdr + "a,b,c,1.0,2.0,,EXTRA\n")
    rdr = FinportReader({"path": str(tmp_path)})
    with _pytest.raises(ValueError, match="malformed"):
        _drain(rdr, _FilePartition(str(tmp_path / "f.csv")))
    # an EMPTY 7th field (trailing comma) is over-wide too — the fast
    # path must reject it exactly like the state machine does
    (tmp_path / "g.csv").write_text(hdr + "a,b,c,1.0,2.0,,\n")
    with _pytest.raises(ValueError, match="malformed|wider"):
        _drain(rdr, _FilePartition(str(tmp_path / "g.csv")))
    (tmp_path / "h.csv").write_text(hdr + 'a,"b",c,1.0,2.0,,\n')
    with _pytest.raises(ValueError, match="malformed|fields"):
        _drain(rdr, _FilePartition(str(tmp_path / "h.csv")))


def test_finport_writer_append_preserves_previous_parts(spark, tmp_path):
    """ADVICE (high): mode('append') must layer new part files next to
    a previous write, never os.replace over identically-named parts —
    final names carry a per-job UUID, so two sequential writes leave
    ALL rows visible."""
    import os

    from pyspark.sql import Row

    from finporter_spark.sources.finport_datasource import (
        FinportDataSource,
    )

    try:
        spark.dataSource.register(FinportDataSource)
    except Exception:
        pass
    out = str(tmp_path / "out")

    schema = (
        "accountID string, securityID string, lotID string, "
        "shareCount double, shareBasis double, acquiredAt timestamp"
    )

    def _df(sec):
        return spark.createDataFrame(
            [Row("a1", sec, "L1", 1.0, None, None)], schema
        ).coalesce(1)

    _df("FIRST").write.format("finport").mode("append").option(
        "path", out
    ).save()
    _df("SECOND").write.format("finport").mode("append").option(
        "path", out
    ).save()
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 2  # both commits' parts coexist
    back = spark.read.format("finport").option("path", out).load()
    assert sorted(r.securityID for r in back.collect()) == [
        "FIRST",
        "SECOND",
    ]
    # overwrite still clears prior parts
    _df("THIRD").write.format("finport").mode("overwrite").option(
        "path", out
    ).save()
    back2 = spark.read.format("finport").option("path", out).load()
    assert [r.securityID for r in back2.collect()] == ["THIRD"]


def test_golden_parser_inverts_encoder_property():
    """Property: for any list of rows of arbitrary strings (quotes,
    delimiters, newlines, backslashes), _parse_golden(_golden_field
    encoding) recovers the rows exactly — OR _golden_field RAISES on
    the one value shape the dialect cannot represent (a quoted field
    whose escaped form ends in a backslash: its tail '...\\"' is
    indistinguishable from an escaped quote, so the writer refuses to
    emit bytes its own reader would reject)."""
    import pytest
    from hypothesis import given, settings, strategies as st

    from finporter_spark.sources.finport_datasource import (
        _golden_field,
        _parse_golden,
    )

    field = st.text(
        alphabet=st.sampled_from(list('abc",\\\n\r xyz')), max_size=8
    )
    rows = st.lists(
        st.lists(field, min_size=1, max_size=4), min_size=1, max_size=5
    )

    def ambiguous(v: str) -> bool:
        # quoted (contains delimiter/newline) AND ends with backslash
        return v.endswith("\\") and any(c in v for c in ",\n\r")

    @settings(max_examples=300, deadline=None)
    @given(rows)
    def check(rs):
        if any(ambiguous(v) for r in rs for v in r):
            bad = next(v for r in rs for v in r if ambiguous(v))
            with pytest.raises(ValueError, match="not representable"):
                _golden_field(bad)
            return
        text = "".join(
            ",".join(_golden_field(v) for v in r) + "\n" for r in rs
        )
        records, tail, open_q = _parse_golden(text)
        assert not open_q and tail is None
        # blank lines (rows of one empty field) are skipped by contract
        expect = [r for r in rs if r != [""]]
        assert [f for f, _ in records] == expect
        # offsets are strictly increasing record boundaries
        ends = [e for _, e in records]
        assert ends == sorted(set(ends))

    check()


def test_finport_stream_legacy_offset_compat(tmp_path):
    """A checkpoint written by the old file-granular offset format
    ({"seen": [names]}) must keep working: read() treats listed files
    as fully consumed; readBetweenOffsets replays them whole."""
    from finporter_spark.sources.finport_datasource import (
        FinportStreamReader,
    )

    d = tmp_path / "stream"
    d.mkdir()
    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    (d / "a.csv").write_text(hdr + "a1,S1,L1,1.0,,\n")
    rdr = FinportStreamReader({"path": str(d)})

    legacy = {"seen": ["a.csv"]}
    rows, end = rdr.read(legacy)
    assert list(rows) == []  # already consumed under the old format
    # replay from genesis to the legacy offset: whole file
    replay = list(rdr.readBetweenOffsets({"seen": {}}, legacy))
    assert [r[1] for r in replay] == ["S1"]
    # a file legacy-listed in BOTH offsets was consumed in an EARLIER
    # batch: replaying this batch must NOT duplicate its rows
    assert list(rdr.readBetweenOffsets(legacy, legacy)) == []
    (d / "b.csv").write_text(hdr + "a2,S2,L2,2.0,,\n")
    it2, o2 = rdr.read(legacy)
    rows2 = list(it2)
    assert [r[1] for r in rows2] == ["S2"]
    assert list(rdr.readBetweenOffsets(legacy, o2)) == rows2


def test_finport_stream_open_quote_fails_loudly(tmp_path):
    """ADVICE (medium): an unterminated quoted field must not stall a
    file silently forever. A legitimate multi-line quoted field
    mid-append is tolerated (and consumed once the quote closes); a
    quote that stays open while the file keeps growing raises after the
    tick bound, and a tail past the byte bound raises immediately."""
    from finporter_spark.sources.finport_datasource import (
        FinportStreamReader,
    )

    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"

    # 1) legit multi-line quoted field: mid-append reads are quiet,
    #    the closing quote releases the record
    d1 = tmp_path / "legit"
    d1.mkdir()
    f1 = d1 / "a.csv"
    f1.write_text(hdr + 'a1,"multi\nline')
    rdr = FinportStreamReader({"path": str(d1)})
    rows, o1 = rdr.read(rdr.initialOffset())
    assert list(rows) == []  # open quote: nothing complete yet
    with open(f1, "a") as fh:
        fh.write('\nstill",L1,1.0,,\n')
    rows2, o2 = rdr.read(o1)
    assert [r[1] for r in rows2] == ["multi\nline\nstill"]

    # 2) malformed: quote never closes while complete lines accumulate
    d2 = tmp_path / "stuck"
    d2.mkdir()
    f2 = d2 / "b.csv"
    f2.write_text(hdr + 'a1,"never closed\n')
    rdr2 = FinportStreamReader({"path": str(d2)})
    off = rdr2.initialOffset()
    with pytest.raises(ValueError, match="unterminated quoted field"):
        for _ in range(12):
            _, off = rdr2.read(off)
            with open(f2, "a") as fh:
                fh.write("x,y,z\n")

    # 3) byte bound: a single huge open-quote tail raises on first sight
    d3 = tmp_path / "huge"
    d3.mkdir()
    f3 = d3 / "c.csv"
    f3.write_text(hdr + 'a1,"' + "x" * (2 << 20))
    rdr3 = FinportStreamReader({"path": str(d3)})
    with pytest.raises(ValueError, match="unterminated quoted field"):
        rdr3.read(rdr3.initialOffset())


def test_finport_stream_legacy_offset_migration_pins(tmp_path):
    """ADVICE (low): first contact with a legacy whole-file offset pins
    the file's current record boundary into the migrated offset, so (a)
    later appends ARE consumed (the old code skipped them forever) and
    (b) replaying the migration batch after the file grows emits
    nothing (the old code replayed whatever getsize said NOW)."""
    from finporter_spark.sources.finport_datasource import (
        FinportStreamReader,
    )

    d = tmp_path / "stream"
    d.mkdir()
    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    f = d / "a.csv"
    f.write_text(hdr + "a1,S1,L1,1.0,,\n")
    rdr = FinportStreamReader({"path": str(d)})

    legacy = {"seen": ["a.csv"]}
    rows, mig = rdr.read(legacy)
    assert list(rows) == []
    assert mig["seen"]["a.csv"] == f.stat().st_size  # pinned boundary

    # the file grows: the delta (and ONLY the delta) is consumed
    with open(f, "a") as fh:
        fh.write("a2,S2,L2,2.0,,\n")
    rows2, o2 = rdr.read(mig)
    assert [r[1] for r in rows2] == ["S2"]

    # replaying the migration batch after growth: still empty
    assert list(rdr.readBetweenOffsets(legacy, mig)) == []
    # replaying the delta batch: exactly the delta
    assert [r[1] for r in rdr.readBetweenOffsets(mig, o2)] == ["S2"]


def test_finport_reader_ancient_timestamps(tmp_path):
    """ADVICE (low): timestamps outside pandas' ns range (years <1677 or
    >2262) must decode on BOTH Arrow paths — the vectorized quote-free
    fast path and the state-machine slow path — not silently null."""
    from datetime import datetime

    from finporter_spark.sources.finport_datasource import FinportReader

    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    d = tmp_path / "data"
    d.mkdir()
    # fast path: no quotes anywhere
    (d / "fast.csv").write_text(
        hdr
        + "a1,S1,L1,1.0,,1500-01-01\n"
        + "a2,S2,L2,2.0,,2500-06-01T12:00:00Z\n"
        + "a3,S3,L3,3.0,,2021-03-01T00:00:00Z\n"
        + "a4,S4,L4,4.0,,notadate\n"
    )
    # slow path: a quoted field forces the state machine
    (d / "slow.csv").write_text(
        hdr + 'a5,"S,5",L5,5.0,,1500-01-01\n'
    )
    rdr = FinportReader({"path": str(d)})
    parts = rdr.partitions()
    got = {}
    for p in parts:
        for batch in rdr.read(p):
            for row in batch.to_pylist():
                got[row["accountID"]] = row["acquiredAt"]
    assert got["a1"] == datetime(1500, 1, 1)
    assert got["a2"] == datetime(2500, 6, 1, 12, 0, 0)
    assert got["a3"] == datetime(2021, 3, 1)
    assert got["a4"] is None  # invalid stays null, as before
    assert got["a5"] == datetime(1500, 1, 1)  # slow path too


def test_finport_writer_rejects_undecodable_corner(spark, tmp_path):
    """ADVICE (low): the writer must not emit bytes its own reader
    rejects — a quoted field whose escaped form ends in a backslash
    raises at encode time (scalar and vectorized paths)."""
    import pyarrow as pa

    from finporter_spark.sources.finport_datasource import (
        FinportDataSource,
        _golden_encode_column,
        _golden_field,
    )

    with pytest.raises(ValueError, match="not representable"):
        _golden_field("a,b\\")
    with pytest.raises(ValueError, match="not representable"):
        _golden_encode_column(pa.array(["ok", "a,b\\"]))
    # fine without the delimiter (not quoted) or without the backslash
    assert _golden_field("ab\\") == "ab\\"
    assert _golden_field("a,b") == '"a,b"'

    spark.dataSource.register(FinportDataSource)
    df = spark.createDataFrame(
        [("a1", "bad,\\", "L1", 1.0, None, None)],
        "accountID string, securityID string, lotID string, "
        "shareCount double, shareBasis double, acquiredAt timestamp",
    )
    out = str(tmp_path / "out")
    with pytest.raises(Exception, match="not representable"):
        df.write.format("finport").mode("overwrite").option(
            "path", out
        ).save()


def test_finport_stream_open_quote_stall_without_growth(tmp_path):
    """ADVICE r7: a malformed file whose producer STOPS appending (tail
    under the byte bound, no further growth) must still trip the tick
    bound — non-progress triggers count whether or not the file grew."""
    from finporter_spark.sources.finport_datasource import (
        FinportStreamReader,
    )

    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    d = tmp_path / "stalled"
    d.mkdir()
    (d / "a.csv").write_text(hdr + 'a1,"never closed\n')
    rdr = FinportStreamReader({"path": str(d)})
    off = rdr.initialOffset()
    with pytest.raises(ValueError, match="unterminated quoted field"):
        for _ in range(FinportStreamReader._OPEN_QUOTE_MAX_TICKS + 2):
            _, off = rdr.read(off)  # file never grows


def test_finport_replay_byte_start_with_legacy_end(tmp_path):
    """ADVICE r7: readBetweenOffsets with a byte-boundary START and a
    legacy whole-file END (version downgrade after an upgrade) must
    replay only [lo, migrated_boundary) — never the rows before lo a
    second time."""
    from finporter_spark.sources.finport_datasource import (
        FinportStreamReader,
    )

    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    d = tmp_path / "downgrade"
    d.mkdir()
    f = d / "a.csv"
    f.write_text(hdr)
    rdr = FinportStreamReader({"path": str(d)})
    o0 = rdr.initialOffset()
    with open(f, "a") as fh:
        fh.write("a1,S1,L1,1.0,,\n")
    rows1, o1 = rdr.read(o0)  # consumes row S1; o1 pins a byte boundary
    assert [r[1] for r in list(rows1)] == ["S1"]
    with open(f, "a") as fh:
        fh.write("a1,S2,L2,2.0,,\n")
    legacy_end = {"seen": ["a.csv"]}  # downgraded writer: whole-file
    replayed = [r[1] for r in rdr.readBetweenOffsets(o1, legacy_end)]
    assert replayed == ["S2"]  # S1 must NOT replay


def test_finportp_parallel_stream_offsets_and_slices(tmp_path):
    """The partition-parallel stream reader: latestOffset advances by
    complete-record boundaries only (torn tails excluded), partitions()
    plans exactly the grown byte ranges (the replay contract), read()
    decodes a slice to a typed Arrow batch on what would be an
    executor, and legacy file-granular offsets are rejected loudly."""
    import pytest

    from finporter_spark.sources.finport_datasource import (
        FinportParallelStreamReader,
    )

    d = tmp_path / "pstream"
    d.mkdir()
    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    (d / "a.csv").write_text(hdr + "a1,S1,L1,1.0,,\na2,S2,L2,2.0,,\nTORN")
    rdr = FinportParallelStreamReader({"path": str(d)})

    o0 = rdr.initialOffset()
    o1 = rdr.latestOffset()
    full = hdr + "a1,S1,L1,1.0,,\na2,S2,L2,2.0,,\n"
    assert o1["seen"]["a.csv"] == len(full.encode())  # torn tail excluded

    parts = rdr.partitions(o0, o1)
    assert [(p.lo, p.hi) for p in parts] == [(0, len(full.encode()))]
    [batch] = list(rdr.read(parts[0]))
    pdf = batch.to_pandas()
    assert list(pdf["securityID"]) == ["S1", "S2"]
    assert list(pdf["shareCount"]) == [1.0, 2.0]

    # the tail completes + a second file arrives: only deltas are planned
    (d / "a.csv").write_text(
        hdr + "a1,S1,L1,1.0,,\na2,S2,L2,2.0,,\nTORN,S3,L3,3.0,,\n"
    )
    (d / "b.csv").write_text(hdr + "b1,S4,L4,4.0,,\n")
    o2 = rdr.latestOffset()
    parts2 = sorted(
        rdr.partitions(o1, o2), key=lambda p: p.path
    )
    assert len(parts2) == 2
    [ba] = list(rdr.read(parts2[0]))  # a.csv delta: the completed line
    assert list(ba.to_pandas()["securityID"]) == ["S3"]
    [bb] = list(rdr.read(parts2[1]))  # b.csv from 0: header stripped
    assert list(bb.to_pandas()["securityID"]) == ["S4"]

    # replay determinism: same (start, end) -> same slices
    assert [(p.path, p.lo, p.hi) for p in rdr.partitions(o1, o2)] == [
        (p.path, p.lo, p.hi) for p in rdr.partitions(o1, o2)
    ]

    with pytest.raises(ValueError, match="legacy file-granular"):
        rdr.partitions({"seen": ["a.csv"]}, o2)


def test_finportp_drain_equals_batch(spark, tmp_path):
    """End-to-end through Spark: format('finportp') drained with
    availableNow equals the batch reader's aggregate over the same
    directory."""
    from pyspark.sql import functions as F

    from finporter_spark.sources.finport_datasource import (
        FinportDataSource,
        FinportParallelDataSource,
    )
    from finporter_spark.streaming.pipeline import run_stream_to_memory

    d = tmp_path / "pdrop"
    d.mkdir()
    hdr = "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt\n"
    for i in range(4):
        (d / f"f{i}.csv").write_text(
            hdr
            + "".join(
                f"acct-{j % 3},S{j},L{j},{float(j)},,\n" for j in range(25)
            )
        )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    for src in (FinportDataSource, FinportParallelDataSource):
        try:
            spark.dataSource.register(src)
        except Exception:
            pass
    sdf = (
        spark.readStream.format("finportp").option("path", str(d)).load()
    )
    agg = sdf.groupBy("accountID").agg(
        F.count("*").alias("n"), F.sum("shareCount").alias("s")
    )
    out = run_stream_to_memory(agg, "fpp_parity_mem", output_mode="complete")
    got = {(r.accountID): (r.n, r.s) for r in out.collect()}
    want = {
        (r.accountID): (r.n, r.s)
        for r in spark.read.format("finport")
        .option("path", str(d))
        .load()
        .groupBy("accountID")
        .agg(F.count("*").alias("n"), F.sum("shareCount").alias("s"))
        .collect()
    }
    assert got == want


def test_scan_boundary_matches_parser_on_adversarial_soup():
    """_scan_boundary (the parallel reader's vectorized offset scan)
    agrees with _parse_golden's boundary + open-quote verdict on
    hypothesis-generated quote/escape/delimiter/newline soups — the
    exactness proof for replacing the record parser in latestOffset."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finporter_spark.sources.finport_datasource import (
        _parse_golden,
        _scan_boundary,
    )

    alphabet = st.sampled_from(list('ab,"\\\n') + ["\r\n", '\\"', '",'])

    def assert_safe_cut(text):
        """The scanner's boundary must be a SAFE resumable cut wrt the
        parser: (1) the prefix parses to whole records only (no torn
        tail, no open quote), (2) the remainder holds NO complete
        record (nothing is left behind past a trigger), (3) the
        open-quote verdict matches the parser's. Boundaries may differ
        from the parser's last-record end only by consuming trailing
        BLANK lines — also a valid cut (the parser skips blank lines),
        and the one that avoids rescanning them every trigger."""
        data = text.encode()
        got_boundary, got_open = _scan_boundary(data)
        _recs, _tail, open_q = _parse_golden(text)
        assert got_open == open_q, text
        prefix = data[:got_boundary].decode()
        p_recs, p_tail, p_open = _parse_golden(prefix)
        assert p_tail is None and not p_open, text
        rest = data[got_boundary:].decode()
        r_recs, _rt, _ro = _parse_golden(rest)
        assert r_recs == [], text
        # completeness: every parser record ends at or before the cut
        if _recs:
            last_end = len(text[: _recs[-1][1]].encode())
            assert got_boundary >= last_end, text

    @settings(max_examples=400, deadline=None)
    @given(st.lists(alphabet, max_size=60).map("".join))
    def check(text):
        assert_safe_cut(text)

    check()

    # unicode safety: multibyte chars around structure
    for text in ("é,ü\n“q”,x\n", 'a,"é\né",b\nz,1,2\n', "é\\\"x,y\nTORN"):
        assert_safe_cut(text)
