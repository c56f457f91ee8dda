"""format("allocdata") Python DataSource: detect-by-header, per-file
partitions, typed decode parity with the column-expression importer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finporter_spark.sources.datasource import AllocDataSource

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
    rows = list(rdr.read(parts[0]))
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
