"""Detect/decode/transform pipeline + disambiguation error taxonomy.

Covers the tests the reference acknowledges as missing
(TransformHandlerTests.swift:20 is an empty stub; SURVEY §5) plus the
abstract-base contract (FINporterTests.swift:25-29).
"""

from __future__ import annotations

import textwrap

import pytest

from finporter_spark.errors import (
    ALL_ERROR_CASES,
    FINporterError,
    ImporterNotRecognized,
    MultipleImportersMatch,
    NotImplementedError_,
    SourceFormatNotRecognized,
)
from finporter_spark.handlers import get_pair, handle_detect, handle_transform
from finporter_spark.importers import (
    Importer,
    PositionsImporter,
    Prospector,
    default_prospector,
)
from finporter_spark.model import AllocFormat, AllocSchema

FIXTURE = (
    '"Positions"\r\n'
    "\r\n"
    '"Individual Something                       abcd-1234"\r\n'
    "Symbol,Description,Qty,Price,Mkt Val,Cost Basis,Date Acquired\r\n"
    'VTI,"Vanguard Total, Stock Market",10.25,220.10,2256.03,1800.00,03/01/2021\r\n'
    'BND,Bond \\"Fund\\",5,85.5,427.50,,\r\n'
    "BAD,not-a-number,XX,,,,\r\n"
)


@pytest.fixture()
def fixture_path(tmp_path):
    p = tmp_path / "positions.csv"
    p.write_bytes(FIXTURE.encode())
    return str(p)


def test_abstract_base_detect_raises():
    with pytest.raises(NotImplementedError_):
        Importer().detect(b"anything")


def test_error_taxonomy_has_11_cases():
    assert len(ALL_ERROR_CASES) == 11
    for case in ALL_ERROR_CASES:
        assert issubclass(case, FINporterError)


def test_detect_positions(fixture_path):
    pros = default_prospector()
    report = handle_detect(pros, fixture_path)
    assert report == ["positions: allocHolding: csv"]


def test_detect_non_matching_soft(tmp_path):
    p = tmp_path / "other.csv"
    p.write_text("a,b,c\n1,2,3\n")
    assert handle_detect(default_prospector(), str(p)) == []


def test_get_pair_errors(fixture_path):
    pros = default_prospector()
    with pytest.raises(ImporterNotRecognized):
        get_pair(pros, b"", importer_id="nope")
    with pytest.raises(SourceFormatNotRecognized):
        get_pair(pros, b"a,b\n1,2\n")
    # two importers matching the same prefix -> ambiguity error
    pros2 = Prospector([PositionsImporter(), PositionsImporter2()])
    with pytest.raises(MultipleImportersMatch):
        get_pair(pros2, FIXTURE.encode())


class PositionsImporter2(PositionsImporter):
    id_ = "positions2"


def test_decode_end_to_end(spark, fixture_path):
    imp = PositionsImporter()
    prefix = FIXTURE.encode()
    acct = imp.account_id(prefix)
    assert acct == "abcd-1234"
    good, bad = imp.decode(
        spark, fixture_path, def_time_of_day="13:00:00", time_zone="EST",
        account_id=acct,
    )
    rows = {r.securityID: r for r in good.collect()}
    assert set(rows) == {"VTI", "BND"}
    vti = rows["VTI"]
    assert vti.accountID == "abcd-1234"
    assert vti.shareCount == 10.25
    assert abs(vti.shareBasis - 1800.00 / 10.25) < 1e-9
    # 13:00 EST == 18:00 UTC
    assert vti.acquiredAt.strftime("%Y-%m-%dT%H:%M:%S") == "2021-03-01T18:00:00"
    assert bad.count() == 1  # the XX-qty row landed in quarantine


def test_handle_transform_golden(spark, fixture_path):
    out = handle_transform(
        spark,
        default_prospector(),
        fixture_path,
        def_time_of_day="00:00:00",
        time_zone="UTC",
        account_id="abcd-1234",
    )
    lines = out.splitlines()
    assert lines[0] == "accountID,securityID,lotID,shareCount,shareBasis,acquiredAt"
    body = sorted(lines[1:])
    assert body[0].startswith("abcd-1234,BND,,5.0,")
    assert "abcd-1234,VTI,,10.25," in body[1]
    assert body[1].endswith("2021-03-01T00:00:00Z")
