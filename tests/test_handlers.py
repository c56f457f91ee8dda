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


def test_error_taxonomy_complete_and_raised(spark, tmp_path):
    """All 11 reference error cases exist (FINporterError.swift:22-34) and
    the resolution paths raise the right ones."""
    from finporter_spark import errors as E
    from finporter_spark.handlers import get_pair
    from finporter_spark.importers.allocdata import AllocDataImporter
    from finporter_spark.importers.base import Importer
    from finporter_spark.importers.prospector import Prospector
    from finporter_spark.model import AllocSchema

    taxonomy = [
        E.NotImplementedError_, E.EncodingError, E.DecodingError,
        E.DecodingKeyError, E.NeedExplicitOutputSchema,
        E.TargetSchemaNotSupported, E.MultipleImportersMatch,
        E.MultipleDetectedSchemasMatch, E.MultipleOutputSchemasMatch,
        E.SourceFormatNotRecognized, E.ImporterNotRecognized,
    ]
    assert len(taxonomy) == 11
    for cls in taxonomy:
        assert issubclass(cls, E.FINporterError)
        try:
            inst = cls("x")
        except TypeError:
            inst = cls()  # no-arg cases carry a fixed message
        assert str(inst)  # every case renders a message

    pros = Prospector([AllocDataImporter()])
    header = b"strategyID,title\ns1,A\n"

    with pytest.raises(E.ImporterNotRecognized):
        get_pair(pros, header, importer_id="nope")
    with pytest.raises(E.SourceFormatNotRecognized):
        get_pair(pros, b"not,a,known,header\n1,2,3,4\n")
    with pytest.raises(E.TargetSchemaNotSupported):
        # positions importer only emits holdings; ask for accounts
        get_pair(
            Prospector([PositionsImporter()]),
            FIXTURE.encode(),
            output_schema=AllocSchema.ACCOUNT,
        )
    # explicit importer with multi-schema surface and no detected winner
    with pytest.raises(E.MultipleOutputSchemasMatch):
        get_pair(pros, header, importer_id="allocdata")
    # abstract importer contract (FINporter.swift:35-37)
    with pytest.raises(E.NotImplementedError_):
        Imp = Importer()
        Imp.detect(b"")

    class NoSchemas(AllocDataImporter):
        id_ = "empty"
        output_schemas = ()

        def detect(self, p):
            return {}

    with pytest.raises(E.NeedExplicitOutputSchema):
        get_pair(Prospector([NoSchemas()]), header, importer_id="empty")
