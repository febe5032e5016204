"""MARC 21 (ISO 2709) + MARCXML readers (FileQueue.java:42-110 processors)."""

import pytest
from pyspark.sql import functions as F

from limetrans_spark.sources import marc as M

LEADER = "00000cam a2200000 a 4500"

REC1 = M.encode_marc21_record(
    LEADER,
    [
        ("001", "ocm0001"),
        ("008", "920324s1993    maua"),
        ("020", " ", " ", [("a", "0585020531"), ("q", "(electronic bk.)")]),
        ("020", " ", " ", [("a", "9780585020532")]),  # repeated field stays distinct
        ("245", "1", "0", [("a", "Type inference :"), ("b", "a study.")]),
    ],
)
REC2 = M.encode_marc21_record(
    LEADER,
    [("001", "ocm0002"), ("100", "1", " ", [("a", "Smith, Ada")])],
)


def test_parse_marc21_roundtrip():
    rid, leader, fields = M.parse_marc21_record(REC1.rstrip(M.RT))
    assert rid == "ocm0001"
    assert leader[5:12] == LEADER[5:12]
    assert ("020", " ", " ", "a", "0585020531") in fields
    assert ("020", " ", " ", "a", "9780585020532") in fields
    assert ("245", "1", "0", "b", "a study.") in fields
    assert ("001", None, None, None, "ocm0001") in fields
    # leader record-length and base-address fields are consistent
    assert int(leader[:5]) == len(REC1.encode())


def test_parse_marc21_malformed():
    with pytest.raises(ValueError):
        M.parse_marc21_record("too short")
    with pytest.raises(ValueError):
        M.parse_marc21_record(LEADER + "001004" + M.FT + "x" + M.FT)  # bad directory


def test_read_marc21_spark(spark, tmp_path):
    p = tmp_path / "batch.mrc"
    p.write_text(REC1 + REC2)
    df = M.read_marc21(spark, str(p))
    rows = {r["record_id"]: r for r in df.collect()}
    assert set(rows) == {"ocm0001", "ocm0002"}
    f1 = [(f["tag"], f["sub"], f["value"]) for f in rows["ocm0001"]["fields"]]
    assert ("245", "a", "Type inference :") in f1
    assert ("100", "a", "Smith, Ada") in [
        (f["tag"], f["sub"], f["value"]) for f in rows["ocm0002"]["fields"]
    ]


MARCXML = """<?xml version="1.0"?>
<collection xmlns="http://www.loc.gov/MARC21/slim">
  <record>
    <leader>00000cam a2200000 a 4500</leader>
    <controlfield tag="001">x1</controlfield>
    <datafield tag="245" ind1="1" ind2="0">
      <subfield code="a">Query planning</subfield>
      <subfield code="c">by A. Smith</subfield>
    </datafield>
  </record>
  <record>
    <leader>00000cam a2200000 a 4500</leader>
    <controlfield tag="001">x2</controlfield>
    <datafield tag="100" ind1=" " ind2=" ">
      <subfield code="a">Jones, Li</subfield>
    </datafield>
  </record>
</collection>
"""


def test_read_marcxml_spark(spark, tmp_path):
    p = tmp_path / "batch.xml"
    p.write_text(MARCXML)
    df = M.read_marcxml(spark, str(p))
    rows = {r["record_id"]: r for r in df.collect()}
    assert set(rows) == {"x1", "x2"}
    f1 = [(f["tag"], f["ind1"], f["sub"], f["value"]) for f in rows["x1"]["fields"]]
    assert ("245", "1", "a", "Query planning") in f1
    assert ("001", None, None, "x1") in [
        (f["tag"], f["ind1"], f["sub"], f["value"]) for f in rows["x1"]["fields"]
    ]
