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


def _one_record_xml(rid: str, title: str) -> str:
    return f"""<?xml version="1.0"?>
<collection xmlns="http://www.loc.gov/MARC21/slim">
  <record>
    <leader>00000cam a2200000 a 4500</leader>
    <controlfield tag="001">{rid}</controlfield>
    <datafield tag="245" ind1="1" ind2="0">
      <subfield code="a">{title}</subfield>
    </datafield>
  </record>
</collection>
"""


def test_read_almaxml_tar(spark, tmp_path):
    """ALMAXML = tar(.gz) of MARCXML member files (TarReader →
    XmlDecoder, FileQueue.java:42-50): every member's records surface,
    tagged with archive path + member name; a plain .xml through the
    same processor still reads (magic-byte routing)."""
    import tarfile

    from limetrans_spark.sources.filequeue import FileQueue

    tar_path = tmp_path / "alma_export.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        for i in range(3):
            p = tmp_path / f"member{i}.xml"
            p.write_text(_one_record_xml(f"alma{i}", f"Title {i}"))
            tf.add(p, arcname=f"member{i}.xml")
    df = FileQueue(base=str(tmp_path), patterns=["*.tar.gz"], processor="almaxml").read(spark)
    rows = {r["record_id"]: r for r in df.collect()}
    assert set(rows) == {"alma0", "alma1", "alma2"}
    assert rows["alma1"]["member"] == "member1.xml"
    assert any(
        f["tag"] == "245" and f["value"] == "Title 1" for f in rows["alma1"]["fields"]
    )
    # plain XML (not a tar) through the almaxml processor
    solo = tmp_path / "solo.xml"
    solo.write_text(_one_record_xml("solo1", "Alone"))
    df2 = FileQueue(base=str(tmp_path), patterns=["solo.xml"], processor="almaxml").read(spark)
    got = {r["record_id"] for r in df2.collect()}
    assert got == {"solo1"}
