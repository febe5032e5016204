"""Formeta encode/decode (Limetrans.java:536-549 FormetaEncoder tee;
grammar from the public Metafacture format)."""

import pytest
from pyspark.sql import functions as F

from limetrans_spark.functions import formeta as FM


def test_roundtrip_verbose_and_multiline():
    fields = [
        ("leader", "00000cam a2200000La 4500"),
        ("001", "ocm42328784"),
        ("040  ", [("a", "N$T"), ("d", "OCL"), ("d", "OCLCQ")]),  # repeats + nesting
        ("note", "it's {weird}: ok\\fine"),
    ]
    for style in ("verbose", "multiline"):
        txt = FM.encode_record("", fields, style=style)
        recs = FM.decode_records(txt)
        assert len(recs) == 1
        rid, pairs = recs[0]
        assert rid == "" and pairs == fields, style


def test_decode_reference_shaped_snippet():
    txt = (
        "''{ leader: '00000cam x', 003: OCoLC, "
        "'040  '{ a: 'N$T', d: OCL, d: OCLCQ }, "
        "'020  '{ a: 0585020531, q: '(electronic bk.)' } }"
    )
    rid, pairs = FM.decode_records(txt)[0]
    flat = FM.flatten_pairs(pairs)
    assert ("leader", "00000cam x") in flat
    assert flat.count(("040  .d", "OCL")) == 1 and ("040  .d", "OCLCQ") in flat
    assert ("020  .q", "(electronic bk.)") in flat


def test_multiple_records_stream():
    txt = "a{ x: 1 } b{ x: 2, y{ z: 3 } }"
    recs = FM.decode_records(txt)
    assert [r for r, _ in recs] == ["a", "b"]
    assert FM.flatten_pairs(recs[1][1]) == [("x", "2"), ("y.z", "3")]


def test_decode_errors():
    with pytest.raises(ValueError):
        FM.decode_records("a{ x: 'unterminated }")
    with pytest.raises(ValueError):
        FM.decode_records("a{ x 1 }")


def test_spark_encode_decode_and_filequeue_processor(spark, tmp_path):
    df = spark.createDataFrame(
        [("r1", {"001": ["ocm1"], "040": ["N$T", "OCL"]}),
         ("r2", {"001": ["ocm2"]})],
        "rid string, record map<string, array<string>>",
    )
    enc = df.select("rid", FM.formeta_encode_udf()(F.col("rid"), F.col("record")).alias("t"))
    rows = {r["rid"]: r["t"] for r in enc.collect()}
    assert rows["r1"] == "r1{ 001: ocm1, 040: N$T, 040: OCL }"  # $ is a bare atom char (reference formeta.formeta golden)
    # write a stream file and read it back through the processor
    p = tmp_path / "out.formeta"
    p.write_text(" ".join(rows.values()))
    back = FM.read_formeta(spark, str(p))
    got = {(r["record_id"], r["path"], r["value"]) for r in back.collect()}
    assert ("r1", "040", "N$T") in got and ("r2", "001", "ocm2") in got
    assert len(got) == 4
