"""Metamorph XML subset: rule shapes lifted from the reference's own rule
sets (rules/elasticsearch.xml, transformation/common/fields-1.xml) run
against hand-derived expectations, plus the Spark mapInPandas surface."""

import json

import pytest

from limetrans_spark.functions.morph import Morph, morph_marc21

OCCS = [
    ("001", "  REC9  "),
    ("008", "920702s1992    gw ||||| |||| 00||||ger  "),
    ("24510.a", "Ein Titel"),
    ("24510.b", "Untertitel"),
    ("650 0.a", "Topic One"),
    ("650 0.a", "Topic Two"),
    ("650 0.a", "Topic One"),
    ("041 0.a", "ger"),
    ("041 0.a", "eng"),
]


def T(xml, occs=None, vars_=None):
    return Morph.from_xml(xml, vars_).transform(occs if occs is not None else OCCS)


def test_data_trim_noop_shape():
    # rules/elasticsearch.xml: <data source="001"><trim/></data>
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <rules><data source="001"><trim/></data></rules></metamorph>"""
    assert T(xml) == {"001": "REC9"}


def test_combine_with_vars_and_internal_variable():
    # fields-1.xml @id shape: combine value="($[isil])${id}" over 001,
    # then a data rule reading the @internal variable
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <vars><var name="isil" value="DE-380"/></vars>
      <rules>
        <combine name="@id" value="($[isil])${id}">
          <data name="id" source="001"><trim/></data>
        </combine>
        <data name="identifierForTheRecord" source="@id"/>
        <data name="isContextLocal" source="@id"><regexp match="\\(DE-836\\).*"/></data>
      </rules></metamorph>"""
    out = T(xml)
    # @id itself is internal (not in the record); the reader of @id is
    assert out == {"identifierForTheRecord": "(DE-380)REC9"}


def test_constant_substring_regexp_format():
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <vars><var name="isil" value="X-1"/></vars>
      <rules>
        <data name="collection" source="001"><constant value="$[isil]"/></data>
        <data name="year" source="008"><substring start="7" end="11"/>
          <regexp match="^[0-9]+$"/></data>
        <data name="yearTagged" source="008"><substring start="7" end="11"/>
          <regexp match="^([0-9]{4})$" format="y:${1}"/></data>
      </rules></metamorph>"""
    assert T(xml) == {"collection": "X-1", "year": "1992", "yearTagged": "y:1992"}


def test_entity_list_lookup_unique():
    # fields-1.xml Language[] shape: indicator/subfield source pattern,
    # unique over repeated 041 values, lookup into a named map
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <rules>
        <entity name="subjects[]" flushWith="record">
          <data source="650[ 0]0.a"><case to="lower"/><unique/></data>
        </entity>
        <entity name="Language">
          <data name="language" source="041[ 01][ 0].[adj]">
            <lookup in="iso-to-name"/></data>
        </entity>
      </rules>
      <maps><map name="iso-to-name">
        <entry name="ger" value="German"/>
      </map></maps></metamorph>"""
    out = T(xml)
    # unique dedups the repeated 'Topic One'; lookup drops unmapped 'eng'
    assert out == {
        "subjects": ["topic one", "topic two"],
        "Language": {"language": "German"},
    }


def test_filters_replace_split_and_if():
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <rules>
        <data name="title" source="245??.a"><replace pattern="Ein" with="Der"/></data>
        <data name="kept" source="245??.b"><not-equals string="nope"/></data>
        <data name="dropped" source="245??.b"><equals string="nope"/></data>
        <entity name="langs[]" flushWith="record">
          <data source="041??.a"><split delimiter=","/></data>
        </entity>
        <combine name="flagged" value="${t}!">
          <if><all><data source="041??.a"><equals string="ger"/></data></all></if>
          <data name="t" source="245??.a"/>
        </combine>
        <combine name="never" value="${t}?">
          <if><none><data source="001"/></none></if>
          <data name="t" source="245??.a"/>
        </combine>
      </rules></metamorph>"""
    out = T(xml)
    assert out == {
        "title": "Der Titel",
        "kept": "Untertitel",
        "langs": ["ger", "eng"],
        "flagged": "Ein Titel!",
    }


def test_nested_entities_and_unsupported_raises():
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <rules>
        <entity name="outer"><entity name="inner">
          <data name="v" source="001"><trim/></data>
        </entity></entity>
      </rules></metamorph>"""
    assert T(xml) == {"outer": {"inner": {"v": "REC9"}}}
    bad = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <rules><data source="001"><frobnicate/></data></rules></metamorph>"""
    with pytest.raises(ValueError, match="frobnicate"):
        T(bad)


def test_morph_marc21_spark_surface(spark, tmp_path):
    from limetrans_spark.sources.marc import encode_marc21_record

    raws = [
        encode_marc21_record(
            "00000nam a2200000 a 4500",
            [
                ("001", f"R{i}"),
                ("245", "1", "0", [("a", f"Title {i}")]),
                ("650", " ", "0", [("a", "T1")]),
                ("650", " ", "0", [("a", "T2")]),
            ],
        )
        for i in range(3)
    ]
    p = tmp_path / "m.mrc"
    p.write_text("".join(raws), encoding="utf-8")
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <vars><var name="isil" value="DE-X"/></vars>
      <rules>
        <combine name="id" value="($[isil])${v}">
          <data name="v" source="001"/></combine>
        <data name="title" source="245??.a"/>
        <entity name="subjects[]" flushWith="record"><data source="650??.a"/></entity>
      </rules></metamorph>"""
    out = morph_marc21(spark, str(p), xml).orderBy("record_id").collect()
    assert [r["record_id"] for r in out] == ["R0", "R1", "R2"]
    assert json.loads(out[1]["record"]) == {
        "id": "(DE-X)R1",
        "title": "Title 1",
        "subjects": ["T1", "T2"],
    }


def test_morph_marc21_rejects_duplicate_field_records(spark, tmp_path):
    """With the INDEXER shaping, a rule set emitting duplicate sibling
    fields rejects THAT record (the reference backend's duplicate-field
    parse error → record missing) without failing the job; the default
    JsonEncoder shaping keeps both records."""
    from limetrans_spark.sources.marc import encode_marc21_record

    raws = [
        encode_marc21_record(
            "00000nam a2200000 a 4500",
            [("001", "GOOD"), ("245", "1", "0", [("a", "one title")])],
        ),
        encode_marc21_record(
            "00000nam a2200000 a 4500",
            [("001", "DUP"),
             ("245", "1", "0", [("a", "first")]),
             ("245", "1", "0", [("a", "second")])],  # → duplicate 'title'
        ),
    ]
    p = tmp_path / "d.mrc"
    p.write_text("".join(raws), encoding="utf-8")
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <rules><data name="title" source="245??.a"/></rules></metamorph>"""
    out = morph_marc21(spark, str(p), xml, shaping="indexer").collect()
    assert [r["record_id"] for r in out] == ["GOOD"]
    assert json.loads(out[0]["record"]) == {"title": "one title"}

    both = morph_marc21(spark, str(p), xml).orderBy("record_id").collect()
    assert [r["record_id"] for r in both] == ["DUP", "GOOD"]
