"""Nested record model: the reference indexer's JSON shaping rules
(``ElasticsearchIndexerTest.java:75-196``, transliterated case by case),
Metafix path addressing, MARC trees, and the Spark mapInPandas surface."""

import json

import pytest

from limetrans_spark.functions import records as R


def J(rec):
    return R.to_json_str(rec)


# --- indexer test transliterations (same fixtures: L*/V*/En*/Li*[]) -------


def test_empty_record():
    assert J(R.RecordBuilder().build()) == "{}"


def test_literals():
    b = R.RecordBuilder().literal("L1", "V1").literal("L2", "V2").literal("L3", "V3")
    assert J(b.build()) == '{"L1":"V1","L2":"V2","L3":"V3"}'


def test_entities():
    b = R.RecordBuilder()
    b.start_entity("En1").literal("L1", "V1").literal("L2", "V2").end_entity()
    b.start_entity("En2").literal("L1", "V1").literal("L2", "V2").end_entity()
    assert J(b.build()) == '{"En1":{"L1":"V1","L2":"V2"},"En2":{"L1":"V1","L2":"V2"}}'


def test_nested_entities():
    b = R.RecordBuilder()
    b.start_entity("En1").start_entity("En2").literal("L1", "V1").end_entity().end_entity()
    assert J(b.build()) == '{"En1":{"En2":{"L1":"V1"}}}'


def test_marked_entities_as_list():
    b = R.RecordBuilder()
    b.start_entity("Li1[]").literal("L1", "V1").literal("L2", "V2").literal("L3", "V3").end_entity()
    assert J(b.build()) == '{"Li1":["V1","V2","V3"]}'


def test_entities_in_lists():
    b = R.RecordBuilder()
    b.start_entity("Li1[]")
    b.start_entity("En1").literal("L1", "V1").literal("L2", "V2").end_entity()
    b.start_entity("En2").literal("L3", "V3").literal("L4", "V4").end_entity()
    b.end_entity()
    assert J(b.build()) == '{"Li1":[{"L1":"V1","L2":"V2"},{"L3":"V3","L4":"V4"}]}'


def test_nested_lists():
    b = R.RecordBuilder()
    b.start_entity("Li1[]")
    b.start_entity("Li2[]").literal("L1", "V1").literal("L2", "V2").end_entity()
    b.start_entity("Li3[]").literal("L3", "V3").literal("L4", "V4").end_entity()
    b.end_entity()
    assert J(b.build()) == '{"Li1":[["V1","V2"],["V3","V4"]]}'


def test_duplicate_names_rejected():
    b = R.RecordBuilder().literal("L1", "V1")
    with pytest.raises(R.DuplicateFieldError):
        b.literal("L1", "V2")
    # duplicates nested one level down reject too
    b2 = R.RecordBuilder().start_entity("En1").literal("L1", "V1")
    with pytest.raises(R.DuplicateFieldError):
        b2.literal("L1", "V2")


def test_unbalanced_entities_raise():
    with pytest.raises(ValueError, match="unclosed"):
        R.RecordBuilder().start_entity("En1").build()
    with pytest.raises(ValueError, match="without"):
        R.RecordBuilder().end_entity()


# --- path addressing -------------------------------------------------------


def _rec():
    return {
        "title": "T",
        "meta": {"lang": "de", "src": "x"},
        "subjects": [
            {"a": "s1", "n": "1"},
            {"a": "s2", "n": "2"},
        ],
        "codes": ["c1", "c2", "c3"],
    }


def test_path_get():
    r = _rec()
    assert R.path_get(r, "title") == ["T"]
    assert R.path_get(r, "meta.lang") == ["de"]
    assert R.path_get(r, "subjects.*.a") == ["s1", "s2"]
    assert R.path_get(r, "subjects.0.a") == ["s1"]
    assert R.path_get(r, "subjects.$last.a") == ["s2"]
    assert R.path_get(r, "codes.$first") == ["c1"]
    assert R.path_get(r, "*.lang") == ["de"]
    assert R.path_get(r, "nope.deep") == []


def test_path_set_modes():
    r = _rec()
    R.path_set(r, "meta.lang", "en")
    assert r["meta"]["lang"] == "en"
    R.path_set(r, "codes.$append", "c4")
    assert r["codes"] == ["c1", "c2", "c3", "c4"]
    R.path_set(r, "codes.$first", "C1")
    R.path_set(r, "codes.$last", "C4")
    assert r["codes"][0] == "C1" and r["codes"][-1] == "C4"
    R.path_set(r, "new.deep.field", "v")  # intermediate objects created
    assert r["new"]["deep"]["field"] == "v"
    R.path_set(r, "title.$append", "T2")  # scalar promoted to array
    assert r["title"] == ["T", "T2"]


def test_path_remove():
    r = _rec()
    R.path_remove(r, "meta.src")
    assert r["meta"] == {"lang": "de"}
    R.path_remove(r, "subjects.*.n")
    assert r["subjects"] == [{"a": "s1"}, {"a": "s2"}]
    R.path_remove(r, "codes.$first")
    assert r["codes"] == ["c2", "c3"]
    R.path_remove(r, "nope.deep")  # no-op


def test_nested_fix_rules():
    rules = [
        R.copy_field("subjects.*.a", "subject_names"),
        R.copy_field("meta.lang", "lang"),
        R.move_field("meta.src", "source"),
        R.do_list("subjects", [R.remove_field("n"), R.add_field("seen", "y")]),
        R.remove_field("codes"),
        R.add_field("const", "v1"),
    ]
    out = R.apply_rules(_rec(), rules)
    assert out["subject_names"] == ["s1", "s2"]
    assert out["lang"] == "de" and out["source"] == "x"
    assert out["meta"] == {"lang": "de"}
    assert out["subjects"] == [{"a": "s1", "seen": "y"}, {"a": "s2", "seen": "y"}]
    assert "codes" not in out and out["const"] == "v1"
    # copy with $append accumulates across rules
    r2 = {"a": "1", "b": "2"}
    R.apply_rules(r2, [R.copy_field("a", "all.$append"), R.copy_field("b", "all.$append")])
    assert r2["all"] == ["1", "2"]
    # reject drops the record
    assert R.apply_rules({"x": "1"}, [R.reject_if(lambda r: "x" in r)]) is None
    # retain keeps only named top-level fields
    r3 = R.apply_rules(_rec(), [R.retain("title", "meta")])
    assert set(r3) == {"title", "meta"}
    # copies are DEEP: mutating the copy leaves the source intact
    r4 = _rec()
    R.apply_rules(r4, [R.copy_field("meta", "meta2"), R.add_field("meta2.lang", "en")])
    assert r4["meta"]["lang"] == "de" and r4["meta2"]["lang"] == "en"


# --- MARC trees ------------------------------------------------------------


def _marc_fields():
    return [
        ("001", "REC1"),
        ("005", "20240101"),
        ("245", "1", "0", [("a", "Main title"), ("b", "sub")]),
        ("650", " ", "0", [("a", "Topic one")]),
        ("650", " ", "0", [("a", "Topic two"), ("x", "gen")]),
        ("700", "1", " ", [("a", "Name"), ("9", "(DE-588)1"), ("9", "(DE-101)2")]),
    ]


def test_marc_fields_to_tree():
    tree = R.marc_fields_to_tree("LDR", _marc_fields())
    assert tree["leader"] == "LDR" and tree["001"] == "REC1"
    # repeated data fields keep instance boundaries
    assert [o["a"] for o in tree["650"]] == ["Topic one", "Topic two"]
    assert tree["245"][0]["ind1"] == "1" and tree["245"][0]["b"] == "sub"
    # repeated subfields inside ONE field become arrays
    assert tree["700"][0]["9"] == ["(DE-588)1", "(DE-101)2"]
    # fix paths address into it
    assert R.path_get(tree, "650.*.a") == ["Topic one", "Topic two"]
    assert R.path_get(tree, "245.0.a") == ["Main title"]


def test_parse_marc21_tree_roundtrip():
    from limetrans_spark.sources.marc import encode_marc21_record

    raw = encode_marc21_record("00000nam a2200000 a 4500", _marc_fields())
    rid, tree = R.parse_marc21_tree(raw)
    assert rid == "REC1"
    assert [o["a"] for o in tree["650"]] == ["Topic one", "Topic two"]
    assert tree["700"][0]["9"] == ["(DE-588)1", "(DE-101)2"]
    # repeated control fields become arrays
    raw2 = encode_marc21_record(
        "00000nam a2200000 a 4500", [("001", "R"), ("003", "A"), ("003", "B")]
    )
    _, t2 = R.parse_marc21_tree(raw2)
    assert t2["003"] == ["A", "B"]


# --- Spark surface ---------------------------------------------------------


def test_read_marc21_nested_and_transform(spark, tmp_path):
    from limetrans_spark.sources.marc import encode_marc21_record

    raws = []
    for i in range(3):
        raws.append(
            encode_marc21_record(
                "00000nam a2200000 a 4500",
                [
                    ("001", f"R{i}"),
                    ("245", "1", "0", [("a", f"Title {i}")]),
                    ("650", " ", "0", [("a", "T1")]),
                    ("650", " ", "0", [("a", "T2")]),
                ],
            )
        )
    p = tmp_path / "recs.mrc"
    p.write_text("".join(raws), encoding="utf-8")
    rules = [
        R.copy_field("245.0.a", "title"),
        R.copy_field("650.*.a", "subjects"),
        R.remove_field("leader", "245", "650"),
    ]
    out = R.read_marc21_nested(spark, str(p), rules).orderBy("record_id").collect()
    assert [r["record_id"] for r in out] == ["R0", "R1", "R2"]
    rec0 = json.loads(out[0]["record"])
    assert rec0 == {"001": "R0", "title": "Title 0", "subjects": ["T1", "T2"]}
    # transform_records_json applies further rules + passes columns through
    df = R.read_marc21_nested(spark, str(p), rules)
    out2 = (
        R.transform_records_json(
            df,
            [R.move_field("subjects", "topics"), R.reject_if(lambda r: r["001"] == "R1")],
        )
        .orderBy("record_id")
        .collect()
    )
    assert [r["record_id"] for r in out2] == ["R0", "R2"]
    assert json.loads(out2[0]["record"])["topics"] == ["T1", "T2"]


def test_extract_fields_to_fielded_index_e2e(spark, tmp_path):
    """The reference's full flow, end to end: MARC stream → Fix rules →
    nested records → extract_fields path projection → fielded index →
    fielded query."""
    from limetrans_spark.operators import fielded as FL
    from limetrans_spark.sources.marc import encode_marc21_record

    raws = []
    titles = ["hash join methods", "merge sort basics", "hash tables deep"]
    for i, t in enumerate(titles):
        raws.append(
            encode_marc21_record(
                "00000nam a2200000 a 4500",
                [
                    ("001", f"R{i}"),
                    ("245", "1", "0", [("a", t)]),
                    ("650", " ", "0", [("a", f"topic{i}")]),
                    ("650", " ", "0", [("a", "shared")]),
                ],
            )
        )
    p = tmp_path / "flow.mrc"
    p.write_text("".join(raws), encoding="utf-8")

    recs = R.read_marc21_nested(spark, str(p))
    flat = R.extract_fields(
        recs,
        {"title": "245.0.a", "subjects": "650.*.a", "marc_id": "001"},
    ).withColumn("doc_id", __import__("pyspark.sql.functions", fromlist=["F"]).monotonically_increasing_id())
    rows = {r["record_id"]: r for r in flat.collect()}
    assert rows["R1"]["title"] == "merge sort basics"
    assert rows["R2"]["subjects"] == "topic2 shared"  # multivalue flattened

    # stable ids for the index (hash of record_id is overkill here)
    from pyspark.sql import functions as F

    flat2 = R.extract_fields(
        recs, {"title": "245.0.a", "subjects": "650.*.a"}
    ).withColumn("doc_id", F.substring("record_id", 2, 9).cast("long"))
    fidx = FL.build_fielded_index(
        flat2,
        fields={"title": "title", "subjects": "subjects"},
        copy_to={"title": ["all"], "subjects": ["all"]},
    )
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "title:hash", k=10).collect()}
    assert hits == {0, 2}
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, "subjects:shared", k=10).collect()}
    assert hits == {0, 1, 2}
    hits = {r["doc_id"] for r in FL.bm25_topk_fielded(fidx, '"merge sort"', k=10).collect()}
    assert hits == {1}
