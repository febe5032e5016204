"""Filter algebra (LimetransFilterTest analogue) + Metafix vocabulary."""

import pytest
from pyspark.sql import functions as F

from limetrans_spark.functions import fix
from limetrans_spark.operators.filter import Filter, apply_filter


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "apple pie", "en", ""),
            (2, "banana", "de", "x"),
            (3, None, "en", "y"),
            (4, "cherry", "fr", "z"),
        ],
        "id int, txt string, lang string, extra string",
    )


def ids(df):
    return sorted(r["id"] for r in df.collect())


def test_exists(df):
    assert ids(apply_filter(df, Filter.all("@txt"))) == [1, 2, 4]
    assert ids(apply_filter(df, Filter.all("!txt"))) == [3]
    assert ids(apply_filter(df, Filter.all("!extra"))) == [1]  # empty string counts as missing


def test_equals_and_regex(df):
    assert ids(apply_filter(df, Filter.all("lang=en"))) == [1, 3]
    assert ids(apply_filter(df, Filter.all("txt=~an.na"))) == [2]


def test_any_field(df):
    # bare value → any-field equality; ~regex → any-field regex
    assert ids(apply_filter(df, Filter.any("banana"))) == [2]
    assert ids(apply_filter(df, Filter.any("~err"))) == [4]


def test_nested_none(df):
    flt = Filter.all("@txt", Filter.none("lang=de", "lang=fr"))
    assert ids(apply_filter(df, flt)) == [1]


def test_nested_any_all(df):
    flt = Filter.any(Filter.all("lang=en", "@txt"), "lang=fr")
    assert ids(apply_filter(df, flt)) == [1, 4]


def test_empty_filter_matches_all(df):
    assert ids(apply_filter(df, Filter.all())) == [1, 2, 3, 4]


# --- fix vocabulary -----------------------------------------------------------


@pytest.fixture(scope="module")
def recs(spark):
    return spark.createDataFrame(
        [(1, "Hello-World foo", "A"), (2, "bar bar baz", "B")],
        "id int, val string, tag string",
    )


def test_fix_pipeline_roundtrip(recs):
    out = fix.run_pipeline(
        recs,
        [
            fix.copy_field("val", "v2"),
            fix.replace_all("v2", "-", " "),
            fix.split_field("v2", " "),
            fix.uniq("v2"),
            fix.join_field("v2", "|"),
            fix.paste("combo", "tag", "v2", "~lit", join_char="+"),
            fix.add_field("k", "v"),
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["v2"] == "Hello|World|foo"
    assert rows[2]["v2"] == "bar|baz"
    assert rows[1]["combo"] == "A+Hello|World|foo+lit"
    assert rows[1]["k"] == "v"


def test_fix_lookup(recs):
    out = fix.run_pipeline(recs, [fix.lookup("tag", {"A": "alpha"}, default="?")])
    rows = {r["id"]: r["tag"] for r in out.collect()}
    assert rows == {1: "alpha", 2: "?"}


def test_fix_lookup_delete_miss(recs):
    out = fix.run_pipeline(recs, [fix.lookup("tag", {"A": "alpha"}, delete=True)])
    rows = {r["id"]: r["tag"] for r in out.collect()}
    assert rows == {1: "alpha", 2: None}


def test_fix_lookup_join(spark, recs):
    m = spark.createDataFrame([("A", "first")], "k string, v string")
    out = fix.run_pipeline(recs, [fix.lookup_join("tag", m, "k", "v", dst="mapped")])
    rows = {r["id"]: r["mapped"] for r in out.collect()}
    assert rows == {1: "first", 2: None}


def test_fix_array_ops(spark):
    df = spark.createDataFrame([(1, ["a", "", "b", "a", None])], "id int, arr array<string>")
    out = fix.run_pipeline(df, [fix.vacuum("arr"), fix.uniq("arr")])
    assert out.first()["arr"] == ["a", "b"]
    out2 = fix.run_pipeline(df, [fix.vacuum("arr"), fix.drop_repeated("arr", 2)])
    assert out2.first()["arr"] == "b"


def test_fix_retain_reject(recs):
    out = fix.run_pipeline(recs, [fix.reject(F.col("id") == 2), fix.retain("id")])
    assert out.columns == ["id"]
    assert [r["id"] for r in out.collect()] == [1]


def test_fix_parse_text(spark):
    df = spark.createDataFrame([(1, "k=alpha;v=7",)], "id int, s string")
    out = fix.run_pipeline(df, [fix.parse_text("s", "k=([a-z]+);v=([0-9]+)", ["pk", "pv"])])
    r = out.first()
    assert (r["pk"], r["pv"]) == ("alpha", "7")
