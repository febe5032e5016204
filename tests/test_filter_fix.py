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


def test_isbn_hyphenation_vectors():
    from limetrans_spark.functions.standard_number import hyphenate_isbn13, isbn_parse

    # ISO 2108 example + classic English-group ISBN
    assert isbn_parse("978-3-16-148410-0")[3] == "978-3-16-148410-0"
    assert isbn_parse("0306406152")[3] == "978-0-306-40615-7"  # 10→13 + hyphenate
    # French group 2, 3-digit registrant
    assert hyphenate_isbn13("9782070408504") == "978-2-07-040850-4"
    # group without shipped ranges (4 = Japan) and 979 prefix → honest None
    assert hyphenate_isbn13("9784163902395") is None
    assert isbn_parse("9798886451740")[3] is None
    # invalid checksum → nothing
    assert isbn_parse("9783161484101") == (False, None, [], None)


def test_drop_local_and_member_local(spark):
    """Reference vectors: DropLocal.java (subfield 9 LOCAL/owner-sigil +
    foreign member M → entry removed) and MemberLocal.java (no M → true,
    else any M == member)."""
    from limetrans_spark.functions.fix import drop_local, member_local

    rows = [
        # (doc, entries[(v9s, m, payload)])
        (1, [(["LOCAL"], "DE-605", "keep-own"), (["LOCAL"], "DE-999", "drop-foreign")]),
        (2, [(["A:123b"], "DE-999", "drop-sigil"), ([], "DE-999", "keep-not-local")]),
        (3, [(None, "DE-999", "keep-null-9"), (["note"], "DE-999", "keep-non-marker")]),
        (4, [(["LOCAL"], None, "keep-no-member")]),
        (5, [(["LOCAL"], "DE-999", "gone")]),  # all entries drop → field nulled
        (6, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, f array<struct<v9: array<string>, m: string, v: string>>"
    )
    out = {r["doc_id"]: r["f"] for r in drop_local("f", "DE-605")(df).collect()}
    assert [e["v"] for e in out[1]] == ["keep-own"]
    assert [e["v"] for e in out[2]] == ["keep-not-local"]
    assert [e["v"] for e in out[3]] == ["keep-null-9", "keep-non-marker"]
    assert [e["v"] for e in out[4]] == ["keep-no-member"]
    assert out[5] is None and out[6] is None

    kept = {r["doc_id"] for r in df.filter(member_local("f", "DE-605", "m")).collect()}
    # 1: has M entries incl DE-605 → true; 2,3,5: M present, none == DE-605 → false
    # 4: only entry has no M → true; 6: field absent → true
    assert kept == {1, 4, 6}

    # scalar (string) subfield-9 variant dispatches on schema
    df2 = spark.createDataFrame(
        [(1, [("LOCAL", "DE-999", "x"), ("B:9z", "DE-605", "y")])],
        "doc_id long, f array<struct<v9: string, m: string, v: string>>",
    )
    out2 = drop_local("f", "DE-605")(df2).collect()[0]["f"]
    assert [e["v"] for e in out2] == ["y"]


def test_keyword_normalized_and_ocn(spark):
    from limetrans_spark.functions.text import keyword_normalized, ocn

    df = spark.createDataFrame(
        [("  Café — déjà-vu!  42 ", "(OCoLC)ocm00012345x")], "t string, o string"
    )
    r = df.select(
        keyword_normalized(F.col("t")).alias("kn"), ocn(F.col("o")).alias("ocn")
    ).collect()[0]
    assert r["kn"] == "cafe dejavu 42"
    assert r["ocn"] == "12345x"
