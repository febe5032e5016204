"""Analyzer unit vectors — the FIXTURES.md §3 families, transliterating the
reference's hyphen/compound-equivalence matrix
(``ElasticsearchQueryTest.java:200-235``) to code identifiers."""

from limetrans_spark.functions.analysis import (
    analyze_query,
    code_doc_length,
    code_tokenize_py,
    simple_tokenize_py,
)


def toks(text):
    return code_tokenize_py(text)


def terms_at(tokens, pos):
    return {t for t, p in tokens if p == pos}


def test_camel_case_graph():
    t = toks("parseJSON")
    # catenated+original coincide (parsejson), parts at 0 and 1
    assert ("parsejson", 0) in t
    assert ("parse", 0) in t
    assert ("json", 1) in t
    assert len(t) == 3
    assert code_doc_length(t) == 2


def test_snake_hyphen_camel_equivalence():
    """parseJSON ≈ parse_json ≈ parse-json: same term/position sets."""
    base = set(toks("parseJSON"))
    assert set(toks("parse_json")) - {("parse_json", 0)} == base
    assert set(toks("parse-json")) - {("parse-json", 0)} == base


def test_three_part_compound():
    # block-max-wand ↔ blockmaxwand ↔ block max wand (drei-zinnen-gebiet family)
    t = toks("block-max-wand")
    assert terms_at(t, 0) >= {"blockmaxwand", "block-max-wand", "block"}
    assert ("max", 1) in t and ("wand", 2) in t
    plain = toks("block max wand")
    assert plain == [("block", 0), ("max", 1), ("wand", 2)]
    cat = toks("blockmaxwand")
    assert cat == [("blockmaxwand", 0)]


def test_single_letter_prefix():
    # e-payment ↔ epayment (single-letter edge case)
    t = toks("e-payment")
    assert ("epayment", 0) in t and ("e", 0) in t and ("payment", 1) in t


def test_positions_advance_by_parts():
    t = toks("readFile then writeBuffer")
    # readFile: parts at 0,1 → "then" at 2 → writeBuffer parts at 3,4
    assert ("then", 2) in t
    assert ("write", 3) in t and ("buffer", 4) in t
    assert code_doc_length(t) == 5


def test_unicode_folding_and_nfc():
    assert toks("naïve") == [("naive", 0)]
    # NFC: decomposed é == composed é
    assert toks("café") == toks("café")


def test_ligature_expansion():
    # icu_folding + german_normalization parity: ss-ligature and ae/oe
    assert toks("Stra\u00dfe") == toks("Strasse") == [("strasse", 0)]
    assert toks("C\u00e6sar") == [("caesar", 0)]


def test_numerics_not_split():
    assert toks("utf8") == [("utf8", 0)]
    assert toks("sha256sum") == [("sha256sum", 0)]


def test_acronym_boundary():
    t = toks("HTTPClient")
    assert ("http", 0) in t and ("client", 1) in t and ("httpclient", 0) in t


def test_stoplike_tokens_kept():
    # unlike the reference's German stopword filter, code keeps if/return
    assert toks("if return the") == [("if", 0), ("return", 1), ("the", 2)]


def test_simple_tokenizer():
    assert simple_tokenize_py("Hello, World! x9") == ["hello", "world", "x9"]
    assert simple_tokenize_py("") == []


def test_query_analysis_variants():
    q = analyze_query("parse-json score")
    assert q[0].catenated == "parsejson"
    assert q[0].parts == ("parse", "json")
    assert q[1].parts == ("score",)


def test_empty_and_punct_only():
    assert toks("") == []
    assert toks("(){};;=->") == []
    assert code_doc_length([]) == 0


def test_simple_stem_analyzer_and_query_matching(spark):
    """D18 unstemmed/stemmed variant: the simple_stem index holds stem +
    original at one position (dl = surface count), and a stemmed query
    matches all inflections while exact queries still work."""
    from limetrans_spark.functions.analysis import (
        invert_py,
        stemmed_query_tokenize_py,
    )
    from limetrans_spark.operators import query as Q
    from limetrans_spark.operators.build import build_index

    dl, postings = invert_py("running runs connected", "simple_stem")
    terms = {t for t, _, _ in postings}
    assert dl == 3
    assert {"running", "run", "runs", "connected", "connect"} <= terms

    docs = spark.createDataFrame(
        [(0, "the runner was running fast"),
         (1, "he runs daily"),
         (2, "a connection pool"),
         (3, "nothing related here")],
        "doc_id long, content string",
    )
    idx = build_index(docs, analyzer="simple_stem", shard_size=64)
    pq = Q.parse_query("running", analyze=stemmed_query_tokenize_py)
    hits = {r["doc_id"] for r in Q.matching_docs_df(idx, pq).collect()}
    assert hits == {0, 1}  # run/runs/running all share the stem 'run'
    pq2 = Q.parse_query("connections", analyze=stemmed_query_tokenize_py)
    assert {r["doc_id"] for r in Q.matching_docs_df(idx, pq2).collect()} == {2}
    # exact surface query still matches (original token kept in index)
    assert {r["doc_id"] for r in Q.matching_docs_df(idx, "runner").collect()} == {0}


def test_porter_published_vectors():
    from limetrans_spark.functions.stem import porter_stem as p

    vecs = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "conflated": "conflat", "hopping": "hop",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "vietnamization": "vietnam",
        "operator": "oper", "decisiveness": "decis", "triplicate": "triplic",
        "electriciti": "electr", "hopeful": "hope", "goodness": "good",
        "allowance": "allow", "inference": "infer", "adjustable": "adjust",
        "replacement": "replac", "adoption": "adopt", "activate": "activ",
        "effective": "effect", "probate": "probat", "rate": "rate",
        "controll": "control", "roll": "roll",
    }
    assert {k: p(k) for k in vecs} == vecs


def test_simple_stop_analyzer(spark):
    """Stop filter (german_stop_words, hbztitle-settings-v8.json:66-122):
    stopwords removed, survivors keep their pre-filter positions (Lucene
    enablePositionIncrements), dl = survivor count; Spark ≡ Python twin;
    query twin drops stopwords too."""
    from limetrans_spark.functions.analysis import (
        STOPWORDS,
        stop_query_tokenize_py,
        stop_tokenize_with_pos_py,
    )
    from limetrans_spark.operators.build import build_index, tokenize

    texts = [
        (0, "Die Katze und der Hund"),
        (1, "hash join of the century"),
        (2, "und der die das"),  # all stopwords
    ]
    df = spark.createDataFrame(texts, "doc_id long, content string")
    got = sorted(
        (r["doc_id"], r["term"], r["pos"])
        for r in tokenize(df, "content", "simple_stop").collect()
    )
    want = sorted(
        (i, t, p) for i, text in texts for t, p in stop_tokenize_with_pos_py(text)
    )
    assert got == want
    # positions keep the gap where the stopwords were
    assert (0, "katze", 1) in got and (0, "hund", 4) in got
    assert not [g for g in got if g[0] == 2]
    # 52 entries in the reference's german_stop_words list
    assert "und" in STOPWORDS and "the" in STOPWORDS and len(STOPWORDS) == 52
    assert stop_query_tokenize_py("die Katze UND hund") == ["katze", "hund"]
    idx = build_index(df, text_col="content", analyzer="simple_stop", shard_size=4)
    dl = {r["doc_id"]: r["dl"] for r in idx.doclens.collect()}
    assert dl[0] == 2 and dl[1] == 3
    # phrase across a removed stopword is NOT adjacent — needs slop
    from limetrans_spark.operators import query as Q
    from limetrans_spark.operators.query import parse_query

    pq0 = parse_query('"katze hund"', analyze=stop_query_tokenize_py)
    assert {r["doc_id"] for r in Q.matching_docs_df(idx, pq0).collect()} == set()
    pq2 = parse_query('"katze hund"~2', analyze=stop_query_tokenize_py)
    assert {r["doc_id"] for r in Q.matching_docs_df(idx, pq2).collect()} == {0}


def test_simple_stop_fielded_tier(spark):
    """A simple_stop field analyzes its query terms with the stop twin;
    stopword-only clauses vanish (ES stop-filter leniency)."""
    from limetrans_spark.operators import fielded as FL

    df = spark.createDataFrame(
        [(0, "die schnelle Katze"), (1, "ein Hund und eine Katze")],
        "doc_id long, title string",
    )
    fidx = FL.build_fielded_index(df, fields={"title": ("title", "simple_stop")})
    hits = {
        r["doc_id"]
        for r in FL.bm25_topk_fielded(fidx, "title:katze", k=10, default_field="title").collect()
    }
    assert hits == {0, 1}
    # stopword in the query is dropped by the query-side twin
    hits = {
        r["doc_id"]
        for r in FL.bm25_topk_fielded(
            fidx, "title:hund title:und", k=10, default_field="title"
        ).collect()
    }
    assert hits == {1}


def test_memoized_tokenizer_identity_fuzz():
    """The token-template memo and the ASCII `_fold` fast path must be
    byte-invisible: fuzz the memoized tokenizer against a straight
    re-derivation of the pre-memo algorithm (regex split per
    occurrence, full unicode fold unconditionally)."""
    import random
    import unicodedata

    from limetrans_spark.functions.analysis import (
        _CAMEL,
        _DELIM,
        _RAW_TOKEN,
        code_tokenize_py,
    )

    def fold_ref(s):
        s = unicodedata.normalize("NFC", s)
        s = (
            s.replace("ß", "ss").replace("ẞ", "SS").replace("æ", "ae")
            .replace("Æ", "AE").replace("œ", "oe").replace("Œ", "OE")
        )
        nk = unicodedata.normalize("NFKD", s)
        return "".join(c for c in nk if not unicodedata.combining(c))

    def tokenize_ref(text):
        out, pos = [], 0
        for m in _RAW_TOKEN.finditer(fold_ref(text)):
            raw = m.group(0)
            parts = [
                p for seg in _DELIM.split(raw) for p in _CAMEL.split(seg) if p
            ]
            if len(parts) == 1:
                out.append((parts[0].lower(), pos))
                pos += 1
                continue
            lparts = [p.lower() for p in parts]
            catenated = "".join(lparts)
            original = raw.lower()
            out.append((catenated, pos))
            if original != catenated:
                out.append((original, pos))
            out.extend((p, pos + i) for i, p in enumerate(lparts))
            pos += len(parts)
        return out

    rng = random.Random(20260818)
    vocab = [
        "parseJson", "get_value", "HTTPServer", "foo-barBaz_qux", "Größe",
        "straße", "cœur", "Ærø", "naïve", "ﬁle", "étude", "ＡＢＣ123",
        "XMLParser2", "id42x7", "a", "B2", "__x__", "--", "çàé",
    ]
    cases = [" ".join(rng.choices(vocab, k=rng.randint(0, 30))) for _ in range(200)]
    cases += [
        "".join(chr(rng.randint(32, 0x2FF)) for _ in range(rng.randint(0, 60)))
        for _ in range(2000)
    ]
    for s in cases:
        assert code_tokenize_py(s) == tokenize_ref(s), repr(s)
