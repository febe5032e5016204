"""Snowball German2 stemmer (the reference's ``snowball_german_umlaut``
filter, ``hbztitle-settings-v8.json:42-45``) + the ``simple_stem_de`` /
``simple_stop_stem_de`` analyzers built on it.

The vector tables were hand-executed from the published Snowball
specification (the German stemming algorithm + the German2 variant
note); this sandbox has no snowball library or official diffs.txt to
import, so each case below was derived step by step (prelude → R1/R2 →
steps 1-3 → postlude) and cross-checked against the algorithm text.
"""

from limetrans_spark.functions.stem_de import german2_stem, german_stem


def test_german2_published_algorithm_vectors():
    """One case per rule: prelude marking, R1≥3 adjustment, step 1
    (em/ern/er, e/en/es + niss, s-ending), step 2 (en/er/est, st),
    step 3 (end/ung±ig, ig/ik/isch, lich/heit±er/en, keit±lich/ig),
    postlude umlaut stripping."""
    vecs = {
        # step 1 er/ern/em in R1
        "kinder": "kind",
        "kindern": "kind",
        "aufeinander": "aufeinand",
        # step 1 e/en/es + trailing-niss fix
        "verhältnisse": "verhaltnis",
        "alten": "alt",
        "aufgabe": "aufgab",
        # R1 start adjusted to >= 3: 'en' at 2 must NOT be deleted
        "eben": "eben",
        # u between vowels marked as a consonant → 'en' IS in R1
        "bauen": "bau",
        "trauen": "trau",
        # step 2 'st' after a valid st-ending preceded by >= 3 letters
        "derbst": "derb",
        # step 2 'est' superlative ('sten' falls to step 1 'en' + step 2)
        "schönsten": "schon",
        # step 3 d-suffixes
        "bedeutung": "bedeut",          # ung in R2
        "vereinigung": "verein",        # ung, then ig in R2
        "beliebig": "belieb",           # ig in R2, not after e
        "vorzeitig": "vorzeit",
        "heiterkeit": "heiter",         # keit in R2
        "aufmerksamkeit": "aufmerksam",
        "möglichkeit": "moglich",       # keit; 'lich' NOT in R2 → kept
        "sicherheit": "sich",           # heit, then 'er' in R1
        "freundlich": "freundlich",     # lich not in R2 → kept
        # postlude: umlauts stripped, marks lowered
        "bücher": "buch",
        "mädchen": "madch",
        "häuser": "haus",
        "bäume": "baum",
        "läuft": "lauft",
        # ß → ss in the prelude
        "größe": "gross",
        "außen": "auss",
    }
    assert {w: german2_stem(w) for w in vecs} == vecs


def test_german2_folds_ae_oe_ue_spellings():
    """THE German2 property: ae/oe/ue spellings stem identically to the
    umlauted (and to the icu-folded plain-vowel) spellings — the reason
    the reference picks German2 over German after icu_folding."""
    triples = [
        ("bücher", "buecher", "bucher", "buch"),
        ("grün", "gruen", "grun", "grun"),
        ("größe", "groesse", "grösse", "gross"),
        ("häuser", "haeuser", None, "haus"),
        ("schönsten", "schoensten", None, "schon"),
    ]
    for umlaut, spelled, folded, stem in triples:
        assert german2_stem(umlaut) == stem
        assert german2_stem(spelled) == stem
        if folded is not None:
            assert german2_stem(folded) == stem
        # standard German does NOT fold the spelled-out variant
        assert german_stem(spelled) != stem


def test_german2_protects_native_ue_and_qu():
    """The marking-before-folding order and the 'qu' hop: a native
    vowel-adjacent ue (bauen, abenteuer, neue) and a qu-prefixed ue
    (quelle) must NOT be treated as ü — German2 equals standard German
    on all of these."""
    for w in ["bauen", "trauen", "abenteuer", "neue", "quelle", "aufbauen"]:
        assert german2_stem(w) == german_stem(w), w
    assert german2_stem("quelle") == "quell"  # not 'qull'
    assert german2_stem("abenteuer") == "abenteu"


def test_german2_edge_inputs():
    assert german2_stem("") == ""
    assert german2_stem("ab") == "ab"
    assert german2_stem("ÄST") == german2_stem("äst")  # lowercased first
    # idempotence is NOT generally promised by snowball; these happen to be
    assert german2_stem(german2_stem("kindern")) == "kind"


def test_simple_stem_de_invert_shape():
    """keyword_repeat shape: surface + (if different) German2 stem at
    one position; dl = surface token count (discountOverlaps)."""
    from limetrans_spark.functions.analysis import invert_py

    dl, postings = invert_py("kinder bauen quellen", "simple_stem_de")
    assert dl == 3
    by_term = {t: ps for t, _, ps in postings}
    assert by_term["kinder"] == [0] and by_term["kind"] == [0]
    assert by_term["bauen"] == [1] and by_term["bau"] == [1]
    assert by_term["quellen"] == [2] and by_term["quell"] == [2]


def test_simple_stop_stem_de_invert_shape():
    """The reference's default chain: stop → keyword_repeat → German2 →
    unique.  Stopword gone, survivors keep pre-filter positions, dl =
    survivor count."""
    from limetrans_spark.functions.analysis import invert_py

    dl, postings = invert_py("die kinder bauen", "simple_stop_stem_de")
    assert dl == 2  # 'die' removed
    by_term = {t: ps for t, _, ps in postings}
    assert "die" not in by_term
    assert by_term["kinder"] == [1]  # pre-filter position kept
    assert by_term["kind"] == [1]
    assert by_term["bauen"] == [2] and by_term["bau"] == [2]


def test_simple_stem_de_index_and_query(spark):
    """End-to-end: a German2 index matches inflected and ae/oe/ue query
    spellings; DF tier and Spark-free serving tier agree."""
    import tempfile

    from limetrans_spark.functions.analysis import german_query_tokenize_py
    from limetrans_spark.operators import query as Q
    from limetrans_spark.operators.build import build_index
    from limetrans_spark.operators.serve import LocalSearcher
    from limetrans_spark.plans.lifecycle import save_index

    docs = spark.createDataFrame(
        [
            (0, "das bucher regal"),        # icu-folded 'bücher'
            (1, "ein buch liegt hier"),
            (2, "die quelle im wald"),
            (3, "nichts verwandtes"),
        ],
        "doc_id long, content string",
    )
    idx = build_index(docs, analyzer="simple_stem_de", shard_size=64)

    def hits(q):
        pq = Q.parse_query(q, analyze=german_query_tokenize_py)
        return {r["doc_id"] for r in Q.matching_docs_df(idx, pq).collect()}

    # 'buecher' → stem 'buch' → matches the folded plural AND the singular
    assert hits("buecher") == {0, 1}
    assert hits("buch") == {0, 1}
    # 'quellen' → 'quell' matches 'quelle'; NOT folded to 'qull'
    assert hits("quellen") == {2}
    # surface form still matches exactly (keyword_repeat keeps it)
    assert hits("regal") == {0}

    with tempfile.TemporaryDirectory() as tmp:
        snap = save_index(idx, tmp, "de", "g1")
        searcher = LocalSearcher.from_snapshot(snap)
        served = {d for d, _ in searcher.search("buecher", k=10)}
        assert served == {0, 1}
        assert {d for d, _ in searcher.search("quellen", k=10)} == {2}


def test_fielded_german2_per_field_analyzer(spark):
    """A fielded index can declare simple_stem_de per field (the
    reference's stemmed catch-all vs unstemmed name field split,
    re-targeted at German2)."""
    from limetrans_spark.operators.fielded import (
        bm25_topk_fielded,
        build_fielded_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "bucher und regale", "schmidt"),
            (1, "eine quelle", "buecher"),  # a NAME, unstemmed field
            (2, "gartenarbeit", "meier"),
        ],
        "doc_id long, title string, name string",
    )
    fidx = build_fielded_index(
        docs,
        fields={"title": ("title", "simple_stem_de"), "name": ("name", "simple")},
    )
    # stemmed field: buecher → buch matches doc 0's folded 'bucher'
    hits = {r["doc_id"] for r in bm25_topk_fielded(fidx, "title:buecher").collect()}
    assert hits == {0}
    # unstemmed name field: exact surface only — the stemmed spelling
    # variants do NOT leak into a simple field
    hits = {r["doc_id"] for r in bm25_topk_fielded(fidx, "name:buecher").collect()}
    assert hits == {1}
    hits = {r["doc_id"] for r in bm25_topk_fielded(fidx, "name:bucher").collect()}
    assert hits == set()
