"""Analyzers: text → (term, position) token streams.

Replaces the reference's Elasticsearch analyzer chain
(``main/src/main/resources/elasticsearch/hbztitle-settings-v8.json:124-162``:
hyphen_protect → standard → lowercase → icu_folding → word_delimiter_graph
with catenate_all + preserve_original → snowball), re-targeted at source
code per the north rule:

* ``simple_tokens``   — pure-Catalyst tokenizer (split/lower, JVM-side, no
  Python).  Used for the oracle-checked query surface: its semantics are
  reproducible in ANSI SQL (DuckDB ``string_split_regex``).
* ``code_tokens_udf`` — the full code-aware *graph* tokenizer as a
  vectorized pandas UDF: identifier splitting on ``_``/``-``/camelCase with
  catenate-all + preserve-original at overlapping positions
  (word_delimiter_graph analogue, ``hbztitle-settings-v8.json:33-41``),
  ASCII folding (icu_folding analogue), NFC normalization
  (``FileQueue.java:182-184`` StreamUnicodeNormalizer analogue).

Graph-position semantics (pinned by the reference's hyphen/compound
matrix, ``ElasticsearchQueryTest.java:200-235``): for a raw token at
position ``p`` that splits into ``n`` parts, the original lowercase form
and the catenated form are emitted at position ``p`` (position increment
0 — they do NOT count toward document length, matching Lucene
``discountOverlaps``), the parts at ``p .. p+n-1``, and the next raw
token starts at ``p+n``.  So ``parseJSON parse_json parse-json`` all
yield {``parsejson``@p, ``parse``@p, ``json``@p+1} and phrase query
``"parse json"`` matches all three.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --- simple analyzer (Catalyst-only; SQL-oracle-compatible) -----------------

SIMPLE_SPLIT_REGEX = "[^a-z0-9]+"


def simple_tokens(col: Column) -> Column:
    """lower → split on non-alphanumeric → drop empties. Pure JVM."""
    arr = F.split(F.lower(col), SIMPLE_SPLIT_REGEX)
    return F.filter(arr, lambda t: t != F.lit(""))


def simple_tokenize_py(text: str) -> list[str]:
    """Python twin of :func:`simple_tokens` for oracles/tests."""
    return [t for t in re.split(SIMPLE_SPLIT_REGEX, text.lower()) if t]


# --- stopword-filtering analyzer --------------------------------------------

# The reference's default chain drops these 54 German/English stopwords
# (``hbztitle-settings-v8.json:66-122``, the ``german_stop_words`` stop
# filter).  Lucene stop-filter semantics: stopwords are removed but the
# surviving tokens KEEP their original positions (enablePositionIncrements
# — a phrase can't pretend the stopword wasn't there), and document
# length counts only the surviving tokens.
STOPWORDS = frozenset(
    """and the of to als am an auf aus bei bis da das dass daß dem den der
    des die dir du durch ein eine einem einen einer eines er es für hat
    ihre im in ist mit nach nicht oder um und vom von vor was wie zu zum
    zur über""".split()
)


def stop_tokens(col: Column) -> Column:
    """``simple_tokens`` minus stopwords, positions preserved: array of
    struct(term, pos) with the ORIGINAL position indices.  Pure JVM."""
    arr = F.split(F.lower(col), SIMPLE_SPLIT_REGEX)
    withpos = F.transform(
        arr, lambda t, i: F.struct(t.alias("term"), i.cast("int").alias("pos"))
    )
    return F.filter(
        withpos,
        lambda s: (s["term"] != F.lit("")) & ~s["term"].isin(*sorted(STOPWORDS)),
    )


def stop_tokenize_with_pos_py(text: str) -> list[tuple[str, int]]:
    """Python twin of :func:`stop_tokens` (positions = pre-filter index).

    NOTE: position indices here intentionally differ from
    ``simple_tokenize_py`` enumeration — gaps remain where stopwords
    were, so phrases across a removed stopword need slop."""
    out = []
    for i, t in enumerate(re.split(SIMPLE_SPLIT_REGEX, text.lower())):
        if t and t not in STOPWORDS:
            out.append((t, i))
    return out


def stop_query_tokenize_py(text: str) -> list[str]:
    """Query-side twin for a ``simple_stop`` index: analyze then drop
    stopwords (ES removes them from the query too)."""
    return [t for t in simple_tokenize_py(text) if t not in STOPWORDS]


# --- code-aware graph analyzer ----------------------------------------------

# A raw token: letters/digits possibly glued by _ or - (hyphen_protect
# analogue: the hyphen stays inside the token at tokenize time).
_RAW_TOKEN = re.compile(r"[A-Za-z0-9]+(?:[-_][A-Za-z0-9]+)*")
# camelCase boundaries: aB | ABc (acronym followed by capitalized word).
_CAMEL = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
_DELIM = re.compile(r"[-_]")


def _fold(s: str) -> str:
    """ICU-folding analogue: NFC normalize, strip combining marks, and
    expand the ligatures NFKD leaves intact (ß→ss, æ/œ — the cases
    icu_folding + german_normalization cover in the reference chain,
    hbztitle-settings-v8.json:46-49,173-178).

    Every step is the identity on pure-ASCII input (NFC/NFKD leave
    ASCII untouched, the ligatures and combining marks are all
    non-ASCII), so ASCII strings — the overwhelming case in a source
    code corpus — short-circuit on one C-level scan."""
    if s.isascii():
        return s
    s = unicodedata.normalize("NFC", s)
    s = s.replace("ß", "ss").replace("ẞ", "SS").replace("æ", "ae").replace(
        "Æ", "AE"
    ).replace("œ", "oe").replace("Œ", "OE")
    nk = unicodedata.normalize("NFKD", s)
    return "".join(c for c in nk if not unicodedata.combining(c))


@dataclass(frozen=True)
class GraphToken:
    term: str
    pos: int


# Identifiers repeat massively in code (the same function/variable names
# occur in thousands of files), so the split/casefold work per DISTINCT
# raw token is memoized: raw token → (emit template [(term, Δpos)…],
# position width).  The cache is insert-only and bounded, so executor
# memory stays fixed and the output is independent of arrival order —
# a miss recomputes the same pure function.
_TOKEN_MEMO: dict[str, tuple[tuple[tuple[str, int], ...], int]] = {}
_TOKEN_MEMO_CAP = 1 << 17


def _analyze_raw(raw: str) -> tuple[tuple[tuple[str, int], ...], int]:
    """Split one raw (already folded) token into its graph-emit template:
    ((term, relative position)…, position width)."""
    parts = [p for seg in _DELIM.split(raw) for p in _CAMEL.split(seg) if p]
    if len(parts) == 1:
        return ((parts[0].lower(), 0),), 1
    lparts = [p.lower() for p in parts]
    catenated = "".join(lparts)
    original = raw.lower()
    # overlap tokens at the start position (posInc 0; not counted in dl)
    emits = [(catenated, 0)]
    if original != catenated:
        emits.append((original, 0))
    emits.extend((p, i) for i, p in enumerate(lparts))
    return tuple(emits), len(parts)


def code_tokenize_py(text: str) -> list[tuple[str, int]]:
    """Graph-tokenize one string. Returns [(term, pos)] sorted by pos.

    Deterministic, pure function — the single source of truth shared by
    the Spark UDF, the pytest oracle, and the query-side analyzer.
    """
    out: list[tuple[str, int]] = []
    pos = 0
    memo = _TOKEN_MEMO
    for m in _RAW_TOKEN.finditer(_fold(text)):
        raw = m.group(0)
        tmpl = memo.get(raw)
        if tmpl is None:
            tmpl = _analyze_raw(raw)
            if len(memo) < _TOKEN_MEMO_CAP:
                memo[raw] = tmpl
        emits, width = tmpl
        if width == 1 and len(emits) == 1:
            out.append((emits[0][0], pos))
        else:
            for term, dp in emits:
                out.append((term, pos + dp))
        pos += width
    return out


def code_doc_length(tokens: list[tuple[str, int]]) -> int:
    """Document length = number of position slots (discountOverlaps)."""
    return (max(p for _, p in tokens) + 1) if tokens else 0


_TOKEN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)


@pandas_udf(_TOKEN_TYPE)
def code_tokens_udf(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) graph tokenizer."""
    return texts.map(lambda t: code_tokenize_py(t) if t is not None else [])


def invert_py(text: str, analyzer: str = "code") -> tuple[int, list[tuple[str, int, list[int]]]]:
    """Tokenize AND invert one document: → (dl, [(term, tf, positions)]).

    This is the map-side half of SPIMI: the per-document posting
    fragments are built where the text lives, so the cluster never
    shuffles raw tokens — only (doc, term, tf, positions) rows, ~3×
    smaller and already aggregated.  Terms sorted for determinism.
    """
    if not text:
        return 0, []
    if analyzer == "code":
        toks = code_tokenize_py(text)
        dl = (max(p for _, p in toks) + 1) if toks else 0
    elif analyzer == "simple_stem":
        # keyword_repeat → porter → unique: the index holds the stem AND
        # the original at one position (the reference's stemmed analyzer
        # shape, hbztitle-settings-v8.json:160-171); stems are overlap
        # tokens, so dl stays the surface token count
        from .stem import porter_stem

        terms = simple_tokenize_py(text)
        toks = []
        for i, t in enumerate(terms):
            toks.append((t, i))
            st = porter_stem(t)
            if st != t:
                toks.append((st, i))
        dl = len(terms)
    elif analyzer == "simple_stem_de":
        # keyword_repeat → snowball German2 → unique: the reference's
        # actual stemming filter (hbztitle-settings-v8.json:42-45
        # "snowball_german_umlaut"); same index shape as simple_stem
        from .stem_de import german2_stem

        terms = simple_tokenize_py(text)
        toks = []
        for i, t in enumerate(terms):
            toks.append((t, i))
            st = german2_stem(t)
            if st != t:
                toks.append((st, i))
        dl = len(terms)
    elif analyzer == "simple_stop_stem_de":
        # the reference's full `default` chain shape
        # (hbztitle-settings-v8.json:126-144): stop → keyword_repeat →
        # snowball German2 → unique.  Stopwords removed with positions
        # preserved, each survivor indexed as surface + stem at its
        # original position, dl = survivor count.
        from .stem_de import german2_stem

        toks = []
        for t, i in stop_tokenize_with_pos_py(text):
            toks.append((t, i))
            st = german2_stem(t)
            if st != t:
                toks.append((st, i))
        dl = len({i for _, i in toks})
    elif analyzer == "simple_stop":
        # stop filter: stopwords removed, survivors keep their original
        # positions (Lucene enablePositionIncrements), dl = survivor count
        toks = stop_tokenize_with_pos_py(text)
        dl = len(toks)
    else:
        terms = simple_tokenize_py(text)
        toks = list(zip(terms, range(len(terms))))
        dl = len(toks)
    acc: dict[str, list[int]] = {}
    for term, pos in toks:
        acc.setdefault(term, []).append(pos)
    return dl, [
        (term, len(ps), sorted(ps)) for term, ps in sorted(acc.items())
    ]


# --- query-side analysis ------------------------------------------------------


@dataclass(frozen=True)
class QueryToken:
    """One raw query token analyzed into its match variants.

    Matches ES's query-time word_delimiter_graph behavior: the token
    matches if the document contains the catenated form at one position
    OR the parts as a phrase (consecutive positions).
    """

    raw: str
    catenated: str
    parts: tuple[str, ...]


def analyze_query(text: str) -> list[QueryToken]:
    out: list[QueryToken] = []
    for m in _RAW_TOKEN.finditer(_fold(text)):
        raw = m.group(0)
        parts = tuple(
            p.lower()
            for seg in _DELIM.split(raw)
            for p in _CAMEL.split(seg)
            if p
        )
        out.append(QueryToken(raw=raw.lower(), catenated="".join(parts), parts=parts))
    return out


def stemmed_query_tokenize_py(text: str) -> list[str]:
    """Query-side analyzer for a ``simple_stem`` index: stem each token
    (no keyword_repeat at query time — the index already holds both the
    stem and the original, so the stemmed query form matches either).
    Pass as ``parse_query(q, analyze=stemmed_query_tokenize_py)``."""
    from .stem import porter_stem

    return [porter_stem(t) for t in simple_tokenize_py(text)]


def german_query_tokenize_py(text: str) -> list[str]:
    """Query-side twin for a ``simple_stem_de`` index (snowball
    German2; the index holds stem + surface at one position)."""
    from .stem_de import german2_stem

    return [german2_stem(t) for t in simple_tokenize_py(text)]


def stop_german_query_tokenize_py(text: str) -> list[str]:
    """Query-side twin for a ``simple_stop_stem_de`` index — the
    reference's ``default``/``search`` chain: drop stopwords, stem the
    survivors with German2."""
    from .stem_de import german2_stem

    return [
        german2_stem(t)
        for t in simple_tokenize_py(text)
        if t not in STOPWORDS
    ]
