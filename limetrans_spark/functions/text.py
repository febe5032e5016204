"""Text-analysis functions for corpus curation: token counting, quality
scoring, language ID, fingerprinting.

All pure Catalyst expressions (JVM-side, codegen'd, no UDF) and all
reproducible in portable SQL — the DuckDB oracle gate checks them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import simple_tokens

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "by", "at", "this", "that",
]

# engine-portable "BPE-ish" pre-token pattern: identifier runs OR single
# non-space symbols (explicit classes; no \w/\s dialect drift)
BPE_TOKEN_REGEX = "[A-Za-z0-9_]+|[^A-Za-z0-9_ ]"

LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "a", "and", "is", "of", "to"],
    "es": ["el", "los", "las", "que", "y", "es"],
    "fr": ["le", "les", "et", "est", "une", "des"],
}


def token_count(col: Column, toks: Column | None = None) -> Column:
    return F.size(simple_tokens(col) if toks is None else toks)


def bpe_token_count(col: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer (regex runs + symbols).

    ``regexp_count`` counts the same non-overlapping matches as
    ``size(regexp_extract_all(…))`` (same Java regex engine, same
    left-to-right scan) without materializing the match array."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_REGEX))


def stopword_ratio(col: Column, toks: Column | None = None) -> Column:
    toks = simple_tokens(col) if toks is None else toks
    stops = F.filter(toks, lambda t: t.isin(STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stops).cast("double") / F.size(toks)).otherwise(0.0)


def punct_count(col: Column) -> Column:
    # single-char class: match count ≡ matched-array size, no array alloc
    return F.regexp_count(col, F.lit("[^A-Za-z0-9_ ]"))


def mean_token_len(col: Column, toks: Column | None = None) -> Column:
    toks = simple_tokens(col) if toks is None else toks
    # Σ length(tok) ≡ length of the separator-free concatenation — one
    # string build instead of a per-element fold lambda
    total = F.length(F.concat_ws("", toks))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(0.0)


def quality_score(col: Column, toks: Column | None = None) -> Column:
    """Heuristic document-quality score in [0,1]:
    length factor × (1 − stopword excess) × (1 − punctuation density).
    Deterministic rational arithmetic → portable across engines."""
    n = token_count(col, toks)
    length_factor = F.least(n.cast("double") / F.lit(20.0), F.lit(1.0))
    stop_penalty = F.lit(1.0) - F.least(stopword_ratio(col, toks) * 2.0, F.lit(1.0))
    pc = punct_count(col).cast("double")
    chars = F.length(col).cast("double")
    punct_penalty = F.lit(1.0) - F.least(
        F.when(chars > 0, pc / chars).otherwise(0.0) * 4.0, F.lit(1.0)
    )
    return F.round(length_factor * stop_penalty * punct_penalty, 6)


def lang_marker_count(col: Column, lang: str, toks: Column | None = None) -> Column:
    toks = simple_tokens(col) if toks is None else toks
    return F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))


def langid(col: Column, toks: Column | None = None) -> Column:
    """Marker-word language ID: argmax of per-language marker counts,
    deterministic tie-break by language code ascending; 'und' if zero."""
    langs = sorted(LANG_MARKERS)
    counts = {lg: lang_marker_count(col, lg, toks) for lg in langs}
    best_count = F.greatest(*[counts[lg] for lg in langs])
    expr = F.lit("und")
    for lg in reversed(langs):  # first (asc) lang wins ties
        expr = F.when((counts[lg] == best_count) & (best_count > 0), F.lit(lg)).otherwise(expr)
    return expr


def normalize_text(col: Column) -> Column:
    """lower → squeeze whitespace → trim (fingerprint canonicalization)."""
    return F.trim(F.regexp_replace(F.lower(col), " +", " "))


def _fold_map() -> tuple[str, str]:
    """1:1 accent-fold table for F.translate, derived from Unicode data
    (Latin-1 Supplement + Latin Extended-A).  Multi-char decompositions
    (ß, æ, …) can't map 1:1 — they fall to the keyword_normalizer strip,
    a documented deviation from full ICU folding."""
    import unicodedata

    src, dst = [], []
    for cp in range(0xC0, 0x180):
        ch = chr(cp)
        base = "".join(
            c for c in unicodedata.normalize("NFKD", ch) if not unicodedata.combining(c)
        )
        if len(base) == 1 and base != ch and base.isascii() and base.isalpha():
            src.append(ch)
            dst.append(base.lower())
    return "".join(src), "".join(dst)


_FOLD_SRC, _FOLD_DST = _fold_map()


def keyword_normalized(col: Column) -> Column:
    """keyword_normalized analyzer parity
    (hbztitle-settings-v8.json:180-189): fold accents → keep only
    ``[a-zA-Z 0-9]`` → squeeze whitespace → trim; whole string = one
    keyword token.  Pure Catalyst (translate + regexp), no UDF."""
    folded = F.lower(F.translate(col, _FOLD_SRC, _FOLD_DST))
    stripped = F.regexp_replace(folded, "[^a-z 0-9]", "")
    return F.trim(F.regexp_replace(stripped, " +", " "))


def ocn(col: Column) -> Column:
    """ocn analyzer parity (hbztitle-settings-v8.json:190-196 +
    ocn_normalizer at :56-60): strip everything up to the first digit,
    then leading zeros — ``(OCoLC)000123`` → ``123``."""
    return F.regexp_replace(col, "^[^0-9]*0*", "")


def fingerprint(col: Column) -> Column:
    """Document fingerprint = md5 of normalized text (whole-doc rolling
    hash stand-in; portable across engines)."""
    return F.md5(normalize_text(col))


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-stop per-document curation profile.

    Tokenizes ONCE into a staging projection and feeds the array to every
    token-based metric — the regex split is the expensive part, and
    Catalyst keeps the two projections separate (CollapseProject refuses
    to inline non-cheap aliases referenced more than once), so the array
    is materialized once per row instead of ~8×.

    Round 6: every shared count is staged ONCE in a middle projection
    (token/stopword/punct/marker counts, Σ token length, fingerprint)
    and the derived metrics — ratios, quality, langid argmax — are pure
    arithmetic over those staged columns.  The previous shape re-derived
    the counts inside ``quality_score`` and three times per language in
    ``langid``'s when-chain (~2.3 s and ~1.9 s standalone at sf1.0 of a
    6.7 s total).  The staged aliases contain lambda functions, so
    CollapseProject keeps the projections separate and nothing is
    re-inlined.  Arithmetic order is unchanged — outputs are
    bit-identical."""
    c = F.col(text_col)
    staged = df.select(F.col(id_col), c.alias("_text"), simple_tokens(c).alias("_toks"))
    x, t = F.col("_text"), F.col("_toks")
    langs = sorted(LANG_MARKERS)
    mid = staged.select(
        F.col(id_col),
        F.size(t).alias("_n"),
        F.length(x).alias("_chars"),
        F.length(F.concat_ws("", t)).alias("_sumlen"),
        F.size(F.filter(t, lambda tk: tk.isin(STOPWORDS))).alias("_nstop"),
        punct_count(x).alias("_np"),
        # the BPE alternation's two branches are disjoint (word runs vs
        # single non-word-non-space chars) and every maximal run is
        # entered at its first char, so the alternation's match count ≡
        # run count + punct count — one simpler scan here, _np reused
        F.regexp_count(x, F.lit("[A-Za-z0-9_]+")).alias("_nruns"),
        *[
            F.size(F.filter(t, lambda tk: tk.isin(LANG_MARKERS[lg]))).alias(
                f"_c_{lg}"
            )
            for lg in langs
        ],
        fingerprint(x).alias("_fp"),
    )
    n = F.col("_n")
    stop_ratio = F.when(n > 0, F.col("_nstop").cast("double") / n).otherwise(0.0)
    mean_len = F.when(n > 0, F.col("_sumlen").cast("double") / n).otherwise(0.0)
    length_factor = F.least(n.cast("double") / F.lit(20.0), F.lit(1.0))
    stop_penalty = F.lit(1.0) - F.least(stop_ratio * 2.0, F.lit(1.0))
    pc_ = F.col("_np").cast("double")
    chars = F.col("_chars").cast("double")
    punct_penalty = F.lit(1.0) - F.least(
        F.when(chars > 0, pc_ / chars).otherwise(0.0) * 4.0, F.lit(1.0)
    )
    quality = F.round(length_factor * stop_penalty * punct_penalty, 6)
    counts = {lg: F.col(f"_c_{lg}") for lg in langs}
    best = F.greatest(*[counts[lg] for lg in langs])
    lang_expr = F.lit("und")
    for lg in reversed(langs):  # first (asc) lang wins ties
        lang_expr = F.when((counts[lg] == best) & (best > 0), F.lit(lg)).otherwise(
            lang_expr
        )
    return mid.select(
        F.col(id_col),
        n.alias("n_tokens"),
        (F.col("_nruns") + F.col("_np")).alias("n_bpe_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.col("_np").alias("n_punct"),
        quality.alias("quality"),
        lang_expr.alias("langid"),
        F.col("_fp").alias("fingerprint"),
    )
