"""Formeta encode/decode — Metafacture's record serialization format.

The reference tees its transformed stream into a Formeta writer
(``Limetrans.java:536-549``, ``FormetaEncoder`` with VERBOSE or
MULTILINE style) and can read ``.formeta`` fixtures back.  The grammar
(public, from the Metafacture project):

    record  :=  id '{' pairs '}'
    pairs   :=  ( pair (',' pair)* )?
    pair    :=  key ':' value  |  key '{' pairs '}'     (entities nest)
    atom    :=  bareword  |  \'…\' with \\-escapes for \' and \\

Repeated keys are allowed (MARC repeated fields).  This module is a
pure-Python encoder/decoder (property: ``decode(encode(x)) == x``)
plus Arrow-batched Spark wrappers over the engine's record shape
(``map<string, array<string>>`` — what ``decode_multiline_records``
emits); nested entity paths flatten with ``.`` like Metafacture's
record paths.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# quoting is needed only for whitespace and Formeta's structural
# characters ({ } , : quots and the escape char) — everything else is a
# bare atom (e.g. N$T, (DE-588)4084672-6)
_PLAIN = re.compile(r"[^\s{},:'\"\\]+")

Pairs = list[tuple[str, object]]  # value: str | Pairs


def _quote(s: str) -> str:
    if s and _PLAIN.fullmatch(s):
        return s
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def encode_record(rec_id: str, fields: Pairs, style: str = "verbose") -> str:
    """One record → Formeta text.  ``style``: ``verbose`` (single line,
    the reference's default) or ``multiline`` (pretty, tab-indented,
    everything quoted — FormatterStyle.MULTILINE)."""
    if style == "verbose":
        def enc(pairs: Pairs) -> str:
            parts = []
            for k, v in pairs:
                if isinstance(v, list):
                    parts.append(f"{_quote(k)}{{ {enc(v)} }}")
                else:
                    parts.append(f"{_quote(k)}: {_quote(str(v))}")
            return ", ".join(parts)

        return f"{_quote(rec_id) if rec_id else chr(39) * 2}{{ {enc(fields)} }}"
    if style == "multiline":
        def qa(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        def enc_ml(pairs: Pairs, depth: int) -> list[str]:
            tab = "\t" * depth
            out = []
            for i, (k, v) in enumerate(pairs):
                sep = "," if i + 1 < len(pairs) else ""
                if isinstance(v, list):
                    out.append(f"{tab}{qa(k)} {{")
                    out.extend(enc_ml(v, depth + 1))
                    out.append(f"{tab}}}{sep}")
                else:
                    out.append(f"{tab}{qa(k)}: {qa(str(v))}{sep}")
            return out

        lines = [f"{qa(rec_id)} {{"] + enc_ml(fields, 1) + ["}"]
        return "\n".join(lines)
    raise ValueError(f"unknown style {style!r}")


class _P:
    """Recursive-descent Formeta parser over a token stream."""

    def __init__(self, text: str):
        self.text = text
        self.i = 0
        self.n = len(text)

    def _ws(self):
        while self.i < self.n and self.text[self.i] in " \t\r\n":
            self.i += 1

    def _peek(self) -> str | None:
        self._ws()
        return self.text[self.i] if self.i < self.n else None

    def _atom(self) -> str:
        self._ws()
        if self.i >= self.n:
            raise ValueError("unexpected end of formeta input")
        c = self.text[self.i]
        if c == "'":
            self.i += 1
            out = []
            while True:
                if self.i >= self.n:
                    raise ValueError("unterminated quoted atom")
                c = self.text[self.i]
                if c == "\\" and self.i + 1 < self.n:
                    out.append(self.text[self.i + 1])
                    self.i += 2
                    continue
                if c == "'":
                    self.i += 1
                    return "".join(out)
                out.append(c)
                self.i += 1
        m = _PLAIN.match(self.text, self.i)
        if not m:
            raise ValueError(f"bad formeta atom at offset {self.i}: {self.text[self.i:self.i+20]!r}")
        self.i = m.end()
        return m.group(0)

    def _expect(self, ch: str):
        self._ws()
        if self.i >= self.n or self.text[self.i] != ch:
            raise ValueError(f"expected {ch!r} at offset {self.i}")
        self.i += 1

    def _pairs(self) -> Pairs:
        out: Pairs = []
        if self._peek() == "}":
            return out
        while True:
            key = self._atom()
            nxt = self._peek()
            if nxt == "{":
                self._expect("{")
                val: object = self._pairs()
                self._expect("}")
            else:
                self._expect(":")
                val = self._atom()
            out.append((key, val))
            if self._peek() == ",":
                self._expect(",")
                continue
            return out

    def record(self) -> tuple[str, Pairs]:
        rid = self._atom() if self._peek() != "{" else ""
        self._expect("{")
        pairs = self._pairs()
        self._expect("}")
        return rid, pairs

    def records(self) -> list[tuple[str, Pairs]]:
        out = []
        while self._peek() is not None:
            out.append(self.record())
        return out


def decode_records(text: str) -> list[tuple[str, Pairs]]:
    """Parse a Formeta stream (any style) → [(record_id, pairs)]."""
    return _P(text).records()


def flatten_pairs(pairs: Pairs, prefix: str = "") -> list[tuple[str, str]]:
    """Nested pairs → [(dotted.path, value)], repeats preserved in order
    (Metafacture's flattened record paths)."""
    out: list[tuple[str, str]] = []
    for k, v in pairs:
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, list):
            out.extend(flatten_pairs(v, path))
        else:
            out.append((path, str(v)))
    return out


# --------------------------------------------------------------------------
# Spark wrappers
# --------------------------------------------------------------------------


def formeta_encode_udf(style: str = "verbose"):
    """(record_id string, record map<string, array<string>>) → formeta
    text, Arrow-batched.  Keys emit in sorted order (maps are unordered;
    determinism beats source order)."""

    @pandas_udf(T.StringType())
    def enc(rid: pd.Series, rec: pd.Series) -> pd.Series:
        out = []
        for r, m in zip(rid, rec):
            fields: Pairs = []
            for k in sorted(m or {}):
                for v in m[k]:
                    fields.append((k, v))
            out.append(encode_record("" if r is None else str(r), fields, style))
        return pd.Series(out)

    return enc


DECODED_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("record_id", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("value", T.StringType()),
        ]
    )
)


@pandas_udf(DECODED_SCHEMA)
def formeta_decode_udf(text: pd.Series) -> pd.Series:
    """Formeta stream text → flattened (record_id, path, value) rows —
    explode downstream to get one row per field occurrence."""
    out = []
    for t in text:
        rows = []
        for rid, pairs in decode_records(t or ""):
            for path, val in flatten_pairs(pairs):
                rows.append((rid, path, val))
        out.append(rows)
    return pd.Series(out)


def read_formeta(spark, paths) -> DataFrame:
    """FileQueue processor ``formeta``: whole-file read → one row per
    field occurrence (``record_id, path, value, _source_file``).
    Records may span lines (MULTILINE style), so this reads whole files
    — at scale Formeta is an exchange/debug format, not the bulk path."""
    from pyspark.sql import functions as F

    raw = spark.read.format("text").option("wholetext", True).load(paths)
    return (
        raw.withColumn("_source_file", F.input_file_name())
        .select("_source_file", F.explode(formeta_decode_udf(F.col("value"))).alias("e"))
        .select("_source_file", "e.record_id", "e.path", "e.value")
    )
