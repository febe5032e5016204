"""Metafix transformation vocabulary as composable Column operations.

The reference's per-record transformation layer is the Metafix DSL
(~1800 lines of ``main/src/main/resources/transformation/*.fix``; operator
inventory in SURVEY.md §2.C).  Every Fix function is row-local — no
shuffle — so each maps to a Catalyst Column expression (JVM-side,
whole-stage-codegen'd) rather than a Python UDF.  This module provides
the vocabulary with Fix-matching names plus a tiny pipeline runner, so a
transformation "program" is a list of steps applied to a DataFrame —
the analogue of compiling a ``.fix`` file.

Coverage ↔ reference (usage counts from SURVEY.md §2.C):
``copy_field``/``move_field``/``remove_field`` (alma.fix:60,422,442),
``add_field`` (alma.fix:110), ``paste`` (alma.fix:260), ``replace_all``
(alma.fix:166), ``split_field``/``join_field`` (alma.fix:663,577),
``substring`` (macros.fix:204), ``prepend``/``append`` (alma.fix:439),
``uniq`` (alma.fix:142), ``filter_field`` (alma.fix:657), ``flatten``
(alma.fix:935), ``lookup`` (alma.fix:159), ``parse_text`` (alma.fix:1090),
``reject``/``retain``/``vacuum`` (alma.fix:1168,1173,1297),
``dedup``/``drop_repeated`` (function/Dedup.java, function/DropRepeated.java).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Step = Callable[[DataFrame], DataFrame]


# --- field plumbing -----------------------------------------------------------


def copy_field(src: str, dst: str) -> Step:
    return lambda df: df.withColumn(dst, F.col(src))


def move_field(src: str, dst: str) -> Step:
    return lambda df: df.withColumnRenamed(src, dst)


def remove_field(*names: str) -> Step:
    return lambda df: df.drop(*names)


def add_field(name: str, value) -> Step:
    return lambda df: df.withColumn(name, F.lit(value))


def retain(*names: str) -> Step:
    """Project to a whitelist (alma.fix:1173-1295)."""
    return lambda df: df.select(*names)


def reject(cond: Column) -> Step:
    """Drop whole records matching cond (reject(), alma.fix:1168)."""
    return lambda df: df.filter(~cond)


# --- string ops ---------------------------------------------------------------


def replace_all(col: str, regex: str, repl: str) -> Step:
    return lambda df: df.withColumn(col, F.regexp_replace(F.col(col), regex, repl))


def paste(dst: str, *parts, join_char: str = " ") -> Step:
    """Concat fields and ``~literal`` parts (Fix paste, alma.fix:260)."""
    cols = [F.lit(p[1:]) if isinstance(p, str) and p.startswith("~") else F.col(p)
            for p in parts]
    return lambda df: df.withColumn(dst, F.concat_ws(join_char, *cols))


def prepend(col: str, prefix: str) -> Step:
    return lambda df: df.withColumn(col, F.concat(F.lit(prefix), F.col(col)))


def append(col: str, suffix: str) -> Step:
    return lambda df: df.withColumn(col, F.concat(F.col(col), F.lit(suffix)))


def substring(col: str, start: int, length: int, dst: str | None = None) -> Step:
    """1-based fixed-position substring (MARC leader slicing, macros.fix:204)."""
    return lambda df: df.withColumn(dst or col, F.substring(F.col(col), start, length))


def parse_text(col: str, regex: str, groups: list[str]) -> Step:
    """Regex-extract named groups into new fields (Fix parse_text, alma.fix:1090)."""

    def step(df: DataFrame) -> DataFrame:
        for i, g in enumerate(groups, start=1):
            df = df.withColumn(g, F.regexp_extract(F.col(col), regex, i))
        return df

    return step


# --- array ops ----------------------------------------------------------------


def split_field(col: str, sep_regex: str, dst: str | None = None) -> Step:
    return lambda df: df.withColumn(dst or col, F.split(F.col(col), sep_regex))


def join_field(col: str, join_char: str, dst: str | None = None) -> Step:
    return lambda df: df.withColumn(dst or col, F.array_join(F.col(col), join_char))


def uniq(col: str) -> Step:
    """Order-preserving array dedup ≈ F.array_distinct (Fix uniq, alma.fix:142)."""
    return lambda df: df.withColumn(col, F.array_distinct(F.col(col)))


def filter_field(col: str, regex: str) -> Step:
    """Keep only matching elements (Fix filter, alma.fix:657)."""
    return lambda df: df.withColumn(col, F.filter(F.col(col), lambda x: x.rlike(regex)))


def flatten(col: str) -> Step:
    return lambda df: df.withColumn(col, F.flatten(F.col(col)))


def vacuum(col: str) -> Step:
    """Remove empty/null elements (Fix vacuum, alma.fix:173,1297)."""
    return lambda df: df.withColumn(
        col, F.filter(F.col(col), lambda x: x.isNotNull() & (x != F.lit("")))
    )


def drop_repeated(col: str, index: int = 1) -> Step:
    """Keep only element ``index`` (1-based) of a repeated field
    (function/DropRepeated.java:12-30)."""
    return lambda df: df.withColumn(col, F.element_at(F.col(col), index))


def sort_field(col: str) -> Step:
    return lambda df: df.withColumn(col, F.sort_array(F.col(col)))


# --- lookups ------------------------------------------------------------------


def lookup(col: str, mapping: dict[str, str], dst: str | None = None,
           delete: bool = False, default: str | None = None) -> Step:
    """Map values through a key→value table (Fix lookup, alma.fix:159,227).

    Small maps inline as a Catalyst ``map`` literal (constant-folded);
    for GB-scale maps use :func:`lookup_join` — the Spark answer to the
    reference's LMDB out-of-core maps (function/PutLmdbMap.java).
    """
    items = []
    for k, v in mapping.items():
        items.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*items) if items else F.create_map()

    def step(df: DataFrame) -> DataFrame:
        hit = F.try_element_at(m, F.col(col))  # null on miss, no ANSI error
        if delete:
            out = hit  # misses → null (caller vacuums)
        elif default is not None:
            out = F.coalesce(hit, F.lit(default))
        else:
            out = F.coalesce(hit, F.col(col))
        return df.withColumn(dst or col, out)

    return step


def lookup_join(col: str, map_df: DataFrame, key: str, value: str,
                dst: str | None = None, broadcast: bool = True) -> Step:
    """Lookup as a keyed join — broadcast when the map is small, shuffle
    hash/sort-merge otherwise (AQE decides).  Replaces point lookups
    against LMDB (core/.../util/LMDB.java:47-172) with the idiomatic
    distributed equivalent."""

    def step(df: DataFrame) -> DataFrame:
        m = map_df.select(
            F.col(key).alias("__lk_key"), F.col(value).alias(dst or col + "_mapped")
        )
        m = F.broadcast(m) if broadcast else m
        return df.join(m, df[col] == m["__lk_key"], "left").drop("__lk_key")

    return step


# --- local-field handling (member libraries) ---------------------------------

# a "local" marker is the literal LOCAL or an owner sigil like A:123b
# (function/DropLocal.java:24-27)
_LOCAL_RE = "^[A-Z]:[0-9]+[a-z]?$"


def is_local_marker(c: Column) -> Column:
    """True iff a scalar subfield-9 value marks the entry as local."""
    return (c == "LOCAL") | c.rlike(_LOCAL_RE)


def drop_local(col: str, member: str, local_field: str = "v9",
               member_field: str = "m") -> Step:
    """Remove local entries owned by OTHER members from an
    ``array<struct>`` field; a field reduced to an empty array is
    nulled out (the reference removes the whole field,
    DropLocal.java:50-59).  ``local_field`` holds subfield 9 — string
    OR array-of-string, dispatched on the actual schema — and
    ``member_field`` holds subfield M."""
    from pyspark.sql import types as T

    def step(df: DataFrame) -> DataFrame:
        elem = df.schema[col].dataType.elementType
        local_is_array = isinstance(elem[local_field].dataType, T.ArrayType)

        def foreign_local(e: Column) -> Column:
            lf = e.getField(local_field)
            if local_is_array:
                marks = F.coalesce(
                    F.exists(lf, is_local_marker), F.lit(False)
                )
            else:
                marks = lf.isNotNull() & is_local_marker(lf)
            mf = e.getField(member_field)
            return marks & mf.isNotNull() & (mf != F.lit(member))

        kept = F.filter(F.col(col), lambda e: ~foreign_local(e))
        return df.withColumn(col, F.when(F.size(kept) > 0, kept))

    return step


def member_local(col: str, member: str, member_field: str = "m") -> Column:
    """Predicate (MemberLocal.java:28-40): True when the field is absent
    or carries no member subfield at all, else True iff ANY entry's
    member equals ``member``.  Usable in filter()/when()."""
    c = F.col(col)
    has_m = F.exists(c, lambda e: e.getField(member_field).isNotNull())
    any_eq = F.exists(
        c,
        lambda e: e.getField(member_field).isNotNull()
        & (e.getField(member_field) == F.lit(member)),
    )
    return c.isNull() | (~has_m) | any_eq


# --- pipeline runner ----------------------------------------------------------


def run_pipeline(df: DataFrame, steps: list[Step]) -> DataFrame:
    """Apply a Fix 'program' = ordered list of steps (the compiled-rule-graph
    analogue of ``Limetrans.getStreamPipe``, ``Limetrans.java:431-501``)."""
    for s in steps:
        df = s(df)
    return df
