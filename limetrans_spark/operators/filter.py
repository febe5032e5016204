"""Record-filter predicate algebra → Spark Column expressions.

Re-expresses the reference's ``LimetransFilter``
(``main/src/main/java/hbz/limetrans/filter/LimetransFilter.java:18-28``
grammar, ``:107-155`` compilation, ``:174-176`` operators): boolean
operators ``all`` / ``any`` / ``none`` nest arbitrarily; leaf predicates
are

* ``@field``        — field exists (non-null, non-empty)
* ``!field``        — field missing
* ``field=value``   — equality
* ``field=~regex``  — regex match
* ``value`` / ``~regex`` — match against ANY of the given fields
  (the reference's ``*`` wildcard source)

The reference compiles the algebra to an inline Metamorph XML program
executed record-at-a-time; here it compiles to a Catalyst ``Column`` so
the filter is pushed down / codegen'd for free (SURVEY.md §4), and the
same compiled predicate serves both the build pipeline (filter before
transform, ``Limetrans.java:476-480``) and the standalone filter CLI
(``filter/Main.java``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Filter:
    """Composable predicate node. ``op`` ∈ {all, any, none}."""

    op: str = "any"
    conditions: list = field(default_factory=list)  # str leaves or Filter nodes

    @classmethod
    def all(cls, *conds) -> "Filter":
        return cls("all", list(conds))

    @classmethod
    def any(cls, *conds) -> "Filter":
        return cls("any", list(conds))

    @classmethod
    def none(cls, *conds) -> "Filter":
        return cls("none", list(conds))

    def add(self, *conds) -> "Filter":
        self.conditions.extend(conds)
        return self

    def compile(self, all_fields: list[str]) -> Column:
        cols = [self._leaf(c, all_fields) if isinstance(c, str) else c.compile(all_fields)
                for c in self.conditions]
        if not cols:
            return F.lit(True)
        acc = cols[0]
        for c in cols[1:]:
            acc = (acc & c) if self.op == "all" else (acc | c)
        if self.op == "none":
            acc = cols[0]
            for c in cols[1:]:
                acc = acc | c
            return ~acc
        return acc

    @staticmethod
    def _leaf(cond: str, all_fields: list[str]) -> Column:
        # LimetransFilter.java grammar: @f | !f | f=v | f=~re | v | ~re
        if cond.startswith("@"):
            f = F.col(cond[1:])
            return f.isNotNull() & (f.cast("string") != "")
        if cond.startswith("!"):
            f = F.col(cond[1:])
            return f.isNull() | (f.cast("string") == "")
        if "=~" in cond:
            name, _, rx = cond.partition("=~")
            if name:
                return F.col(name).cast("string").rlike(rx)
            return Filter._any_field(all_fields, lambda c: c.rlike(rx))
        if "=" in cond:
            name, _, val = cond.partition("=")
            if name:
                return F.col(name).cast("string") == val
            cond = val
        if cond.startswith("~"):
            rx = cond[1:]
            return Filter._any_field(all_fields, lambda c: c.rlike(rx))
        return Filter._any_field(all_fields, lambda c: c == cond)

    @staticmethod
    def _any_field(fields: list[str], pred) -> Column:
        acc = F.lit(False)
        for f in fields:
            acc = acc | F.coalesce(pred(F.col(f).cast("string")), F.lit(False))
        return acc


def apply_filter(df: DataFrame, flt: Filter) -> DataFrame:
    return df.filter(flt.compile(df.columns))
