"""Metamorph XML rules → row-local record transforms (subset).

The reference dispatches transformation rules by extension: ``.fix`` →
Metafix, ``.xml`` → Metamorph (``main/src/main/java/hbz/limetrans/
Limetrans.java:155-189`` — METAMORPH is the required default).  The
Metafix analogue lives in :mod:`functions.fix` (flat) and
:mod:`functions.records` (nested paths); this module closes the second
IR with an interpreter for the Metamorph shapes the reference's rule
sets actually use (``main/src/main/resources/transformation/common/
fields-1.xml``):

* ``<data source name>`` with a function chain — trim, case, substring,
  regexp (match + ``${n}`` format), replace, constant, equals /
  not-equals filters, lookup (``<map>`` tables), unique, split;
* ``<combine name value="...${part}...">`` — emits when every template
  part has been collected, then resets;
* ``<entity name>`` — nested objects, ``name[]`` lists, recursive;
* ``@name`` internal variables (emissions replayed as occurrences);
* ``<vars>`` / ``$[var]`` substitution and ``<maps>``.

Simplifications, documented: occurrences are processed in record order;
``flushWith``/``sameEntity``/``reset`` micro-semantics collapse to
emit-on-complete (combine) and emit-at-end-of-record-if-nonempty
(entity); conditions (``<if>``) are evaluated over the record's full
occurrence set.  These match the common rule shapes; exotic flush
timings are out of scope and raise where detectably different.

Spark-first: like :mod:`functions.records`, the whole transform runs in
one Arrow-batched ``mapInPandas`` pass per partition — per-record Java
logic in the reference, per-batch vectorized dispatch here.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .records import RecordBuilder, to_json_str

_NS = "{http://www.culturegraph.org/metamorph}"


def _strip(tag: str) -> str:
    return tag.split("}", 1)[1] if tag.startswith("{") else tag


def _compile_source(pattern: str) -> re.Pattern:
    """Metamorph source pattern → regex over occurrence keys
    (``tag`` for control fields, ``tag+ind1+ind2.code`` for subfields):
    ``?`` any char, ``*`` any run, ``[...]`` char class, ``|``
    alternatives."""
    alts = []
    for alt in pattern.split("|"):
        out, i = "", 0
        while i < len(alt):
            c = alt[i]
            if c == "[":
                j = alt.index("]", i)
                out += "[" + re.escape(alt[i + 1 : j]).replace("\\", "") + "]"
                i = j + 1
            elif c == "?":
                out, i = out + ".", i + 1
            elif c == "*":
                out, i = out + ".*", i + 1
            else:
                out, i = out + re.escape(c), i + 1
        alts.append(out)
    return re.compile("^(?:" + "|".join(alts) + ")$")


class _Reject(Exception):
    """A filter function (equals / regexp without match) dropped the value."""


class _Func:
    def __init__(self, kind: str, attrs: dict, maps: dict):
        self.kind = kind
        self.attrs = attrs
        self.maps = maps

    def apply(self, v: str, state: dict) -> list[str]:
        a = self.attrs
        if self.kind == "trim":
            return [v.strip()]
        if self.kind == "case":
            return [v.upper() if a.get("to") == "upper" else v.lower()]
        if self.kind == "substring":
            # Metamorph substring: 0-based start, exclusive end
            start = int(a.get("start", "0"))
            end = a.get("end")
            return [v[start : int(end)] if end else v[start:]]
        if self.kind == "regexp":
            m = re.search(a["match"], v)
            if not m:
                raise _Reject()
            fmt = a.get("format")
            if fmt is None:
                return [m.group(0)]
            return [re.sub(r"\$\{(\d+)\}", lambda g: m.group(int(g.group(1))) or "", fmt)]
        if self.kind == "replace":
            return [re.sub(a["pattern"], a["with"], v)]
        if self.kind == "constant":
            return [a["value"]]
        if self.kind == "equals":
            if v != a["string"]:
                raise _Reject()
            return [v]
        if self.kind == "not-equals":
            if v == a["string"]:
                raise _Reject()
            return [v]
        if self.kind == "lookup":
            table = self.maps.get(a["in"], {})
            if v in table:
                return [table[v]]
            if "default" in a:
                return [a["default"]]
            raise _Reject()
        if self.kind == "unique":
            seen = state.setdefault(("unique", id(self)), set())
            if v in seen:
                raise _Reject()
            seen.add(v)
            return [v]
        if self.kind == "split":
            return [p for p in re.split(a["delimiter"], v) if p]
        raise ValueError(f"unsupported metamorph function <{self.kind}>")


class _Data:
    def __init__(self, el: ET.Element, maps: dict, subst):
        self.pattern = _compile_source(el.get("source"))
        self.name = subst(el.get("name") or el.get("source"))
        self.funcs = [
            _Func(_strip(c.tag), {k: subst(v) for k, v in c.attrib.items()}, maps)
            for c in el
            if _strip(c.tag) != "if"
        ]
        self.cond = next((c for c in el if _strip(c.tag) == "if"), None)

    def run(self, value: str, state: dict) -> list[str]:
        vals = [value]
        for f in self.funcs:
            nxt: list[str] = []
            for v in vals:
                try:
                    nxt.extend(f.apply(v, state))
                except _Reject:
                    pass
            vals = nxt
            if not vals:
                break
        return vals


class _Combine:
    def __init__(self, el: ET.Element, maps: dict, subst):
        self.name = subst(el.get("name"))
        self.template = subst(el.get("value"))
        self.parts = [
            _Data(c, maps, subst) for c in el if _strip(c.tag) == "data"
        ]
        self.cond = next((c for c in el if _strip(c.tag) == "if"), None)
        self.needed = set(re.findall(r"\$\{([^}]+)\}", self.template))

    def collect(self, slots: dict) -> str | None:
        if not self.needed <= set(slots):
            return None
        out = re.sub(r"\$\{([^}]+)\}", lambda m: slots[m.group(1)], self.template)
        slots.clear()
        return out


class _Entity:
    def __init__(self, el: ET.Element, maps: dict, subst):
        self.name = subst(el.get("name") or "")
        self.children = _parse_rules(el, maps, subst)


def _parse_rules(parent: ET.Element, maps: dict, subst) -> list:
    out = []
    for el in parent:
        kind = _strip(el.tag)
        if kind == "data":
            out.append(_Data(el, maps, subst))
        elif kind == "combine":
            out.append(_Combine(el, maps, subst))
        elif kind == "entity":
            out.append(_Entity(el, maps, subst))
        elif kind == "if":
            pass  # held on the owning rule
        else:
            raise ValueError(f"unsupported metamorph rule <{kind}>")
    return out


class Morph:
    """Compiled Metamorph rule set; ``transform`` maps one record's
    occurrence list to a nested record dict (RecordBuilder shaping)."""

    def __init__(self, rules: list, maps: dict, vars_: dict):
        self.rules = rules
        self.maps = maps
        self.vars = vars_

    @classmethod
    def from_xml(cls, xml_text: str, vars_: dict | None = None) -> "Morph":
        root = ET.fromstring(xml_text)
        vars_ = dict(vars_ or {})
        maps: dict[str, dict[str, str]] = {}
        for vs in root.iter(f"{_NS}vars"):
            for v in vs:
                vars_.setdefault(v.get("name"), v.get("value"))

        def subst(s):
            if s is None:
                return None
            return re.sub(r"\$\[([^\]]+)\]", lambda m: vars_.get(m.group(1), ""), s)

        for mp in root.iter(f"{_NS}map"):
            maps[mp.get("name")] = {
                e.get("name"): e.get("value") for e in mp
            }
        rules_el = root.find(f"{_NS}rules")
        if rules_el is None:
            raise ValueError("metamorph XML has no <rules>")
        return cls(_parse_rules(rules_el, maps, subst), maps, vars_)

    # -- evaluation ---------------------------------------------------------

    def _cond_holds(self, cond: ET.Element | None, occs: list[tuple[str, str]], state) -> bool:
        if cond is None:
            return True
        (group,) = list(cond)
        kind = _strip(group.tag)
        checks = []
        for d in group:
            dd = _Data(d, self.maps, lambda s: s)
            hit = any(
                dd.pattern.match(k) and dd.run(v, state) for k, v in occs
            )
            checks.append(hit)
        if kind == "all":
            return all(checks)
        if kind == "any":
            return any(checks)
        if kind == "none":
            return not any(checks)
        raise ValueError(f"unsupported <if> group <{kind}>")

    def transform(self, occurrences: list[tuple[str, str]]) -> dict:
        """``occurrences``: ordered (key, value) pairs — ``("001", v)``
        for control fields, ``("245 0.a", v)`` per subfield."""
        state: dict = {}
        internal: list[tuple[str, str]] = []

        def emissions(rules: list, occs) -> list[tuple[str, object]]:
            out: list[tuple[str, object]] = []
            slots: dict[int, dict] = {}
            for key, value in occs:
                for r in rules:
                    if isinstance(r, _Data):
                        if not r.pattern.match(key):
                            continue
                        if not self._cond_holds(r.cond, all_occs, state):
                            continue
                        for v in r.run(value, state):
                            out.append((r.name, v))
                    elif isinstance(r, _Combine):
                        if not self._cond_holds(r.cond, all_occs, state):
                            continue
                        slot = slots.setdefault(id(r), {})
                        for part in r.parts:
                            if part.pattern.match(key):
                                for v in part.run(value, state):
                                    slot[part.name] = v
                        done = r.collect(slot)
                        if done is not None:
                            out.append((r.name, done))
            for r in rules:
                if isinstance(r, _Entity):
                    sub = emissions(r.children, occs)
                    if sub:
                        out.append((r.name, sub))
            return out

        # two passes so @internal emissions are visible as occurrences
        all_occs = list(occurrences)
        top = emissions(self.rules, all_occs)
        internal = [(n, v) for n, v in top if n.startswith("@") and isinstance(v, str)]
        if internal:
            all_occs = list(occurrences) + internal
            top = emissions(self.rules, all_occs)

        b = RecordBuilder()

        def emit(items, depth=0):
            for name, v in items:
                if name.startswith("@"):
                    continue  # internal variable, not part of the record
                if isinstance(v, list):
                    b.start_entity(name)
                    emit(v, depth + 1)
                    b.end_entity()
                else:
                    b.literal(name, v)

        emit(top)
        return b.build()


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------


def _occurrences(fields: list[tuple]) -> list[tuple[str, str]]:
    """Flat per-subfield scan rows → Metamorph occurrence keys."""
    occs = []
    for tag, ind1, ind2, sub, value in fields:
        if sub is None:
            occs.append((tag, value))
        else:
            occs.append((f"{tag}{ind1}{ind2}.{sub}", value))
    return occs


def morph_marc21(spark, paths, xml_text: str, vars_: dict | None = None) -> DataFrame:
    """MARC21 stream → ``(record_id, record)`` JSON via a compiled
    Metamorph rule set — one Arrow-batched pass (read + parse +
    transform + serialize fused), the ``.xml`` twin of
    :func:`records.read_marc21_nested`."""
    from ..sources.marc import RT, parse_marc21_record

    morph = Morph.from_xml(xml_text, vars_)
    raw = (
        spark.read.format("text")
        .option("lineSep", RT)
        .load(paths)
        .filter(F.length(F.trim(F.col("value"))) > 0)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .records import DuplicateFieldError

        for pdf in batches:
            ids, recs = [], []
            for raw_rec in pdf["value"]:
                rid, _, fields = parse_marc21_record(raw_rec)
                try:
                    tree = morph.transform(_occurrences(fields))
                except DuplicateFieldError:
                    # the reference's backend rejects THE RECORD on
                    # duplicate sibling fields (assertMissing,
                    # ElasticsearchIndexerTest.java:180-196) — one bad
                    # record must not fail a corpus-wide job
                    continue
                ids.append(rid)
                recs.append(to_json_str(tree))
            yield pd.DataFrame({"record_id": ids, "record": recs})

    return raw.mapInPandas(run, "record_id string, record string")
