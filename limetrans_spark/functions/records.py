"""Nested record model + Metafix path addressing.

The reference's record model is a nested EVENT STREAM materialized to
JSON with pinned shaping rules (``main/src/test/java/hbz/limetrans/
ElasticsearchIndexerTest.java:75-196``):

* literals at a level → object fields,
* ``startEntity("En1")`` → nested object,
* ``startEntity("Li1[]")`` → array; literals inside contribute their
  VALUES (names ignored),
* entities inside a ``[]`` entity → array of objects,
* ``[]`` entities inside a ``[]`` entity → array of arrays,
* duplicate sibling field names → the record is REJECTED (ES 7+
  duplicate-field parse error, ``ElasticsearchIndexerTest.java:180-196``).

Fix rules address into that tree with dot paths, wildcards and array
selectors (``$append``/``$first``/``$last`` — Metafix path semantics;
the reference's own Value matcher shape is visible in
``main/src/main/java/hbz/limetrans/function/DropLocal.java:35-56``).

Spark-first design: the tree is row-local, dynamic-schema data — no
fixed struct column can hold every record shape a ``.fix`` file can
produce.  The engine therefore carries records as a compact JSON string
column and runs the ENTIRE transform pipeline (build tree → fix rules →
serialize) in one Arrow-batched ``mapInPandas`` pass: embarrassingly
parallel, zero shuffles, no per-row Python UDF dispatch, and the output
column feeds straight into sinks or ``F.get_json_object`` /
``from_json`` projections for indexing.
"""

from __future__ import annotations

import copy
import json
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LIST_MARKER = "[]"


class DuplicateFieldError(ValueError):
    """Duplicate sibling field — the reference indexer's ES backend
    rejects the whole record (``ElasticsearchIndexerTest.java:180-196``)."""


# --------------------------------------------------------------------------
# event stream → value tree (the indexer's shaping rules)
# --------------------------------------------------------------------------


class RecordBuilder:
    """Consume ``literal``/``startEntity``/``endEntity`` events and build
    the nested value tree exactly as the reference indexer shapes its
    JSON source (see module docstring for the pinned rules)."""

    def __init__(self) -> None:
        self._root: dict = {}
        self._stack: list = [self._root]

    def _put(self, name: str, value) -> None:
        top = self._stack[-1]
        if isinstance(top, list):
            top.append(value)
            return
        if name in top:
            raise DuplicateFieldError(name)
        top[name] = value

    def literal(self, name: str, value) -> "RecordBuilder":
        self._put(name, value)
        return self

    def start_entity(self, name: str) -> "RecordBuilder":
        if name.endswith(LIST_MARKER):
            child: list | dict = []
            self._put(name[: -len(LIST_MARKER)], child)
        else:
            child = {}
            self._put(name, child)
        self._stack.append(child)
        return self

    def end_entity(self) -> "RecordBuilder":
        if len(self._stack) == 1:
            raise ValueError("endEntity without startEntity")
        self._stack.pop()
        return self

    def build(self) -> dict:
        if len(self._stack) != 1:
            raise ValueError(f"{len(self._stack) - 1} unclosed entities")
        return self._root


def to_json_str(rec: dict) -> str:
    """Canonical compact serialization (insertion-ordered keys) — the
    exact string the gate compares against the DuckDB ``json_object``
    oracle, so no whitespace, no ASCII escaping of non-ASCII."""
    return json.dumps(rec, ensure_ascii=False, separators=(",", ":"))


# --------------------------------------------------------------------------
# path addressing (get / set / remove with wildcards + array selectors)
# --------------------------------------------------------------------------


def _get_matches(node, segs: list[str]) -> list:
    """All values matched by ``segs`` under ``node`` (document order)."""
    if not segs:
        return [node]
    head, rest = segs[0], segs[1:]
    out: list = []
    if isinstance(node, dict):
        if head == "*":
            for v in node.values():
                out.extend(_get_matches(v, rest))
        elif head in node:
            out.extend(_get_matches(node[head], rest))
    elif isinstance(node, list):
        if head == "*":
            for v in node:
                out.extend(_get_matches(v, rest))
        elif head == "$first" and node:
            out.extend(_get_matches(node[0], rest))
        elif head == "$last" and node:
            out.extend(_get_matches(node[-1], rest))
        elif head.isdigit() and int(head) < len(node):
            out.extend(_get_matches(node[int(head)], rest))
    return out


def path_get(rec: dict, path: str) -> list:
    """Values at ``path`` (``a.b``, ``*`` wildcards, numeric indexes,
    ``$first``/``$last``).  Always a list — wildcards match many."""
    return _get_matches(rec, path.split("."))


def _nav_parent(rec: dict, segs: list[str], create: bool):
    """Walk to the parent container of the final segment, optionally
    creating intermediate objects (plain-name segments only)."""
    node = rec
    for s in segs:
        if isinstance(node, dict):
            if s not in node:
                if not create:
                    return None
                node[s] = {}
            node = node[s]
        elif isinstance(node, list):
            if s == "$first" and node:
                node = node[0]
            elif s == "$last" and node:
                node = node[-1]
            elif s.isdigit() and int(s) < len(node):
                node = node[int(s)]
            else:
                return None
        else:
            return None
    return node


def path_set(rec: dict, path: str, value) -> None:
    """Set ``path`` to ``value``.  The final segment decides the mode:
    plain name = overwrite, ``$append`` = append to the array named by
    the parent path (created, or a scalar promoted to an array),
    ``$first``/``$last`` = replace that element, digits = replace index.
    Intermediate objects are created on demand (Metafix set semantics).
    """
    segs = path.split(".")
    last = segs[-1]
    if last == "$append":
        parent = _nav_parent(rec, segs[:-2], True)
        name = segs[-2] if len(segs) >= 2 else None
        if name is None or not isinstance(parent, dict):
            raise ValueError(f"$append needs an array name before it: {path!r}")
        cur = parent.get(name)
        if cur is None:
            parent[name] = [value]
        elif isinstance(cur, list):
            cur.append(value)
        else:
            parent[name] = [cur, value]
        return
    parent = _nav_parent(rec, segs[:-1], True)
    if isinstance(parent, dict):
        parent[last] = value
    elif isinstance(parent, list):
        if last == "$first" and parent:
            parent[0] = value
        elif last == "$last" and parent:
            parent[-1] = value
        elif last.isdigit() and int(last) < len(parent):
            parent[int(last)] = value
        else:
            raise ValueError(f"cannot set {path!r}")
    else:
        raise ValueError(f"cannot set {path!r}")


def path_remove(rec: dict, path: str) -> None:
    """Remove every match of ``path`` (wildcards allowed in any
    position; missing paths are a no-op, as in Metafix)."""
    segs = path.split(".")

    def rm(node, segs: list[str]) -> None:
        head, rest = segs[0], segs[1:]
        if isinstance(node, dict):
            keys = list(node) if head == "*" else ([head] if head in node else [])
            for k in keys:
                if rest:
                    rm(node[k], rest)
                else:
                    del node[k]
        elif isinstance(node, list):
            if rest:
                if head == "*":
                    for v in node:
                        rm(v, rest)
                elif head == "$first" and node:
                    rm(node[0], rest)
                elif head == "$last" and node:
                    rm(node[-1], rest)
                elif head.isdigit() and int(head) < len(node):
                    rm(node[int(head)], rest)
            else:
                if head == "*":
                    node.clear()
                elif head == "$first" and node:
                    node.pop(0)
                elif head == "$last" and node:
                    node.pop()
                elif head.isdigit() and int(head) < len(node):
                    node.pop(int(head))

    rm(rec, segs)


# --------------------------------------------------------------------------
# nested Fix rules (row-local tree → tree callables)
# --------------------------------------------------------------------------

NRule = Callable[[dict], dict | None]  # None = reject record (Metafix reject)


def copy_field(src: str, dst: str) -> NRule:
    """Nested ``copy_field``: one match → the value (deep-copied), many
    (wildcard) matches → append each when ``dst`` ends in ``$append``,
    else set ``dst`` to the list of matches."""

    def rule(rec: dict) -> dict:
        vals = path_get(rec, src)
        if not vals:
            return rec
        if dst.endswith(".$append") or dst == "$append":
            for v in vals:
                path_set(rec, dst, copy.deepcopy(v))
        elif len(vals) == 1:
            path_set(rec, dst, copy.deepcopy(vals[0]))
        else:
            path_set(rec, dst, [copy.deepcopy(v) for v in vals])
        return rec

    return rule


def move_field(src: str, dst: str) -> NRule:
    cp = copy_field(src, dst)

    def rule(rec: dict) -> dict:
        vals = path_get(rec, src)
        if not vals:
            return rec
        cp(rec)
        path_remove(rec, src)
        return rec

    return rule


def remove_field(*paths: str) -> NRule:
    def rule(rec: dict) -> dict:
        for p in paths:
            path_remove(rec, p)
        return rec

    return rule


def add_field(path: str, value) -> NRule:
    def rule(rec: dict) -> dict:
        path_set(rec, path, value)
        return rec

    return rule


def set_array(path: str, *values) -> NRule:
    return add_field(path, list(values))


def set_hash(path: str) -> NRule:
    return add_field(path, {})


def retain(*names: str) -> NRule:
    """Keep only the named TOP-LEVEL fields (Metafix retain)."""

    def rule(rec: dict) -> dict:
        for k in [k for k in rec if k not in names]:
            del rec[k]
        return rec

    return rule


def reject_if(pred: Callable[[dict], bool]) -> NRule:
    """Drop the record when ``pred`` holds (Metafix ``reject``)."""

    def rule(rec: dict) -> dict | None:
        return None if pred(rec) else rec

    return rule


def do_list(path: str, rules: Iterable[NRule]) -> NRule:
    """Metafix ``do list(path: ...)``: apply ``rules`` to every OBJECT
    element of the array at ``path``, each element acting as the record
    root (the binding-variable form with the binding inlined)."""
    rules = list(rules)

    def rule(rec: dict) -> dict:
        for arr in path_get(rec, path):
            if not isinstance(arr, list):
                continue
            for el in arr:
                if isinstance(el, dict):
                    for r in rules:
                        r(el)
        return rec

    return rule


def apply_rules(rec: dict, rules: Iterable[NRule]) -> dict | None:
    for r in rules:
        rec = r(rec)
        if rec is None:
            return None
    return rec


# --------------------------------------------------------------------------
# MARC → nested tree
# --------------------------------------------------------------------------


def marc_fields_to_tree(leader: str, fields: Iterable[tuple]) -> dict:
    """FIELD-level MARC record → nested tree.

    ``fields`` uses the encoder's field-level shape
    (``sources/marc.py:111``): ``(tag, data)`` control fields or
    ``(tag, ind1, ind2, [(code, value), …])`` data fields — so repeated
    fields keep their instance boundaries (the flat per-subfield rows of
    the scan schema cannot recover them).

    Shape: ``leader`` literal; control tags → scalar (array when
    repeated); data tags → ALWAYS an array of field objects
    ``{"ind1":…, "ind2":…, <code>: value-or-array}`` so Fix paths
    address instances uniformly (``245.*.a``, ``650.0.a``)."""
    rec: dict = {"leader": leader}
    for f in fields:
        if len(f) == 2:
            tag, data = f
            cur = rec.get(tag)
            if cur is None:
                rec[tag] = data
            elif isinstance(cur, list):
                cur.append(data)
            else:
                rec[tag] = [cur, data]
            continue
        tag, ind1, ind2, subs = f
        obj: dict = {"ind1": ind1, "ind2": ind2}
        for code, value in subs:
            cur = obj.get(code)
            if cur is None:
                obj[code] = value
            elif isinstance(cur, list):
                cur.append(value)
            else:
                obj[code] = [cur, value]
        rec.setdefault(tag, []).append(obj)
    return rec


def parse_marc21_tree(raw: str) -> tuple[str | None, dict]:
    """One ISO 2709 record → (record_id, nested tree).  Field instance
    boundaries come from the directory (one entry per field), so
    repeated tags stay distinct — unlike the flat per-subfield scan
    schema."""
    from ..sources.marc import FT, RT, SF

    if len(raw) < 26:
        raise ValueError("truncated MARC record")
    leader = raw[:24]
    dir_end = raw.index(FT, 24)
    directory = raw[24:dir_end]
    if len(directory) % 12 != 0:
        raise ValueError("malformed MARC directory")
    tags = [directory[i : i + 3] for i in range(0, len(directory), 12)]
    body = raw[dir_end + 1 :]
    if body.endswith(RT):
        body = body[:-1]
    raw_fields = body.split(FT)
    if raw_fields and raw_fields[-1] == "":
        raw_fields.pop()
    if len(raw_fields) != len(tags):
        raise ValueError(
            f"directory lists {len(tags)} fields but record has {len(raw_fields)}"
        )
    record_id: str | None = None
    fields: list[tuple] = []
    for tag, data in zip(tags, raw_fields):
        if tag < "010":
            fields.append((tag, data))
            if tag == "001":
                record_id = data
            continue
        ind1, ind2 = (data[0], data[1]) if len(data) >= 2 else (" ", " ")
        subs = [
            (chunk[0], chunk[1:]) for chunk in data[2:].split(SF) if chunk
        ]
        fields.append((tag, ind1, ind2, subs))
    return record_id, marc_fields_to_tree(leader, fields)


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------


def read_marc21_nested(
    spark, paths, rules: Iterable[NRule] = ()
) -> DataFrame:
    """MARC21 stream → ``(record_id, record)`` with ``record`` = the
    nested tree as compact JSON, Fix ``rules`` already applied — one
    Arrow-batched pass over the raw records (build + transform +
    serialize fused; records a rule rejects are dropped)."""
    from ..sources.marc import RT

    rules = list(rules)
    raw = (
        spark.read.format("text")
        .option("lineSep", RT)
        .load(paths)
        .filter(F.length(F.trim(F.col("value"))) > 0)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, recs = [], []
            for raw_rec in pdf["value"]:
                rid, tree = parse_marc21_tree(raw_rec)
                tree = apply_rules(tree, rules)
                if tree is None:
                    continue
                ids.append(rid)
                recs.append(to_json_str(tree))
            yield pd.DataFrame({"record_id": ids, "record": recs})

    return raw.mapInPandas(run, "record_id string, record string")


def transform_records_json(
    df: DataFrame,
    rules: Iterable[NRule],
    record_col: str = "record",
    drop_rejected: bool = True,
) -> DataFrame:
    """Apply nested Fix ``rules`` to a JSON-string record column — the
    whole pipeline in one ``mapInPandas`` pass, other columns passed
    through.  Rejected records (a rule returned ``None``) are dropped
    (or kept with a null record when ``drop_rejected=False``)."""
    rules = list(rules)
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_col = []
            keep = []
            for s in pdf[record_col]:
                rec = apply_rules(json.loads(s), rules) if s is not None else None
                ok = rec is not None
                keep.append(ok or not drop_rejected)
                out_col.append(to_json_str(rec) if ok else None)
            pdf = pdf.copy()
            pdf[record_col] = out_col
            yield pdf[pd.Series(keep, index=pdf.index)]

    return df.mapInPandas(run, schema)


def _scalar_leaves(v) -> list[str]:
    """Scalar leaves of a matched value in document order — how an
    indexer flattens a multivalued/nested field into one analyzable
    stream (cf. Elasticsearch array flattening)."""
    if isinstance(v, dict):
        return [s for x in v.values() for s in _scalar_leaves(x)]
    if isinstance(v, list):
        return [s for x in v for s in _scalar_leaves(x)]
    return [] if v is None else [str(v)]


def extract_fields(
    df: DataFrame,
    paths: dict[str, str],
    record_col: str = "record",
    joiner: str = " ",
) -> DataFrame:
    """Project Fix paths out of a nested-record JSON column into plain
    string columns — the last-mile glue between the transform surface
    (``read_marc21_nested`` / ``transform_records_json``) and the
    fielded index builders, which take flat source columns.

    ``paths``: output column → Fix path (wildcards/array selectors
    allowed); every scalar leaf of every match joins with ``joiner`` in
    document order, so a multivalued path (``650.*.a``) indexes like an
    Elasticsearch array field.  One Arrow-batched pass."""
    paths = dict(paths)
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{c}` string" for c in paths]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {c: [] for c in paths}
            for s in pdf[record_col]:
                rec = json.loads(s) if s is not None else {}
                for c, p in paths.items():
                    leaves = [
                        leaf for m in path_get(rec, p) for leaf in _scalar_leaves(m)
                    ]
                    cols[c].append(joiner.join(leaves) if leaves else None)
            out = pdf.copy()
            for c, vals in cols.items():
                out[c] = vals
            yield out

    return df.mapInPandas(run, schema)
