"""Config-file pipeline driver — the ``Main.main(config.json)`` surface.

The reference's primary entry point is a JSON settings tree
(``core/src/main/java/hbz/limetrans/util/Settings.java``) naming input
queues, a filter, a transformation rule set and one or more outputs,
assembled by ``Limetrans.java:204-284`` and driven with exit-code
discipline by ``Main.java:111-133``.  This module re-expresses that
surface over the existing Spark operators:

* ``Settings``: JSON load, recursive ``${key}`` placeholder
  interpolation against top-level keys (escaped ``\\${`` kept,
  ``Settings.java:20,270-306``), programmatic overlay puts (the
  ``Main`` env-overlay hook: ``env=local`` drops the queue max-age,
  every env records itself under ``env``);
* input: ``input.queue*`` → :class:`sources.filequeue.FileQueue`
  (path/pattern/processor/sort_by/order/max/max-age, brace-glob
  patterns, gzip-transparent), multiple ordered queues, a failed or
  missing queue fails the run (``Limetrans.java:250-284``);
* ``filter`` / ``filterOperator`` / ``filterKey``: the LimetransFilter
  algebra evaluated per record over the flattened occurrence stream;
* ``transformation-rules``: ``%s`` expands to the rule-type extension
  (``.xml`` Metamorph — ``pathForType``, ``Limetrans.java:587-589``);
  the rules run in one Arrow-batched ``mapInPandas`` pass;
* ``vars``: ``isil`` → ``sigel``/``isil-path`` derivation plus the
  ``vars`` block (``Limetrans.java:288-304``);
* outputs (any combination, one persisted DataFrame feeding all sinks):
  ``output.json`` (JsonEncoder parity: ``_id`` first, duplicate keys
  and event order preserved, compact or ``pretty-printing``),
  ``output.formeta`` (verbose Formeta), ``output.elasticsearch`` →
  the index IS the sink: ``plans.lifecycle.build_and_publish`` under
  ``embeddedPath`` (the reference's embedded-node testing hook) with
  the configured index name.

Scale note: the sinks sort by (queue, file, record) ordinals to
reproduce the reference's single-writer output byte-for-byte; at 100 TB
you would drop the global sort and let each partition write its split —
the transform itself is one shuffle-free ``mapInPandas`` pass either
way.
"""

from __future__ import annotations

import json
import re
import time
from pathlib import Path
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.morph import (
    Morph,
    events_to_obj,
    marc21_record_events,
    marcxml_record_events,
    obj_to_jackson,
)

_PLACEHOLDER = re.compile(r"(?<!\\)\$\{(.*?)\}")


class Settings:
    """JSON settings tree with ``${key}`` interpolation (top-level keys,
    recursive) — Settings.java's Builder semantics."""

    def __init__(self, data: dict):
        self._data = data

    @classmethod
    def load(cls, path: str | Path, overlay: dict | None = None,
             env: str | None = None) -> "Settings":
        data = json.loads(Path(path).read_text(encoding="utf-8"))
        for k, v in (overlay or {}).items():
            _put(data, k.split("."), v)
        if env is not None:
            # Main.java env overlay shape: every env records itself;
            # local drops the input max-age (no cluster to rewire here —
            # the embedded index path IS the cluster)
            data["env"] = env
            if env == "local":
                _put(data, ["input", "queue", "max-age"], -1)
        _replace_placeholders(data, data)
        return cls(data)

    def get(self, key: str, default=None):
        node = self._data
        for part in key.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def sub(self, key: str) -> dict:
        v = self.get(key)
        return v if isinstance(v, dict) else {}

    def path_for_type(self, key: str, default: str | None = None,
                      ext: str = ".xml") -> str | None:
        v = self.get(key, default)
        return v.replace("%s", ext) if isinstance(v, str) else v


def _put(node: dict, parts: list[str], value):
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _replace_placeholders(node, root: dict):
    if isinstance(node, dict):
        for k, v in node.items():
            if isinstance(v, str):
                node[k] = _interpolate(v, root)
            else:
                _replace_placeholders(v, root)
    elif isinstance(node, list):
        for i, v in enumerate(node):
            if isinstance(v, str):
                node[i] = _interpolate(v, root)
            else:
                _replace_placeholders(v, root)


def _interpolate(s: str, root: dict) -> str:
    def repl(m):
        v = root.get(m.group(1))
        if not isinstance(v, str):
            return m.group(0)
        return _interpolate(v, root)

    return _PLACEHOLDER.sub(repl, s)


# --------------------------------------------------------------------------
# filter algebra over the flattened occurrence stream
# --------------------------------------------------------------------------


def _compile_conds(conds: list[str]):
    from ..functions.morph import _compile_source

    out = []
    for cond in conds or []:
        if not cond:
            continue
        negate = cond.startswith("!")
        body = cond[1:] if negate else cond
        if "=~" in body:
            key, _, rx = body.partition("=~")
            out.append((negate, _compile_source(key), re.compile(rx)))
        elif "=" in body:
            key, _, val = body.partition("=")
            out.append((negate, _compile_source(key), val))
        else:
            out.append((negate, _compile_source(body), None))
    return out


def _cond_hits(compiled, occs: list[tuple[str, str]]) -> bool:
    negate, key_rx, val = compiled
    hit = False
    for path, value in occs:
        if not key_rx.match(path):
            continue
        if val is None:
            hit = True
        elif isinstance(val, str):
            hit = value == val
        else:
            hit = bool(val.search(value or ""))
        if hit:
            break
    return hit != negate


def record_filter(conds: list[str], operator: str = "any"):
    """LimetransFilter algebra (operators/filter.py twin) over flattened
    ``(path, value)`` occurrences; empty filter accepts everything."""
    compiled = [_compile_conds([c])[0] for c in conds or [] if c]
    if not compiled:
        return lambda occs: True
    if operator == "all":
        return lambda occs: all(_cond_hits(c, occs) for c in compiled)
    if operator == "none":
        return lambda occs: not any(_cond_hits(c, occs) for c in compiled)
    return lambda occs: any(_cond_hits(c, occs) for c in compiled)


def _events_to_occurrences(events: list[tuple]) -> list[tuple[str, str]]:
    occs, stack = [], []
    for ev in events:
        if ev[0] == "literal":
            path = (stack[-1] + "." + ev[1]) if stack else ev[1]
            occs.append((path, ev[2]))
        elif ev[0] == "start":
            stack.append(ev[1])
        else:
            occs.append((stack.pop(), ""))
    return occs


# --------------------------------------------------------------------------
# output encoders (JsonEncoder / Formeta parity)
# --------------------------------------------------------------------------


def obj_to_compact(node) -> str:
    """Pairs tree → the reference JsonEncoder's compact output: event
    order and duplicate keys preserved."""
    kind = node[0] if isinstance(node, tuple) else "scalar"
    if kind == "obj":
        return "{" + ",".join(
            f"{json.dumps(k, ensure_ascii=False)}:{obj_to_compact(v)}"
            for k, v in node[1]
        ) + "}"
    if kind == "arr":
        return "[" + ",".join(obj_to_compact(v) for v in node[1]) + "]"
    return json.dumps(node, ensure_ascii=False)


def _record_json(rid: str, pairs: list, pretty: bool) -> str:
    node = events_to_obj([("_id", rid)] + pairs)
    return obj_to_jackson(node) if pretty else obj_to_compact(node)


def _record_formeta(rid: str, pairs: list, pretty: bool) -> str:
    from ..functions.formeta import encode_record

    def conv(items):
        return [
            (n, conv(v)) if isinstance(v, list) else (n, v) for n, v in items
        ]

    return encode_record(rid, conv([("_id", rid)] + pairs),
                         style="multiline" if pretty else "verbose")


# --------------------------------------------------------------------------
# the run
# --------------------------------------------------------------------------


class ConfigError(ValueError):
    pass


_PROCESSORS = {"MARCXML", "MARC21", "MARC21RECORDS"}


def _queue_files(qsettings: dict) -> list[str]:
    from ..sources.filequeue import FileQueue

    if "path" not in qsettings or "pattern" not in qsettings:
        raise ConfigError("input queue needs path and pattern")
    pats = qsettings["pattern"]
    pats = pats if isinstance(pats, list) else [pats]
    sort_by = {"lastmodified": "mtime"}.get(
        qsettings.get("sort_by", "name"), qsettings.get("sort_by", "name")
    )
    max_age = qsettings.get("max-age")
    q = FileQueue(
        base=qsettings["path"],
        patterns=[p for pat in pats for p in _expand_braces(pat)],
        sort_by=sort_by,
        order=qsettings.get("order", "asc"),
        max_files=qsettings.get("max"),
        max_age=None if max_age in (None, -1) else max_age,
    )
    return q.resolve()


def _expand_braces(pat: str) -> list[str]:
    """Java PathMatcher glob braces ``{a,b}`` → explicit alternatives."""
    m = re.search(r"\{([^{}]*)\}", pat)
    if not m:
        return [pat]
    out = []
    for alt in m.group(1).split(","):
        out.extend(_expand_braces(pat[: m.start()] + alt + pat[m.end():]))
    return out


def run_config(spark: SparkSession, config_path: str | Path,
               overlay: dict | None = None, env: str | None = None) -> dict:
    """Run one config end-to-end; returns a report dict with
    ``ok``/``records``/``outputs``.  Raises ConfigError on an invalid
    config (no input / no output / unknown processor) — the Main.java
    exit-code discipline maps that to exit 1 in the CLI."""
    config_path = Path(config_path)
    settings = Settings.load(config_path, overlay, env)

    # ---- vars (Limetrans.initializeVars) --------------------------------
    vars_: dict[str, str] = {"external-maps": "./maps", "id-suffix": ""}
    isil = settings.get("isil")
    if isil:
        vars_["isil"] = isil
        if "-" in isil:
            vars_["sigel"] = isil.split("-", 1)[1]
        if settings.get("path"):
            vars_["isil-path"] = str(Path(settings.get("path")) / isil)
    vars_.update({k: str(v) for k, v in settings.sub("vars").items()})

    # ---- input queues ---------------------------------------------------
    input_settings = settings.sub("input")
    if not input_settings:
        raise ConfigError("no input specified")
    queues = []
    for key in input_settings:  # insertion order = config order
        q = input_settings[key]
        if not key.startswith("queue"):
            raise ConfigError(f"unsupported input type: {key}")
        processor = q.get("processor", "MARCXML").upper()
        if processor not in _PROCESSORS:
            raise ConfigError(f"unsupported processor: {processor}")
        files = _queue_files(q)
        if not files:
            raise ConfigError(f"empty input queue: {key}")
        # FileQueue.java:131 — NFC normalization is ON by default
        normalize = bool(q.get("normalize-unicode", True))
        queues.append((key, processor, files, normalize))

    # ---- outputs --------------------------------------------------------
    out = settings.sub("output")
    pretty = bool(out.get("pretty-printing", False))
    json_path = settings.path_for_type("output.json")
    formeta_path = settings.path_for_type("output.formeta")
    es = out.get("elasticsearch")
    if json_path is None and formeta_path is None and es is None:
        raise ConfigError("no output specified")

    # ---- rules + filter -------------------------------------------------
    rules_path = settings.path_for_type("transformation-rules")
    rules_xml = None
    if rules_path is not None:
        if not rules_path.endswith(".xml"):
            raise ConfigError(
                f"only Metamorph (.xml) rules are supported: {rules_path}"
            )
        rules_file = Path(rules_path)
        if not rules_file.is_absolute():
            rules_file = config_path.parent / rules_file
        rules_xml = str(rules_file)

    filter_conds = settings.get("filter") or []
    if isinstance(filter_conds, str):
        filter_conds = [filter_conds]
    filter_op = settings.get("filterOperator", "any")

    # ---- the fused transform pass ---------------------------------------
    rows = []
    for qi, (_key, processor, files, normalize) in enumerate(queues):
        for fi, f in enumerate(files):
            rows.append((qi, fi, f, processor, normalize))
    files_df = spark.createDataFrame(
        rows,
        "queue_idx int, file_idx int, path string, processor string, "
        "normalize boolean",
    ).repartition(min(len(rows), 32), "path")

    rules_for_task = rules_xml
    vars_for_task = dict(vars_)
    conds_for_task = list(filter_conds)
    op_for_task = filter_op
    want_json = json_path is not None
    want_formeta = formeta_path is not None
    pretty_for_task = pretty

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        morph = (
            Morph.from_file(rules_for_task, vars_for_task)
            if rules_for_task
            else None
        )
        accept = record_filter(conds_for_task, op_for_task)
        for pdf in batches:
            out_rows = []
            for q_idx, f_idx, path, processor, normalize in zip(
                pdf["queue_idx"], pdf["file_idx"], pdf["path"],
                pdf["processor"], pdf["normalize"],
            ):
                raw = Path(path).read_bytes()
                if raw[:2] == b"\x1f\x8b":
                    raw = gzip.decompress(raw)
                text = raw.decode("utf-8")
                if processor == "MARCXML":
                    recs = marcxml_record_events(text)
                    recs = [("" if rid is None else "", ev) for rid, ev in recs]
                    # MarcXmlHandler's record identifier is empty
                else:
                    from ..sources.marc import RT

                    recs = []
                    for chunk in text.split(RT):
                        if not chunk.strip():
                            continue
                        # records may be newline-separated between the
                        # 0x1D terminators
                        rid, ev = marc21_record_events(chunk.lstrip() + RT)
                        recs.append((rid or "", ev))
                if normalize:
                    import unicodedata

                    recs = [
                        (
                            unicodedata.normalize("NFC", rid),
                            [
                                (
                                    ("literal", e[1],
                                     unicodedata.normalize("NFC", e[2])
                                     if e[2] is not None else None)
                                    if e[0] == "literal" else e
                                )
                                for e in events
                            ],
                        )
                        for rid, events in recs
                    ]
                for r_idx, (rid, events) in enumerate(recs):
                    if not accept(_events_to_occurrences(events)):
                        continue
                    pairs = morph.run(events) if morph else []
                    row = {
                        "queue_idx": q_idx,
                        "file_idx": f_idx,
                        "record_idx": r_idx,
                        "record_id": rid,
                    }
                    if want_json:
                        row["json"] = _record_json(rid, pairs, pretty_for_task)
                    if want_formeta:
                        row["formeta"] = _record_formeta(rid, pairs, pretty_for_task)
                    leaves = []

                    def walk(items):
                        for _n, v in items:
                            if isinstance(v, list):
                                walk(v)
                            elif v:
                                leaves.append(v)

                    walk(pairs)
                    row["content"] = " ".join(leaves)
                    out_rows.append(row)
            cols = ["queue_idx", "file_idx", "record_idx", "record_id", "content"]
            if want_json:
                cols.append("json")
            if want_formeta:
                cols.append("formeta")
            yield pd.DataFrame(out_rows, columns=cols)

    schema = (
        "queue_idx int, file_idx int, record_idx int, record_id string, "
        "content string"
        + (", json string" if want_json else "")
        + (", formeta string" if want_formeta else "")
    )
    records = files_df.mapInPandas(transform, schema)
    multiple_sinks = sum(x is not None for x in (json_path, formeta_path, es)) > 1
    if multiple_sinks:
        records = records.persist()

    report = {"ok": True, "outputs": {}}
    try:
        n = records.count()
        report["records"] = n

        ordered = records.orderBy("queue_idx", "file_idx", "record_idx")
        if json_path is not None:
            (ordered.select("json").coalesce(1)
             .write.mode("overwrite").text(json_path))
            report["outputs"]["json"] = json_path
        if formeta_path is not None:
            (ordered.select("formeta").coalesce(1)
             .write.mode("overwrite").text(formeta_path))
            report["outputs"]["formeta"] = formeta_path
        if es is not None:
            from . import lifecycle as lc

            root = es.get("embeddedPath") or es.get("root") or "./index"
            name = (es.get("index") or {}).get("name", "index")
            generation = str(
                (es.get("index") or {}).get("timewindow")
                or time.strftime("%Y%m%d%H%M%S")
            )
            # record_id is a KEY column — assign_doc_ids maps it to the
            # engine's integer doc ids; the docstore keeps the mapping
            corpus = records.select(
                F.coalesce(
                    F.nullif(F.col("record_id"), F.lit("")),
                    F.format_string(
                        "r%d", F.monotonically_increasing_id()
                    ),
                ).alias("record_id"),
                F.col("content"),
            )
            # "update": true is the reference's update mode — the build
            # must land in the CURRENT generation of an existing index
            # and fails fast otherwise (checkIndex,
            # ElasticsearchClient.java:92,110-112,204-209)
            rep = lc.build_and_publish(
                corpus, root=root, name=name, generation=generation,
                keys=("record_id",), analyzer=es.get("analyzer", "simple"),
                update=bool(es.get("update", False)),
            )
            report["outputs"]["index"] = {
                "root": root, "name": name,
                "snapshot": rep.snapshot,
                "docs": rep.index.n_docs,
            }
            # engine extension: "checkIndex": true|"deep" runs the
            # post-publish self-check (stats cross-checks; "deep" also
            # decodes every compressed run) before the run reports ok
            chk = es.get("checkIndex")
            if chk:
                report["outputs"]["index"]["check"] = lc.check_index(
                    spark, rep.snapshot, deep=(chk == "deep")
                )
    finally:
        if multiple_sinks:
            records.unpersist()
    return report
