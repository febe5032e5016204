"""Config-file pipeline driver: the ``Main.main(config.json)`` surface.

E2E golden parity: the reference's own ``config/test/*.json`` configs
(input paths repointed at its checkout, outputs at tmp) must produce
byte-identical output to ``limetrans/reference.xml/*`` — json compact +
pretty, formeta compact + pretty, marc21 + marc21records processors,
multiple ordered queues, NFC normalization.  Plus Settings placeholder
semantics, exit-code discipline, and the index-as-sink output.
"""

import glob
import json
from pathlib import Path

import pytest

from limetrans_spark.plans.config import (
    ConfigError,
    Settings,
    _expand_braces,
    record_filter,
    run_config,
)

REF = Path("/root/reference")
CFG = REF / "config/test"
GOLD = REF / "main/src/test/resources/limetrans/reference.xml"

_E2E_CASES = [
    "json",
    "json-pretty",
    "marc21",
    "marc21records",
    "multiple-input-queues",
    "formeta",
    "formeta-pretty",
    "unicode-normalization-composed",
    "unicode-normalization-decomposed",
]

needs_reference = pytest.mark.skipif(
    not CFG.is_dir(), reason="reference checkout not present"
)


def _localize(name: str, tmp_path: Path) -> tuple[Path, Path, str]:
    """Reference config → same config with inputs pointed at the
    reference checkout and outputs at tmp; returns (config_path,
    output_dir, golden_name)."""
    cfg = json.loads((CFG / f"{name}.json").read_text())

    def fix(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if isinstance(v, str) and v.startswith("src/"):
                    node[k] = str(REF / "main" / v)
                else:
                    fix(v)

    fix(cfg["input"])
    okey = "json" if "json" in cfg.get("output", {}) else "formeta"
    golden_name = Path(cfg["output"][okey]).name
    cfg["output"][okey] = str(tmp_path / ("out%s/" + golden_name))
    if "transformation-rules" in cfg:
        cfg["transformation-rules"] = str(
            REF / "main" / cfg["transformation-rules"]
        )
    p = tmp_path / f"{name}.json"
    p.write_text(json.dumps(cfg))
    return p, tmp_path / "out.xml" / golden_name, golden_name


@needs_reference
@pytest.mark.parametrize("name", _E2E_CASES)
def test_config_e2e_matches_reference_output(spark, tmp_path, name):
    cfg_path, out_dir, golden_name = _localize(name, tmp_path)
    report = run_config(spark, cfg_path)
    assert report["ok"] and report["records"] > 0
    part = glob.glob(str(out_dir / "part-*"))
    assert len(part) == 1
    got = Path(part[0]).read_text(encoding="utf-8")
    want = (GOLD / golden_name.replace("%s", "")).read_text(encoding="utf-8")
    assert got == want, f"{name}: output diverges from reference golden"


def test_settings_placeholders(tmp_path):
    # settings-replace-placeholders.json shape: recursive, nested values
    p = tmp_path / "s.json"
    p.write_text(json.dumps({
        "a": "A", "b": "B", "ab": "${a}${b}", "abc": "${ab}C",
        "x": {"y": "${abc}"}, "esc": "\\${a}", "missing": "${nope}",
    }))
    s = Settings.load(p)
    assert s.get("ab") == "AB"
    assert s.get("abc") == "ABC"
    assert s.get("x.y") == "ABC"
    assert s.get("esc") == "\\${a}"  # escaped placeholder untouched
    assert s.get("missing") == "${nope}"  # unknown key left as-is


def test_settings_env_overlay(tmp_path):
    p = tmp_path / "s.json"
    p.write_text(json.dumps({"input": {"queue": {"max-age": 60}}}))
    s = Settings.load(p, env="local")
    assert s.get("env") == "local"
    assert s.get("input.queue.max-age") == -1
    s2 = Settings.load(p, overlay={"input.queue.max-age": 5})
    assert s2.get("input.queue.max-age") == 5


def test_expand_braces():
    assert _expand_braces("input-queue-{1,2}.xml") == [
        "input-queue-1.xml", "input-queue-2.xml",
    ]
    assert _expand_braces("a{1,2}b{x,y}") == ["a1bx", "a1by", "a2bx", "a2by"]
    assert _expand_braces("plain.xml") == ["plain.xml"]


def test_record_filter_algebra():
    occs = [("001", "X1"), ("DEL  .a", "Y"), ("leader", "00000d")]
    assert record_filter(["DEL??.a=Y"], "any")(occs)
    assert not record_filter(["DEL??.a=N"], "any")(occs)
    assert record_filter(["leader=~^.{5}d"], "any")(occs)
    assert record_filter(["!POR  .A"], "all")(occs)  # absent field
    assert not record_filter(["DEL??.a"], "none")(occs)
    assert record_filter([], "any")(occs)  # empty filter accepts


def test_config_errors(spark, tmp_path):
    def write(cfg):
        p = tmp_path / "bad.json"
        p.write_text(json.dumps(cfg))
        return p

    with pytest.raises(ConfigError, match="no input"):
        run_config(spark, write({"output": {"json": "x"}}))
    with pytest.raises(ConfigError, match="path and pattern"):
        run_config(spark, write({
            "input": {"queue": {"path": "/tmp"}}, "output": {"json": "x"},
        }))
    with pytest.raises(ConfigError, match="empty input queue"):
        run_config(spark, write({
            "input": {"queue": {"path": str(tmp_path), "pattern": "zzz*"}},
            "output": {"json": "x"},
        }))
    with pytest.raises(ConfigError, match="unsupported processor"):
        run_config(spark, write({
            "input": {"queue": {"path": str(tmp_path), "pattern": "bad.json",
                                "processor": "WAT"}},
            "output": {"json": "x"},
        }))
    with pytest.raises(ConfigError, match="no output"):
        run_config(spark, write({
            "input": {"queue": {"path": str(tmp_path), "pattern": "bad.json"}},
        }))


def test_cli_run_exit_codes(tmp_path, spark):
    from limetrans_spark.cli import main

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"output": {"json": "x"}}))
    assert main(["run", str(bad)]) == 1


@needs_reference
def test_config_index_sink(spark, tmp_path):
    """output.elasticsearch → the index IS the sink: build_and_publish
    under embeddedPath, searchable afterwards."""
    from pyspark.sql import functions as F

    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.operators import query as Q

    cfg = {
        "input": {"queue": {
            "path": str(REF / "main/src/test/resources/limetrans/input"),
            "pattern": "10.marc21",
            "processor": "MARC21",
        }},
        "transformation-rules": str(
            REF / "main/src/test/resources/limetrans/rules/noop%s"
        ),
        "output": {"elasticsearch": {
            "embeddedPath": str(tmp_path / "es"),
            "index": {"name": "titel", "timewindow": "g1"},
        }},
    }
    p = tmp_path / "es.json"
    p.write_text(json.dumps(cfg))
    report = run_config(spark, p)
    assert report["ok"] and report["records"] == 10
    info = report["outputs"]["index"]
    assert info["docs"] == 10
    idx = lc.load_index(spark, info["root"])
    hits = Q.bm25_topk_df(idx, "946638705", k=5).collect()  # record id term
    assert hits, "published index must be searchable"
    top_key = (
        idx.docstore.filter(F.col("doc_id") == hits[0].doc_id)
        .select("record_id").collect()[0][0]
    )
    assert top_key == "946638705"


@needs_reference
def test_config_index_update_mode_and_check(spark, tmp_path):
    """output.elasticsearch "update": true is the reference's update
    mode (must land in the CURRENT generation, fail fast when absent —
    checkIndex); "checkIndex" runs the post-publish self-check and the
    report carries its result."""
    base = {
        "input": {"queue": {
            "path": str(REF / "main/src/test/resources/limetrans/input"),
            "pattern": "10.marc21",
            "processor": "MARC21",
        }},
        "transformation-rules": str(
            REF / "main/src/test/resources/limetrans/rules/noop%s"
        ),
        "output": {"elasticsearch": {
            "embeddedPath": str(tmp_path / "es"),
            "index": {"name": "titel", "timewindow": "g1"},
            "update": True,
        }},
    }
    p = tmp_path / "upd.json"
    p.write_text(json.dumps(base))
    # update mode against a missing index fails fast (checkIndex)
    with pytest.raises(FileNotFoundError, match="checkIndex"):
        run_config(spark, p)

    # create first (no update), with the post-publish self-check on
    create = json.loads(p.read_text())
    es = create["output"]["elasticsearch"]
    es["update"] = False
    es["checkIndex"] = "deep"
    (tmp_path / "create.json").write_text(json.dumps(create))
    rep1 = run_config(spark, tmp_path / "create.json")
    assert rep1["ok"] and rep1["outputs"]["index"]["check"]["ok"]
    assert rep1["outputs"]["index"]["check"]["deep"]["violations"] == 0

    # now update mode lands in the existing g1 generation
    rep2 = run_config(spark, p)
    assert rep2["ok"]
    assert rep2["outputs"]["index"]["snapshot"] == rep1["outputs"]["index"]["snapshot"]
