"""CLI end-to-end: build → resume → search → filter (subprocess — the CLI
owns its SparkSession lifecycle)."""

import json
import subprocess
import sys

import pytest


def run_cli(*args, timeout=300):
    out = subprocess.run(
        [sys.executable, "-m", "limetrans_spark.cli", "--master", "local[4]", *args],
        capture_output=True, text=True, timeout=timeout, cwd="/root/repo",
    )
    return out


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    from limetrans_spark.sources.corpus import synth_corpus

    p = str(tmp_path_factory.mktemp("clicorpus") / "corpus")
    synth_corpus(spark, 80, max_tokens=120, partitions=4).write.parquet(p)
    return p


def test_cli_build_search_filter_resume(corpus_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cliidx"))
    out = run_cli(
        "build", "--input", corpus_path, "--root", root, "--generation", "g1",
        "--shard-size", "32", "--buckets", "4", "--wave-size", "2",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["n_docs"] == 80 and rep["resumed_buckets"] == 0

    # resume: same generation → all buckets skipped, same postings count
    out2 = run_cli(
        "build", "--input", corpus_path, "--root", root, "--generation", "g1",
        "--shard-size", "32", "--buckets", "4", "--wave-size", "2",
    )
    rep2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert rep2["resumed_buckets"] == 4
    assert rep2["n_postings"] == rep["n_postings"]

    s = run_cli("search", "--root", root, "--query", "parse json", "-k", "3")
    assert s.returncode == 0, s.stderr[-2000:]
    hits = [json.loads(line) for line in s.stdout.strip().splitlines()]
    assert len(hits) == 3 and all("score" in h for h in hits)

    w = run_cli("search", "--root", root, "--query", "tokenize | score",
                "-k", "3", "--mode", "wand", "--operator", "or")
    assert w.returncode == 0 and len(w.stdout.strip().splitlines()) == 3

    f = run_cli("filter", "--input", corpus_path, "-f", "lang=py",
                "-f", "@content", "-O", "all", "--limit", "2")
    assert f.returncode == 0
    rows = [json.loads(line) for line in f.stdout.strip().splitlines() if line.startswith("{")]
    assert rows and all(r["lang"] == "py" for r in rows)

    # failure path: nonexistent index root → exit 1 with an error line
    bad = run_cli("search", "--root", str(tmp_path_factory.mktemp("nope")), "--query", "x")
    assert bad.returncode == 1
    assert "error:" in bad.stderr


def test_package_pyfiles_deterministic(tmp_path):
    """--py-files deploy artifact: zip is importable and reproducible."""
    import subprocess
    import sys
    import zipfile

    out1 = str(tmp_path / "a.zip")
    out2 = str(tmp_path / "b.zip")
    subprocess.run([sys.executable, "tools/package_pyfiles.py", out1], check=True, cwd="/root/repo")
    subprocess.run([sys.executable, "tools/package_pyfiles.py", out2], check=True, cwd="/root/repo")
    assert open(out1, "rb").read() == open(out2, "rb").read()
    names = zipfile.ZipFile(out1).namelist()
    assert "limetrans_spark/__init__.py" in names
    assert "limetrans_spark/operators/query.py" in names
    assert not any("__pycache__" in n or n.startswith("tests") for n in names)
    # importable in a clean interpreter with ONLY the zip on sys.path
    code = (
        "import sys; sys.path.insert(0, %r); "
        "sys.path = [p for p in sys.path if p not in ('', '/root/repo')]; "
        "import limetrans_spark; print('ok')" % out1
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert r.returncode == 0 and "ok" in r.stdout


def test_spark_submit_py_files_end_to_end(tmp_path):
    """North-rule deployment shape: the job runs under spark-submit with
    ONLY the packaged zip providing the engine (fresh JVM, no repo on
    sys.path), builds an index and answers a sharded BM25 query."""
    import shutil
    import subprocess
    import sys

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")
    zip_path = str(tmp_path / "pkg.zip")
    subprocess.run(
        [sys.executable, "tools/package_pyfiles.py", zip_path], check=True, cwd="/root/repo"
    )
    job = tmp_path / "job.py"
    job.write_text(
        "import json\n"
        "from pyspark.sql import SparkSession\n"
        "from limetrans_spark.operators.build import build_index\n"
        "from limetrans_spark.operators import query as Q\n"
        "from limetrans_spark.sources.corpus import synth_corpus\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "idx = build_index(synth_corpus(spark, 120, partitions=4), shard_size=64)\n"
        "rows = Q.bm25_topk_sharded(idx, 'tokenize | score', k=5).collect()\n"
        "print('SUBMIT_RESULT', len(rows), rows[0]['doc_id'])\n"
        "spark.stop()\n"
    )
    r = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path, str(job)],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=280,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SUBMIT_RESULT 5 111" in r.stdout  # rank-identical to the library run


def test_cli_fielded_build_and_search(spark, tmp_path_factory):
    """build-fielded (two analyzers via JSON spec) → search-fielded over
    the published per-field snapshots, stemmed field:term syntax."""
    p = str(tmp_path_factory.mktemp("clifieldcorpus") / "corpus")
    spark.createDataFrame(
        [(0, "merge queries fast", "en"), (1, "merged query slow", "de"),
         (2, "sort scan", "en")],
        "doc_id long, body string, lang string",
    ).write.parquet(p)
    root = str(tmp_path_factory.mktemp("clifieldidx"))
    out = run_cli(
        "build-fielded", "--input", p, "--root", root, "--generation", "g1",
        "--fields", '{"body": ["body", "simple_stem"], "lang": "lang"}',
        "--copy-to", '{"body": ["all"]}',
        "--shard-size", "4",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["fields"]["body"]["analyzer"] == "simple_stem"
    assert set(rep["fields"]) == {"body", "lang", "all"}

    out2 = run_cli("search-fielded", "--root", root, "--query", "body:query lang:en")
    assert out2.returncode == 0, out2.stderr[-2000:]
    hits = [json.loads(l) for l in out2.stdout.strip().splitlines() if l.startswith("{")]
    # 'query' stems to 'queri' → matches doc 0 ('queries') in lang en
    assert [h["doc_id"] for h in hits] == [0]

    out3 = run_cli("search-fielded", "--root", root, "--query", "nosuchfield:x")
    assert out3.returncode == 0 and out3.stdout.strip() == ""  # lenient


def test_cli_serve_sparkless(corpus_path, tmp_path_factory):
    """The `serve` subcommand answers from a published snapshot WITHOUT
    a SparkSession, matching the Spark `search` command's results; a
    --shards replica serves its slice with global statistics."""
    root = str(tmp_path_factory.mktemp("serveidx"))
    out = run_cli(
        "build", "--input", corpus_path, "--root", root, "--generation", "g1",
        "--shard-size", "32", "--buckets", "4", "--wave-size", "2",
    )
    assert out.returncode == 0, out.stderr[-2000:]

    q = "tokenize score"
    spark_out = run_cli("search", "--root", root, "--query", q, "-k", "5", "--mode", "wand")
    assert spark_out.returncode == 0, spark_out.stderr[-2000:]
    want = [json.loads(l) for l in spark_out.stdout.strip().splitlines() if l.startswith("{")]

    serve_out = run_cli("serve", "--root", root, "--query", q, "-k", "5")
    assert serve_out.returncode == 0, serve_out.stderr[-2000:]
    got = [json.loads(l) for l in serve_out.stdout.strip().splitlines() if l.startswith("{")]
    assert got == want
    # the serve path must not have started a JVM: no spark noise markers
    assert "SparkContext" not in serve_out.stderr

    # replica slice: shard 0 only → docs < 32, scores equal the full run
    repl_out = run_cli("serve", "--root", root, "--query", q, "-k", "100", "--shards", "0")
    rows = [json.loads(l) for l in repl_out.stdout.strip().splitlines() if l.startswith("{")]
    assert rows and all(r["doc_id"] < 32 for r in rows)
    full = {r["doc_id"]: r["score"] for r in got}
    for r in rows:
        if r["doc_id"] in full:
            assert abs(r["score"] - full[r["doc_id"]]) < 1e-9

    # --unordered-slop reaches the serving scorer: out-of-order NEAR
    # matches at least the ordered doc set (strict superset on corpora
    # with reversals; subset relation is the universal invariant)
    uq = '"parse json"~3'
    ordered = run_cli("serve", "--root", root, "--query", uq, "-k", "1000")
    unordered = run_cli(
        "serve", "--root", root, "--query", uq, "-k", "1000", "--unordered-slop"
    )
    assert ordered.returncode == 0 and unordered.returncode == 0
    dord = {json.loads(l)["doc_id"] for l in ordered.stdout.strip().splitlines() if l.startswith("{")}
    duno = {json.loads(l)["doc_id"] for l in unordered.stdout.strip().splitlines() if l.startswith("{")}
    assert dord <= duno and dord

    # getDocument point lookup, Spark-free
    gd = run_cli("serve", "--root", root, "--get-doc", "0")
    assert gd.returncode == 0, gd.stderr[-2000:]
    row = json.loads(gd.stdout.strip().splitlines()[-1])
    assert row["doc_id"] == 0 and row["content"]
    assert "SparkContext" not in gd.stderr
    # exactly one of --query / --get-doc
    both = run_cli("serve", "--root", root, "--query", "x", "--get-doc", "0")
    assert both.returncode == 2


def test_cli_serve_segment(spark, tmp_path):
    """`serve --segment-base`: Spark-free serving over base + delta
    segment; updated docs answer from the delta, base tombstones hold."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.operators.build import build_index
    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, 90, partitions=2).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).persist()
    base_root, delta_root = str(tmp_path / "base"), str(tmp_path / "delta")
    base_snap = lc.save_index(
        build_index(corpus, shard_size=32), base_root, "code", "g1"
    )
    upd = corpus.where(F.col("doc_id") % 10 == 1).withColumn(
        "content", F.lit("segmentcliterm fresh")
    )
    lc.publish_delta_segment(spark, base_snap, upd, delta_root, "code", "d1")

    out = run_cli(
        "serve", "--root", delta_root, "--segment-base", base_root,
        "--query", "segmentcliterm", "-k", "20",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert {r["doc_id"] for r in rows} == {d for d in range(90) if d % 10 == 1}
    assert "SparkContext" not in out.stderr


def test_cli_serve_fielded_segment(spark, tmp_path):
    """`serve --fielded --segment-base`: Spark-free fielded serving over
    a save_fielded base tree plus per-field delta segments."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.operators.fielded import build_fielded_sharded
    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, 80, partitions=2).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).withColumn(
        "title", F.array_join(F.slice(F.split(F.col("content"), " "), 1, 5), " ")
    ).persist()
    FIELDS = {"title": ("title", "simple"), "body": ("content", "simple")}
    base_root, delta_root = str(tmp_path / "base"), str(tmp_path / "delta")
    lc.save_fielded(
        build_fielded_sharded(corpus, FIELDS, shard_size=32), base_root, "x", "g1"
    )
    upd = corpus.where(F.col("doc_id") % 10 == 3).withColumn(
        "title", F.lit("fcliseg fresh")
    )
    lc.publish_fielded_delta_segment(
        spark, base_root, upd, delta_root, "x", "d1", fields=FIELDS
    )

    out = run_cli(
        "serve", "--fielded", "--root", delta_root, "--segment-base", base_root,
        "--query", "title:fcliseg", "-k", "20",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert {r["doc_id"] for r in rows} == {d for d in range(80) if d % 10 == 3}
    assert "SparkContext" not in out.stderr

    # stack a second fielded delta and serve the whole chain
    d2_root = str(tmp_path / "delta2")
    lc.publish_fielded_delta_segment(
        spark, delta_root,
        corpus.where(F.col("doc_id") % 20 == 3).withColumn(
            "title", F.lit("fcliseg2 again")
        ),
        d2_root, "x", "d2", fields=FIELDS,
    )
    out2 = run_cli(
        "serve", "--fielded", "--root", d2_root, "--segments",
        "--query", "title:fcliseg", "-k", "20",
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    rows2 = [json.loads(l) for l in out2.stdout.strip().splitlines() if l.startswith("{")]
    assert {r["doc_id"] for r in rows2} == {
        d for d in range(80) if d % 10 == 3 and d % 20 != 3
    }

    # `check --fielded` validates the 3-level stack we just served
    chk = run_cli("check", "--fielded", "--root", d2_root)
    assert chk.returncode == 0, chk.stderr[-2000:]
    rep = json.loads(chk.stdout.strip().splitlines()[-1])
    assert rep["ok"] and rep["segments"] == 3

    # fielded getDocument across the stack: doc 3 was re-updated in d2
    gd = run_cli(
        "serve", "--fielded", "--root", d2_root, "--segments",
        "--get-doc", "3",
    )
    assert gd.returncode == 0, gd.stderr[-2000:]
    row = json.loads(gd.stdout.strip().splitlines()[-1])
    assert row["title"] == "fcliseg2 again"
    gone = run_cli(
        "serve", "--fielded", "--root", d2_root, "--segments",
        "--get-doc", "999999",
    )
    assert json.loads(gone.stdout.strip().splitlines()[-1]) is None


def test_cli_serve_segment_chain(spark, tmp_path):
    """`serve --segments`: the whole stack is discovered from the
    newest delta root via the recorded segment_of links."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.operators.build import build_index
    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, 60, partitions=2).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).persist()
    b = lc.save_index(
        build_index(corpus, shard_size=32), str(tmp_path / "base"), "c", "g1"
    )
    d1 = lc.publish_delta_segment(
        spark, b,
        corpus.where(F.col("doc_id") % 10 == 1).withColumn(
            "content", F.lit("chainterm one")
        ),
        str(tmp_path / "d1"), "c", "s1",
    )
    lc.publish_delta_segment(
        spark, d1,
        corpus.where(F.col("doc_id") % 20 == 1).withColumn(
            "content", F.lit("chainterm two")
        ),
        str(tmp_path / "d2"), "c", "s2",
    )

    out = run_cli(
        "serve", "--root", str(tmp_path / "d2"), "--segments",
        "--query", "chainterm", "-k", "30",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert {r["doc_id"] for r in rows} == {d for d in range(60) if d % 10 == 1}
    assert "SparkContext" not in out.stderr


def test_cli_compact_segments(spark, tmp_path):
    """`compact` folds the stack located via --root's segment_of links
    into a fresh base, served identically to the stack afterwards."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.operators.build import build_index
    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, 50, partitions=2).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).persist()
    b = lc.save_index(
        build_index(corpus, shard_size=32), str(tmp_path / "base"), "c", "g1"
    )
    lc.publish_delta_segment(
        spark, b,
        corpus.where(F.col("doc_id") % 5 == 2).withColumn(
            "content", F.lit("clicompact fresh")
        ),
        str(tmp_path / "d1"), "c", "s1",
    )

    out = run_cli(
        "compact", "--root", str(tmp_path / "d1"),
        "--out", str(tmp_path / "cc"), "--generation", "g2",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    snap = json.loads(out.stdout.strip().splitlines()[-1])["snapshot"]
    assert snap.startswith(str(tmp_path / "cc"))

    served = run_cli(
        "serve", "--root", str(tmp_path / "cc"),
        "--query", "clicompact", "-k", "20",
    )
    rows = [json.loads(l) for l in served.stdout.strip().splitlines() if l.startswith("{")]
    assert {r["doc_id"] for r in rows} == {d for d in range(50) if d % 5 == 2}


def test_cli_check_segments(spark, tmp_path):
    """`check` validates a segment stack's merged statistics against a
    recomputation from the segments' own postings; exit 1 + ok:false on
    a corrupted stack (missing tombstone list)."""
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from limetrans_spark.operators.build import build_index
    from limetrans_spark.plans import lifecycle as lc
    from limetrans_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, 40, partitions=2).withColumn(
        "doc_id",
        F.row_number().over(Window.orderBy("repo", "path", "commit")).cast("long")
        - 1,
    ).persist()
    b = lc.save_index(
        build_index(corpus, shard_size=32), str(tmp_path / "base"), "c", "g1"
    )
    d1 = lc.publish_delta_segment(
        spark, b,
        corpus.where(F.col("doc_id") % 8 == 1).withColumn(
            "content", F.lit("checkcli one")
        ),
        str(tmp_path / "d1"), "c", "s1",
    )

    out = run_cli("check", "--root", str(tmp_path / "d1"))
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["ok"] and report["segments"] == 2

    shutil.rmtree(os.path.join(d1, "tombstones"))
    out = run_cli("check", "--root", str(tmp_path / "d1"))
    assert out.returncode == 1
    assert not json.loads(out.stdout.strip().splitlines()[-1])["ok"]


def test_pyfiles_zip_is_fresh(tmp_path):
    """The committed spark-submit --py-files artifact must match a fresh
    deterministic repackage of the source tree byte-for-byte (the zip is
    reproducible: sorted members, zeroed timestamps). If this fails, run
    `python tools/package_pyfiles.py`."""
    import importlib.util

    import os

    spec = importlib.util.spec_from_file_location(
        "package_pyfiles", "/root/repo/tools/package_pyfiles.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fresh = mod.package(str(tmp_path / "fresh.zip"))
    dist = "/root/repo/dist/limetrans_spark.zip"
    if not os.path.exists(dist):  # dist/ is a gitignored build artifact
        mod.package(dist)
    with open(fresh, "rb") as a, open(dist, "rb") as b:
        assert a.read() == b.read(), (
            "dist/limetrans_spark.zip is stale — run tools/package_pyfiles.py"
        )
