"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

The engine's domain input is an Iceberg-style table
``(repo, path, commit, lang, content)`` (BASELINE.json ``input_hint``).
No such table ships with the sandbox, so tests and benchmarks synthesize
one deterministically (seeded; no external data) — the analogue of the
reference's checked-in MARC fixtures (``main/src/test/resources/limetrans/
input/*``).

Generation is distributed: ``spark.range(n)`` → ``mapInPandas`` with a
per-row PCG64 stream keyed by ``(seed, row_id)``, so the content of row
``i`` is identical regardless of partitioning or cluster size — the
property every rank-identity test leans on.

~20% of rows get a license-boilerplate paragraph injected, producing the
realistic high-DF skew terms the north rule requires us to handle.
Row lengths are log-normal in [50, 5000] tokens so BM25 length
normalization (avgdl) is exercised.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["py", "java", "js", "go", "rs"]
_EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "rs": "rs"}

# identifier vocabulary: camelCase / snake_case / hyphenated / catenated
# families (FIXTURES §3) + code keywords kept as high-DF stop-like tokens.
IDENTIFIERS = [
    "parseJSON", "parse_json", "parse-json", "parsejson",
    "blockMaxWand", "block_max_wand", "block-max-wand", "blockmaxwand",
    "tokenStream", "token_stream", "tokenizer", "tokenize",
    "readFile", "read_file", "writeBuffer", "write_buffer",
    "HttpClient", "http_client", "e-payment", "epayment",
    "indexBuilder", "index_builder", "postingList", "posting_list",
    "docFrequency", "doc_frequency", "avgFieldLength", "score",
    "naïve", "naive", "deltaGap", "delta_gap", "varintEncode",
    "shardRouter", "shard_router", "bm25Scorer", "queryPlanner",
    "mergeSegments", "merge_segments", "checkpointManager",
]
KEYWORDS = ["if", "return", "def", "class", "for", "while", "import",
            "fn", "let", "const", "var", "func", "pub", "static"]
PUNCT = ["(", ")", "{", "}", "=", "==", "->", ":", ";", ",", ".", "[", "]"]
LICENSE = (
    "Licensed under the Apache License Version 2.0 the License "
    "you may not use this file except in compliance with the License "
    "Unless required by applicable law or agreed to in writing software "
    "distributed under the License is distributed on an AS IS BASIS "
    "WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND either express or implied"
)

DEFAULT_SEED = 42


def _row_content(seed: int, i: int, min_tokens: int, max_tokens: int) -> str:
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
    # log-normal token count clipped to [min_tokens, max_tokens]
    n = int(np.clip(rng.lognormal(mean=5.0, sigma=0.8), min_tokens, max_tokens))
    ids = rng.integers(0, len(IDENTIFIERS), size=n)
    kind = rng.random(size=n)
    toks: list[str] = []
    if rng.random() < 0.20:
        toks.append(LICENSE)
    for j in range(n):
        r = kind[j]
        if r < 0.55:
            toks.append(IDENTIFIERS[ids[j]])
        elif r < 0.80:
            toks.append(KEYWORDS[ids[j] % len(KEYWORDS)])
        elif r < 0.92:
            toks.append(PUNCT[ids[j] % len(PUNCT)])
        else:
            toks.append(f"v{ids[j]}")
    return " ".join(toks)


def synth_corpus(
    spark: SparkSession,
    n_rows: int,
    seed: int = DEFAULT_SEED,
    min_tokens: int = 50,
    max_tokens: int = 5000,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic corpus DataFrame (repo, path, commit, lang, content)."""
    base = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            repo = [f"org{i % 7}/repo{i % 23}" for i in ids]
            lang = [LANGS[i % len(LANGS)] for i in ids]
            path = [
                f"src/dir{i % 11}/file_{i}.{_EXT[lang_]}"
                for i, lang_ in zip(ids, lang)
            ]
            commit = [
                hashlib.sha256(f"{r}:{p}".encode()).hexdigest()[:40]
                for r, p in zip(repo, path)
            ]
            content = [_row_content(seed, int(i), min_tokens, max_tokens) for i in ids]
            yield pd.DataFrame(
                {
                    "repo": repo,
                    "path": path,
                    "commit": commit,
                    "lang": lang,
                    "content": content,
                }
            )

    return base.mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string"
    )


def synth_corpus_rows(n_rows: int, seed: int = DEFAULT_SEED,
                      min_tokens: int = 50, max_tokens: int = 5000) -> list[dict]:
    """Driver-side twin of :func:`synth_corpus` for pytest oracles."""
    rows = []
    for i in range(n_rows):
        repo = f"org{i % 7}/repo{i % 23}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/dir{i % 11}/file_{i}.{_EXT[lang]}"
        commit = hashlib.sha256(f"{repo}:{path}".encode()).hexdigest()[:40]
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": _row_content(seed, i, min_tokens, max_tokens),
            }
        )
    return rows


CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def read_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "parquet",
    columns: tuple[str, ...] = CORPUS_COLUMNS,
) -> DataFrame:
    """Load the corpus table ``(repo, path, commit, lang, content)`` from
    its production home (BASELINE.json ``input_hint``: an Iceberg table
    of source-code repositories) or a parquet path.

    ``fmt="iceberg"`` reads a catalog table (``spark.table`` resolves
    catalog.db.table through the Iceberg runtime — snapshot isolation,
    partition pruning and file skipping come from the table format);
    this sandbox ships no Iceberg runtime, so that branch raises a clear
    error instead of a JVM stack trace.  ``fmt="parquet"`` reads a path.
    Column presence is validated up front either way — a missing content
    column should fail at plan time, not three stages into a build.
    """
    if fmt == "iceberg":
        try:
            df = spark.table(source)
        except Exception as e:  # pragma: no cover - depends on runtime jars
            raise RuntimeError(
                "Iceberg runtime not available in this Spark session "
                "(add iceberg-spark-runtime to spark.jars.packages and "
                "configure a catalog); reading parquet instead requires "
                "fmt='parquet'"
            ) from e
    elif fmt == "parquet":
        df = spark.read.parquet(source)
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"corpus table is missing columns {missing}; has {df.columns}")
    return df.select(*[c for c in df.columns if c in set(columns) | {"doc_id"}])


def rich_corpus(
    spark: SparkSession,
    n_rows: int,
    vocab: int = 20_000,
    seed: int = DEFAULT_SEED,
    min_tokens: int = 30,
    max_tokens: int = 400,
    dup_rate: float = 0.05,
    partitions: int | None = None,
) -> DataFrame:
    """Non-degenerate scale-probe corpus: ``vocab`` distinct identifiers
    under a Zipf(1.3) frequency law plus the license boilerplate on ~5%
    of rows, and ``dup_rate`` of rows generated as exact duplicates of
    an earlier row (dedup ground truth).  Same determinism contract as
    :func:`synth_corpus` (per-row PCG64 keyed by (seed, id)); exists
    because the 31-term default corpus makes every similarity join
    degenerate — expansion caps, df-ceilings and cluster resolution
    need a vocabulary that binds them realistically (round-4 verdict
    "Next round #8")."""
    base = spark.range(0, n_rows, 1,
                       partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out_id, out_text = [], []
            for i in ids:
                i = int(i)
                rng = np.random.Generator(np.random.PCG64(seed * 9_999_991 + i))
                if i > 0 and rng.random() < dup_rate:
                    src = int(rng.integers(0, i))
                    rng2 = np.random.Generator(
                        np.random.PCG64(seed * 9_999_991 + src)
                    )
                    if rng2.random() < dup_rate:
                        # keep ground truth simple: duplicate only
                        # non-dup originals
                        rng2 = rng
                        src = i
                    out_id.append(i)
                    out_text.append(_rich_text(rng2, vocab, min_tokens, max_tokens))
                    continue
                out_id.append(i)
                out_text.append(_rich_text(rng, vocab, min_tokens, max_tokens))
            yield pd.DataFrame({"doc_id": out_id, "text": out_text})

    return base.mapInPandas(gen, "doc_id long, text string")


def _rich_text(rng, vocab: int, min_tokens: int, max_tokens: int) -> str:
    n = int(np.clip(rng.lognormal(mean=4.5, sigma=0.7), min_tokens, max_tokens))
    # Zipf over the vocabulary: realistic head/tail df skew
    ranks = rng.zipf(1.3, size=n)
    ranks = np.clip(ranks, 1, vocab) - 1
    toks = [f"id{r}x{r % 97}" for r in ranks]
    if rng.random() < 0.05:
        toks.append(LICENSE)
    return " ".join(toks)
