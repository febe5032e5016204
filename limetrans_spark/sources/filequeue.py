"""File-queue scan source: glob → order → limit → format reader.

Re-expresses the reference's ``FileQueue``
(``core/src/main/java/hbz/limetrans/util/FileQueue.java:126-157`` setup,
``:280-334`` glob/sort/limit) on Spark: the driver resolves the file
list (glob under a base path, sort by name or mtime asc/desc, cap by
``max`` count and ``max-age`` seconds) and hands the explicit list to
``spark.read`` so the scan parallelizes per file split.  Format
processors (``FileQueue.java:42-110``): ``jsonl``, ``json`` (multiLine),
``text``, ``parquet``, ``binary``, ``formeta`` (functions/formeta),
``marc21``/``marc21records`` (ISO 2709, record-split text scan) and
``marcxml``/``almaxml`` (sources/marc), plus the SISIS-style multi-line
record assembler below.  Gzip decompression is transparent in Spark's text/json
readers (``FileQueue.java:176-177`` analogue); BGZF files are valid
concatenated gzip, so they read the same way.

Multiple ordered queues (``Limetrans.java:250-284``) = several
``FileQueue`` results combined with ``unionByName``.
"""

from __future__ import annotations

import glob as _glob
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class FileQueue:
    """Settings mirror FileQueue's: path/pattern(s), sort_by, order,
    max, max_age (seconds), processor."""

    base: str
    patterns: list[str] = field(default_factory=lambda: ["*"])
    sort_by: str = "name"  # name | mtime
    order: str = "asc"  # asc | desc
    max_files: int | None = None
    max_age: float | None = None
    processor: str = "jsonl"  # jsonl|json|text|parquet|binary|formeta|marc21|marcxml|almaxml

    def resolve(self) -> list[str]:
        """Driver-side listing: glob, filter by age, sort, cap."""
        files: list[str] = []
        for pat in self.patterns:
            files.extend(_glob.glob(os.path.join(self.base, pat)))
        files = [f for f in files if os.path.isfile(f)]
        if self.max_age is not None:
            cutoff = time.time() - self.max_age
            files = [f for f in files if os.path.getmtime(f) >= cutoff]
        key = (lambda f: os.path.getmtime(f)) if self.sort_by == "mtime" else (lambda f: f)
        files.sort(key=key, reverse=(self.order == "desc"))
        if self.max_files is not None:
            files = files[: self.max_files]
        return files

    def read(self, spark: SparkSession, schema: T.StructType | str | None = None) -> DataFrame:
        files = self.resolve()
        if not files:
            return spark.createDataFrame([], schema or "value string")
        if self.processor == "jsonl":
            r = spark.read.schema(schema) if schema else spark.read
            return r.json(files).withColumn("_source_file", F.input_file_name())
        if self.processor == "json":
            r = spark.read.schema(schema) if schema else spark.read
            return r.option("multiLine", True).json(files).withColumn(
                "_source_file", F.input_file_name()
            )
        if self.processor == "text":
            return spark.read.text(files).withColumn("_source_file", F.input_file_name())
        if self.processor == "parquet":
            return spark.read.parquet(*files)
        if self.processor == "binary":
            return spark.read.format("binaryFile").load(files)
        if self.processor == "formeta":
            from ..functions.formeta import read_formeta

            return read_formeta(spark, files)
        if self.processor in ("marc21", "marc21records"):
            from .marc import read_marc21

            return read_marc21(spark, files)
        if self.processor == "marcxml":
            from .marc import read_marcxml

            return read_marcxml(spark, files)
        if self.processor == "almaxml":
            # tar-of-XML unpack (TarReader → XmlDecoder analogue); also
            # accepts plain .xml[.gz] — routed by magic bytes
            from .marc import read_almaxml

            return read_almaxml(spark, files)
        raise ValueError(f"unknown processor {self.processor}")


def decode_multiline_records(
    lines: DataFrame,
    record_start_regex: str = r"^0000:",
    kv_regex: str = r"^(\w+)(?:\.(\d+))?:(.*)$",
) -> DataFrame:
    """SISIS-style multi-line record assembly
    (``core/.../util/MultiLineDecoder.java:97-196``): a ``field[.sub]:value``
    line stream where a marker line starts each record → one row per
    record with a ``map<string, array<string>>`` of fields.

    Plan: tag record boundaries with a running count (window over file +
    line order), then groupBy record id and collect the field pairs —
    the distributed version of the reference's stateful line loop.

    Line order must survive files that Spark splits across partitions:
    ``monotonically_increasing_id`` alone is partition-prefixed, and
    partition ids need not follow file offsets.  Ordering by
    ``(input_file_block_start, mono_id)`` is split-safe — blocks of one
    file sort by byte offset, and within a block the mono id is
    monotone in read order.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("_source_file").orderBy("_blk_start", "_line_no")
    tagged = (
        lines.withColumn("_blk_start", F.input_file_block_start())
        .withColumn("_line_no", F.monotonically_increasing_id())
        .withColumn("is_start", F.col("value").rlike(record_start_regex).cast("int"))
        .withColumn("rec_no", F.sum("is_start").over(w))
        .filter(F.col("rec_no") > 0)
    )
    parsed = tagged.select(
        "_source_file",
        "rec_no",
        F.regexp_extract("value", kv_regex, 1).alias("field"),
        F.regexp_extract("value", kv_regex, 3).alias("val"),
    ).filter(F.col("field") != "")
    return (
        parsed.groupBy("_source_file", "rec_no")
        .agg(F.sort_array(F.collect_list(F.struct("field", "val"))).alias("entries"))
        .select(
            "_source_file",
            "rec_no",
            F.expr(
                "aggregate(entries, cast(map() as map<string, array<string>>), (m, e) -> "
                "map_concat(map_filter(m, (k, v) -> k != e.field), "
                "map(e.field, array_union(coalesce(element_at(m, e.field), array()), array(e.val)))))"
            ).alias("record"),
        )
    )
