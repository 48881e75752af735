"""Misc reference tools (SURVEY.md §2 S11 tail; VERDICT r3 missing #5).

* :func:`dump_content_files` — ``tools/FileDumper.java:105-260``: dump each
  fetched payload to an individual file named ``<md5(url)>_<base>.<ext>``,
  plus the mimetype histogram the reference prints.  Files are written
  partition-parallel (each task writes its own rows to the shared
  directory) — no driver collect.
* :func:`parse_dmoz_rdf` — ``tools/DmozParser.java:152-398``: turn a DMOZ
  RDF dump into injector seed lines.  The reference streams the XML
  through a SAX handler; here ``spark.read.option("lineSep",
  "</ExternalPage>")`` splits the dump into one record per ExternalPage
  block, so url/topic extraction is pure JVM regexp over distributed
  splits — a 3 GB dump parses in parallel instead of through one SAX
  stream.
* ``tools/Benchmark.java`` is superseded by the repo-level ``bench.py``
  (documented in COVERAGE.md).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SEEDS


def dump_content_files(content: DataFrame, outdir: str,
                       formats: list[str] | None = None) -> dict[str, int]:
    """FileDumper: one file per payload, named ``md5(url)_<basename>.<fmt>``
    (``DumpFileUtil.createFileName`` shape).  ``formats`` filters like the
    reference's ``mimeTypes`` arg (None = all).  Returns the per-format
    count histogram the reference logs.

    ``outdir`` must be on a filesystem every executor can reach (the
    reference writes through the Hadoop FS API to HDFS; here tasks open
    plain paths, so on a multi-node cluster point this at the shared
    mount — on a local-mode driver any path works)."""
    os.makedirs(outdir, exist_ok=True)
    df = content.filter(F.col("bytes").isNotNull())
    if formats is not None:
        df = df.filter(F.col("fmt").isin(list(formats)))
    rows = df.select(
        F.md5(F.col("url").cast("binary")).alias("_md5"),
        F.regexp_extract("url", r"([^/?#]+)(?:[?#].*)?$", 1).alias("_base"),
        "fmt", "bytes",
    )

    out = outdir

    def write_files(it):
        for pdf in it:
            names = []
            for md5h, base, fmt, data in zip(
                    pdf["_md5"], pdf["_base"], pdf["fmt"], pdf["bytes"]):
                name = f"{md5h}_{(base or 'index')[:64]}.{fmt or 'bin'}"
                with open(os.path.join(out, name), "wb") as f:
                    f.write(bytes(data))
                names.append(name)
            yield pd.DataFrame({"file": names, "fmt": pdf["fmt"]})

    written = rows.mapInPandas(write_files, schema="file string, fmt string")
    return {r["fmt"]: r["count"]
            for r in written.groupBy("fmt").count().collect()}


def parse_dmoz_rdf(spark: SparkSession, path: str,
                   topic_pattern: str | None = None) -> DataFrame:
    """DmozParser: RDF dump → SEEDS lines (url + ``dmoz.topic`` metadata).

    ``topic_pattern`` is the ``-topic`` regex subset filter
    (``DmozParser.java:398`` topic selection pattern); blocks without an
    ExternalPage url are dropped like the handler's non-page elements."""
    blocks = (
        spark.read.option("lineSep", "</ExternalPage>").text(path)
        .select(
            F.regexp_extract(
                "value", r'<ExternalPage\s+about="([^"]+)"', 1).alias("url"),
            F.regexp_extract("value", r"<topic>([^<]*)</topic>", 1)
            .alias("topic"),
        )
        .filter(F.col("url") != "")
    )
    if topic_pattern is not None:
        blocks = blocks.filter(F.col("topic").rlike(topic_pattern))
    lines = blocks.select(
        F.concat(
            F.col("url"),
            F.when(F.col("topic") != "",
                   F.concat(F.lit("\tdmoz.topic="), F.col("topic")))
            .otherwise(F.lit("")),
        ).alias("line")
    )
    return lines.select(F.col("line").cast(SEEDS["line"].dataType).alias("line"))
