"""scoring-depth plugin analogue (SURVEY.md §2 SC6; ref
``scoring-depth/.../DepthScoringFilter.java``).

Depth-limited crawling via metadata: injected seeds start at ``_depth_=1``
(optionally carrying a per-seed ``_maxdepth_`` override); each hop
increments the child's depth; outlinks whose parent depth reached the max
are discarded ("depth exceeded — throw away",
``DepthScoringFilter.java:97``).  All column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH_KEY = "_depth_"
MAX_DEPTH_KEY = "_maxdepth_"
DEFAULT_MAX_DEPTH = 1000  # scoring.depth.max


def with_seed_depth(injected: DataFrame, max_depth: int | None = None) -> DataFrame:
    """Stamp initial depth 1 (+ optional _maxdepth_) on injected rows
    (DepthScoringFilter.injectedScore, :156-176).

    Defaults go FIRST in the concat so a per-seed metadata override
    (``_maxdepth_`` carried on the seed line) WINS under last-wins map
    semantics — the reference only applies the config default when the
    metadata key is absent."""
    injected.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    md = F.coalesce(F.col("metadata"), F.expr("map()"))
    entries = [F.lit(DEPTH_KEY), F.lit("1")]
    if max_depth is not None:
        entries += [F.lit(MAX_DEPTH_KEY), F.lit(str(int(max_depth)))]
    return injected.withColumn("metadata", F.map_concat(F.create_map(*entries), md))


def limit_outlinks_by_depth(link_rows: DataFrame, parent_meta: DataFrame,
                            default_max_depth: int = DEFAULT_MAX_DEPTH) -> DataFrame:
    """Drop linked rows whose source page is already at max depth; stamp the
    child depth (DepthScoringFilter.distributeScoreToOutlinks, :81-116).

    ``parent_meta``: (url, metadata) of the fetched parents.
    """
    pm = parent_meta.select(
        F.col("url").alias("from_url"),
        F.coalesce(F.col("metadata").getItem(DEPTH_KEY).cast("int"), F.lit(1))
        .alias("_pdepth"),
        F.coalesce(F.col("metadata").getItem(MAX_DEPTH_KEY).cast("int"),
                   F.lit(int(default_max_depth))).alias("_pmax"),
    )
    j = link_rows.join(pm, "from_url", "left")
    # an ABSENT parent row is the reference's depth-metadata-missing case:
    # parent depth defaults to 1 and the child is stamped 2, still subject
    # to the limit — the former unconditional keep + depth-1 stamp let a
    # chain reset its depth whenever the parent lookup missed
    pdepth = F.coalesce(F.col("_pdepth"), F.lit(1))
    pmax = F.coalesce(F.col("_pmax"), F.lit(int(default_max_depth)))
    kept = j.filter(pdepth < pmax)
    child_meta = F.map_concat(
        F.coalesce(F.col("metadata"), F.expr("map()")),
        F.create_map(F.lit(DEPTH_KEY), (pdepth + 1).cast("string")),
    )
    return kept.withColumn("metadata", child_meta).drop("_pdepth", "_pmax")
