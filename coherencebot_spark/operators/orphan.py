"""scoring-orphan plugin analogue (SURVEY.md §2 SC6; ref
``src/plugin/scoring-orphan``, hook at ``crawl/CrawlDbReducer.java:160-165``).

The reference's orphan filter stamps ``_last_inlink_`` time whenever a page
receives inlinks during updatedb; pages whose last-inlink time is older
than ``scoring.orphan.mark.gone.after`` become ``db_gone``, and older than
``scoring.orphan.mark.orphan.after`` become ``db_orphan`` (then purgeable
via ``db.update.purge.orphan``).  Column expressions over the frontier +
the cycle's linked rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..status import Db, Msg

LAST_INLINK_KEY = "_last_inlink_"
DAY_MS = 86_400_000


def mark_orphans(frontier: DataFrame, parse_out: DataFrame | None,
                 cur_time: int,
                 gone_after_ms: int = 30 * DAY_MS,
                 orphan_after_ms: int = 40 * DAY_MS) -> DataFrame:
    """Stamp inlink-recency and flip long-orphaned pages.

    Pages seen with inlinks this cycle get ``_last_inlink_ = cur_time``;
    pages with no stamp inherit one (first sighting).  Then:
    age > orphan_after → db_orphan; age > gone_after → db_gone.
    """
    if parse_out is not None:
        linked = (
            parse_out.filter(F.col("status") == int(Msg.LINKED))
            .select("url").distinct()
            .withColumn("_has_inlink", F.lit(True))
        )
        df = frontier.join(linked, "url", "left")
    else:
        df = frontier.withColumn("_has_inlink", F.lit(None).cast("boolean"))

    meta = F.coalesce(F.col("metadata"), F.expr("map()"))
    prev = meta.getItem(LAST_INLINK_KEY).cast("long")
    stamp = (
        F.when(F.col("_has_inlink"), F.lit(int(cur_time)))
        .otherwise(F.coalesce(prev, F.lit(int(cur_time))))
    )
    df = df.withColumn(
        "metadata",
        F.map_concat(
            F.map_filter(meta, lambda k, _: k != F.lit(LAST_INLINK_KEY)),
            F.create_map(F.lit(LAST_INLINK_KEY), stamp.cast("string")),
        ),
    )
    age = F.lit(int(cur_time)) - stamp
    new_status = (
        F.when(age > int(orphan_after_ms), F.lit(int(Db.ORPHAN)))
        .when(age > int(gone_after_ms), F.lit(int(Db.GONE)))
        .otherwise(F.col("status"))
    )
    return df.withColumn("status", new_status).drop("_has_inlink")
