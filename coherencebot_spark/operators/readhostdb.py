"""ReadHostDb — the hostdb reader tool (SURVEY.md §2 S11; ref
``hostdb/ReadHostDb.java:56-289``).

The reference is a map-only job over the hostdb MapFile with an optional
JEXL filter expression evaluated per record against a fixed variable set
(``ReadHostDbMapper.map``: unfetched, fetched, gone, redirTemp, redirPerm,
redirs, notModified, ok, numRecords, dnsFailures, connectionFailures, plus
numeric metadata keys).  Here each variant is a one-expression DataFrame
query; the JEXL expression becomes a SQL predicate over the same derived
variable columns (the C9 Jexl→SQL mapping the engine already uses for
``generate.expr``), so it is pushed into the scan instead of evaluated
row-at-a-time in a mapper.

Variants (ReadHostDb.run, :244-289):

* ``dump``          — all fields + derived variables (``-dump``/default)
* ``hostnames``     — hostname column only (``-dumpHostnames``)
* ``homepages``     — homepage urls where present (``-dumpHomepages``;
                      homepage lives in ``metadata['homepage_url']`` as
                      UpdateHostDb records it)
* ``get``           — point lookup for one host (``-get``)
* ``stats``         — aggregate totals over the (filtered) hostdb; the
                      reader-tool companion to the builder's A3 aggregate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# JEXL boolean operators → SQL (the expressions the reference feeds to
# commons-jexl are C-style; everything else JEXL shares with SQL already)
_JEXL_TO_SQL = (("&&", " AND "), ("||", " OR "), ("==", "="), ("!=", "<>"))


def jexl_to_sql(expr: str) -> str:
    out = expr
    for a, b in _JEXL_TO_SQL:
        out = out.replace(a, b)
    # bare `!x` negation (JEXL) → NOT x; avoid touching <> produced above
    out = re.sub(r"!\s*(?=[A-Za-z(])", " NOT ", out)
    return out


def _with_variables(hostdb: DataFrame) -> DataFrame:
    """Attach the JEXL variable set as columns (ReadHostDbMapper.map
    jcontext.set calls; numRecords per ``HostDatum.numRecords:123``)."""
    return (
        hostdb
        .withColumn("redirs", (F.col("redir_perm") + F.col("redir_temp")).cast("long"))
        .withColumn("ok", (F.col("fetched") + F.col("not_modified")).cast("long"))
        .withColumn(
            "num_records",
            (F.col("unfetched") + F.col("fetched") + F.col("gone")
             + F.col("redir_perm") + F.col("redir_temp")
             + F.col("not_modified")).cast("long"),
        )
        .withColumn(
            "sum_failures",
            (F.col("dns_failures") + F.col("connection_failures")).cast("long"),
        )
    )


def dump(hostdb: DataFrame, expr: str | None = None) -> DataFrame:
    """``readhostdb -dump`` with an optional filter expression.

    ``expr`` is SQL (or JEXL — ``&&``/``||``/``==`` are translated) over
    the ReadHostDbMapper variable names; it lands in the scan as a pushed
    predicate instead of a per-record evaluator."""
    df = _with_variables(hostdb)
    if expr is not None:
        df = df.filter(F.expr(jexl_to_sql(expr)))
    return df


def hostnames(hostdb: DataFrame, expr: str | None = None) -> DataFrame:
    """``-dumpHostnames``: hostname column only (filter applies first)."""
    return dump(hostdb, expr).select("host")


def homepages(hostdb: DataFrame, expr: str | None = None) -> DataFrame:
    """``-dumpHomepages``: homepage urls where recorded
    (``datum.hasHomepageUrl()`` guard → IS NOT NULL filter)."""
    hp = F.col("metadata").getItem("homepage_url")
    return (
        dump(hostdb, expr)
        .filter(hp.isNotNull())
        .select(hp.alias("homepage_url"))
    )


def get(hostdb: DataFrame, host: str) -> DataFrame:
    """``-get <host>`` point lookup (``getHostDbRecord``, :216-237) —
    a pushed equality predicate instead of the reference's full
    SequenceFile sweep."""
    return _with_variables(hostdb).filter(F.col("host") == host)


def stats(hostdb: DataFrame, expr: str | None = None) -> DataFrame:
    """Aggregate totals over the (filtered) hostdb — one row."""
    return dump(hostdb, expr).agg(
        F.count("*").alias("hosts"),
        F.sum("unfetched").alias("unfetched"),
        F.sum("fetched").alias("fetched"),
        F.sum("gone").alias("gone"),
        F.sum("redirs").alias("redirs"),
        F.sum("not_modified").alias("not_modified"),
        F.sum("num_records").alias("num_records"),
        F.sum("sum_failures").alias("sum_failures"),
        F.round(F.avg("score"), 4).alias("avg_score"),
    )
