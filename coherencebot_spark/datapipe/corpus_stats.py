"""Corpus composition statistics — the dashboard aggregates a training
corpus is steered by (what the mix looks like per language/source, how
document lengths distribute).

* :func:`corpus_rollup` — multi-level composition via ``ROLLUP``: one
  Expand + hash aggregate, fully partial-aggregable (one shuffle
  regardless of dimension count), grouping flags distinguish subtotal
  levels.  At 10^10 docs the output is bounded by the dimension
  cardinality product — a dashboard table, not data.
* :func:`length_quantiles` — per-group length distribution.  The exact
  ``percentile`` aggregate (linear interpolation, DuckDB
  ``quantile_cont`` twin) buffers each group's values: right for the
  oracle and for bounded groups, wrong for 10^9-row groups — pass
  ``approx=True`` in production to swap in ``approx_percentile`` (a
  t-digest-style mergeable sketch, same output shape) at a documented
  accuracy/memory trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_rollup(docs: DataFrame, dims: tuple = ("lang", "source"),
                  length_col: str = "n_chars") -> DataFrame:
    """ROLLUP composition table: one row per (dim prefix) subtotal level
    plus the grand total, with GROUPING flags and count/sum/avg length."""
    gcols = [F.grouping(d).cast("int").alias(f"g_{d}") for d in dims]
    return (docs.rollup(*dims).agg(
        F.count("*").alias("n_docs"),
        F.sum(length_col).alias("total_chars"),
        F.round(F.avg(length_col), 4).alias("avg_chars"),
        *gcols,
    ))


def length_quantiles(docs: DataFrame, group_col: str = "lang",
                     length_col: str = "n_chars",
                     probs: tuple = (0.25, 0.5, 0.75, 0.9),
                     approx: bool = False,
                     accuracy: int = 10_000) -> DataFrame:
    """Per-group length quantiles: (group, prob, value).

    ``approx=False``: exact interpolated percentile (bit-comparable to
    DuckDB ``quantile_cont`` — the oracle path; buffers each group).
    ``approx=True``: ``approx_percentile`` — mergeable, map-side
    combinable, the 10^10-row path."""
    plist = [float(p) for p in probs]
    fn = ((lambda c: F.approx_percentile(c, F.array(*[F.lit(p) for p in plist]),
                                         F.lit(int(accuracy))))
          if approx else
          (lambda c: F.percentile(c, F.array(*[F.lit(p) for p in plist]))))
    agg = docs.groupBy(group_col).agg(
        fn(F.col(length_col).cast("double")).alias("qs"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in plist]).alias("prob"),
        F.col("qs").alias("value"))
    return (agg.select(group_col, F.explode(pairs).alias("pq"))
               .select(group_col,
                       F.col("pq.prob").alias("prob"),
                       F.round(F.col("pq.value"), 4).alias("value")))
