"""coherencebot_spark — a brand-new PySpark-native URL-frontier + fetch
scheduler with the query/data-processing capabilities of
coherentdigital/coherencebot (an Apache Nutch 1.19 fork).

Architecture (SURVEY.md §7): the engine is a set of pure
``DataFrame -> DataFrame`` operators (inject / generate / fetch / parse /
updatedb / dedup / hostdb / linkdb / readdb) chained by a thin cycle driver
that commits snapshot-isolated table versions.  All per-row compute runs in
vectorized pandas/Arrow UDFs; everything relational stays in Catalyst
(joins, windows, aggregations, approximate quantiles).

Nothing here is a port: the reference's MapReduce mappers/partitioners/
reducers are re-expressed as declarative DataFrame plans (see SURVEY.md §2
for the operator-by-operator mapping, with reference file:line citations in
each module's docstring).
"""

__version__ = "0.1.0"
