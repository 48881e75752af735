"""Python-worker daemon with the engine's Arrow stack preloaded.

Spark's stock ``pyspark.daemon`` imports ``pyspark.worker`` (which pulls
numpy) in the daemon PARENT, then forks one child per worker request —
so children inherit numpy copy-on-write, but each fresh worker still
imports pandas + pyarrow on its first Arrow batch (~1-1.5 s of
single-threaded import per fork).  A crawl-cycle stage chains 2-3
Python operators per task, so its worker demand spikes past the idle
pool and dozens of forks pay that import inside the timed phase
(event-log evidence in OPTIMIZATION_r06.md: "time to initialize Python
workers" dwarfed actual Python run time on every cycle stage, and task
run time sat ~5x above task CPU time).

Importing the full Arrow serialization stack HERE — once, in the
daemon parent — makes every forked worker inherit it for free
(guide §4.5: heavyweight initialisation once per process, amortised;
here amortised across ALL workers, not just batches).  Wired up by
``session.build_session`` via ``spark.python.daemon.module``; the
module stays importable wherever the engine's own UDFs are (workers
must already import ``coherencebot_spark.*`` to unpickle them).
"""

from __future__ import annotations

import pyspark.daemon as _daemon

# the stack every engine UDF batch touches, heaviest first; guarded so
# a stripped runtime without pandas still gets a working (stock-speed)
# daemon rather than a crash loop
try:  # noqa: SIM105
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401
except ImportError:  # pragma: no cover - never in the engine's own env
    pass

if __name__ == "__main__":
    _daemon.manager()
