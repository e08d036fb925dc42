"""PySpark worker daemon with the heavy per-worker imports preloaded.

Why this exists (optimization guide §4.5 taken to the process level):
PySpark's daemon forks one OS process per concurrently-running Python
task. The fork itself is cheap, but each forked worker then imports
numpy + pandas + pyarrow + the Arrow serializers when it unpickles its
first pandas UDF / ``mapInPandas`` function — ~0.4 s of CPU per worker,
and a local[32] session that suddenly needs 32 workers pays 32 of those
imports AT ONCE, on the same CPUs that are supposed to be running the
query (measured: ``binary_resize_meta`` cold 10.0 s at width 32 vs
1.4 s warm on an idle 32-core box; the driver's r15 bench read 16.3 s
at 32 cores vs 1.2 s at 8 — the spawn storm, not the query).

Preloading those modules HERE, in the daemon process before it starts
forking, makes every forked worker inherit the already-initialized
modules through copy-on-write memory: worker startup drops to ~fork
cost, and the resident pages are shared across all workers instead of
duplicated per worker. This is scale-neutral engineering, not a bench
trick — on a real cluster every executor's daemon forks workers the
same way, and the per-worker import tax is identical.

Selected via ``spark.python.daemon.module`` (a documented Spark conf;
``session.get_spark`` sets it together with
``spark.executorEnv.PYTHONPATH`` so the executor-side Python can import
this module). Every behavior besides the preload is delegated to the
stock ``pyspark.daemon``: this module's ``__main__`` body simply runs
its ``manager()`` after the imports, and ``pyspark.daemon`` reads
``sys.argv`` itself, so custom ``spark.python.worker.module`` selection
still works unchanged.

The preload is best-effort by design: a worker environment without
pandas must degrade to exactly the stock behavior (the import error
will then surface, correctly, only if a query actually needs pandas).
"""

from __future__ import annotations


def preload() -> None:
    """Import the modules every pandas/Arrow worker needs, best-effort."""
    try:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import pyspark.sql.pandas.serializers  # noqa: F401
        import pyspark.sql.pandas.types  # noqa: F401
    except Exception:  # pragma: no cover - env without pandas/pyarrow
        pass
    try:
        # The engine's own Python-boundary modules: forked workers
        # otherwise import these from the addPyFile zip (source compile,
        # no bytecode cache inside zips) on their first unpickle. The
        # installed tree and the shipped zip are built from the same
        # files (session.ship_package_to_workers), so pre-importing the
        # installed copy is equivalent and amortized once.
        import etl_project_gcp_spark.operators.dedup  # noqa: F401
        import etl_project_gcp_spark.operators.media  # noqa: F401
        import etl_project_gcp_spark.operators.multimodal  # noqa: F401
        import etl_project_gcp_spark.operators.text  # noqa: F401
        import etl_project_gcp_spark.operators.vector  # noqa: F401
        import etl_project_gcp_spark.streaming.streams  # noqa: F401
    except Exception:  # pragma: no cover - package not on worker path
        pass


if __name__ == "__main__":
    preload()
    import pyspark.daemon as _stock_daemon

    _stock_daemon.manager()
