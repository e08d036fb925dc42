"""The preloading Python worker daemon (r16: cold-worker fan-out).

pydaemon.py preloads numpy/pandas/pyarrow + this package in the worker
daemon so forked workers inherit the imports copy-on-write; get_spark
selects it for local sessions (the only place the executor Python
provably shares this environment) behind the SPARK_GRAFT_PYDAEMON
override. These tests pin the selection logic, the module's import
safety, and that a live local session actually runs Python stages
under it.
"""

from __future__ import annotations

import os

import pytest

from etl_project_gcp_spark import pydaemon
from etl_project_gcp_spark.session import _want_pydaemon


def test_want_pydaemon_selection(monkeypatch):
    # local defaults ON (explicit local master, or no cluster master)
    monkeypatch.delenv("SPARK_GRAFT_PYDAEMON", raising=False)
    monkeypatch.delenv("SPARK_MASTER", raising=False)
    assert _want_pydaemon(None) is True
    assert _want_pydaemon("local[8]") is True
    # a cluster master defaults OFF: the daemon module may not be
    # importable by the executors' Python
    assert _want_pydaemon("spark://host:7077") is False
    monkeypatch.setenv("SPARK_MASTER", "yarn")
    assert _want_pydaemon(None) is False
    # explicit override wins both ways
    monkeypatch.setenv("SPARK_GRAFT_PYDAEMON", "1")
    assert _want_pydaemon("spark://host:7077") is True
    monkeypatch.setenv("SPARK_GRAFT_PYDAEMON", "0")
    monkeypatch.delenv("SPARK_MASTER", raising=False)
    assert _want_pydaemon(None) is False


def test_pydaemon_preload_is_import_safe():
    # preload must never raise — a worker env without some module must
    # degrade to stock behavior, not kill the daemon
    pydaemon.preload()
    # and the module must be runnable as `python -m` (the daemon launch
    # path): it delegates to pyspark.daemon's manager under __main__,
    # which we can't run here, but the import seam it uses must exist
    import pyspark.daemon

    assert callable(pyspark.daemon.manager)


def test_local_session_runs_python_stage_under_pydaemon(spark):
    if os.environ.get("SPARK_GRAFT_PYDAEMON", "").strip() == "0":
        pytest.skip("pydaemon explicitly disabled in this environment")
    assert (
        spark.conf.get("spark.python.daemon.module", None)
        == "etl_project_gcp_spark.pydaemon"
    )

    # a Python-boundary stage must work end-to-end under the custom
    # daemon (fork + unpickle + Arrow round trip)
    def double(batches):
        for pdf in batches:
            pdf["id"] = pdf["id"] * 2
            yield pdf

    got = sorted(
        r.id
        for r in spark.range(0, 8, 1, 4)
        .mapInPandas(double, "id long")
        .collect()
    )
    assert got == [0, 2, 4, 6, 8, 10, 12, 14]


def test_prewarm_runs_once_per_session(spark):
    """The background worker-pool prewarm fires at session build and
    must not re-fire on every get_spark() call (it marks the session)."""
    from etl_project_gcp_spark.session import get_spark

    if os.environ.get("SPARK_GRAFT_PREWARM", "").strip() == "0":
        pytest.skip("prewarm explicitly disabled in this environment")
    assert getattr(spark, "_spark_graft_prewarmed", False) is True
    # idempotent: a repeat call returns the same session, still marked,
    # without spawning another prewarm (the flag short-circuits it)
    again = get_spark(app_name="prewarm-idempotence-check")
    assert again is spark
    assert getattr(again, "_spark_graft_prewarmed", False) is True
