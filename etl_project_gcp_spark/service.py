"""ETL-as-a-service surface (main.py:25-177 parity).

The reference exposes the pipeline over HTTP on Cloud Run: POST
/trigger-etl, GET /verify-results, GET /sample-data, GET / and /status.
Here the handlers are plain functions over the engine (testable without
a server); ``create_app`` wraps them in Flask if it's installed — the
service layer stays out of the engine core, mirroring the reference's
module split (SURVEY §3.4).
"""

from __future__ import annotations

import time

from etl_project_gcp_spark.plans import reports as RP
from etl_project_gcp_spark.plans import verify as V
from etl_project_gcp_spark.plans.medallion import MedallionPipeline

SERVICE_NAME = "etl-project-gcp-spark"
VERSION = "0.1.0"


def health() -> dict:
    """GET / (main.py:25-28)."""
    return {"status": "healthy", "service": SERVICE_NAME}


def status() -> dict:
    """GET /status (main.py:148-177)."""
    return {
        "service": SERVICE_NAME,
        "version": VERSION,
        "engine": "pyspark",
        "endpoints": ["/", "/status", "/trigger-etl", "/verify-results", "/sample-data"],
    }


def trigger_etl(pipe: MedallionPipeline, sources: dict[str, str]) -> dict:
    """POST /trigger-etl (main.py:35-74): run the pipeline, report
    per-layer statement results + wall time (etl_pipeline.py:6-13)."""
    t0 = time.time()
    result = pipe.run_etl(sources)
    result["duration_sec"] = round(time.time() - t0, 2)
    return result


def verify_results(pipe: MedallionPipeline) -> dict:
    """GET /verify-results (main.py:76-110)."""
    return V.verify_results_detailed(pipe)


def sample_data(pipe: MedallionPipeline) -> dict:
    """GET /sample-data (main.py:112-146)."""
    return RP.sample_reports(pipe)


def create_app(pipe: MedallionPipeline, sources: dict[str, str]):
    """Optional Flask wrapper — Flask may not be installed; the handlers
    above are the contract either way."""
    try:
        from flask import Flask, jsonify
    except ImportError as e:  # pragma: no cover
        raise ImportError("flask is not installed; use the plain handlers") from e

    app = Flask(SERVICE_NAME)
    app.add_url_rule("/", "health", lambda: jsonify(health()))
    app.add_url_rule("/status", "status", lambda: jsonify(status()))
    app.add_url_rule(
        "/trigger-etl", "trigger",
        lambda: jsonify(trigger_etl(pipe, sources)), methods=["POST"],
    )
    app.add_url_rule("/verify-results", "verify", lambda: jsonify(verify_results(pipe)))
    app.add_url_rule("/sample-data", "sample", lambda: jsonify(sample_data(pipe)))
    return app
