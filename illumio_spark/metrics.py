"""Execution metrics / lineage capture.

The reference's HealthReporter thread (app/health_reporter.py:62-90,
266-289) polls counters and appends JSON report rows. Spark already emits
everything per query: a QueryExecutionListener captures observed metrics
(df.observe) and per-write row counts; this module collects them into
report lines / rows for the rollups sink."""

from __future__ import annotations

import time


class PipelineMetrics:
    """Collects (query, observed-metrics, duration) tuples per execution."""

    def __init__(self):
        self.records: list[dict] = []

    def report(self) -> list[str]:
        out = []
        for r in self.records:
            obs = ", ".join(f"{k}={v}" for k, v in r["observed"].items()) or "-"
            out.append(f"{r['name']}: {r['duration_s']:.2f}s observed[{obs}]")
        return out


def attach_metrics(spark) -> PipelineMetrics:
    """Attach a QueryExecutionListener via the py4j bridge when available;
    degrade to a no-op collector otherwise (listener API needs the JVM
    callback server, which plain local sessions may not run)."""
    metrics = PipelineMetrics()

    try:
        from pyspark.sql.utils import try_remote_functions  # noqa: F401 — presence probe
    except Exception:
        pass

    class _Listener:
        def onSuccess(self, funcName, qe, durationNs):
            try:
                observed = dict(qe.observedMetrics()) if hasattr(qe, "observedMetrics") else {}
            except Exception:
                observed = {}
            metrics.records.append(
                {
                    "name": funcName,
                    "observed": observed,
                    "duration_s": durationNs / 1e9,
                    "ts": time.time(),
                }
            )

        def onFailure(self, funcName, qe, exception):
            metrics.records.append(
                {
                    "name": f"{funcName}!FAILED",
                    "observed": {},
                    "duration_s": 0.0,
                    "ts": time.time(),
                }
            )

        class Java:
            implements = ["org.apache.spark.sql.util.QueryExecutionListener"]

    try:
        spark._jsparkSession.listenerManager().register(_Listener())  # type: ignore[attr-defined]
    except Exception:
        pass  # callback server unavailable — observe()-based rollups still work
    return metrics
