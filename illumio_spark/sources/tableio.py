"""TableIO seam: Iceberg-first, parquet+manifest fallback (SURVEY.md §7 step 0).

The pipeline code never branches on storage format. When an Iceberg runtime
jar is on the classpath, tables live in a hadoop catalog ('local.db.<name>')
with snapshot commits; otherwise each table is a parquet directory per run
(`<root>/<table>/run_id=<id>/`) plus a `manifest.json` standing in for
snapshot metadata (run lineage, schema, paths).

This mirrors — and strictly improves on — the reference's durability story:
the SQLite FIFO queue (app/log_processor.py:129-169) and state.json
(app/s3_manager.py:253-267) become atomic table commits + a manifest.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from illumio_spark.session import iceberg_available


class TableIO:
    def __init__(self, root: str, use_iceberg: bool | None = None):
        self.root = root
        self.use_iceberg = iceberg_available() if use_iceberg is None else use_iceberg
        os.makedirs(root, exist_ok=True)

    # -- manifest (fallback snapshot metadata) ------------------------------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "manifest.json")

    def _load_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"table": table, "runs": []}

    def _commit_manifest(self, table: str, run_id: str, path: str, schema: str) -> None:
        m = self._load_manifest(table)
        m["runs"] = [r for r in m["runs"] if r["run_id"] != run_id]
        m["runs"].append(
            {"run_id": run_id, "path": path, "schema": schema, "committed_at": time.time()}
        )
        tmp = self._manifest_path(table) + ".tmp"
        os.makedirs(os.path.dirname(tmp), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, self._manifest_path(table))  # atomic commit

    # -- write/read ----------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        table: str,
        run_id: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> str:
        if self.use_iceberg:
            full = f"local.db.{table}"
            w = df.writeTo(full)
            if partition_by:
                from pyspark.sql.functions import col

                w = w.partitionedBy(*[col(c) for c in partition_by])
            w.createOrReplace() if mode == "overwrite" else w.append()
            return full
        path = os.path.join(self.root, table, f"run_id={run_id}")
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self._commit_manifest(table, run_id, path, df.schema.simpleString())
        return path

    def read(self, spark: SparkSession, table: str, run_id: str | None = None) -> DataFrame:
        if self.use_iceberg:
            return spark.read.table(f"local.db.{table}")
        if run_id is not None:
            return spark.read.parquet(os.path.join(self.root, table, f"run_id={run_id}"))
        runs = self._load_manifest(table)["runs"]
        if not runs:
            raise FileNotFoundError(f"no committed runs for table {table}")
        # per-run reads unioned so hive-style partition discovery (e.g. the
        # `sink` column) resolves against each run's own base path
        dfs = [spark.read.parquet(r["path"]) for r in runs]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def committed_runs(self, table: str) -> list[str]:
        return [r["run_id"] for r in self._load_manifest(table)["runs"]]

    # -- logical sinks over the one-pass partitioned fan-out table -----------
    SINK_COLUMNS = {
        "routed_events": [
            "conv_id", "turn_idx", "event_class", "event_type", "severity", "routed_text", "ts",
        ],
        "dead_letter": ["conv_id", "turn_idx", "raw_text", "error_reason", "ts"],
    }

    def read_sink(self, spark: SparkSession, sink: str, run_id: str | None = None) -> DataFrame:
        """routed_events / dead_letter as views over pipeline_out's `sink`
        partition — partition pruning makes this a targeted directory read."""
        cols = self.SINK_COLUMNS[sink]
        df = self.read(spark, "pipeline_out", run_id)
        from pyspark.sql.functions import col

        return df.filter(col("sink") == sink).select(*cols)
