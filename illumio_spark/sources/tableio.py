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
    def write(self, df: DataFrame, table: str, run_id: str, mode: str = "overwrite") -> str:
        if self.use_iceberg:
            full = f"local.db.{table}"
            df.writeTo(full).createOrReplace() if mode == "overwrite" else df.writeTo(full).append()
            return full
        path = os.path.join(self.root, table, f"run_id={run_id}")
        df.write.mode(mode).parquet(path)
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
        return spark.read.parquet(*[r["path"] for r in runs])

    def committed_runs(self, table: str) -> list[str]:
        return [r["run_id"] for r in self._load_manifest(table)["runs"]]
