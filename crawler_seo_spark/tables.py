"""Snapshot-versioned parquet tables (checkpoint/resume layer).

Production target is Iceberg (`MERGE INTO` frontier/seen, snapshot-per-round
time travel); the Iceberg runtime jars are not in this container, so this
module provides the same contract on plain parquet:

* one directory per table per round: ``{root}/{table}/r{round:05d}/``,
* atomic commit: data lands in a ``_tmp`` directory, then a single
  ``os.rename`` publishes it (rename is atomic on POSIX),
* a JSON manifest (``_manifest.json``) recording the last committed round
  and counters, written last — a crash between data and manifest leaves the
  previous round as the committed state, so resume is always consistent,
* resume = read every table at the manifest's round (bit-identical, tested).

Call sites use only this API, so swapping in Iceberg is a one-module change
(reference checkpoint artifacts modeled: the ``cache/*.pkl`` run snapshots,
see SURVEY §1.4).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest -------------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def manifest(self) -> dict | None:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def commit_round(self, round_id: int, counters: dict) -> None:
        payload = {"round": round_id, "counters": counters}
        hist_dir = os.path.join(self.root, "rounds")
        os.makedirs(hist_dir, exist_ok=True)
        with open(os.path.join(hist_dir, f"r{round_id:05d}.json"), "w") as f:
            json.dump(payload, f, indent=1)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def rollback(self, round_id: int) -> None:
        """Reset the committed state to ``round_id`` (crash simulation /
        manual recovery): later snapshot dirs become unreferenced garbage,
        exactly as after a crash between data write and manifest publish."""
        with open(os.path.join(self.root, "rounds",
                               f"r{round_id:05d}.json")) as f:
            payload = json.load(f)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1)
        os.replace(tmp, self._manifest_path)

    # -- table snapshots ---------------------------------------------------
    def _table_dir(self, table: str, round_id: int) -> str:
        return os.path.join(self.root, table, f"r{round_id:05d}")

    def write(self, table: str, df: DataFrame, round_id: int) -> None:
        final = self._table_dir(table, round_id)
        tmp = final + "_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final)

    def read(self, spark: SparkSession, table: str, round_id: int) -> DataFrame:
        return spark.read.parquet(self._table_dir(table, round_id))

    def read_latest(self, spark: SparkSession, table: str) -> DataFrame | None:
        m = self.manifest()
        if m is None:
            return None
        return self.read(spark, table, m["round"])
