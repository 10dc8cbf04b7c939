"""Commit-logged versioned parquet table (a minimal lakehouse table format).

Why not plain ``spark.write.mode("append")``: object-store listings are
eventually consistent and give no atomicity, no versions, and no time
travel. A JSON commit log (the Delta/Iceberg core idea, reimplemented
minimally on public primitives since neither package ships in this
environment) gives us:

- atomic commits: data files land first, then one rename publishes the
  commit file — readers never see partial writes;
- snapshot reads + time travel: a read pins the set of committed files;
- append-only history: every ingest is a new version (the reference's
  offline-store semantic, /root/reference/core/feature_store_manager.py:96-102,
  where "every put is a new version row").

Scale notes: data files are written by executors (full parallelism); only
the tiny commit JSON is driver-side. Reads hand Spark a list of parquet
files, so partition pruning / predicate pushdown work unchanged. A real
deployment would swap this class for Delta/Iceberg with zero API change —
documented equivalence, same plans.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_LOG_DIR = "_commits"
_DATA_DIR = "data"


class VersionedParquetTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        partition_cols: list[str] | None = None,
    ):
        """``partition_cols`` (must be schema columns) become hive-style
        directory partitions inside every commit — readers filtering on
        them get partition pruning (directories skipped before any IO),
        the storage-layout half of the 100 TB story. Use low-cardinality
        derived columns (event DATE, not timestamp)."""
        self.spark = spark
        self.path = path
        self.schema = schema
        self.partition_cols = partition_cols or []
        missing = set(self.partition_cols) - set(schema.fieldNames())
        if missing:
            raise ValueError(f"partition columns not in schema: {sorted(missing)}")

    # -- log helpers --------------------------------------------------------
    @property
    def _log_path(self) -> str:
        return os.path.join(self.path, _LOG_DIR)

    def _commit_file(self, version: int) -> str:
        return os.path.join(self._log_path, f"{version:010d}.json")

    def versions(self) -> list[int]:
        if not os.path.isdir(self._log_path):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self._log_path)
            if f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    # -- write --------------------------------------------------------------
    def append(self, df: DataFrame) -> int:
        """Append a new immutable version; returns the committed version id.

        Files first, then an atomic rename of the commit JSON — a reader
        enumerating the log sees either the whole commit or none of it.
        """
        if [f.name for f in df.schema.fields] != [f.name for f in self.schema.fields]:
            raise ValueError(
                f"schema mismatch: expected {self.schema.fieldNames()}, "
                f"got {df.schema.fieldNames()}"
            )
        os.makedirs(self._log_path, exist_ok=True)
        version = (self.latest_version() or 0) + 1
        data_dir = os.path.join(self.path, _DATA_DIR, f"v{version:010d}-{uuid.uuid4().hex[:8]}")
        writer = df.write.mode("errorifexists")
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(data_dir)

        commit = {
            "version": version,
            "data_dir": data_dir,
            "ts_unix": time.time(),
            "schema": df.schema.jsonValue(),
        }
        fd, tmp = tempfile.mkstemp(dir=self._log_path, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(commit, f)
        os.rename(tmp, self._commit_file(version))  # atomic publish
        return version

    # -- maintenance --------------------------------------------------------
    def compact(self) -> int:
        """Rewrite the current snapshot as one commit (OPTIMIZE analog).

        Small-file mitigation: N append commits become a single data dir;
        subsequent reads scan compacted files + any later appends. The
        per-row ``_commit_version`` is MATERIALIZED into the compacted
        files, so arrival-order semantics (parity online view, §2.13 Q5)
        survive compaction bit-for-bit. Old dirs are kept for time travel
        (a vacuum policy would garbage-collect them after a retention
        window, exactly like Delta).
        """
        base = self.latest_version()
        if base is None:
            raise ValueError("nothing to compact: table has no commits")
        snapshot = self.read()  # includes _commit_version
        os.makedirs(self._log_path, exist_ok=True)
        version = base + 1
        data_dir = os.path.join(
            self.path, _DATA_DIR, f"v{version:010d}-{uuid.uuid4().hex[:8]}"
        )
        writer = snapshot.write.mode("errorifexists")
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(data_dir)
        commit = {
            "version": version,
            "type": "compact",
            "base_version": base,
            "data_dir": data_dir,
            "ts_unix": time.time(),
            "schema": snapshot.schema.jsonValue(),
        }
        fd, tmp = tempfile.mkstemp(dir=self._log_path, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(commit, f)
        os.rename(tmp, self._commit_file(version))
        return version

    def vacuum(self) -> list[int]:
        """Garbage-collect data made unreachable by the LATEST compaction:
        commits at or below its base_version. Their commit files are kept
        (tombstoned with the data_dir nulled) so the version history stays
        enumerable; time travel below the compaction base stops working —
        the documented retention trade, same as Delta VACUUM.

        Returns the list of vacuumed version ids.
        """
        import shutil

        commits = []
        for v in self.versions():
            with open(self._commit_file(v)) as f:
                commits.append(json.load(f))
        compacts = [c for c in commits if c.get("type") == "compact"]
        if not compacts:
            return []
        base = max(compacts, key=lambda c: c["version"])["base_version"]
        removed = []
        for c in commits:
            if c["version"] <= base and c.get("data_dir"):
                shutil.rmtree(c["data_dir"], ignore_errors=True)
                c["data_dir"] = None
                c["vacuumed"] = True
                fd, tmp = tempfile.mkstemp(dir=self._log_path, suffix=".tmp")
                with os.fdopen(fd, "w") as f:
                    json.dump(c, f)
                os.rename(tmp, self._commit_file(c["version"]))
                removed.append(c["version"])
        return removed

    # -- read ---------------------------------------------------------------
    def read(self, as_of_version: int | None = None) -> DataFrame:
        """Snapshot read of all rows, optionally time-traveled.

        Adds ``_commit_version`` (the ingest sequence number) — the
        arrival-order axis used by parity-mode "latest" semantics
        (SURVEY.md §2.13 Q5).
        """
        from pyspark.sql import functions as F

        versions = self.versions()
        if as_of_version is not None:
            versions = [v for v in versions if v <= as_of_version]
        if not versions:
            empty = self.spark.createDataFrame([], self.schema)
            return empty.withColumn("_commit_version", F.lit(None).cast("int"))

        commits = []
        for v in versions:
            with open(self._commit_file(v)) as f:
                commits.append(json.load(f))
        # honor the latest visible compaction: it replaces every commit at
        # or below its base_version (older dirs remain only for deeper
        # time travel)
        compacts = [c for c in commits if c.get("type") == "compact"]
        compact = max(compacts, key=lambda c: c["version"]) if compacts else None
        cols = [*self.schema.fieldNames(), "_commit_version"]

        visible_appends = [
            c
            for c in commits
            if c.get("type", "append") == "append"
            and (compact is None or c["version"] > compact["base_version"])
        ]
        gone = [c["version"] for c in visible_appends if not c.get("data_dir")]
        if gone:
            raise ValueError(
                f"versions {gone} were vacuumed; time travel below the "
                "compaction base is no longer available"
            )
        append_dirs = [c["data_dir"] for c in visible_appends]

        parts = []
        if compact is not None:
            # compacted files carry _commit_version as a real column
            compact_schema = T.StructType(
                [*self.schema.fields, T.StructField("_commit_version", T.IntegerType())]
            )
            parts.append(
                self.spark.read.schema(compact_schema)
                .parquet(compact["data_dir"])
                .select(*cols)
            )
        if append_dirs:
            # ONE multi-path scan for all append commits (a union-per-commit
            # plan grows linearly with history and chokes the optimizer);
            # the commit version is recovered from the data-dir name via
            # _metadata.file_path (input_file_name() is non-deterministic
            # and would block predicate/partition pushdown).
            out = self.spark.read.schema(self.schema).parquet(*append_dirs)
            version_from_path = F.regexp_extract(
                F.col("_metadata.file_path"), r"/v(\d{10})-[0-9a-f]{8}/", 1
            ).cast("int")
            parts.append(
                out.withColumn("_commit_version", version_from_path).select(*cols)
            )
        result = parts[0]
        for p in parts[1:]:
            result = result.unionByName(p)
        return result

    def history(self) -> list[dict]:
        out = []
        for v in self.versions():
            with open(self._commit_file(v)) as f:
                out.append(json.load(f))
        return out
