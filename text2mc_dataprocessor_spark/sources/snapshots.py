"""Iceberg-style snapshot tables over Parquet (sandbox fallback).

The production design keeps frontier / seen / extracted state in Apache
Iceberg tables (atomic snapshot commits, ``VERSION AS OF``, rollback,
partition pruning). The Iceberg runtime jar is not available offline in
this sandbox, so this module provides the same *contract* over plain
Parquet + JSON manifests (SURVEY §7.5 anticipated exactly this
fallback; the crawl loop only talks to this interface, so swapping in
Iceberg is a one-module change).

Layout per table::

    <root>/<name>/data/v{N}-{token}/*.parquet   immutable data files
    <root>/<name>/manifests/v{N}.json           {version, path, meta, parent}
    <root>/<name>/HEAD                          current version (atomic rename)

Commit protocol: write data dir → write manifest → atomically replace
HEAD. A reader at any moment sees a complete snapshot. ``read(version=k)``
is Iceberg's ``VERSION AS OF k``; ``rollback(k)`` rewrites HEAD.

Checkpoint/resume semantics mirror the reference's periodic whole-CSV
rewrite (/root/reference/scraper/selenium_scraper.py:134-135,181-182)
but atomic and versioned instead of clobber-in-place.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _force_nullable(dt):
    """Parquet schema inference reports every column nullable; stored
    writer schemas are normalized the same way so schema-from-manifest
    reads are indistinguishable from inferred reads."""
    if isinstance(dt, T.StructType):
        return T.StructType([
            T.StructField(f.name, _force_nullable(f.dataType), True,
                          f.metadata)
            for f in dt.fields
        ])
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_force_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_force_nullable(dt.keyType),
                         _force_nullable(dt.valueType), True)
    return dt


def _schema_from_json(schema_json: str) -> T.StructType:
    return _force_nullable(T.StructType.fromJson(json.loads(schema_json)))


def _read_parquet(spark: SparkSession, paths: list[str],
                  schema_json: str | None) -> DataFrame:
    """Read parquet with the writer schema recorded in the manifest
    when available — each schema-less ``spark.read.parquet`` pays a
    driver-side footer-inference job per call, pure fixed cost on every
    snapshot read (r6, guide §6); old manifests without a stored schema
    fall back to inference."""
    reader = spark.read
    if schema_json:
        reader = reader.schema(_schema_from_json(schema_json))
    return reader.parquet(*paths)


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.name = name
        os.makedirs(os.path.join(self.dir, "data"), exist_ok=True)
        os.makedirs(os.path.join(self.dir, "manifests"), exist_ok=True)

    # -- write --------------------------------------------------------------
    def commit(self, df: DataFrame, meta: dict[str, Any] | None = None,
               version: int | None = None, publish: bool = True) -> int:
        """Atomic snapshot commit. Explicit ``version`` lets a resumed
        round re-publish the same target version after a mid-round crash
        (the orphaned data dir of the half-committed attempt is inert).

        ``publish=False`` writes the data files + manifest but leaves
        HEAD untouched — the snapshot exists (``read(version=…)`` works,
        readers of HEAD still see the previous one) until
        ``publish_version`` moves HEAD. This lets a multi-table commit
        run every table's write job concurrently and still publish in a
        strict order (the crawl publishes the frontier last — its HEAD
        is the round's consistency point)."""
        if version is None:
            parent = self.current_version()
            version = (parent or 0) + 1
        else:
            parent = version - 1 if version > 1 else None
        token = uuid.uuid4().hex[:8]
        data_path = os.path.join(self.dir, "data", f"v{version}-{token}")
        df.write.mode("errorifexists").parquet(data_path)
        manifest = {
            "version": version,
            "parent": parent,
            "path": data_path,
            "schema": df.schema.json(),
            "meta": meta or {},
        }
        mpath = os.path.join(self.dir, "manifests", f"v{version}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mpath + ".tmp", mpath)
        if publish:
            self.publish_version(version)
        return version

    def commit_empty(self, schema: T.StructType | str,
                     meta: dict[str, Any] | None = None,
                     version: int | None = None,
                     publish: bool = True) -> int:
        """Commit a KNOWN-empty snapshot without any Spark write job:
        the manifest records ``path: null`` plus the schema, and every
        reader synthesizes an empty frame from it. The engine's
        ``init_frontier`` seeds five always-empty tables this way — the
        old form paid one parquet write job per table for zero rows
        (r6, pure fixed cost)."""
        if isinstance(schema, str):
            schema = T._parse_datatype_string(schema)
        if version is None:
            parent = self.current_version()
            version = (parent or 0) + 1
        else:
            parent = version - 1 if version > 1 else None
        manifest = {
            "version": version,
            "parent": parent,
            "path": None,
            "schema": schema.json(),
            "meta": meta or {},
        }
        mpath = os.path.join(self.dir, "manifests", f"v{version}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mpath + ".tmp", mpath)
        if publish:
            self.publish_version(version)
        return version

    def publish_version(self, version: int) -> None:
        """Atomically point HEAD at an already-written snapshot."""
        head_tmp = os.path.join(self.dir, "HEAD.tmp")
        with open(head_tmp, "w") as f:
            f.write(str(version))
        os.replace(head_tmp, os.path.join(self.dir, "HEAD"))

    # -- incremental commits --------------------------------------------------
    # Iceberg-manifest-style append: a version may carry, besides its
    # (rewritten) main data dir, a HISTORY list of immutable data dirs
    # inherited from the parent version plus this commit's delta. Only
    # the delta is written; every inherited dir is byte-reused across
    # versions — the fix for "full-table rewrite per checkpoint" on
    # monotonically growing tables (trace, lineage, seen, crawl 'done'
    # history) at 10^10-row scale. ``read`` unions main + history, and
    # VERSION AS OF / rollback semantics are unchanged (manifests are
    # immutable and self-contained).

    def commit_with_history(self, main_df: DataFrame | None,
                            delta_df: DataFrame | None,
                            meta: dict[str, Any] | None = None,
                            version: int | None = None,
                            publish: bool = True,
                            reset_history: bool = False) -> int:
        """Write ``main_df`` (or reuse the parent's main dir if None)
        plus an appended ``delta_df`` history segment (if not None).
        ``reset_history=True`` drops the inherited segment list so the
        written delta becomes the ONLY history segment — the compaction
        commit: ``delta_df`` must then be the full accumulated history
        (parent manifests still pin the old segments for time travel)."""
        if version is None:
            parent = self.current_version()
            version = (parent or 0) + 1
        else:
            parent = version - 1 if version > 1 else None
        parent_manifest = self.manifest(parent) if parent else None
        history = (
            [] if reset_history
            else list(parent_manifest.get("history", [])) if parent_manifest
            else []
        )
        token = uuid.uuid4().hex[:8]
        if main_df is not None:
            data_path = os.path.join(self.dir, "data", f"v{version}-{token}")
            main_df.write.mode("errorifexists").parquet(data_path)
            schema_json = main_df.schema.json()
        else:
            if parent_manifest is None:
                raise ValueError("first commit needs a main DataFrame")
            data_path = parent_manifest["path"]  # byte-reused (may be None)
            schema_json = parent_manifest.get("schema")
        if delta_df is not None:
            delta_path = os.path.join(self.dir, "data", f"v{version}-{token}-delta")
            delta_df.write.mode("errorifexists").parquet(delta_path)
            history.append(delta_path)
            if schema_json is None:
                schema_json = delta_df.schema.json()
        manifest = {
            "version": version,
            "parent": parent,
            "path": data_path,
            "history": history,
            "meta": meta or {},
        }
        if schema_json is not None:
            manifest["schema"] = schema_json
        mpath = os.path.join(self.dir, "manifests", f"v{version}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mpath + ".tmp", mpath)
        if publish:
            self.publish_version(version)
        return version

    def commit_append(self, delta_df: DataFrame | None,
                      meta: dict[str, Any] | None = None,
                      version: int | None = None,
                      publish: bool = True) -> int:
        """Append-only commit: parent's data dirs are all byte-reused;
        only the delta is written."""
        return self.commit_with_history(None, delta_df, meta, version, publish)

    def read_main(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Only the main (rewritten) part of a snapshot."""
        m = self.manifest(version)
        if m["path"] is None:  # commit_empty lineage — no data files
            return spark.createDataFrame([], _schema_from_json(m["schema"]))
        return _read_parquet(spark, [m["path"]], m.get("schema"))

    def read_history(self, spark: SparkSession,
                     version: int | None = None) -> DataFrame | None:
        """Only the appended history segments (None if there are none)."""
        m = self.manifest(version)
        paths = m.get("history", [])
        if not paths:
            return None
        return _read_parquet(spark, paths, m.get("schema"))

    # -- read ---------------------------------------------------------------
    def current_version(self) -> int | None:
        head = os.path.join(self.dir, "HEAD")
        if not os.path.exists(head):
            return None
        with open(head) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        version = version if version is not None else self.current_version()
        if version is None:
            raise FileNotFoundError(f"no snapshot in {self.dir}")
        with open(os.path.join(self.dir, "manifests", f"v{version}.json")) as f:
            return json.load(f)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """VERSION AS OF ``version`` (default: latest) — main ∪ history."""
        m = self.manifest(version)
        paths = [p for p in [m["path"], *m.get("history", [])]
                 if p is not None]
        if not paths:  # commit_empty with no appended history yet
            return spark.createDataFrame([], _schema_from_json(m["schema"]))
        return _read_parquet(spark, paths, m.get("schema"))

    def versions(self) -> list[int]:
        out = []
        for fn in os.listdir(os.path.join(self.dir, "manifests")):
            if fn.startswith("v") and fn.endswith(".json"):
                out.append(int(fn[1:-5]))
        return sorted(out)

    def rollback(self, version: int) -> None:
        if version not in self.versions():
            raise ValueError(f"unknown version {version}")
        head_tmp = os.path.join(self.dir, "HEAD.tmp")
        with open(head_tmp, "w") as f:
            f.write(str(version))
        os.replace(head_tmp, os.path.join(self.dir, "HEAD"))

    def exists(self) -> bool:
        return self.current_version() is not None


class BucketedSnapshotTable(SnapshotTable):
    """Snapshot table whose rows are clustered into ``n_buckets`` hash
    buckets of a caller-chosen key, each bucket owning an ordered list
    of immutable parquet segments (Iceberg bucket-partitioning +
    manifest-per-partition, over plain parquet).

    Why: a commit touches only the buckets it writes — every other
    bucket's segment list carries over BY REFERENCE, so per-commit I/O
    is O(delta), never O(table), and key-targeted readers
    (``read_buckets``) open only the files that can contain their keys.
    This is the at-rest shape for the crawl's ``extracted`` table
    (VERDICT round 2: the full-table join+rewrite per round was the
    last O(crawl-history) cost).

    Writes take a DataFrame carrying an int ``_bkt`` column (the
    caller's ``pmod(xxhash64(key), P)``); it is written as a parquet
    partition directory and NOT stored in the data files — readers
    re-derive it from the key when they need it.

    Per-bucket compaction is folded into the commit: any bucket whose
    segment list would exceed ``max_segments`` is rewritten as ONE
    segment (read its list ∪ the new delta, write once), bounding read
    fan-in at O(max_segments) files per bucket with O(size/K)
    amortized write cost — the LSM discipline."""

    def __init__(self, root: str, name: str, max_segments: int = 8):
        super().__init__(root, name)
        self.max_segments = max_segments

    @staticmethod
    def _materialized_buckets(path: str) -> dict[int, str]:
        out = {}
        if os.path.isdir(path):
            for fn in os.listdir(path):
                if fn.startswith("_bkt="):
                    out[int(fn.split("=", 1)[1])] = os.path.join(path, fn)
        return out

    def commit_delta(self, delta_df: DataFrame | None,
                     meta: dict[str, Any] | None = None,
                     version: int | None = None, publish: bool = True,
                     spark: SparkSession | None = None) -> int:
        """Append ``delta_df`` (with ``_bkt``) as one new segment per
        materialized bucket; compact any bucket whose list overflows."""
        if version is None:
            parent = self.current_version()
            version = (parent or 0) + 1
        else:
            parent = version - 1 if version > 1 else None
        parent_manifest = self.manifest(parent) if parent else None
        buckets: dict[str, list[str]] = (
            {k: list(v) for k, v in parent_manifest.get("buckets", {}).items()}
            if parent_manifest else {}
        )
        token = uuid.uuid4().hex[:8]
        schema_json = (
            parent_manifest.get("schema") if parent_manifest else None)
        if delta_df is not None:
            from pyspark.sql import functions as F

            spark = spark or delta_df.sparkSession
            # readers open bucket dirs directly, so the partition column
            # is absent from their frames — store the bucket-stripped
            # writer schema
            schema_json = delta_df.drop("_bkt").schema.json()
            delta_dir = os.path.join(self.dir, "data", f"v{version}-{token}-delta")
            # cluster by bucket before the partitioned write: otherwise
            # every input partition opens a writer per bucket it sees —
            # up to P·tasks small files per commit; hash-clustered, each
            # bucket is written by exactly one task → P files total
            delta_df = delta_df.repartition(F.col("_bkt"))
            delta_df.write.mode("errorifexists").partitionBy("_bkt").parquet(delta_dir)
            for b, p in self._materialized_buckets(delta_dir).items():
                buckets.setdefault(str(b), []).append(p)
        # fold overflowing buckets into single segments (their parent
        # files stop being referenced from THIS version on; earlier
        # manifests still pin them, so time travel is unaffected)
        overflow = {
            int(b): paths for b, paths in buckets.items()
            if len(paths) > self.max_segments
        }
        if overflow:
            if spark is None:
                raise ValueError("compaction requires a SparkSession")
            from functools import reduce

            from pyspark.sql import functions as F
            fold = reduce(
                lambda a, b: a.unionByName(b),
                [
                    _read_parquet(spark, paths, schema_json).withColumn(
                        "_bkt", F.lit(b).cast("int"))
                    for b, paths in overflow.items()
                ],
            )
            fold_dir = os.path.join(self.dir, "data", f"v{version}-{token}-fold")
            fold = fold.repartition(F.col("_bkt"))
            fold.write.mode("errorifexists").partitionBy("_bkt").parquet(fold_dir)
            folded = self._materialized_buckets(fold_dir)
            for b in overflow:
                # a bucket whose rows all filtered out still resets to []
                buckets[str(b)] = [folded[b]] if b in folded else []
        manifest = {
            "version": version,
            "parent": parent,
            "buckets": buckets,
            "meta": meta or {},
        }
        if schema_json is not None:
            manifest["schema"] = schema_json
        mpath = os.path.join(self.dir, "manifests", f"v{version}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mpath + ".tmp", mpath)
        if publish:
            self.publish_version(version)
        return version

    def commit_full(self, df: DataFrame, meta: dict[str, Any] | None = None,
                    version: int | None = None, publish: bool = True) -> int:
        """Rewrite the WHOLE table: every materialized bucket becomes one
        segment and every inherited segment list is dropped (parent
        manifests still pin the old files for time travel). This is the
        table-wide compaction commit — the crawl uses it at the
        ``compact_history_every`` cadence to bake merge-on-read fills
        into the rows (O(table) every K commits → O(table/K) amortized,
        the same bound as the other history folds)."""
        if version is None:
            parent = self.current_version()
            version = (parent or 0) + 1
        else:
            parent = version - 1 if version > 1 else None
        from pyspark.sql import functions as F

        token = uuid.uuid4().hex[:8]
        full_dir = os.path.join(self.dir, "data", f"v{version}-{token}-full")
        df.repartition(F.col("_bkt")).write.mode("errorifexists") \
            .partitionBy("_bkt").parquet(full_dir)
        buckets = {
            str(b): [p] for b, p in self._materialized_buckets(full_dir).items()
        }
        manifest = {
            "version": version,
            "parent": parent,
            "buckets": buckets,
            "schema": df.drop("_bkt").schema.json(),
            "meta": meta or {},
        }
        mpath = os.path.join(self.dir, "manifests", f"v{version}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mpath + ".tmp", mpath)
        if publish:
            self.publish_version(version)
        return version

    def bucket_paths(self, version: int | None = None) -> dict[int, list[str]]:
        m = self.manifest(version)
        return {int(b): list(p) for b, p in m.get("buckets", {}).items()}

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        m = self.manifest(version)
        paths = [p for ps in m.get("buckets", {}).values() for p in ps]
        if not paths:
            return None
        return _read_parquet(spark, paths, m.get("schema"))

    def read_buckets(self, spark: SparkSession, buckets,
                     version: int | None = None) -> DataFrame | None:
        """Only the segments of ``buckets`` — the key-pruned scan."""
        m = self.manifest(version)
        want = set(int(b) for b in buckets)
        paths = [
            p for b, ps in m.get("buckets", {}).items()
            if int(b) in want for p in ps
        ]
        if not paths:
            return None
        return _read_parquet(spark, paths, m.get("schema"))
