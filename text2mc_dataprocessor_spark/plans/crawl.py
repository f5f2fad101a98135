"""The crawl round loop — the engine's replacement for the reference's
sequential passes (/root/reference/scraper/run_scraper.py:6-22).

Each round is ONE declarative DataFrame job:

    frontier.filter(QUEUED)
      → robots gate (broadcast join)                     [politeness]
      → window top-k per host under politeness budget    [frontier]
      → fetch (replay: broadcast-join the dequeued batch against the
        pages table; production: HTTP inside mapInArrow — same stage
        boundary) repartitioned on salted host            [skew]
      → extraction pandas UDFs (listing outlinks / detail fields /
        raw download link)                               [extract]
      → explode outlinks → first-occurrence in-batch dedup
      → Bloom probe → exact left_anti backstop           [seen]
      → assign discovered_seq (explicit total order)
      → MERGE new state → snapshot commit per table      [snapshots]

with per-round lineage + per-partition fetch/dedup metrics, and
resume-from-any-snapshot (north rule). Catalyst plans each job; the
driver loop only crosses job boundaries.

Checkpoint analog in the reference: whole-CSV rewrite every K rows
(selenium_scraper.py:20-22, 181-182, 270-276); here every round is an
atomic, versioned commit and ``CrawlEngine.resume`` continues from the
latest (or any) consistent version.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.extract import (
    FIELD_SEP,
    extract_detail_udf,
    extract_outlinks_udf,
    extract_raw_link_udf,
)
from ..functions.urlkeys import host_col, url_hash_col
from ..operators.frontier import (
    FRONTIER_SCHEMA,
    kind_score_expr,
    dequeue,
)
from ..operators.politeness import robots_gate, salt_fetch_partitions
from ..operators.seen import PartitionedBloom, split_new_urls
from ..sources.snapshots import SnapshotTable

SEEN_SCHEMA = "url string, url_hash long, bucket int"
EXTRACTED_SCHEMA = (
    "url string, download_url string, image_url string, tags string, "
    "raw_download_link string, extracted_text string"
)
TRACE_SCHEMA = "dequeue_seq long, round int, url string, host string, kind string"
LINEAGE_SCHEMA = "round int, metric string, key string, value long"

_FRONTIER_COLS = [
    "url", "host", "url_hash", "bucket", "kind", "depth", "score", "state",
    "discovered_seq", "round", "parent_url",
]


@dataclass
class CrawlConfig:
    politeness_budget: int = 1
    global_budget: int | None = None
    n_buckets: int = 64
    bloom_capacity_per_bucket: int = 100_000
    bloom_fpr: float = 0.01
    salt_buckets: int = 16
    fetch_partitions: int | None = None


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        pages: DataFrame,
        robots: DataFrame | None = None,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.pages = pages.select("url", "html")
        self.robots = robots
        self.t_frontier = SnapshotTable(workdir, "frontier")
        self.t_seen = SnapshotTable(workdir, "seen")
        self.t_bloom = SnapshotTable(workdir, "bloom")
        self.t_extracted = SnapshotTable(workdir, "extracted")
        self.t_trace = SnapshotTable(workdir, "trace")
        self.t_lineage = SnapshotTable(workdir, "lineage")
        self.bloom = PartitionedBloom(
            self.cfg.n_buckets, self.cfg.bloom_capacity_per_bucket, self.cfg.bloom_fpr
        )

    # -- lifecycle -----------------------------------------------------------
    def init(self, seeds: DataFrame) -> None:
        """seeds: (url string, seed_rank int) — FIFO order of the seed list."""
        n_buckets = self.cfg.n_buckets
        frontier0 = seeds.select(
            F.col("url"),
            host_col("url").alias("host"),
            url_hash_col("url").alias("url_hash"),
            F.pmod(url_hash_col("url"), F.lit(n_buckets)).cast("int").alias("bucket"),
            F.lit("listing").alias("kind"),
            F.lit(0).alias("depth"),
            F.lit(2.0).alias("score"),
            F.lit("QUEUED").alias("state"),
            F.col("seed_rank").cast("long").alias("discovered_seq"),
            F.lit(0).alias("round"),
            F.lit(None).cast("string").alias("parent_url"),
        )
        seen0 = frontier0.select("url", "url_hash", "bucket")
        bloom0 = self.bloom.build(seen0.select("bucket", "url_hash"))
        empty = self.spark.createDataFrame([], EXTRACTED_SCHEMA)
        self.t_trace.commit(self.spark.createDataFrame([], TRACE_SCHEMA), {"round": 0})
        self.t_lineage.commit(self.spark.createDataFrame([], LINEAGE_SCHEMA), {"round": 0})
        self.t_extracted.commit(empty, {"round": 0})
        self.t_seen.commit(seen0, {"round": 0})
        self.t_bloom.commit(bloom0, {"round": 0})
        self.t_frontier.commit(frontier0, {"round": 0})

    @property
    def version(self) -> int:
        v = self.t_frontier.current_version()
        if v is None:
            raise RuntimeError("engine not initialized — call init(seeds)")
        return v

    def round_number(self, version: int | None = None) -> int:
        return int(self.t_frontier.manifest(version)["meta"]["round"])

    def rollback(self, version: int) -> None:
        """Resume-from-any-snapshot: point every table at ``version``."""
        for t in (self.t_frontier, self.t_seen, self.t_bloom, self.t_extracted,
                  self.t_trace, self.t_lineage):
            t.rollback(version)

    # -- table accessors (read at the frontier's consistent version) ----------
    def _read(self, table: SnapshotTable) -> DataFrame:
        return table.read(self.spark, self.version)

    def frontier_df(self) -> DataFrame:
        return self._read(self.t_frontier)

    def seen_df(self) -> DataFrame:
        return self._read(self.t_seen)

    def extracted_df(self) -> DataFrame:
        return self._read(self.t_extracted)

    def trace_df(self) -> DataFrame:
        return self._read(self.t_trace)

    def lineage_df(self) -> DataFrame:
        return self._read(self.t_lineage)

    # -- driving ---------------------------------------------------------------
    def run(self, rounds: int | None = None) -> int:
        """Run until the frontier drains (or ``rounds``); → rounds executed."""
        done = 0
        while rounds is None or done < rounds:
            if not self._one_round():
                break
            done += 1
        return done

    def _one_round(self) -> bool:
        spark = self.spark
        cfg = self.cfg
        base_version = self.version
        r = self.round_number() + 1

        frontier = self.t_frontier.read(spark, base_version)
        queued = frontier.filter(F.col("state") == "QUEUED")
        allowed, denied = robots_gate(queued, self.robots)
        dequeued = dequeue(allowed, cfg.politeness_budget, cfg.global_budget).cache()
        n_deq = dequeued.count()
        denied = denied.cache()
        n_denied = denied.count()
        if n_deq == 0 and n_denied == 0:
            return False

        # ---- fetch (replay mode: broadcast the small dequeued batch against
        # the pages table — the 100 TB side is scanned, never shuffled; the
        # production path swaps this join for an HTTP mapInArrow stage).
        n_parts = cfg.fetch_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        fetched = (
            self.pages.join(
                F.broadcast(dequeued.select(*_FRONTIER_COLS, "dequeue_rank")), "url"
            )
        )
        fetched = salt_fetch_partitions(fetched, n_parts, cfg.salt_buckets).cache()
        failed = dequeued.join(fetched.select("url"), "url", "left_anti").cache()

        # ---- extract (Arrow-batched pandas UDFs)
        listings = fetched.filter(F.col("kind") == "listing").withColumn(
            "outlinks", extract_outlinks_udf("url", "html")
        )
        details = fetched.filter(F.col("kind") == "detail").withColumn(
            "d", extract_detail_udf("url", "html")
        ).cache()
        downloads = fetched.filter(F.col("kind") == "download").withColumn(
            "raw_link", extract_raw_link_udf("url", "html")
        )

        # ---- outlink candidates: (url, parent_rank, dom_pos, kind, depth)
        listing_out = listings.select(
            F.col("dequeue_rank").alias("parent_rank"),
            F.col("depth").alias("parent_depth"),
            F.col("url").alias("src_url"),
            F.explode("outlinks").alias("o"),
        ).select(
            F.col("o.href").alias("url"),
            "parent_rank",
            F.col("o.dom_pos").alias("dom_pos"),
            F.col("o.kind").alias("kind"),
            "parent_depth",
            "src_url",
        )
        download_out = details.filter(F.col("d.download_url") != "").select(
            F.col("d.download_url").alias("url"),
            F.col("dequeue_rank").alias("parent_rank"),
            F.lit(0).alias("dom_pos"),
            F.lit("download").alias("kind"),
            F.col("depth").alias("parent_depth"),
            F.col("url").alias("src_url"),
        )
        candidates = listing_out.unionByName(download_out).cache()
        n_candidates = candidates.count()

        # first-occurrence dedup within the batch (deterministic: min struct
        # over the (parent dequeue order, DOM position) total order)
        cand = (
            candidates.groupBy("url")
            .agg(
                F.min(
                    F.struct("parent_rank", "dom_pos", "kind", "parent_depth", "src_url")
                ).alias("m")
            )
            .select("url", "m.*")
            .withColumn("host", host_col("url"))
            .withColumn("url_hash", url_hash_col("url"))
            .withColumn(
                "bucket",
                F.pmod(F.col("url_hash"), F.lit(cfg.n_buckets)).cast("int"),
            )
        )

        # ---- seen-set dedup: Bloom pre-filter + exact anti-join backstop
        seen = self.t_seen.read(spark, base_version)
        bloom_df = self.t_bloom.read(spark, base_version)
        new = split_new_urls(cand, seen, bloom_df)

        max_seq = frontier.agg(F.max("discovered_seq")).first()[0]
        seq_w = Window.orderBy("parent_rank", "dom_pos")
        new_front = new.select(
            "url",
            "host",
            "url_hash",
            "bucket",
            "kind",
            (F.col("parent_depth") + 1).alias("depth"),
            kind_score_expr().alias("score"),
            F.lit("QUEUED").alias("state"),
            (F.lit(max_seq) + F.row_number().over(seq_w)).alias("discovered_seq"),
            F.lit(r).alias("round"),
            F.col("src_url").alias("parent_url"),
        ).cache()
        n_new = new_front.count()
        n_unique_cand = cand.count()

        # ---- frontier MERGE: untouched ∪ state-updates ∪ new QUEUED rows
        touched = dequeued.select("url").unionByName(denied.select("url"))
        rest = frontier.join(touched, "url", "left_anti")

        def as_state(df: DataFrame, state: str) -> DataFrame:
            return df.select(*_FRONTIER_COLS).withColumn("state", F.lit(state)).select(
                *_FRONTIER_COLS
            )

        frontier2 = (
            rest.select(*_FRONTIER_COLS)
            .unionByName(as_state(fetched, "FETCHED"))
            .unionByName(as_state(failed, "FAILED"))
            .unionByName(as_state(denied, "ROBOTS_DENIED"))
            .unionByName(new_front)
        )

        # ---- seen / bloom updates
        seen2 = seen.unionByName(new_front.select("url", "url_hash", "bucket"))
        bloom2 = self.bloom.merge(bloom_df, new_front.select("bucket", "url_hash"))

        # ---- extracted: new detail rows + raw-link fills from download pages
        extracted = self.t_extracted.read(spark, base_version)
        new_ext = details.select(
            "url",
            F.col("d.download_url").alias("download_url"),
            F.col("d.image_url").alias("image_url"),
            F.col("d.tags").alias("tags"),
            F.lit("").alias("raw_download_link"),
        )
        raw_upd = downloads.select(
            F.col("parent_url").alias("url"), F.col("raw_link").alias("_new_raw")
        )
        ext_all = (
            extracted.select(
                "url", "download_url", "image_url", "tags", "raw_download_link"
            )
            .unionByName(new_ext)
            .join(raw_upd, "url", "left")
            .withColumn(
                "raw_download_link",
                F.coalesce(F.col("_new_raw"), F.col("raw_download_link")),
            )
            .drop("_new_raw")
            .withColumn(
                "extracted_text",
                F.concat_ws(
                    FIELD_SEP,
                    "download_url",
                    "image_url",
                    "tags",
                    "raw_download_link",
                ),
            )
        )

        # ---- trace append (dequeue order is the explicit rank, never
        # physical row order)
        trace = self.t_trace.read(spark, base_version)
        prev_total = trace.count()
        trace2 = trace.unionByName(
            dequeued.select(
                (F.lit(prev_total) + F.col("dequeue_rank") - 1).alias("dequeue_seq"),
                F.lit(r).alias("round"),
                "url",
                "host",
                "kind",
            )
        )

        # ---- lineage / metrics (per-partition fetch + dedup counters)
        n_fetched = fetched.count()
        part_rows = (
            fetched.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .select(
                F.lit(r).alias("round"),
                F.lit("fetch_partition_rows").alias("metric"),
                F.col("pid").cast("string").alias("key"),
                F.col("count").alias("value"),
            )
        )
        scalars = [
            ("dequeued", n_deq),
            ("fetched", n_fetched),
            ("failed", n_deq - n_fetched),
            ("robots_denied", n_denied),
            ("outlinks", n_candidates),
            ("dup_dropped_in_batch", n_candidates - n_unique_cand),
            ("dup_dropped_seen", n_unique_cand - n_new),
            ("new_urls", n_new),
        ]
        lineage = self.t_lineage.read(spark, base_version)
        lineage2 = lineage.unionByName(
            self.spark.createDataFrame(
                [(r, m, "total", int(v)) for m, v in scalars], LINEAGE_SCHEMA
            )
        ).unionByName(part_rows)

        # ---- atomic commits; the frontier commit (last) publishes the round.
        v = base_version + 1
        meta = {"round": r, **{m: int(x) for m, x in scalars}}
        self.t_trace.commit(trace2, meta, version=v)
        self.t_lineage.commit(lineage2, meta, version=v)
        self.t_extracted.commit(ext_all, meta, version=v)
        self.t_seen.commit(seen2, meta, version=v)
        self.t_bloom.commit(bloom2, meta, version=v)
        self.t_frontier.commit(frontier2, meta, version=v)

        for df in (dequeued, fetched, details, candidates, new_front, denied, failed):
            df.unpersist()
        return True

    # -- resume -----------------------------------------------------------------
    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        workdir: str,
        pages: DataFrame,
        robots: DataFrame | None = None,
        config: CrawlConfig | None = None,
        version: int | None = None,
    ) -> "CrawlEngine":
        """Attach to an existing crawl at ``version`` (default: latest
        consistent). Mid-round crashes leave trailing tables one version
        ahead — the frontier's version is the consistency point."""
        eng = cls(spark, workdir, pages, robots, config)
        target = version if version is not None else eng.t_frontier.current_version()
        if target is None:
            raise RuntimeError(f"nothing to resume in {workdir}")
        eng.rollback(target)
        return eng
