"""Immutable index segments + ledger (manifest) storage.

Maps the reference's sink + lifecycle surface onto a log-structured Parquet
layout (SURVEY.md §2.1):
  - ES bulk post -> atomic segment commit (S5,
    /root/reference/.../ElasticSearchBatchService.java:82-139)
  - offset commit-after-success -> ledger entry written only after the
    segment is fully on disk (S3, ConsumerWorker.java:117-120)
  - create/delete index (S7/S8, ElasticSearchClientService.java:115-123)
  - segment model + merge tombstones (D5, Lucene semantics)

Layout (Iceberg-style: immutable data files + an append-only JSON manifest
log; swap the filesystem calls for an Iceberg catalog on a real cluster —
the TableIO seam of SURVEY.md §7.3):

    <root>/<index>/
      _meta.json                    # index config snapshot
      _aliases.json                 # alias -> {filter_col, filter_val} (S9-S11)
      segments/<segment_id>/
        postings/   docs/           # parquet (postings sorted by term)
        term_stats/                 # (term, df) per segment
        stats.json                  # n_docs, sum_dl, base_doc_id, ...
      ledger/<entry_id>.json        # {kind: ingest|merge, adds, removes,
                                    #  partition_offsets, metrics}
      quarantine/<batch>/           # failed-transform rows (S13)

Crash-consistency contract (reference E1 semantics): segment data is written
FIRST, the ledger entry LAST via atomic rename. A crash between the two
leaves an orphan segment directory that the deterministic re-run of the same
batch overwrites — re-runs neither lose nor duplicate documents.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.config import DEFAULT_CONFIG, IndexConfig

DOCS_SCHEMA_COLS = ["doc_id", "url", "doc_len", "warc_ts", "lang", "part_id", "row_offset"]


def _unescape_hive(suffix: str) -> str | None:
    """Hive partition-directory suffix -> true partition value. Spark
    escapes special chars (: / % = # etc.) as %XX and writes nulls under
    __HIVE_DEFAULT_PARTITION__; path-level listing must decode, or a value
    like "en:US" never matches its own directory."""
    if suffix == "__HIVE_DEFAULT_PARTITION__":
        return None
    from urllib.parse import unquote

    return unquote(suffix)


def _atomic_write_json(path: str, obj: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic on posix; maps to Iceberg commit on a cluster


@dataclass
class LedgerEntry:
    entry_id: int
    kind: str  # "ingest" | "merge" | "restore" (engine/snapshot.py)
    segments_added: list[str]
    segments_removed: list[str] = field(default_factory=list)
    # per-partition committed high-water marks (reference offset semantics)
    partition_offsets: dict = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)


class IndexStore:
    """One named index on disk. All mutation goes through ledger commits."""

    def __init__(self, root: str, name: str, cfg: IndexConfig = DEFAULT_CONFIG):
        self.root = root
        self.name = name
        self.cfg = cfg
        self.path = os.path.join(root, name)

    # -- lifecycle (S7/S8) --------------------------------------------------
    def create(self) -> "IndexStore":
        os.makedirs(os.path.join(self.path, "segments"), exist_ok=True)
        os.makedirs(os.path.join(self.path, "ledger"), exist_ok=True)
        # create is idempotent on an EXISTING store (reference createIndex
        # no-op guard): never rewrite _meta.json — a re-create with a
        # different cfg would silently switch the store's codec and make
        # every existing segment undecodable (review finding r04)
        if not os.path.exists(os.path.join(self.path, "_meta.json")):
            # the store's full settings contract is persisted (not just the
            # codec): jobs that operate on an EXISTING store (update_by_query,
            # rollover generations, reindex destinations) resolve their
            # IndexConfig from here via persisted_config() instead of
            # defaulting — a CLI invocation without flags must not silently
            # strip routing/_source/positions from a store that has them
            _atomic_write_json(
                os.path.join(self.path, "_meta.json"),
                {"name": self.name, "k1": self.cfg.k1, "b": self.cfg.b,
                 "block_size": self.cfg.block_size, "codec": self.cfg.codec,
                 "routing_col": self.cfg.routing_col,
                 "store_positions": self.cfg.store_positions,
                 "store_source": self.cfg.store_source},
            )
        if not os.path.exists(os.path.join(self.path, "_aliases.json")):
            _atomic_write_json(os.path.join(self.path, "_aliases.json"), {})
        return self

    def create_and_alias(
        self, alias: str, filter_col: str | None = None, filter_val=None,
        routing: str | None = None,
    ) -> "IndexStore":
        """One-call create-index-then-alias, the reference's
        createIndexAndAlias (ElasticSearchClientService.java:125-128).
        Idempotent like create(); the alias (optionally filtered/routed,
        S10/S11) points at this index when the call returns."""
        self.create()
        self.add_alias(alias, filter_col=filter_col, filter_val=filter_val,
                       routing=routing)
        return self

    def delete(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_meta.json"))

    @property
    def codec(self) -> str:
        """Posting-block codec this store was created with ("varint" for
        stores predating the codec field). Every segment of a store shares
        one codec; ingest/merge/query all resolve it from here."""
        mp = os.path.join(self.path, "_meta.json")
        try:
            with open(mp) as f:
                return json.load(f).get("codec", "varint")
        except FileNotFoundError:
            return "varint"

    def persisted_config(self) -> IndexConfig:
        """The IndexConfig this store was CREATED with, rehydrated from
        _meta.json — the authoritative settings contract for jobs that
        mutate an existing store (update_by_query, rollover generations).
        Fields a pre-existing store's meta lacks fall back to defaults,
        matching how those stores actually behave."""
        mp = os.path.join(self.path, "_meta.json")
        try:
            with open(mp) as f:
                meta = json.load(f)
        except FileNotFoundError:
            return DEFAULT_CONFIG
        from dataclasses import replace

        return replace(
            DEFAULT_CONFIG,
            k1=float(meta.get("k1", DEFAULT_CONFIG.k1)),
            b=float(meta.get("b", DEFAULT_CONFIG.b)),
            block_size=int(meta.get("block_size", DEFAULT_CONFIG.block_size)),
            codec=meta.get("codec", "varint"),
            routing_col=meta.get("routing_col"),
            store_positions=bool(meta.get("store_positions", False)),
            store_source=bool(meta.get("store_source", False)),
        )

    # -- ledger ---------------------------------------------------------------
    def ledger_entries(self) -> list[LedgerEntry]:
        d = os.path.join(self.path, "ledger")
        if not os.path.isdir(d):
            return []
        out = []
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    out.append(LedgerEntry(**json.load(f)))
        return sorted(out, key=lambda e: e.entry_id)

    def next_entry_id(self) -> int:
        es = self.ledger_entries()
        return (es[-1].entry_id + 1) if es else 0

    def commit(self, entry: LedgerEntry) -> None:
        path = os.path.join(self.path, "ledger", f"{entry.entry_id:010d}.json")
        if os.path.exists(path):
            raise RuntimeError(f"ledger entry {entry.entry_id} already committed")
        _atomic_write_json(path, asdict(entry))

    def live_segments(self) -> list[str]:
        live: list[str] = []
        for e in self.ledger_entries():
            live = [s for s in live if s not in set(e.segments_removed)]
            live.extend(e.segments_added)
        return live

    def committed_offsets(self) -> dict[int, int]:
        """Per-partition high-water marks folded over ingest entries (S2 RESTART)."""
        hwm: dict[int, int] = {}
        for e in self.ledger_entries():
            for p, o in e.partition_offsets.items():
                p = int(p)
                hwm[p] = max(hwm.get(p, -1), int(o))
        return hwm

    def has_batch(self, batch_id: int) -> bool:
        return any(
            e.metrics.get("batch_id") == batch_id
            for e in self.ledger_entries()
            if e.kind == "ingest"
        )

    # -- delete_by_query tombstones (engine/updates.py) -----------------------
    def active_delete_entries(self) -> list[LedgerEntry]:
        """Delete entries that can still match a live doc. A delete applies
        only to docs that existed when it committed; doc ids are globally
        monotonic (next_doc_id_base), so once every live segment was CREATED
        after the delete entry (merges rewrite survivors under fresh ids),
        the entry is inert and read paths skip its anti-join entirely."""
        entries = self.ledger_entries()
        created = {}
        for e in entries:
            for s in e.segments_added:
                created[s] = e.entry_id
        live = self.live_segments()
        if not live:
            return []
        oldest = min(created[s] for s in live)
        return [e for e in entries if e.kind == "delete" and e.entry_id > oldest]

    def has_deletes(self) -> bool:
        return bool(self.active_delete_entries())

    def deleted_ids(self, spark: SparkSession):
        """(doc_id) relation of delete_by_query tombstones, or None when no
        active delete entries exist (the common, zero-cost path). Bounded by
        the delete rate between merges — the Lucene live-docs-bitset analog."""
        entries = self.active_delete_entries()
        if not entries:
            return None
        paths = [
            os.path.join(self.path, e.metrics["deletes_dir"]) for e in entries
        ]
        return self._read_parquet(spark, *paths).select("doc_id").distinct()

    # -- segments -------------------------------------------------------------
    def segment_path(self, segment_id: str) -> str:
        return os.path.join(self.path, "segments", segment_id)

    def write_segment(
        self,
        segment_id: str,
        postings: DataFrame,
        docs: DataFrame,
        stats: dict,
        ranged: bool = False,
        term_metrics: dict | None = None,
    ) -> DataFrame:
        """Write (or deterministically overwrite) one immutable segment.

        The expensive postings plan executes exactly ONCE: term_stats (and
        any caller-side metrics) are derived from the parquet read-back, not
        by re-running the build. Returns the read-back postings DataFrame.

        `ranged=False` (micro-ingest segments): blocks are written straight
        out of the builder with only a PARTITION-LOCAL sort by
        (term, min_doc) — a narrow transformation, so the build executes
        once with no persist/count materialization job and no
        repartitionByRange sampling job (two fewer Spark jobs per
        micro-batch; per-batch fixed job count is what bounds loop
        throughput at 10^12-doc scale). Term-sorted files still give
        `WHERE term IN (...)` row-group skipping within every file.

        `ranged=True` (merge output — the big long-lived segment): the
        global range layout — each term's blocks collapsed to one contiguous
        file range — is GUARANTEED BY THE CALLER: `build_posting_blocks`
        already range-exchanged the long-form postings on
        (routing?, term, doc_id) before encoding, so its block output is
        globally range-partitioned and intra-partition ordered. The flag is
        a contract marker, not a shuffle: re-ranging the blocks here would
        repeat a sampling job + a full block shuffle for a layout the input
        already has (ADVICE r03). Routed segments (D9) are additionally
        hive-partitioned by routing: a routed query's scan touches ONLY
        that routing value's files.

        term_stats: persisted ONLY for ranged (long-lived merge) segments —
        a micro-ingest segment lives until the next tiered merge, and its
        (term, df) table is exactly derivable from the block rows' `n`
        column (term_stats_df falls back to a column-pruned, term-pushed
        scan of the postings metadata for segments without the file), so
        writing it per micro-batch was a pure fixed-job tax (one
        agg+write action per batch).

        `term_metrics` (optional dict, filled in place): per-term-run df
        skew — max(n)/median(n) over the block rows, observe()d ON the
        postings write action itself, zero extra jobs. Block rows are
        per-(partition, term) runs, so for micro segments this reads as
        "df partials per doc-range partition"; max/median still flags
        hot-term skew (a hot term is hot in every partition).
        """
        sp = self.segment_path(segment_id)
        spark = postings.sparkSession
        routed = "routing" in postings.columns
        sort_cols = (["routing"] if routed else []) + ["term", "min_doc"]
        to_write = postings.sortWithinPartitions(*sort_cols)
        obs = None
        if term_metrics is not None:
            from pyspark.sql import Observation

            obs = Observation()
            to_write = to_write.observe(
                obs,
                F.max("n").alias("max_df"),
                F.expr("percentile_approx(n, 0.5)").alias("median_df"),
            )
        writer = to_write.write.mode("overwrite")
        if routed:
            writer = writer.partitionBy("routing")
        writer.parquet(os.path.join(sp, "postings"))
        if obs is not None:
            term_metrics.update(obs.get)
        written = self._read_parquet(spark, os.path.join(sp, "postings"))
        if ranged:
            from engine.postings import term_stats as _ts

            _ts(written).write.mode("overwrite").parquet(
                os.path.join(sp, "term_stats")
            )
        doc_writer = docs.write.mode("overwrite")
        if routed and "routing" in docs.columns:
            doc_writer = doc_writer.partitionBy("routing")
        doc_writer.parquet(os.path.join(sp, "docs"))
        _atomic_write_json(os.path.join(sp, "stats.json"), stats)
        return written

    @staticmethod
    def _read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
        """Parquet read that keeps hive partition values as strings (a
        routing value like "7" must not come back as an int column).

        mergeSchema=true so a store whose segments straddle a schema
        addition (e.g. the round-5 imp_tf/imp_dl impacts columns) reads as
        the UNION schema with nulls for old segments — with the default
        single-footer sampling, which segment "wins" would be arbitrary
        (new columns silently dropped, or present-with-nulls), breaking the
        reader's documented legacy fallback."""
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        if "routing" in df.columns:
            df = df.withColumn("routing", F.col("routing").cast("string"))
        return df

    def segment_stats(self, segment_id: str) -> dict:
        with open(os.path.join(self.segment_path(segment_id), "stats.json")) as f:
            return json.load(f)

    def drop_segment_files(self, segment_id: str) -> None:
        shutil.rmtree(self.segment_path(segment_id), ignore_errors=True)

    # -- readers ----------------------------------------------------------------
    def _read_union(self, spark: SparkSession, sub: str, segments: list[str] | None,
                    routing: str | None = None):
        segs = self.live_segments() if segments is None else segments
        if not segs:
            raise ValueError(f"index {self.name} has no live segments")
        paths = [os.path.join(self.segment_path(s), sub) for s in segs]
        routed = os.path.isdir(paths[0]) and any(
            d.startswith("routing=") for d in os.listdir(paths[0])
        )
        if not routed:
            return self._read_parquet(spark, *paths)
        if len(paths) == 1 and routing is None:
            return self._read_parquet(spark, *paths)
        # hive-partitioned segment dirs (routing=...) cannot share one
        # multi-root read (CONFLICTING_DIRECTORY_STRUCTURES). Group by
        # ROUTING VALUE instead: each value's per-segment leaf dirs share a
        # flat structure, so they read as ONE multi-root scan node. The
        # union is O(distinct routing values) — bounded by the num_shards
        # analog — never O(segments) (the round-2 scale-killer: one scan
        # node per segment until a merge collapsed the store).
        # `routing` prunes at PATH-LISTING time: only that value's leaf
        # directories are ever handed to the reader (stronger than a
        # partition filter — non-matching files are never even listed)
        # directory suffixes are HIVE-ESCAPED (%XX for : / % = etc.; nulls
        # land under __HIVE_DEFAULT_PARTITION__) — compare and label with
        # the DECODED value, or a routing value like "en:US" silently
        # matches nothing once a second segment exists (review finding r04)
        by_routing: dict[str | None, list[str]] = {}
        for p in paths:
            if not os.path.isdir(p):
                continue
            for d in os.listdir(p):
                if d.startswith("routing="):
                    rv = _unescape_hive(d[len("routing="):])
                    if routing is not None and rv != routing:
                        continue
                    by_routing.setdefault(rv, []).append(os.path.join(p, d))
        out = None
        for rv in sorted(by_routing, key=lambda v: (v is None, v)):
            # mergeSchema + allowMissingColumns: routing groups may straddle
            # a schema addition (segments written before/after the impacts
            # columns); missing columns become nulls, which the readers'
            # legacy fallbacks expect — without this the union raises or
            # silently drops the new columns depending on footer sampling
            df = spark.read.option("mergeSchema", "true").parquet(*by_routing[rv])
            df = df.withColumn("routing", F.lit(rv).cast("string"))
            out = df if out is None else out.unionByName(
                df, allowMissingColumns=True
            )
        if out is None:
            if routing is not None:
                # requested routing value holds no documents: empty result
                # with the store's schema (read any partition, keep no rows)
                empty = self._read_union(spark, sub, segs).where(F.lit(False))
                return empty.withColumn("routing", F.lit(routing).cast("string"))
            raise ValueError(f"index {self.name}: no routing partitions under {sub}")
        return out

    def postings(self, spark: SparkSession, segments: list[str] | None = None) -> DataFrame:
        return self._read_union(spark, "postings", segments)

    def docs(self, spark: SparkSession, segments: list[str] | None = None) -> DataFrame:
        return self._read_union(spark, "docs", segments)

    def positions(self, spark: SparkSession, segments: list[str] | None = None) -> DataFrame:
        """Positional-postings sidecar union (engine/positions.py); present
        only for segments built with IndexConfig(store_positions=True)."""
        return self._read_union(spark, "positions", segments)

    def term_stats_df(self, spark: SparkSession, segments: list[str] | None = None) -> DataFrame:
        """(term, df) summed over `segments`. Merged (long-lived) segments
        have a persisted term_stats table; micro-ingest segments don't
        (write_segment skips it — one less action per batch), so their df
        comes from the postings block metadata directly: a column-pruned
        scan of (term, n) — the heavy posting buffers are never read, and a
        caller's `term IN (...)` filter pushes down to row-group skipping."""
        segs = self.live_segments() if segments is None else segments
        have = [
            s for s in segs
            if os.path.isdir(os.path.join(self.segment_path(s), "term_stats"))
        ]
        lack = [s for s in segs if s not in set(have)]
        parts = []
        if have:
            parts.append(
                self._read_union(spark, "term_stats", have).select("term", "df")
            )
        if lack:
            parts.append(
                self._read_union(spark, "postings", lack).select(
                    "term", F.col("n").cast("long").alias("df")
                )
            )
        if not parts:
            raise ValueError(f"index {self.name} has no live segments")
        df = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        return df.groupBy("term").agg(F.sum("df").cast("long").alias("df"))

    def postings_routed(self, spark: SparkSession, routing: str,
                        segments: list[str] | None = None) -> DataFrame:
        """Postings pruned to one routing partition (D9): only routing=<val>
        directories are ever listed or read — the ES routed-shard-search
        data-locality analog. Single-segment stores keep the hive partition
        filter (PartitionFilters in the plan); multi-segment stores prune at
        path level inside _read_union."""
        segs = self.live_segments() if segments is None else segments
        if len(segs) == 1:
            return self.postings(spark, segs).where(
                F.col("routing") == F.lit(routing)
            )
        return self._read_union(spark, "postings", segs, routing=routing)

    def docs_routed(self, spark: SparkSession, routing: str,
                    segments: list[str] | None = None) -> DataFrame:
        segs = self.live_segments() if segments is None else segments
        if len(segs) == 1:
            return self.docs(spark, segs).where(F.col("routing") == F.lit(routing))
        return self._read_union(spark, "docs", segs, routing=routing)

    def routing_values(self, segments: list[str] | None = None) -> list[str]:
        segs = self.live_segments() if segments is None else segments
        vals: set[str] = set()
        for s in segs:
            vals.update((self.segment_stats(s).get("routing_stats") or {}).keys())
        return sorted(vals)

    def routing_global_stats(self, routing: str,
                             segments: list[str] | None = None) -> dict:
        """Per-routing-partition corpus stats (shard-local BM25 semantics: a
        routed ES query_then_fetch search scores with the routed shard's own
        stats — SURVEY.md §2.5 D9)."""
        segs = self.live_segments() if segments is None else segments
        n_docs, sum_dl = 0, 0
        for s in segs:
            rs = (self.segment_stats(s).get("routing_stats") or {}).get(routing)
            if rs:
                n_docs += rs["n_docs"]
                sum_dl += rs["sum_dl"]
        return {
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        }

    def global_stats(self, segments: list[str] | None = None) -> dict:
        segs = self.live_segments() if segments is None else segments
        n_docs, sum_dl = 0, 0
        for s in segs:
            st = self.segment_stats(s)
            n_docs += st["n_docs"]
            sum_dl += st["sum_dl"]
        return {
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
        }

    def next_doc_id_base(self) -> int:
        """Doc-id space high-water mark. Each segment records `doc_id_hwm`;
        merges carry forward the max of their inputs, so the live set alone
        determines the next base and ids are never reused."""
        base = 0
        for s in self.live_segments():
            st = self.segment_stats(s)
            hwm = st.get("doc_id_hwm", st["base_doc_id"] + st["n_docs"])
            base = max(base, hwm)
        return base

    # -- aliases (S9-S11) ---------------------------------------------------
    def _aliases(self) -> dict:
        with open(os.path.join(self.path, "_aliases.json")) as f:
            return json.load(f)

    def add_alias(
        self, alias: str, filter_col: str | None = None, filter_val=None,
        routing: str | None = None,
    ) -> None:
        """Plain alias (S10) or filtered alias (S11 — the reference's only
        literal query operator: termQuery(field, value) restriction), with an
        optional ROUTING value: the reference's
        addAliasWithRoutingToExistingIndex(index, alias, routing, field=value)
        (ElasticSearchClientService.java:135-138) attaches BOTH a routing
        value and a term filter to every request through the alias."""
        a = self._aliases()
        a[alias] = {
            "filter_col": filter_col, "filter_val": filter_val,
            "routing": routing,
        }
        _atomic_write_json(os.path.join(self.path, "_aliases.json"), a)

    def remove_alias(self, alias: str) -> None:
        """Detach an alias (the remove half of ES's atomic alias swap —
        _rollover moves an alias by remove-here + add-there)."""
        a = self._aliases()
        a.pop(alias, None)
        _atomic_write_json(os.path.join(self.path, "_aliases.json"), a)

    def alias_spec(self, alias: str) -> dict:
        spec = self._aliases()[alias]
        spec.setdefault("routing", None)  # aliases written before the slot
        return spec

    def docs_via_alias(self, spark: SparkSession, alias: str) -> DataFrame:
        """Alias read = view with the filter predicate; Catalyst pushes the
        equality down to the parquet scan (partition/row-group pruning). An
        alias routing value prunes the scan to that routing partition first."""
        spec = self.alias_spec(alias)
        df = (
            self.docs_routed(spark, spec["routing"])
            if spec["routing"] is not None
            else self.docs(spark)
        )
        if spec["filter_col"] is not None:
            df = df.where(F.col(spec["filter_col"]) == F.lit(spec["filter_val"]))
        return df
