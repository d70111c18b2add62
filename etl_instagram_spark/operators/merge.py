"""Key-based merge/upsert operators — the engine's core write primitive.

The reference upserts 4 of its 6 entities with
``findOneAndUpdate({key}, doc, {upsert: true})``
(reference: module/instagram/posts-from-hashtags.js:346-348 for posts,
:314-316 for users; module/instagram/extend-followers.js:126-128 for
followers; module/news/elimparcial.js:114-116 for news), deletes followers
whose profile page is gone (extend-followers.js:116), and existence-checks
before expensive enrichment (posts-from-hashtags.js:295-300).

Spark-first re-expression (no lakehouse format in this environment, so
MERGE INTO is emulated relationally and the physical table is a parquet
directory swapped atomically):

- ``upsert``          : replace-if-exists / insert-if-new, latest-wins.
                        ``existing ⟕anti incoming ∪ incoming`` — one shuffle
                        on the key; AQE coalesces output partitions.
- ``upsert_coalesce`` : partial-field update (follower enrichment W3) —
                        per-column ``coalesce(new, old)`` preserving old
                        fields the batch didn't carry.
- ``delete_by_key``   : tombstone delete (W7) — left-anti against keys.
- ``anti_join_new``   : incremental-ingest gate (J3/J4/J5) — keep only rows
                        whose key is not yet in the table, BEFORE expensive
                        enrichment UDFs (Catalyst won't reorder through
                        non-deterministic UDFs, so lineage order is authored
                        here deliberately).
- ``dedup_latest``    : within-batch key dedup, latest-wins by order column.

Scale notes (100 TB): all operators are single-shuffle on the merge key.
For a large fact table the anti-join side should be key-pruned first
(partition the physical table by ingest date / source so the scan prunes);
the incoming batch is typically small → broadcast left-anti.
``MergeTable`` (below) persists these semantics as a manifest-based file
store with key-range file pruning; with Delta/Iceberg available, swap it
for MERGE INTO without touching callers.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _key_list(key: str | Sequence[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def dedup_latest(df: DataFrame, key: str | Sequence[str], order_by: str = "updated_at") -> DataFrame:
    """Keep one row per key: the latest by ``order_by``; rows tied on the
    order column are broken deterministically by a content hash of the
    full row, so repeated runs (and the idempotence property) pick the
    same winner regardless of partitioning.

    Mirrors Mongo's replace-by-key semantics when a batch carries the same
    key twice (last write wins, posts-from-hashtags.js:346-348).
    """
    keys = _key_list(key)
    tie_break = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    order_exprs = (
        [F.col(order_by).desc_nulls_last(), tie_break]
        if order_by in df.columns
        # batch doesn't carry the order column (partial-field updates):
        # the content hash alone still picks a deterministic winner
        else [tie_break]
    )
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def anti_join_new(incoming: DataFrame, existing: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """Rows of ``incoming`` whose key does not appear in ``existing``.

    The reference's existence-check dedup (J3: posts-from-hashtags.js:295-300,
    J4: :144-149, J5: elimparcial.js:104-110). ``existing`` only needs its key
    columns — select them so the scan prunes to the key column and the
    anti-join build side stays small (often broadcastable).
    """
    keys = _key_list(key)
    return incoming.join(existing.select(*keys).distinct(), on=keys, how="left_anti")


def upsert(
    existing: DataFrame,
    incoming: DataFrame,
    key: str | Sequence[str],
    order_by: str = "updated_at",
) -> DataFrame:
    """Replace-if-exists / insert-if-new (W1/W2/W4), latest-wins.

    Result has exactly one row per key: incoming rows win over existing rows
    with the same key; within the batch the latest ``order_by`` wins.
    Missing columns on either side are allowed (schema evolution) via
    unionByName(allowMissingColumns).
    """
    keys = _key_list(key)
    deduped = dedup_latest(incoming, keys, order_by=order_by)
    kept = existing.join(deduped.select(*keys).distinct(), on=keys, how="left_anti")
    return kept.unionByName(deduped, allowMissingColumns=True)


def upsert_coalesce(
    existing: DataFrame,
    incoming: DataFrame,
    key: str | Sequence[str],
    order_by: str = "updated_at",
) -> DataFrame:
    """Partial-field upsert (W3, extend-followers.js:126-128): for keys
    present in both, each non-key column becomes coalesce(new, old) so a
    batch that carries only some fields preserves the rest; new keys insert,
    unmatched old rows are kept unchanged.
    """
    keys = _key_list(key)
    deduped = dedup_latest(incoming, keys, order_by=order_by)
    new = deduped.alias("new")
    old = existing.alias("old")
    joined = old.join(new, on=keys, how="full_outer")
    all_cols = list(dict.fromkeys(existing.columns + deduped.columns))
    exprs = [F.coalesce(f"old.{k}", f"new.{k}").alias(k) for k in keys]
    for c in all_cols:
        if c in keys:
            continue
        in_old = c in existing.columns
        in_new = c in deduped.columns
        if in_old and in_new:
            exprs.append(F.coalesce(F.col(f"new.{c}"), F.col(f"old.{c}")).alias(c))
        elif in_old:
            exprs.append(F.col(f"old.{c}").alias(c))
        else:
            exprs.append(F.col(f"new.{c}").alias(c))
    return joined.select(*exprs)


def delete_by_key(existing: DataFrame, tombstones: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """Tombstone delete (W7, extend-followers.js:116)."""
    keys = _key_list(key)
    return existing.join(tombstones.select(*keys).distinct(), on=keys, how="left_anti")


def table_changes(
    old_df: DataFrame, new_df: DataFrame, key: str | Sequence[str]
) -> DataFrame:
    """The diff core shared by :meth:`MergeTable.diff` and the streaming
    changelog (streaming/incremental.apply_changelog_batch): classify
    rows as insert/update/delete between two images of the same keyed
    table. Change detection hashes the columns COMMON to both frames
    (sha2 over to_json of a name-sorted struct) so schema evolution
    alone doesn't read as a mass update; output is the NEW frame's
    column set (deleted rows carry old values, added columns null) plus
    ``_change``; unchanged rows are filtered. One key-equi full-outer
    join — O(|old| + |new|), no driver state."""
    keys = _key_list(key)
    common = sorted(set(old_df.columns) & set(new_df.columns))
    if not set(keys) <= set(common):
        raise ValueError(f"frames do not share the table key {keys}")

    def fingerprint(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__fp", F.sha2(F.to_json(F.struct(*[F.col(c) for c in common])), 256)
        ).withColumn("__present", F.lit(1))

    o, n = fingerprint(old_df).alias("__o"), fingerprint(new_df).alias("__n")
    cond = None
    for k in keys:
        eq = F.col(f"__o.{k}").eqNullSafe(F.col(f"__n.{k}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("__o.__present").isNull(), F.lit("insert"))
        .when(F.col("__n.__present").isNull(), F.lit("delete"))
        .when(F.col("__o.__fp") != F.col("__n.__fp"), F.lit("update"))
    )  # unchanged → null → filtered
    image = [
        F.when(
            F.col("__n.__present").isNull(),
            F.col(f"__o.{c}") if c in old_df.columns else F.lit(None),
        )
        .otherwise(F.col(f"__n.{c}"))
        .alias(c)
        for c in new_df.columns
    ]
    return (
        joined.withColumn("_change", change)
        .filter(F.col("_change").isNotNull())
        .select(*image, "_change")
    )


def stamp_timestamps(
    incoming: DataFrame,
    existing: DataFrame | None,
    key: str | Sequence[str],
    batch_ts: datetime,
) -> DataFrame:
    """Maintain mongoose-style ``created_at``/``updated_at`` (F13,
    models.js:13/31/58/77): every incoming row gets updated_at=batch_ts;
    created_at is preserved from the existing row when the key already
    exists, else set to batch_ts. One broadcast-sized key join."""
    keys = _key_list(key)
    ts = F.lit(batch_ts).cast("timestamp")
    inc = incoming.withColumn("updated_at", ts).withColumn("created_at", ts)
    if existing is not None and "created_at" in existing.columns:
        old = existing.select(*keys, F.col("created_at").alias("__created0"))
        inc = (
            inc.join(old, on=keys, how="left")
            .withColumn("created_at", F.coalesce("__created0", "created_at"))
            .drop("__created0")
        )
    return inc


class MergeTable:
    """A manifest-based parquet table with atomic, incremental
    upsert/delete/append — a lakehouse-lite MERGE target.

    Layout::

        path/_CURRENT                    # name of the current manifest
        path/manifests/snap-<seq>-<id>.json
        path/data/<commit-id>/part-*.parquet

    A snapshot is a JSON manifest listing immutable data files plus
    per-file min/max statistics of the first key column (read from the
    parquet footers). Commits write ONLY new data files and a new
    manifest, then atomically retarget the pointer — readers never see
    partial writes; a failed job leaves the previous snapshot intact
    (SURVEY §7 'upsert without a lakehouse format').

    Scale behavior (the round-1 full-rewrite fix):
    - ``append`` writes O(batch) files and re-lists the old ones — never
      reads the table (W6 rates time-series stays O(batch) per tick).
    - ``upsert``/``delete`` rewrite ONLY files whose key range actually
      CONTAINS a batch key (per-file probe via a broadcast range-join of
      file stats against the deduped batch keys — not a single batch
      [min,max] envelope, which a scattered-key batch would stretch over
      the whole table); non-hit files are carried forward by reference.
      Data files are written ``repartitionByRange(key)`` so file
      key-ranges are disjoint and the probe prunes aggressively (the
      file-skipping analogue of partitioned MERGE INTO). The batch is
      localCheckpoint-ed first so the probe and the write see the same
      rows even for non-deterministic sources.
    - With Delta/Iceberg available, swap this class for MERGE INTO
      without touching callers.
    """

    def __init__(self, spark: SparkSession, path: str, key: str | Sequence[str], order_by: str = "updated_at"):
        self.spark = spark
        self.path = path
        self.keys = _key_list(key)
        self.order_by = order_by
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # -- pointer / manifest plumbing ---------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_snapshot(self) -> str | None:
        try:
            with open(self._pointer, encoding="utf-8") as f:
                name = f.read().strip()
        except FileNotFoundError:
            return None
        return os.path.join(self.path, "manifests", name) if name else None

    def list_snapshots(self) -> list[str]:
        mdir = os.path.join(self.path, "manifests")
        return sorted(f[:-5] for f in os.listdir(mdir) if f.startswith("snap-") and f.endswith(".json"))

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    def _manifest_files(self) -> list[dict]:
        snap = self.current_snapshot()
        if snap is None:
            return []
        with open(snap, encoding="utf-8") as f:
            return json.load(f)["files"]

    def read(self, snapshot: str | None = None) -> DataFrame:
        """Read the current snapshot, or a named one from
        ``list_snapshots()`` — manifest-based time travel: old manifests
        keep referencing their (immutable) data files until vacuum."""
        if snapshot is None:
            files = self._manifest_files()
        else:
            mpath = os.path.join(self.path, "manifests", snapshot + ".json")
            with open(mpath, encoding="utf-8") as f:
                files = json.load(f)["files"]
        if not files:
            raise FileNotFoundError(f"MergeTable at {self.path} has no snapshot yet")
        paths = [os.path.join(self.path, f["path"]) for f in files]
        # mergeSchema: carried-forward files may predate schema evolution
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        # stable column-order contract: keys first (declaration order),
        # then the rest sorted by name. mergeSchema's output order
        # depends on which file the merge visits first, so an upsert
        # that rewrites overlapping files could FLIP the order between
        # two reads (surfaced as a once-in-a-while positional-tuple
        # mismatch in the streaming replay tests) — columns are
        # name-addressed everywhere, but the order a reader sees must
        # still be a function of the table, not of file history
        keyed = [k for k in self.keys if k in df.columns]
        rest = sorted(c for c in df.columns if c not in set(keyed))
        return df.select(*keyed, *rest)

    # -- data-file writing with key statistics -----------------------------
    @staticmethod
    def _ser(v):
        if isinstance(v, datetime):
            return {"t": "dt", "v": v.isoformat()}
        if isinstance(v, (int, float, str)) or v is None:
            return {"t": "raw", "v": v}
        return {"t": "str", "v": str(v)}

    @staticmethod
    def _deser(d):
        if d is None:
            return None
        if d["t"] == "dt":
            return datetime.fromisoformat(d["v"])
        return d["v"]

    def _write_data(self, df: DataFrame) -> list[dict]:
        """Write df as parquet files range-partitioned by the first key
        (disjoint per-file key ranges → pruning), return file entries
        with footer min/max stats."""
        import pyarrow.parquet as pq

        commit_id = uuid.uuid4().hex[:12]
        rel_dir = os.path.join("data", commit_id)
        out_dir = os.path.join(self.path, rel_dir)
        key = self.keys[0]
        if key in df.columns:
            # pin before the range write (r20, guide §1.2/§5):
            # repartitionByRange's range-bounds SAMPLING pass is a
            # separate job over the child, so an unpinned frame paid the
            # whole merge/dedup lineage TWICE per commit (once for the
            # sampler, once for the shuffle write) — and every commit
            # action re-analyzed the full wide merge plan. The lazy
            # local checkpoint truncates the plan at call time (one
            # analysis) and the sampler's pass doubles as the one
            # required materialization; the write then reads the pinned
            # blocks. At scale this trades a recompute of a shuffle
            # join for one local-disk round-trip of the same bytes the
            # write shuffle spills anyway — the standard
            # materialize-vs-recompute win for multi-consumer lineages.
            df = df.localCheckpoint(eager=False).repartitionByRange(
                F.col(key)
            )
        df.write.mode("overwrite").parquet(out_dir)

        entries: list[dict] = []
        for name in sorted(os.listdir(out_dir)):
            if not name.endswith(".parquet"):
                continue
            fpath = os.path.join(out_dir, name)
            lo = hi = None
            try:
                md = pq.ParquetFile(fpath).metadata
                # match the full dotted PATH, not the leaf name: a nested
                # leaf can share the key's name (user.id, location.id in
                # the posts table) and would shadow the top-level key in
                # a name-keyed map — None stats at best, and at worst a
                # WRONG file range built from the nested column's values,
                # which silently breaks pruning-based upsert/anti-join
                idx = next(
                    (
                        i
                        for i in range(md.num_columns)
                        if md.schema.column(i).path == key
                    ),
                    None,
                )
                if idx is not None:
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            lo = hi = None
                            break
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
            except Exception:  # noqa: BLE001 — stats are an optimization only
                lo = hi = None
            entries.append(
                {
                    "path": os.path.join(rel_dir, name),
                    "min_key": self._ser(lo),
                    "max_key": self._ser(hi),
                }
            )
        return entries

    def _commit_manifest(self, files: list[dict]) -> None:
        existing = self.list_snapshots()
        seq = 1 + max((int(s.split("-")[1]) for s in existing), default=-1)
        snap_name = f"snap-{seq:08d}-{uuid.uuid4().hex[:8]}"
        mpath = os.path.join(self.path, "manifests", snap_name + ".json")
        with open(mpath, "w", encoding="utf-8") as f:
            json.dump({"files": files}, f)
        # atomic pointer swap: write tmp file then os.replace (POSIX-atomic)
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(snap_name + ".json")
        os.replace(tmp, self._pointer)

    def _split_overlap(self, incoming: DataFrame) -> tuple[list[dict], list[dict]]:
        """Partition current files into (overlapping, carried) by testing
        each file's [min, max] key range against the batch's ACTUAL key
        set — not a single [batch-min, batch-max] envelope. A scattered-key
        batch (hash-like ids, the posts table's real key shape) spans the
        whole table's envelope while touching only a few files; the
        envelope test would degrade every upsert to a full-table rewrite.

        Mechanics: broadcast the manifest's file ranges (small — O(#files))
        to the deduped batch keys, range-join, and collect only the HIT
        file indices. One job over the batch keys, O(#files) driver memory;
        the batch keys themselves never reach the driver. Files without
        stats — or with stats the key type can't round-trip — are
        conservatively treated as overlapping (correct, just unpruned)."""
        key = self.keys[0]
        files = self._manifest_files()
        overlapping_idx: set[int] = set()
        ranged: list[tuple[int, object, object]] = []
        for i, f in enumerate(files):
            fmin, fmax = self._deser(f["min_key"]), self._deser(f["max_key"])
            if fmin is None or fmax is None:
                overlapping_idx.add(i)
            else:
                ranged.append((i, fmin, fmax))
        if ranged:
            try:
                kt = incoming.schema[key].dataType
                ranges_df = self.spark.createDataFrame(
                    ranged,
                    T.StructType(
                        [
                            T.StructField("__fidx", T.IntegerType()),
                            T.StructField("__lo", kt),
                            T.StructField("__hi", kt),
                        ]
                    ),
                )
                hits = (
                    incoming.select(F.col(key).alias("__k"))
                    .where(F.col("__k").isNotNull())
                    .distinct()
                    .join(
                        F.broadcast(ranges_df),
                        (F.col("__k") >= F.col("__lo")) & (F.col("__k") <= F.col("__hi")),
                    )
                    .select("__fidx")
                    .distinct()
                    .collect()
                )
                overlapping_idx |= {r["__fidx"] for r in hits}
            except Exception:  # noqa: BLE001 — pruning is an optimization only
                overlapping_idx |= {i for i, _, _ in ranged}
        overlapping = [f for i, f in enumerate(files) if i in overlapping_idx]
        carried = [f for i, f in enumerate(files) if i not in overlapping_idx]
        return overlapping, carried

    def _read_files(self, files: list[dict]) -> DataFrame:
        paths = [os.path.join(self.path, f["path"]) for f in files]
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def read_overlapping(self, keys: DataFrame) -> DataFrame:
        """Read ONLY the files whose key range contains at least one key
        from ``keys`` — the read-side analogue of the upsert/delete
        probe. Sufficient for any key-EQUALITY lookup of those keys
        (existence anti-joins, point lookups): by the per-file min/max
        invariant, a probed key cannot live in an unreturned file. An
        ingest tick's "which of these ids already exist" check touches
        O(overlapping files) instead of scanning the whole table — the
        difference between O(batch) and O(table) ticks at scale. Files
        without usable stats are conservatively included. Zero hits →
        an empty frame with the table's schema."""
        overlapping, _ = self._split_overlap(keys)
        if not overlapping:
            return self.read().limit(0)
        return self._read_files(overlapping)

    # -- mutations ----------------------------------------------------------
    def overwrite(self, df: DataFrame) -> None:
        self._commit_manifest(self._write_data(df))

    def append(self, df: DataFrame) -> None:
        """O(batch): writes only the new files; never reads the table."""
        self._commit_manifest(self._manifest_files() + self._write_data(df))

    def _merge_commit(
        self,
        incoming: DataFrame,
        merge_fn,
        batch_ts: datetime | None = None,
        assume_pinned: bool = False,
    ) -> None:
        # Pin the batch before probing: the overlap probe and the merge
        # write must see IDENTICAL rows — a non-deterministic source
        # re-evaluated per action could emit keys outside the probed set
        # and duplicate a key carried forward. localCheckpoint
        # materializes once and truncates the lineage, so re-evaluation
        # is impossible (not merely unlikely, as with persist()).
        # Lazy (r20): the first action — the overlap probe — triggers
        # the one materialization; eager=True paid the same work plus a
        # dedicated job barrier per commit (ticks are job-count-bound).
        # ``assume_pinned`` skips this when the CALLER already pinned
        # the batch (or a frame it deterministically derives from) —
        # a pipeline writing one materialized batch into several tables
        # would otherwise pay a full extra checkpoint per table.
        if not assume_pinned:
            incoming = incoming.localCheckpoint(eager=False)
        overlapping, carried = self._split_overlap(incoming)
        if overlapping:
            old = self._read_files(overlapping)
            if batch_ts is not None:
                # created_at preservation only needs rows whose key is in
                # the batch — and those live in overlapping files only, so
                # the stamp join never scans carried files
                incoming = stamp_timestamps(incoming, old, self.keys, batch_ts)
            merged = merge_fn(old, incoming)
        else:
            if batch_ts is not None:
                incoming = stamp_timestamps(incoming, None, self.keys, batch_ts)
            merged = dedup_latest(incoming, self.keys, self.order_by)
        self._commit_manifest(carried + self._write_data(merged))

    def upsert(
        self,
        incoming: DataFrame,
        batch_ts: datetime | None = None,
        assume_pinned: bool = False,
    ) -> None:
        """Idempotent: applying the same batch twice == once. Pass
        ``batch_ts`` to maintain created_at/updated_at (F13).
        ``assume_pinned=True`` is the caller's PROMISE that ``incoming``
        is a deterministic derivation of an already-materialized frame
        (localCheckpoint'd or fully-cached): the internal re-evaluation
        pin is skipped, saving a full checkpoint write per table when
        one batch fans out into several upserts. Passing an unpinned
        non-deterministic frame here re-opens the probe/write
        duplicate-key hazard the pin exists to close — don't."""
        if not self.exists():
            if batch_ts is not None:
                incoming = stamp_timestamps(incoming, None, self.keys, batch_ts)
            self._commit_manifest(self._write_data(dedup_latest(incoming, self.keys, self.order_by)))
            return
        self._merge_commit(
            incoming,
            lambda old, inc: upsert(old, inc, self.keys, self.order_by),
            batch_ts=batch_ts,
            assume_pinned=assume_pinned,
        )

    def upsert_coalesce(self, incoming: DataFrame) -> None:
        if not self.exists():
            self._commit_manifest(self._write_data(dedup_latest(incoming, self.keys, self.order_by)))
            return
        self._merge_commit(
            incoming, lambda old, inc: upsert_coalesce(old, inc, self.keys, self.order_by)
        )

    def delete(self, tombstones: DataFrame) -> None:
        if not self.exists():
            return
        # same pinning as _merge_commit (lazy: the probe materializes it)
        tombstones = tombstones.localCheckpoint(eager=False)
        overlapping, carried = self._split_overlap(tombstones)
        if overlapping:
            remaining = delete_by_key(self._read_files(overlapping), tombstones, self.keys)
            self._commit_manifest(carried + self._write_data(remaining))

    def diff(self, since: str, until: str | None = None) -> DataFrame:
        """CDC-style snapshot diff: the rows inserted, updated, or
        deleted between snapshot ``since`` and ``until`` (default: the
        current snapshot), as a DataFrame in the NEWER snapshot's column
        set plus a ``_change`` column ('insert' | 'update' | 'delete').
        Deleted rows carry their OLD values (columns the new schema
        added are null for them); unchanged rows are filtered out.

        Change detection hashes the columns COMMON to both snapshots
        (sha2 over to_json of a name-sorted struct), so schema evolution
        alone does not mark every row updated — a row counts as updated
        only when a shared column's value changed. Plan shape: one
        key-equi full-outer join (sort-merge on the table key, the same
        shuffle the upsert itself pays) — O(|old| + |new|), no driver
        state, safe at any table size.

        The downstream-sync primitive (reference analogue: none — the
        reference overwrites collections blindly; engines like Delta
        expose this as CHANGE DATA FEED)."""
        old_df = self.read(since)
        new_df = self.read(until) if until else self.read()
        return table_changes(old_df, new_df, self.keys)

    def compact(self, target_files: int | None = None) -> None:
        """Rewrite the current snapshot into ``target_files`` files (the
        small-files fix for append-heavy tables: many O(batch) appends →
        many tiny files → scan/task overhead). One job, one new manifest;
        old files are GC'd by the next vacuum."""
        if not self.exists():
            return
        df = self.read()
        if target_files is not None:
            df = df.coalesce(target_files)
        self._commit_manifest(self._write_data(df))

    def vacuum(self, keep: int = 2) -> None:
        """Drop all but the newest ``keep`` manifests (never the current),
        then garbage-collect data files no remaining manifest references."""
        current = os.path.basename(self.current_snapshot() or "")
        snaps = self.list_snapshots()
        doomed = [s for s in (snaps[:-keep] if keep else snaps) if s + ".json" != current]
        for snap in doomed:
            os.remove(os.path.join(self.path, "manifests", snap + ".json"))
        referenced: set[str] = set()
        for snap in self.list_snapshots():
            with open(os.path.join(self.path, "manifests", snap + ".json"), encoding="utf-8") as f:
                referenced |= {e["path"] for e in json.load(f)["files"]}
        data_dir = os.path.join(self.path, "data")
        for commit in os.listdir(data_dir):
            cdir = os.path.join(data_dir, commit)
            for name in os.listdir(cdir):
                rel = os.path.join("data", commit, name)
                if name.endswith(".parquet") and rel not in referenced:
                    os.remove(os.path.join(cdir, name))
            if not any(n.endswith(".parquet") for n in os.listdir(cdir)):
                shutil.rmtree(cdir, ignore_errors=True)
