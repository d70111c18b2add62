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
the incoming batch is typically small → broadcast left-anti. ``upsert``
rewrites only the union's partitions when the physical layout is
partitioned; with Delta/Iceberg available, swap `MergeTable.write` for
MERGE INTO without touching callers.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


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
    w = Window.partitionBy(*keys).orderBy(F.col(order_by).desc_nulls_last(), tie_break)
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
    """A parquet-backed table with atomic upsert/delete/append.

    Plain-parquet emulation of a lakehouse MERGE target: every mutation
    writes a fresh snapshot directory then atomically retargets a pointer
    file, so readers never see partial writes and a failed job leaves the
    previous snapshot intact (SURVEY §7 'upsert without a lakehouse format').
    Snapshots also give time-travel-lite (list_snapshots).
    """

    def __init__(self, spark: SparkSession, path: str, key: str | Sequence[str], order_by: str = "updated_at"):
        self.spark = spark
        self.path = path
        self.keys = _key_list(key)
        self.order_by = order_by
        os.makedirs(path, exist_ok=True)

    # -- snapshot plumbing -------------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_snapshot(self) -> str | None:
        try:
            with open(self._pointer, encoding="utf-8") as f:
                name = f.read().strip()
        except FileNotFoundError:
            return None
        return os.path.join(self.path, name) if name else None

    def list_snapshots(self) -> list[str]:
        return sorted(d for d in os.listdir(self.path) if d.startswith("snap-"))

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    def read(self) -> DataFrame:
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"MergeTable at {self.path} has no snapshot yet")
        return self.spark.read.parquet(snap)

    def _commit(self, df: DataFrame) -> None:
        # monotonic sequence prefix so list_snapshots() sorts oldest→newest
        # lexically (uuid suffix keeps names collision-free under retry);
        # max(existing)+1, not len(), so vacuum can't make sequences regress
        existing = self.list_snapshots()
        seq = 1 + max((int(s.split("-")[1]) for s in existing), default=-1)
        snap_name = f"snap-{seq:08d}-{uuid.uuid4().hex[:8]}"
        snap_path = os.path.join(self.path, snap_name)
        df.write.mode("overwrite").parquet(snap_path)
        # atomic pointer swap: write tmp file then os.replace (POSIX-atomic)
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(snap_name)
        os.replace(tmp, self._pointer)

    def vacuum(self, keep: int = 2) -> None:
        """Drop all but the newest ``keep`` snapshots (never the current)."""
        current = os.path.basename(self.current_snapshot() or "")
        snaps = self.list_snapshots()
        for snap in snaps[:-keep] if keep else snaps:
            if snap != current:
                shutil.rmtree(os.path.join(self.path, snap), ignore_errors=True)

    # -- mutations ----------------------------------------------------------
    def overwrite(self, df: DataFrame) -> None:
        self._commit(df)

    def append(self, df: DataFrame) -> None:
        if self.exists():
            self._commit(self.read().unionByName(df, allowMissingColumns=True))
        else:
            self._commit(df)

    def upsert(self, incoming: DataFrame, batch_ts: datetime | None = None) -> None:
        """Idempotent: applying the same batch twice == once. Pass
        ``batch_ts`` to maintain created_at/updated_at (F13)."""
        if self.exists():
            existing = self.read()
            if batch_ts is not None:
                incoming = stamp_timestamps(incoming, existing, self.keys, batch_ts)
            self._commit(upsert(existing, incoming, self.keys, self.order_by))
        else:
            if batch_ts is not None:
                incoming = stamp_timestamps(incoming, None, self.keys, batch_ts)
            self._commit(dedup_latest(incoming, self.keys, self.order_by))

    def upsert_coalesce(self, incoming: DataFrame) -> None:
        if self.exists():
            self._commit(upsert_coalesce(self.read(), incoming, self.keys, self.order_by))
        else:
            self._commit(dedup_latest(incoming, self.keys, self.order_by))

    def delete(self, tombstones: DataFrame) -> None:
        if self.exists():
            self._commit(delete_by_key(self.read(), tombstones, self.keys))
