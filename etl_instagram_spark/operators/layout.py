"""Physical-layout operators for scale: bucketing (co-located joins) and
salting (skew mitigation).

These are the 100-TB levers the query inventory's docstrings keep
pointing at (e.g. q3: "at cluster scale bucket both facts by orderkey"):

- ``write_bucketed`` / ``bucketed_join``: pre-shuffle both fact tables
  into the same bucket layout once at write time; every later equi-join
  on the bucket key runs with NO Exchange on either side (verified by
  ``assert_no_exchange`` in tests). This is the amortize-the-shuffle
  trade: one shuffle at ingest, zero per query.
- ``salted_join``: for a hot key that AQE's skew splitting can't save
  (e.g. one user with 10% of all events joined against a per-key dim),
  explode the dimension side K ways and spray the fact side uniformly —
  turns one straggler partition into K even ones.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str | Sequence[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) managed table. Joins/aggs on the
    bucket key read co-located buckets — no Exchange, and with sorted
    buckets no Sort either (SortMergeJoin reads pre-sorted runs)."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    spark = df.sparkSession
    # idempotent re-create: a dead session can leave the managed location
    # behind with no catalog entry, which saveAsTable refuses to reuse
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    leftover = os.path.join(warehouse, table_name.lower())
    if os.path.isdir(leftover):
        shutil.rmtree(leftover, ignore_errors=True)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=keys, how=how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the final physical plan (0 for a
    properly co-located bucketed join). Counts the ``(N) Exchange``
    detail headers — each node prints twice in ``explain("formatted")``
    (tree line + detail section), so a raw substring count double-counts."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return len(re.findall(r"^\(\d+\) Exchange", buf.getvalue(), flags=re.M))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate the (small) ``dim`` side
    ``salt_buckets`` ways and spray ``fact`` rows uniformly across the
    replicas, so a hot key occupies ``salt_buckets`` partitions instead
    of one straggler.

    Correctness: every fact row meets exactly the one dim replica whose
    salt matches its spray value — same result set as the unsalted join.
    That equivalence only holds for fact-preserving joins: under right/
    full-outer, a dim key whose fact matches carry OTHER salt values
    would emit its unmatched replicas as duplicate null-extended rows.
    """
    # normalize the way Spark's own join-type parser does (case-insensitive,
    # underscore-free) so every fact-preserving spelling is accepted
    if how.lower().replace("_", "") not in (
        "inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"
    ):
        raise ValueError(
            f"salted_join does not support how={how!r}: replicated dim "
            "rows would surface as duplicate unmatched rows under "
            "right/full outer joins"
        )
    salted_fact = fact.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_fact.join(salted_dim, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def write_partitioned(df: DataFrame, path: str, partition_by: str | Sequence[str]) -> None:
    """Hive-style partitioned parquet layout (the engine's standing
    advice for posts-by-source/date and rates-by-day): filters on the
    partition columns become directory pruning — the scan never lists,
    let alone reads, the other partitions."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def partition_filter_count(df: DataFrame) -> int:
    """Number of partition filters the scan applies (>=1 proves pruning)."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", buf.getvalue())
    if not m or not m.group(1).strip():
        return 0
    return m.group(1).count(",") + 1


def zorder_key(
    cols: Sequence["F.Column"],
    ranges: Sequence[tuple[float, float]],
    bits: int = 16,
) -> "F.Column":
    """Morton (Z-order) key: normalize each column to a ``bits``-wide
    integer grid over its [min, max] range, then interleave the bits.

    Files written in z-key order are clustered on EVERY participating
    column at once: each file's [min, max] footer stats are tight for
    all of them, so a predicate on ANY one column prunes files — the
    multi-column answer to single-column sort (which prunes perfectly on
    the sort key and not at all on the others). This is the same layout
    lever as Delta's OPTIMIZE ZORDER BY, expressed as a pure column
    function. NULL and constant columns land at grid 0.

    Pure codegen: per column a scale + floor, then bits×ncols shift/and/
    or terms — no UDF, no shuffle (the shuffle belongs to the writer's
    repartitionByRange).
    """
    if len(cols) != len(ranges):
        raise ValueError("cols and ranges must align")
    if not 1 <= bits <= 20:
        raise ValueError("bits must be in [1, 20]")
    n = len(cols)
    # the interleaved key must fit a signed long: Spark's shiftleft masks
    # the shift mod 64, so an overflowing config would silently wrap high
    # bits onto low positions (merging distinct cells), and bit 63 would
    # flip the sign and invert the range ordering
    if bits * n > 63:
        raise ValueError(
            f"bits*len(cols) must be <= 63 to fit a long Morton key; "
            f"got {bits}*{n} — lower bits (e.g. bits={63 // n})"
        )
    grid_max = (1 << bits) - 1
    grids = []
    for c, (mn, mx) in zip(cols, ranges):
        if mx <= mn:  # constant column: no clustering signal
            grids.append(F.lit(0).cast("long"))
            continue
        scaled = (c.cast("double") - mn) / (mx - mn) * grid_max
        g = F.floor(
            F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(grid_max)))
        )
        grids.append(F.coalesce(g, F.lit(0)).cast("long"))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, g in enumerate(grids):
            bit = F.shiftright(g, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write parquet clustered by the Z-order of ``cols``: one bounded
    agg for the per-column ranges, then range-repartition + sort on the
    z-key so each output file covers a contiguous z-range (a small
    hyper-rectangle of the column space). Point/range predicates on any
    of ``cols`` then skip most files via footer min/max stats.

    At 100 TB this runs once at compaction/release time (like bucketing,
    it amortizes one shuffle across every later scan); n_files scales to
    total-bytes / target-file-size.
    """
    ranges_row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).first()
    ranges = [(ranges_row[f"mn_{c}"], ranges_row[f"mx_{c}"]) for c in cols]
    if any(mn is None for mn, _ in ranges):  # empty input: plain write
        df.write.mode("overwrite").parquet(path)
        return
    z = zorder_key([F.col(c) for c in cols], ranges, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — works
    on any FS the cluster can reach (local, HDFS, object stores), not
    just the driver's local disk."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return int(fs.getContentSummary(p).getLength())


def write_sized_shards(
    df: DataFrame,
    path: str,
    target_mb: float = 256.0,
    order_col: str | None = None,
    salt: str = "shuffle",
    pilot_rows: int = 5_000,
) -> int:
    """Write ``df`` as parquet shards sized to ``target_mb`` each — the
    release/shard-prep writer for a training corpus, where downstream
    loaders want uniform ~N-MB files, not whatever task count the last
    shuffle happened to have.

    Measure, don't guess: a PILOT of ``pilot_rows`` rows is written
    first and its actual on-disk bytes (post-encoding, post-compression
    — the only honest estimator for text/binary columns) calibrate
    bytes-per-row; the shard count is then ``ceil(total_rows ·
    bytes_per_row / target)``. Costs one bounded pilot write + one
    count + the final shuffled write — release-time amortized, like
    bucketing/Z-ordering.

    With ``order_col`` set, rows are laid out in
    ``sampling.shuffle_key`` order (range-partitioned on the hashed
    key): every shard is a deterministic pseudo-random slice of the
    corpus and the global training order is reproducible with NO
    single-task sort bottleneck. Without it, a plain round-robin
    repartition balances bytes but fixes no order. Returns the shard
    count."""
    if target_mb <= 0:
        raise ValueError(f"target_mb must be > 0, got {target_mb}")
    spark = df.sparkSession
    total = df.count()
    if total == 0:
        df.write.mode("overwrite").parquet(path)
        return 1
    n_pilot = min(pilot_rows, total)
    pilot_path = path.rstrip("/") + "__pilot"
    pilot = df.limit(n_pilot) if order_col is None else (
        df.orderBy(order_col).limit(n_pilot)
    )
    pilot.write.mode("overwrite").parquet(pilot_path)
    try:
        bytes_per_row = _dir_bytes(spark, pilot_path) / n_pilot
    finally:
        try:  # best-effort cleanup through the same FS abstraction
            jvm = spark.sparkContext._jvm
            conf = spark.sparkContext._jsc.hadoopConfiguration()
            p = jvm.org.apache.hadoop.fs.Path(pilot_path)
            p.getFileSystem(conf).delete(p, True)
        except Exception:  # noqa: BLE001 — stray pilot dir is harmless
            pass
    n_files = max(1, -(-int(total * bytes_per_row) // int(target_mb * 1024 * 1024)))
    if order_col is not None:
        from etl_instagram_spark.operators.sampling import shuffle_key

        key = shuffle_key(F.col(order_col), salt)
        out = (
            df.withColumn("__sk", key)
            .repartitionByRange(n_files, "__sk")
            .sortWithinPartitions("__sk")
            .drop("__sk")
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(path)
    return n_files
