"""Sequence packing: group variable-length documents into fixed
token-budget training sequences — the last operator of every LLM
data pipeline (sample packing / example packing). Engine-native
extension; the reference has no notion of token budgets.

Two strategies, trading packing quality against plan purity:

- :func:`pack_cumsum` — pure window arithmetic (running token sum per
  shard, bin = exclusive-cumsum // budget). No UDF, whole-stage codegen,
  one shuffle on the shard key. Bins can overrun the budget by at most
  one document (the straddling doc joins the bin its cumsum starts in),
  which is the right trade when docs ≪ budget (the common case: 100-2k
  token docs into 8k-128k contexts) — downstream truncation handles the
  tail.
- :func:`pack_first_fit` — per-shard first-fit-decreasing via
  ``applyInPandas`` (Arrow-batched, never row-at-a-time): bins NEVER
  exceed the budget (oversized docs get a singleton bin flagged
  ``oversize``), at the cost of a Python stage. FFD is within 11/9·OPT+1
  of optimal bin count (public bin-packing bound), far better than
  cumsum when doc sizes approach the budget.

Scale design (100 TB): packing is embarrassingly parallel across
SHARDS — a deterministic hash of the id fans docs out to ``shards``
independent packing problems, so no single task sees more than
~rows/shards docs and the global result is deterministic regardless of
partitioning (within a shard, order is fixed by (tokens desc, id)).
Cross-shard packing waste is ≤ one underfull bin per shard — negligible
at any realistic shard count. Bin ids are (shard, bin_idx) pairs; the
caller concatenates doc ids per bin with the usual collect_list-under-
groupBy if the physical sequences are being materialized.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from etl_instagram_spark.functions.text import hash32


def _shard(id_col: str, shards: int):
    return (hash32(F.col(id_col).cast("string")) % shards).cast("int")


def pack_cumsum(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 64,
) -> DataFrame:
    """UDF-free packing: within each hash shard, docs are ordered by
    (tokens desc, id) and binned by exclusive-running-sum // budget.
    Adds ``shard``, ``bin_idx``. Deterministic for any partitioning."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(token_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("shard", _shard(id_col, shards))
        .withColumn(
            "bin_idx",
            (F.coalesce(F.sum(token_col).over(w), F.lit(0)) / budget)
            .cast("long"),
        )
    )


def pack_first_fit(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 64,
) -> DataFrame:
    """Strict packing: per-shard first-fit-decreasing. Adds ``shard``,
    ``bin_idx``, ``oversize`` (true when a single doc exceeds the budget
    and was given its own bin). Bins never exceed ``budget`` except
    those singletons. Deterministic: docs are processed in (tokens desc,
    id) order inside each shard."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")

    # schema: id, tokens, shard (original types) + bin_idx, oversize
    from pyspark.sql.types import BooleanType, IntegerType, LongType

    # full payload rides through the packer (parity with pack_cumsum)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("shard", IntegerType(), True),
            StructField("bin_idx", LongType(), True),
            StructField("oversize", BooleanType(), True),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        open_bins: list[int] = []  # remaining capacity per bin
        bin_idx = []
        oversize = []
        for t in pdf[token_col]:
            # null/NaN token counts consume no capacity (matches
            # pack_cumsum, where the window sum ignores nulls)
            t = 0 if pd.isna(t) else int(t)
            if t > budget:
                # capacity -1 CLOSES the singleton: a zero-token doc
                # satisfies `cap >= 0`, so a capacity of 0 would let it
                # slip into an oversize bin and break the singleton
                # invariant
                open_bins.append(-1)
                bin_idx.append(len(open_bins) - 1)
                oversize.append(True)
                continue
            for i, cap in enumerate(open_bins):
                if cap >= t:
                    open_bins[i] = cap - t
                    bin_idx.append(i)
                    break
            else:
                open_bins.append(budget - t)
                bin_idx.append(len(open_bins) - 1)
            oversize.append(False)
        out = pdf.copy()
        out["shard"] = pdf["shard"].astype("int32")
        out["bin_idx"] = pd.Series(bin_idx, dtype="int64")
        out["oversize"] = pd.Series(oversize, dtype="bool")
        return out

    sharded = df.withColumn("shard", _shard(id_col, shards))
    return sharded.groupBy("shard").applyInPandas(_pack, out_schema)


def bin_fill_stats(packed: DataFrame, token_col: str, budget: int) -> DataFrame:
    """Per-bin fill summary of either packer's output: one row per
    (shard, bin_idx) with doc count, token total, and fill ratio —
    the packing-efficiency metric a corpus build reports."""
    return (
        packed.groupBy("shard", "bin_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).alias("bin_tokens"),
        )
        .withColumn("fill", F.round(F.col("bin_tokens") / budget, 4))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    stride: int | None = None,
    chunk_col: str = "chunk_idx",
    out_col: str = "chunk_text",
) -> DataFrame:
    """Split each document into fixed-size token windows — the step
    BEFORE packing when docs exceed the context length (pretraining
    chunking, retrieval-corpus windowing). Window i covers tokens
    [1 + i·stride, i·stride + chunk_tokens]; ``stride < chunk_tokens``
    overlaps consecutive chunks (retrieval), ``stride == chunk_tokens``
    tiles exactly (pretraining, the default). The final partial window
    is kept (training handles ragged tails); empty/blank docs yield one
    empty chunk so no document silently disappears.

    Pure per-row expressions — tokenize once, then slice + array_join
    under a posexplode; no UDF, no shuffle. Chunk count and content are
    a pure function of the text, partitioning-independent; DuckDB can
    replay the windows with list slicing (pinned in tests).

    Output: input columns (minus ``text_col``) + ``chunk_col`` (0-based)
    + ``out_col`` + ``n_chunk_tokens``.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens], got {stride}"
        )
    # split directly (NOT functions.text.tokens, which lowercases for
    # analysis kernels) — a chunker must hand training text through
    # case-intact. Filtering empty fragments (instead of F.trim, which
    # strips only ASCII spaces) makes the tokenization robust to tab/
    # newline-edged and all-whitespace text, and the coalesce keeps NULL
    # text on the same one-empty-chunk path as blank text — the oracle
    # mirrors both.
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )
    # number of windows over n tokens: 1 + ceil(max(0, n - chunk) / stride)
    n = F.size(F.col("__ct_toks"))
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride + 1
    )
    chunks = F.transform(
        starts,
        lambda s: F.array_join(F.slice(F.col("__ct_toks"), s, chunk_tokens), " "),
    )
    keep = [c for c in df.columns if c != text_col]
    return (
        df.withColumn("__ct_toks", toks)
        .select(*keep, F.posexplode(chunks).alias(chunk_col, out_col))
        .withColumn(
            "n_chunk_tokens",
            F.when(F.length(F.col(out_col)) == 0, F.lit(0)).otherwise(
                F.size(F.split(F.col(out_col), " "))
            ),
        )
    )
