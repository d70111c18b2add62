"""Pretraining-corpus curation pipeline: the operator families composed
end to end, the way a training-data team would actually run them.

The reference's pipelines (hashtags/news/rates) are scrape-shaped; this
one is the engine-native counterpart for the LLM-data brief — one
callable that takes a raw documents table and yields a curated, split,
audited corpus:

    quality rules (Gopher base + n-gram repetition)
      → exact dedup (content hash)
      → near dedup (MinHash-LSH + verified Jaccard)
      → benchmark decontamination (13-gram, Bloom-prefiltered)
      → optional DSIR domain selection (importance-resampled top-k)
      → PII redaction
      → deterministic train/val/test split

Every stage is the already-certified operator (each has its own oracle
or parity entry); what THIS module pins is the composition contract:

- ordering is cheapest-reject-first: per-row codegen rules cut the
  corpus before any shuffle-bearing dedup stage runs, and the (small)
  decontamination join sees only survivors;
- nothing silently vanishes — every rejected row lands in the returned
  audit frame with the stage that killed it, the
  keep-the-evidence convention of gopher_filter/split_sentinel_pages;
- the pipeline is deterministic: same input rows (any partitioning,
  any order) → identical kept set, identical audit, identical splits
  (every stage is hash- or min-id-based; pinned by test).

Scale shape (100 TB): stages 1, 4, 5 are scan-stage expressions; stage
2 is one hash shuffle; stage 3 shuffles only LSH band keys and verified
candidates; decontamination broadcasts the eval side and Bloom-prunes
its input inside the scan. No stage collects row data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_instagram_spark.operators.cleanup import (
    flag_contaminated,
    gopher_filter,
    gopher_ngram_filter,
    redact_pii,
)
from etl_instagram_spark.functions.text import hash32
from etl_instagram_spark.operators.dedup import (
    exact_dedup,
    near_dedup_keep_best,
    near_dedup_minhash,
)
from etl_instagram_spark.operators.sampling import hash_split


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark: DataFrame | None = None,
    near_dup_threshold: float = 0.7,
    near_dup_keep: str = "smallest_id",
    decontamination_n: int = 13,
    bloom_fpp: float | None = 0.001,
    dedup_spans_n: int | None = None,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    dsir_buckets: int = 4096,
    split_weights: dict[str, float] | None = None,
    split_salt: str = "split",
    split_on: str = "id",
    nfc: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation chain; returns ``(kept, rejected)``.

    ``kept``: the surviving rows with ``text`` PII-redacted and a
    ``split`` column assigned; original columns preserved.
    ``rejected``: original rows + ``reject_stage`` ∈ {quality,
    exact_dup, near_dup, contaminated, not_selected} — route it to an
    audit sink.

    ``benchmark=None`` skips decontamination (no eval set, no rule).
    ``dedup_spans_n`` (e.g. 50) additionally runs ExactSubstr-style
    duplicate-span removal on the survivors — a text EDIT, not a
    reject, so it happens after every document-dropping stage (editing
    first would perturb the near-dup/decontamination shingles) and its
    word counts land in ``n_spans_removed``/``n_words_removed`` on
    ``kept``.

    ``dsir_target`` + ``dsir_k`` additionally run DSIR importance
    resampling (operators/dsir) over the CLEAN survivors — selection
    sees only deduped, decontaminated text so duplicate mass can't
    distort the raw-side model, and the fit/score passes run on the
    smallest possible frame. Docs outside the k-sample (or with no
    features) audit as ``not_selected``.

    ``near_dup_keep`` picks the near-dedup survivor policy:
    ``"smallest_id"`` (default, near_dedup_minhash's pairwise rule) or
    ``"best"`` (dedup.near_dedup_keep_best — connected components over
    the verified pairs, keep the longest text per TRANSITIVE cluster).

    ``split_on="content"`` keys the train/val/test assignment on
    hash32(normalized text) instead of the doc id — the leakage-safe
    split (gate row docs_leakage_safe_split): any residual byte-equal
    duplicates co-assign by construction, so eval contamination through
    the split is impossible even if dedup was skipped upstream.

    ``nfc=True`` prepends UAX #15 NFC normalization of ``text_col``
    (functions/unicodenorm) — a text EDIT applied BEFORE every
    content-keyed stage, so composition variants of the same text
    dedup/decontaminate/split as the identical bytes they are. Off by
    default: it inserts the pipeline's only pandas-UDF stage, and
    ASCII-clean corpora don't need it.

    Single-normalization contract (r18): the edit above is the ONLY
    normalization pass — the dedup stages below run byte-exact
    (``normalize=None``) on the already-normalized text, never
    re-normalizing through the operator-layer ``normalize=`` kwargs
    (dedup.py r17). Those kwargs exist for DIRECT operator users who
    want normalized KEYS while survivors keep original bytes; this
    pipeline's contract is the edit (kept text IS the NFC form).
    Pinned by test_curate_corpus_nfc_normalizes_exactly_once."""
    base_cols = docs.columns
    if id_col not in base_cols or text_col not in base_cols:
        raise ValueError(f"docs must carry {id_col!r} and {text_col!r}")
    if nfc:
        from etl_instagram_spark.functions.unicodenorm import (
            unicode_normalize,
        )

        docs = docs.withColumn(
            text_col, unicode_normalize(F.col(text_col), "NFC")
        )

    def rejected_from(current: DataFrame, survivors: DataFrame, stage: str):
        return (
            current.join(
                survivors.select(id_col), on=id_col, how="left_anti"
            )
            .select(*base_cols)
            .withColumn("reject_stage", F.lit(stage))
        )

    audits: list[DataFrame] = []

    # Every stage output below is LAZILY PINNED (localCheckpoint,
    # r20, guide §5): each feeds BOTH the next stage and its left-anti
    # reject audit, and ``kept``/``rejected`` are returned as separate
    # frames — unpinned, collecting the audit union re-evaluated stage
    # k's whole upstream chain once per LATER stage (quadratic in
    # stages; measured 40 s of re-evaluation on a 6-doc corpus). One
    # materialization per stage is also the 100 TB shape: a curation
    # pipeline persists stage boundaries rather than re-running LSH
    # dedup per audit consumer.

    # 1. per-row quality rules (all codegen, cheapest rejects first)
    flagged = gopher_ngram_filter(
        gopher_filter(docs, text_col), text_col
    )
    quality = flagged.filter(
        F.col("gopher_pass") & F.col("gopher_ngram_pass")
    ).select(*base_cols).localCheckpoint(eager=False)
    audits.append(rejected_from(docs, quality, "quality"))

    # 2. exact dedup — one hash shuffle, keep-smallest-id
    exact = exact_dedup(quality, text_col, id_col).select(
        *base_cols
    ).localCheckpoint(eager=False)
    audits.append(rejected_from(quality, exact, "exact_dup"))

    # 3. near dedup — LSH candidates, verified Jaccard; survivor policy
    # per near_dup_keep (pairwise min-id vs per-cluster best)
    if near_dup_keep == "smallest_id":
        near = near_dedup_minhash(
            exact, id_col, text_col, threshold=near_dup_threshold
        ).select(*base_cols).localCheckpoint(eager=False)
    elif near_dup_keep == "best":
        near = near_dedup_keep_best(
            exact, id_col, text_col, threshold=near_dup_threshold
        ).select(*base_cols).localCheckpoint(eager=False)
    else:
        raise ValueError(
            f"near_dup_keep must be 'smallest_id' or 'best', got {near_dup_keep!r}"
        )
    audits.append(rejected_from(exact, near, "near_dup"))

    # 4. benchmark decontamination (optional)
    if benchmark is not None:
        deco = flag_contaminated(
            near,
            benchmark,
            id_col,
            text_col,
            n=decontamination_n,
            bloom_fpp=bloom_fpp,
        )
        clean = deco.filter(~F.col("contaminated")).select(
            *base_cols
        ).localCheckpoint(eager=False)
        audits.append(rejected_from(near, clean, "contaminated"))
    else:
        clean = near

    # 5. optional domain selection (DSIR): fit on the clean survivors,
    # keep the Gumbel-top-k sample; everything else audits
    if (dsir_target is None) != (dsir_k is None):
        raise ValueError("dsir_target and dsir_k must be given together")
    if dsir_target is not None:
        from etl_instagram_spark.operators.dsir import (
            fit_dsir,
            importance_sample,
        )

        model = fit_dsir(clean, dsir_target, text_col, n_buckets=dsir_buckets)
        selected = importance_sample(
            clean, model, dsir_k, text_col, id_col
        ).select(*base_cols).localCheckpoint(eager=False)
        audits.append(rejected_from(clean, selected, "not_selected"))
        clean = selected

    # 6. optional passage-level dedup (edits text, drops nothing)
    if dedup_spans_n is not None:
        from etl_instagram_spark.operators.cleanup import (
            remove_duplicate_spans,
        )

        clean = remove_duplicate_spans(
            clean, id_col, text_col, n=dedup_spans_n
        )

    # 7. PII redaction + deterministic split on the survivors
    redacted = clean.withColumn(text_col, redact_pii(F.col(text_col)))
    if split_on == "id":
        kept = hash_split(
            redacted, id_col, weights=split_weights, salt=split_salt
        )
    elif split_on == "content":
        # leakage-safe: the split key is the normalized-text hash, so
        # byte-identical duplicates co-assign (docs_leakage_safe_split)
        kept = hash_split(
            redacted.withColumn(
                "__gk", hash32(F.trim(F.lower(F.col(text_col))))
            ),
            "__gk",
            weights=split_weights,
            salt=split_salt,
        ).drop("__gk")
    else:
        raise ValueError(
            f"split_on must be 'id' or 'content', got {split_on!r}"
        )
    rejected = audits[0]
    for a in audits[1:]:
        rejected = rejected.unionByName(a)
    return kept, rejected
