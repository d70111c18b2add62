"""Composition contract of the pretraining curation pipeline
(pipelines/pretrain.py): partition of the input, stage attribution,
determinism across partitionings, and stage wiring (each operator is
individually certified elsewhere)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.pipelines.pretrain import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then wanders through "
    "a long meadow full of distinct interesting words because natural prose "
    "keeps a healthy mixture of stopwords like the and of while avoiding "
    "any excessive repetition of phrases so that quality rules accept it "
    "without complaint and it flows onward for enough words to clear the "
    "minimum length threshold comfortably in every single configured rule"
)


def _corpus(spark, parts=4):
    rows = [
        (1, GOOD + " first variant closing sentence."),
        (2, GOOD + " first variant closing sentence."),     # exact dup of 1
        (3, GOOD + " slightly different closing sentence."),  # near dup of 1
        (4, "buy now " * 60),                                 # quality reject
        (5, "a completely independent second document sails its own course "
            "describing quiet harbors and the slow craft of rigging small "
            "boats before dawn while the crew shares coffee and stories of "
            "the previous season and plans a careful route between islands "
            "where the water stays calm and the wind arrives gently from "
            "the south so contact me at alice@example.com for trip details "
            "because there is room aboard for two more curious travelers"),
        (6, "this third unrelated document discusses the history of bread "
            "baking across several regions noting how flour and water and "
            "salt combine under patient hands into loaves that differ by "
            "climate and custom and it also hides the planted benchmark "
            "sentence for the eval set one two three four five six seven "
            "eight nine ten eleven twelve thirteen and then continues on "
            "with a long digression about ovens and stones and embers"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(parts)


def _bench(spark):
    return spark.createDataFrame(
        [("benchmark sentence planted verbatim for the eval set one two "
          "three four five six seven eight nine ten eleven twelve thirteen",)],
        "text string",
    )


def test_curation_partitions_input_and_attributes_stages(spark):
    docs = _corpus(spark)
    kept, rejected = curate_corpus(docs, benchmark=_bench(spark))
    k = {r["doc_id"] for r in kept.collect()}
    rej = {r["doc_id"]: r["reject_stage"] for r in rejected.collect()}
    # partition: every input row is in exactly one of kept/rejected
    assert k | set(rej) == {1, 2, 3, 4, 5, 6} and not (k & set(rej))
    assert rej[4] == "quality"
    assert rej[2] == "exact_dup"       # loses to smaller id 1
    assert rej[3] == "near_dup"
    assert rej[6] == "contaminated"
    assert k == {1, 5}
    got = kept.filter("doc_id = 5").first()
    assert "<EMAIL>" in got["text"] and "alice@example.com" not in got["text"]
    assert got["split"] in {"train", "val", "test"}


def test_curation_deterministic_across_partitionings(spark):
    def snap(parts):
        kept, rejected = curate_corpus(_corpus(spark, parts), benchmark=_bench(spark))
        return (
            sorted((r["doc_id"], r["split"], r["text"]) for r in kept.collect()),
            sorted((r["doc_id"], r["reject_stage"]) for r in rejected.collect()),
        )

    assert snap(1) == snap(7)


def test_curation_without_benchmark_skips_decontamination(spark):
    kept, rejected = curate_corpus(_corpus(spark))
    assert 6 in {r["doc_id"] for r in kept.collect()}
    assert "contaminated" not in {r["reject_stage"] for r in rejected.collect()}


def test_curation_keep_best_prefers_longest_near_dup(spark):
    """near_dup_keep='best': the cluster keeps its longest member (doc 3
    carries an extra clause vs doc 1) instead of the smallest id."""
    rows = [
        (1, GOOD + " first variant closing sentence."),
        (3, GOOD + " slightly different closing sentence with extra words."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept_min, _ = curate_corpus(docs, near_dup_threshold=0.5)
    kept_best, rej_best = curate_corpus(
        docs, near_dup_threshold=0.5, near_dup_keep="best"
    )
    assert {r["doc_id"] for r in kept_min.collect()} == {1}
    assert {r["doc_id"] for r in kept_best.collect()} == {3}
    assert {(r["doc_id"], r["reject_stage"]) for r in rej_best.collect()} == {
        (1, "near_dup")
    }
    with pytest.raises(ValueError):
        curate_corpus(docs, near_dup_keep="bogus")


def test_curation_content_split_matches_leakage_safe_assignment(spark):
    """split_on='content': the assignment is a pure function of the
    redacted normalized text — the same text under a different doc_id
    (and any partitioning) lands in the same split."""
    docs = _corpus(spark)
    kept, _ = curate_corpus(docs, split_on="content")
    by_id = {r["doc_id"]: (r["split"], r["text"]) for r in kept.collect()}
    # re-run with every surviving doc re-keyed: splits must follow text
    rekeyed = docs.withColumn("doc_id", F.col("doc_id") + 1000)
    kept2, _ = curate_corpus(rekeyed, split_on="content")
    by_id2 = {r["doc_id"] - 1000: r["split"] for r in kept2.collect()}
    assert {d: s for d, (s, _t) in by_id.items()} == by_id2
    assert "__gk" not in kept.columns
    with pytest.raises(ValueError):
        curate_corpus(docs, split_on="bogus")


def test_curation_validates_columns(spark):
    with pytest.raises(ValueError):
        curate_corpus(_corpus(spark), id_col="nope")


def test_curation_optional_span_dedup_edits_survivors(spark):
    extra = spark.createDataFrame(
        [
            (7, "an entirely different but long enough piece about gardens "
                "where rows of tomatoes and beans climb their stakes while "
                "the gardener waters them each morning before the sun gets "
                "high and the planted shared passage flows across texts "
                "verbatim today ends this document with some final words "
                "about compost and patience and the seasons turning over"),
            (8, "another sufficiently long and distinct essay concerning "
                "mountain weather and the habits of marmots that whistle "
                "from the scree while hikers pass and the planted shared "
                "passage flows across texts verbatim today sits in the "
                "middle before closing thoughts about maps and thermoses "
                "of tea and the long walk back to the quiet valley floor"),
        ],
        "doc_id long, text string",
    )
    docs = _corpus(spark).unionByName(extra)
    kept, _ = curate_corpus(docs, dedup_spans_n=8)
    by_id = {r["doc_id"]: r for r in kept.collect()}
    assert 7 in by_id and 8 in by_id
    edited = [i for i in (7, 8) if by_id[i]["n_spans_removed"] > 0]
    assert edited == [8]  # keeper = smaller doc_id stays verbatim
    assert "n_words_removed" in kept.columns


def test_curation_optional_dsir_selection_audits_the_rest(spark):
    """With a dsir_target, the clean survivors are importance-resampled
    to k docs; non-selected clean docs audit as not_selected, prior
    stage attributions are untouched, and the partition property holds."""
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") == 5)  # nautical-flavored domain
    kept, rejected = curate_corpus(
        docs, benchmark=_bench(spark), dsir_target=target, dsir_k=1,
        dsir_buckets=512,
    )
    k = {r["doc_id"] for r in kept.collect()}
    rej = {r["doc_id"]: r["reject_stage"] for r in rejected.collect()}
    assert k | set(rej) == {1, 2, 3, 4, 5, 6} and not (k & set(rej))
    assert len(k) == 1
    assert rej[4] == "quality" and rej[2] == "exact_dup"
    assert rej[3] == "near_dup" and rej[6] == "contaminated"
    # exactly one of the two clean survivors (1, 5) was selected; the
    # other audits as not_selected
    other = ({1, 5} - k).pop()
    assert rej[other] == "not_selected"

    # determinism across partitionings holds with the stage enabled
    kept2, rejected2 = curate_corpus(
        _corpus(spark, 7), benchmark=_bench(spark),
        dsir_target=_corpus(spark, 2).filter(F.col("doc_id") == 5),
        dsir_k=1, dsir_buckets=512,
    )
    assert {r["doc_id"] for r in kept2.collect()} == k
    assert {r["doc_id"]: r["reject_stage"] for r in rejected2.collect()} == rej


def test_curation_dsir_params_must_pair(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError):
        curate_corpus(docs, dsir_target=docs)
    with pytest.raises(ValueError):
        curate_corpus(docs, dsir_k=5)


def test_curate_corpus_nfc_unifies_composition_variants(spark):
    """nfc=True: two composition variants of the same text exact-dedup
    into one kept row (the reject audits as exact_dup); without it both
    survive as distinct content."""
    from pyspark.sql import functions as F

    from etl_instagram_spark.pipelines.pretrain import curate_corpus

    base = (
        "this is a perfectly reasonable document about nothing with "
        "enough words to pass every quality threshold easily and it "
        "keeps going for a while so the gopher rules are satisfied "
        "because short documents are rejected by the word count rule "
        "which would defeat the purpose of this particular test case"
    )
    composed = base + " caf\u00e9"
    decomposed = base + " cafe\u0301"
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed)], "doc_id long, text string"
    )
    kept, rejected = curate_corpus(df, nfc=True)
    k = kept.collect()
    assert len(k) == 1 and k[0]["doc_id"] == 1
    r = rejected.collect()
    assert len(r) == 1 and r[0]["reject_stage"] == "exact_dup"
    # kept text is the NORMALIZED form (composed NFC bytes)
    assert k[0]["text"].endswith(" caf\u00e9")
    # without nfc the bytes differ, so the EXACT stage misses the pair
    # — it only dies later at the (shingle-tolerant) near-dup stage
    _, rejected2 = curate_corpus(df)
    r2 = rejected2.collect()
    assert len(r2) == 1 and r2[0]["reject_stage"] == "near_dup"


def test_curate_corpus_nfc_normalizes_exactly_once(spark, monkeypatch):
    """r18 (single-normalization contract): nfc=True normalizes the
    text ONE time, up front, as a text EDIT — the dedup stages then run
    byte-exact on the already-normalized text, never re-normalizing via
    their own r17 ``normalize=`` entry-point kwargs (the kwarg exists
    for DIRECT operator users who want keys normalized while output
    keeps original bytes; the pipeline's contract is the edit)."""
    from etl_instagram_spark.pipelines import pretrain as P

    seen: list[object] = []
    real_exact, real_near = P.exact_dedup, P.near_dedup_minhash

    def spy_exact(df, text_col, id_col, normalize=None):
        seen.append(("exact", normalize))
        return real_exact(df, text_col, id_col, normalize=normalize)

    def spy_near(df, id_col, text_col, normalize=None, **kw):
        seen.append(("near", normalize))
        return real_near(df, id_col, text_col, normalize=normalize, **kw)

    monkeypatch.setattr(P, "exact_dedup", spy_exact)
    monkeypatch.setattr(P, "near_dedup_minhash", spy_near)
    base = (
        "this is a perfectly reasonable document about nothing with "
        "enough words to pass every quality threshold easily and it "
        "keeps going for a while so the gopher rules are satisfied "
        "because short documents are rejected by the word count rule "
        "which would defeat the purpose of this particular test case"
    )
    df = spark.createDataFrame(
        [(1, base + " café"), (2, base + " café")],
        "doc_id long, text string",
    )
    kept, _ = P.curate_corpus(df, nfc=True)
    assert kept.count() == 1
    # both dedup stages ran, and NEITHER got a second normalization pass
    assert ("exact", None) in seen and ("near", None) in seen
    assert all(norm is None for _, norm in seen)
