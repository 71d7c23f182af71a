"""The capstone composition: raw corpus → curated training shards.

Chains the engine's operator families in the order every pre-training
data pipeline runs them, wired from the already-tested pieces:

1. quality gate        functions/text.quality_score (codegen filter)
2. exact dedup         operators/dedup.exact_dedup (one fp shuffle)
3. near-dup removal    MinHash-LSH → Jaccard verify → connected
                       components → canonical survivors (bucketed,
                       candidate-restricted — never all-pairs)
4. decontamination     operators/decontaminate (one distinct
                       benchmark gram set — broadcast when it fits,
                       shuffled join when it doesn't; doc-level match,
                       cost linear in corpus grams)
5. pack + shard write  operators/packing + sharding via
                       plans/training_export (distributed prefix
                       scan, clustered partitioned write, manifest
                       computed FROM the written table)

Returns ``(manifest, stats)`` where stats is the per-stage funnel
(rows surviving each stage) — the number every curation run needs to
report, computed from the same persisted intermediates the next stage
consumes (each stage's count is the action that materializes its
cache; no extra passes).

Scale posture: every stage is the operator's documented bounded form;
the persists are the silver-layer materializations a real pipeline
writes between stages anyway. 100 TB changes the sizes, not the plan.
"""

from __future__ import annotations

import re
from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from cod_stats_spark.functions import text as T
from cod_stats_spark.functions.text import shingles
from cod_stats_spark.operators._util import spread
from cod_stats_spark.operators.components import dedup_clusters
from cod_stats_spark.operators.decontaminate import decontaminate
from cod_stats_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from cod_stats_spark.plans.training_export import export_training_shards


def _model_gate(
    gated: DataFrame,
    qc_model,
    min_qc_score: float,
    text_col: str,
    id_col: str,
    stats: dict[str, int],
) -> DataFrame:
    """Shared classifier-gate stage: score, threshold, persist, count
    (the count is the materializing action, as with every stage), and
    release the parent stage's cache."""
    from cod_stats_spark.operators.quality_classifier import (
        quality_classifier_score,
    )

    kept = (
        quality_classifier_score(
            gated, qc_model, text_col=text_col, id_col=id_col
        )
        .where(F.col("qc_score") >= min_qc_score)
        .drop("qc_score")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats["after_model_gate"] = kept.count()
    gated.unpersist()
    return kept


def _validate_lm_gate_args(lm_model, max_lm_nll) -> None:
    """Argument validation shared by both postures, run at FUNCTION
    ENTRY — half a gate is a silent no-op the caller would misread as
    "the CCNet gate ran", and raising only after the upstream stages
    executed would burn hours of funnel work on a crawl-scale corpus
    before surfacing a pure configuration error (r12 review)."""
    if (lm_model is None) != (max_lm_nll is None):
        raise ValueError(
            "curate_corpus/curate_corpus_append: lm_model and "
            "max_lm_nll must be set together"
        )


def _lm_gate(
    gated: DataFrame,
    lm_model,
    max_lm_nll: float,
    text_col: str,
    id_col: str,
    stats: dict[str, int],
) -> DataFrame:
    """Shared LM-perplexity gate (the CCNet stage): score each doc's
    mean NLL under a FIXED reference model and drop everything above
    the threshold. The model must be fixed for the corpus's lifetime —
    CCNet fits it on a reference corpus, not the data being gated —
    which is also what keeps the stage stateless (append == rebuild:
    a per-batch refit would move the threshold's meaning batch to
    batch). Threshold values come from a reference run of
    :func:`operators.lm_score.perplexity_partition`'s cut points.

    ``lm_model`` is either a unigram count table (DataFrame — the
    subsample-fit posture) or an :class:`operators.lm_score.ArpaModel`
    (r14 — a PUBLISHED backoff LM imported by ``load_arpa``: the
    actual CCNet deployment, which gates on a pre-trained KenLM's
    scores; threshold then applies to the backoff NLL in nats, the
    same unit). Both are fixed inputs, so either way the stage stays
    stateless."""
    from cod_stats_spark.operators.lm_score import (
        ArpaModel,
        arpa_lm_score,
        unigram_lm_score,
    )

    if isinstance(lm_model, ArpaModel):
        scored = arpa_lm_score(
            gated, lm_model, text_col=text_col, id_cols=[id_col]
        ).select(
            id_col,
            F.col("arpa_tokens").alias("lm_tokens"),
            F.col("arpa_nll").alias("lm_nll"),
        )
    else:
        scored = unigram_lm_score(
            gated, lm_model, text_col=text_col, id_cols=[id_col]
        )
    keep_ids = (
        scored
        # zero-token docs score (0, 0.0) — the BEST possible NLL — so
        # without this they'd sail through the gate as maximally
        # in-distribution; a doc with no tokens has no perplexity
        .where(
            (F.col("lm_tokens") > 0)
            & (F.col("lm_nll") <= float(max_lm_nll))
        )
        .select(id_col)
    )
    kept = gated.join(keep_ids, id_col, "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stats["after_lm_gate"] = kept.count()
    gated.unpersist()
    return kept


def _validate_dsir_gate_args(dsir_model, min_dsir_logw) -> None:
    """Same entry-time contract as the LM gate: half a gate is a
    silent no-op the caller would misread as 'the DSIR gate ran'."""
    if (dsir_model is None) != (min_dsir_logw is None):
        raise ValueError(
            "curate_corpus/curate_corpus_append: dsir_model and "
            "min_dsir_logw must be set together"
        )


def _dsir_gate(
    gated: DataFrame,
    dsir_model,
    min_dsir_logw: float,
    text_col: str,
    id_col: str,
    stats: dict[str, int],
) -> DataFrame:
    """DSIR domain-match gate in the model-gate slot: score every doc
    against the FIXED importance model (operators/dsir.py — hashed
    bag-of-n-grams log p̂_target − log q̂_raw) and drop below the
    threshold. The THRESHOLD form, not the Gumbel top-k resample: a
    fixed model + fixed cut is stateless, so append == rebuild holds
    (a global top-k would re-rank on every append — use the
    standalone ``dsir_select`` for one-shot corpus construction)."""
    from cod_stats_spark.operators.dsir import dsir_score

    kept = (
        dsir_score(gated, dsir_model, text_col=text_col, id_col=id_col)
        .where(F.col("dsir_logw") >= float(min_dsir_logw))
        .drop("dsir_logw")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats["after_dsir_gate"] = kept.count()
    gated.unpersist()
    return kept


def _replace_text(
    parent: DataFrame,
    scrubbed: DataFrame,
    text_col: str,
    id_col: str,
    stats: dict[str, int],
    key: str,
) -> DataFrame:
    """Shared text-rewrite plumbing for the scrubbing stages (line
    dedup, ExactSubstr): swap the parent's text for the scrubbed
    ``clean_text``, drop documents scrubbed to empty, persist, count
    (the materializing action), release the parent's cache."""
    replaced = (
        parent.drop(text_col)
        .join(
            scrubbed.where(F.length("clean_text") > 0).select(
                id_col, F.col("clean_text").alias(text_col)
            ),
            id_col,
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats[key] = replaced.count()
    parent.unpersist()
    return replaced


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.25,
    jaccard_threshold: float = 0.7,
    # 8 bands × 4 rows: s-curve midpoint (1/8)^(1/4) ≈ 0.6, matched to
    # the 0.7 default threshold. Wider banding (more bands, fewer rows)
    # raises recall but collides sub-threshold doc FAMILIES — measured
    # at 19.8M false candidates on the sf10eq replica corpus (SCALING.md)
    num_hashes: int = 32,
    bands: int = 8,
    decontam_ngram_n: int = 8,
    decontam_min_overlap: int = 1,
    token_budget: int = 2048,
    salt: str = "curate",
    splits: Mapping[str, float] | None = None,
    substring_n: int | None = None,
    qc_model=None,
    min_qc_score: float = 0.5,
    lm_model: DataFrame | None = None,
    max_lm_nll: float | None = None,
    dsir_model=None,
    min_dsir_logw: float | None = None,
    line_sep: str | None = None,
    line_min_chars: int = 1,
    semantic_centroids: list[list[float]] | None = None,
    semantic_threshold: float = 0.95,
    embedding_col: str = "embedding",
    semantic_benchmark: DataFrame | None = None,
    semantic_decon_threshold: float = 0.95,
    semantic_decon_method: str = "gemm",
    mixture_alpha: float | None = None,
    mixture_domain_col: str = "lang",
    mixture_max_weight: float | None = None,
    url_col: str | None = None,
    domain_blocklist: list[str] | None = None,
    domain_allowlist: list[str] | None = None,
    html_input: bool = False,
    html_min_words: int = 5,
    html_boilerplate: list[str] | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full curation funnel; write shards to ``out_path``.

    ``benchmark``: eval/benchmark documents to decontaminate against
    (None skips stage 4). Returns (shard manifest, stage-count dict).

    ``substring_n``: when set, an ExactSubstr span-removal stage
    (operators/substring.py, keep_first=True) runs between near-dup
    removal and decontamination: any passage of >= substring_n tokens
    still repeated across the SURVIVORS — cross-document boilerplate
    near-dup removal can't see, because the docs around it differ — is
    kept once (globally first site) and scrubbed everywhere else.
    Documents scrubbed to empty are dropped; stats gains
    ``after_substring`` (surviving docs). Surviving text is the
    span-removed NORMALIZED form (lowercased, single-spaced — the
    dedup family's canonical text), which downstream stages normalize
    into anyway. Off by default: the timed `curate_corpus` bench
    entry keeps its r7 five-stage plan.

    ``splits``: optional train/val/test fraction map — after cleaning,
    every surviving doc gets a deterministic hash-bucket split
    (sampling.assign_splits; near-dups are already collapsed to one
    canonical survivor upstream, so row-level assignment cannot leak
    an eval doc's near-duplicate into train), and each split packs and
    writes its OWN shard tree under ``out_path/split=<name>`` with an
    independent shard sequence. The manifest gains a ``split`` column;
    stats gains per-split survivor counts.

    ``semantic_centroids``: when set (and ``docs`` carries
    ``embedding_col``), a SemDeDup stage (operators/semantic.py) runs
    right after lexical near-dup removal: paraphrases and re-renders
    whose WORDS differ — invisible to MinHash/Jaccard/ExactSubstr —
    collapse to the farthest-from-centroid exemplar when their
    embedding cosine clears ``semantic_threshold``. Stats gains
    ``after_semantic``. Centroids come from
    ``clustering.kmeans_fit`` (or any fixed list); k is the scale
    knob that bounds the within-cluster pairing.

    ``qc_model``: an optional trained
    :class:`operators.quality_classifier.QualityClassifierModel` —
    when set, a MODEL gate runs right after the heuristic quality
    gate (the CCNet posture: cheap heuristics first, then the trained
    fluent-vs-junk classifier, both before the expensive dedup
    stages): docs scoring below ``min_qc_score`` drop; stats gains
    ``after_model_gate``. Inference is the classifier's stateless
    forward pass (zero-shuffle codegen for dims ≤ 4096, broadcast
    relation otherwise), so the stage adds no state and preserves the
    append-equals-rebuild contract.

    ``lm_model`` + ``max_lm_nll``: the CCNet LM-perplexity gate in the
    same model-gate slot (after the classifier when both are set):
    docs whose mean NLL under the FIXED reference model exceeds the
    threshold drop; stats gains ``after_lm_gate``. Fixed model +
    fixed threshold ⇒ stateless ⇒ append == rebuild holds (see
    :func:`_lm_gate`).

    ``dsir_model`` + ``min_dsir_logw``: the DSIR domain-match gate in
    the same model-gate slot (last of the three when all are set —
    fluency first, then domain match): docs whose log importance
    weight under the FIXED target/raw model (operators/dsir.py) falls
    below the cut drop; stats gains ``after_dsir_gate``. The
    THRESHOLD posture — stateless, append == rebuild; the paper's
    exact Gumbel top-k resample is the standalone ``dsir_select``
    (a global k re-ranks on every append, so it belongs to one-shot
    corpus construction, not the funnel).

    ``line_sep``: when set, a duplicate-LINE removal stage
    (operators/line_dedup.py, keep_first=True — the RefinedWeb/Dolma
    boilerplate pass) runs after the model gates and BEFORE the
    document-level dedup (the published ordering: recurring
    navigation/footer lines removed first sharpen the document
    fingerprints the dedup stages hash): a normalized line repeated
    anywhere in the corpus keeps its globally-first occurrence and is
    scrubbed everywhere else; blank lines and lines shorter than
    ``line_min_chars`` are exempt. Documents scrubbed to empty drop;
    stats gains ``after_line_dedup``.

    ``semantic_benchmark``: embedding-space decontamination right
    after the n-gram decontamination (the same stage-4 slot): any
    surviving doc within ``semantic_decon_threshold`` cosine of ANY
    benchmark embedding drops (paraphrased eval material n-grams
    cannot see). ``semantic_decon_method`` defaults to the BLAS
    "gemm" path (42× the Column path at the 2 GB stratum —
    SCALING.md); both share the round-6-before-max decision rule.
    Stateless vs a fixed benchmark — append == rebuild holds. Stats
    gains ``after_semantic_decon``.

    ``mixture_alpha``: temperature-based mixture rebalancing
    (sampling.temperature_mixture, the mC4/XLM-R p_d ∝ m_d^α
    posture) over ``mixture_domain_col`` AFTER cleaning, before
    packing: high-resource domains thin, low-resource domains
    replicate (epochs). Stats gains ``after_mixture`` (output rows
    incl. replicas). Replicas share the original id, so packing and
    the shard write key on ``epoch_key`` and split assignment hashes
    the ORIGINAL id (a doc's replicas can never straddle
    train/eval). ONE-SHOT ONLY: the weights derive from the corpus
    masses, so an append would re-weigh every earlier batch —
    curate_corpus_append deliberately has no such stage.

    ``url_col`` + ``domain_blocklist``/``domain_allowlist``: when set,
    a provenance gate (functions/url.domain_gate — subdomain-matching
    blocklist, optional allowlist) runs FIRST, before any content
    stage (the public-pipeline ordering: the cheapest gate drops the
    most-known-bad mass before anything is scored or sketched).
    Stateless string arithmetic — append == rebuild is preserved.
    Stats gains ``after_domain_gate``.

    ``html_input``: when True, ``text_col`` holds raw MARKUP and the
    funnel's stage zero is HTML→text extraction + C4 line cleaning
    (functions/html.extract_text — pure Column regex, the stage every
    public crawl pipeline starts with); documents whose every line
    dies are dropped. Stats gains ``after_html``. Written declaratively
    BEFORE the URL gate (the crawl's logical order), but both stages
    are stateless codegen filters with no dependency between them, so
    Catalyst pushes the cheap domain filter below the byte-scanning
    extraction in the physical plan — logical order costs nothing.
    Stateless — append == rebuild is preserved.
    """
    _validate_lm_gate_args(lm_model, max_lm_nll)
    _validate_dsir_gate_args(dsir_model, min_dsir_logw)
    # the input count is REPORTING only (nothing downstream reads it)
    # but costs a full corpus pass at scale — run it from a driver
    # thread so it overlaps the first content stage's scan instead of
    # serializing in front of it (guide §2.6; the two jobs read the
    # same unpersisted scan, so there is no cache race to lose).
    # r17, VERDICT #4 — the one overlap in this funnel whose sides
    # are truly independent; every later stage consumes its
    # predecessor's persisted survivors, where overlapping the
    # materializing count with the consumer would just compute the
    # cache twice.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    input_count = pool.submit(docs.count)
    stats: dict[str, int] = {"input": 0}

    # the try spans exactly the stages that run before the future is
    # consumed: an early-stage failure must not strand the background
    # count (the in-flight job cannot be cancelled, but the exception
    # propagates immediately instead of blocking on a full corpus
    # pass — r17 review)
    try:
        if html_input:
            from cod_stats_spark.functions.html import extract_text

            docs = docs.withColumn(
                text_col,
                extract_text(
                    F.col(text_col),
                    min_words=html_min_words,
                    blocklist=html_boilerplate,
                ),
            ).where(F.length(F.col(text_col)) > 0)
            stats["after_html"] = docs.count()

        if url_col is not None and (domain_blocklist or domain_allowlist):
            from cod_stats_spark.functions.url import domain_gate

            docs = domain_gate(
                docs, url_col,
                blocklist=domain_blocklist, allowlist=domain_allowlist,
            )
            stats["after_domain_gate"] = docs.count()

        gated = docs.filter(
            T.quality_score(F.col(text_col)) >= min_quality
        ).persist(StorageLevel.MEMORY_AND_DISK)
        after_quality = gated.count()
        stats["input"] = input_count.result()
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
    stats["after_quality"] = after_quality

    if qc_model is not None:
        gated = _model_gate(gated, qc_model, min_qc_score, text_col,
                            id_col, stats)
    if lm_model is not None:
        gated = _lm_gate(gated, lm_model, max_lm_nll, text_col,
                         id_col, stats)
    if dsir_model is not None:
        gated = _dsir_gate(gated, dsir_model, min_dsir_logw, text_col,
                           id_col, stats)

    if line_sep is not None:
        from cod_stats_spark.operators.line_dedup import line_dedup

        gated = _replace_text(
            gated,
            line_dedup(
                gated, text_col, id_col,
                sep=line_sep, min_chars=line_min_chars, keep_first=True,
            ),
            text_col, id_col, stats, "after_line_dedup",
        )

    # exact + near dedup — the dedup_pipeline gate's shape: shingle
    # once, share the projection across LSH and the Jaccard verify.
    # materialize(): heap-cache when the shingle arrays fit, scratch
    # parquet when they don't (the r8 forced-spill finding — see
    # _dedup_pipeline_survivors and SCALING.md)
    from cod_stats_spark.operators._util import materialize

    exact = exact_dedup(gated, text_col, id_col)
    keepers = materialize(
        spread(
            gated.join(
                exact.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
            )
        ).withColumn("_sh", shingles(text_col, 3, distinct=False)),
        expansion=24,
        label="keepers",
    )
    cands = minhash_lsh_pairs(
        keepers, text_col, id_col, num_hashes=num_hashes, bands=bands,
        shingle_col="_sh",
    )
    confirmed = ngram_jaccard_pairs(
        keepers, text_col, id_col, cands, threshold=jaccard_threshold,
        shingle_col="_sh",
    )
    clustered = dedup_clusters(keepers, confirmed.select("id_a", "id_b"), id_col)
    deduped = (
        clustered.filter(F.col("is_canonical"))
        .drop("_sh", "cluster_id", "is_canonical")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats["after_dedup"] = deduped.count()

    if semantic_centroids is not None:
        from cod_stats_spark.operators.semantic import semantic_dedup

        kept = (
            semantic_dedup(
                deduped,
                embedding_col,
                id_col,
                semantic_centroids,
                threshold=semantic_threshold,
            )
            .drop("cluster", "centroid_cosine")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        stats["after_semantic"] = kept.count()
        deduped.unpersist()
        deduped = kept

    if substring_n is not None:
        from cod_stats_spark.operators.substring import substring_dedup

        deduped = _replace_text(
            deduped,
            substring_dedup(
                deduped, text_col, id_col, n=substring_n, keep_first=True
            ),
            text_col, id_col, stats, "after_substring",
        )

    if benchmark is not None:
        clean = decontaminate(
            deduped, benchmark, text_col, id_col,
            ngram_n=decontam_ngram_n, min_overlap=decontam_min_overlap,
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        clean = deduped
    stats["after_decontamination"] = clean.count()
    clean_persisted = benchmark is not None

    if semantic_benchmark is not None:
        from cod_stats_spark.operators.decontaminate import (
            semantic_decontaminate,
        )

        sclean = semantic_decontaminate(
            clean, semantic_benchmark, embedding_col, id_col,
            threshold=semantic_decon_threshold,
            method=semantic_decon_method,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        stats["after_semantic_decon"] = sclean.count()
        if clean_persisted:
            clean.unpersist()
        clean, clean_persisted = sclean, True

    # packing/splits key on the doc id — unless the mixture stage
    # replicated docs, in which case epoch_key is the unique per-copy
    # key (the epoch_expand contract) and split assignment hashes the
    # ORIGINAL id so replicas can never straddle train/eval
    export_id, split_group = id_col, None
    if mixture_alpha is not None:
        from cod_stats_spark.operators.sampling import temperature_mixture

        mixed = temperature_mixture(
            clean, id_col, mixture_domain_col, alpha=mixture_alpha,
            salt=f"{salt}|tmix", max_weight=mixture_max_weight,
        ).drop("epoch").persist(StorageLevel.MEMORY_AND_DISK)
        stats["after_mixture"] = mixed.count()
        if clean_persisted:
            clean.unpersist()
        clean, clean_persisted = mixed, True
        export_id, split_group = "epoch_key", id_col

    # min_quality already applied — the export's gate must not drop
    # more (quality_score is [0,1], so 0.0 passes everything)
    if splits:
        import os

        from cod_stats_spark.operators.sampling import assign_splits

        assigned = assign_splits(
            clean, export_id, splits, salt=salt, group_col=split_group
        ).persist(StorageLevel.MEMORY_AND_DISK)
        parts = []
        for name in splits:
            part = assigned.filter(F.col("split") == name).drop("split")
            stats[f"split_{name}"] = part.count()
            m = export_training_shards(
                part,
                os.path.join(out_path, f"split={name}"),
                text_col=text_col,
                id_col=export_id,
                token_budget=token_budget,
                min_quality=0.0,
                salt=f"{salt}|{name}",
            )
            parts.append(m.withColumn("split", F.lit(name)))
        manifest = parts[0]
        for m in parts[1:]:
            manifest = manifest.unionByName(m)
        assigned.unpersist()
    else:
        manifest = export_training_shards(
            clean,
            out_path,
            text_col=text_col,
            id_col=export_id,
            token_budget=token_budget,
            min_quality=0.0,
            salt=salt,
        )
    stats["shards"] = manifest.count()
    for df in (gated, keepers, deduped):
        df.unpersist()
    if clean_persisted:
        clean.unpersist()
    return manifest, stats


def curate_corpus_append(
    spark,
    new_docs: DataFrame,
    benchmark: DataFrame | None,
    state_dir: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.25,
    jaccard_threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 16,
    decontam_ngram_n: int = 8,
    decontam_min_overlap: int = 1,
    token_budget: int = 2048,
    salt: str = "curate",
    substring_n: int | None = None,
    substring_min_count: int = 2,
    qc_model=None,
    min_qc_score: float = 0.5,
    lm_model: DataFrame | None = None,
    max_lm_nll: float | None = None,
    dsir_model=None,
    min_dsir_logw: float | None = None,
    line_sep: str | None = None,
    line_min_chars: int = 1,
    line_state_mode: str = "exact",
    line_bloom_bits: int = 1 << 30,
    line_bloom_hashes: int = 7,
    semantic_centroids: list[list[float]] | None = None,
    semantic_threshold: float = 0.95,
    embedding_col: str = "embedding",
    semantic_benchmark: DataFrame | None = None,
    semantic_decon_threshold: float = 0.95,
    semantic_decon_method: str = "gemm",
    url_col: str | None = None,
    domain_blocklist: list[str] | None = None,
    domain_allowlist: list[str] | None = None,
    html_input: bool = False,
    html_min_words: int = 5,
    html_boilerplate: list[str] | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Incremental curation — the production posture `curate_corpus`
    lacks: append ONE new document batch against the EXISTING curated
    corpus state instead of rebuilding the funnel over the union.

    ``html_input``: HTML→text extraction + C4 line cleaning as stage
    zero, same slot and semantics as the one-shot funnel. Stateless —
    append == rebuild holds. Stats gains ``after_html``.

    ``url_col`` + ``domain_blocklist``/``domain_allowlist``: the
    provenance gate in the same FIRST slot as the one-shot funnel
    (functions/url.domain_gate). Stateless — append == rebuild holds.

    ``semantic_centroids``: the SemDeDup stage in the same slot as the
    one-shot funnel (after lexical dedup), incremental form: the batch
    dedups within itself by the worse-side rule, then SHIPPED WINS —
    a batch doc with a ≥threshold partner already in the
    cluster-partitioned state under ``state_dir/semantic_state`` dies
    (an already-shipped exemplar is immutable). Stats gains
    ``after_semantic``. Centroids must stay FIXED for the state's
    lifetime.

    ``qc_model`` / ``min_qc_score``: the trained-classifier gate in
    the same slot as the one-shot funnel (right after the heuristic
    quality gate). The forward pass is stateless, so the stage cannot
    break append-equals-rebuild.

    ``lm_model`` + ``max_lm_nll``: the CCNet LM-perplexity gate in the
    same slot as the one-shot funnel (after the classifier). The
    reference model and threshold are FIXED inputs, so the stage is
    stateless and append == rebuild holds.

    ``dsir_model`` + ``min_dsir_logw``: the DSIR domain-match gate in
    the same model-gate slot as the one-shot funnel (after the LM
    gate). Fixed model + fixed cut — stateless, append == rebuild
    holds (the threshold posture; see :func:`_dsir_gate`).

    ``line_sep`` (+ ``line_min_chars``): the duplicate-line scrub in
    the same slot as the one-shot funnel (after the model gates,
    before document dedup), incremental form: a persisted line census
    under ``state_dir/line_census`` (streaming/line_dedup.py) makes
    the semantics KEEP-FIRST-IN-TIME — a batch line already shipped
    (this batch or any earlier one) is scrubbed; batch-id-tagged
    commits keep at-least-once replays from double-counting. With
    increasing doc ids across batches, append == rebuild (the
    substring-census contract, one granularity up). Stats gains
    ``after_line_dedup``.

    ``line_state_mode`` (r15): ``"exact"`` (default) keeps the
    (h, cnt) census — exact decisions, append == rebuild, state
    O(distinct lines). ``"bloom"`` swaps it for the FIXED-SIZE Bloom
    filter relation (``line_bloom_bits``/``line_bloom_hashes`` —
    streaming/line_dedup's Dolma posture): constant state forever,
    the crawl-scale configuration, at an explicit designed
    false-positive rate of never-seen lines wrongly scrubbed —
    meaning append ≠ rebuild by exactly those FP scrubs, which is why
    the exact census stays the default (its contract is exact). The
    state dir's ``_LINESTATE`` marker freezes the mode for the
    state's lifetime; switching modes mid-stream fails loudly.

    ``semantic_benchmark`` (+ ``semantic_decon_threshold``,
    ``semantic_decon_method``): embedding-space decontamination in
    the same stage-4 slot as the one-shot funnel, against a FIXED
    eval-embedding set — stateless, append == rebuild holds. Stats
    gains ``after_semantic_decon``. There is deliberately NO
    ``mixture_alpha`` here: temperature weights derive from corpus
    masses, so an append would re-weigh every earlier batch.

    ``substring_n``: when set, the ExactSubstr span scrub runs between
    the dedup stage and decontamination — the same slot it occupies in
    the one-shot funnel — via streaming/substring's persisted gram
    census under ``state_dir/substring_census``: any passage of >=
    substring_n tokens already SHIPPED (this batch or any earlier one)
    is kept at its first-in-time site and scrubbed everywhere later.
    Documents scrubbed to empty are dropped; stats gains
    ``after_substring``; surviving text is the span-removed NORMALIZED
    form (the dedup family's canonical text), exactly as in
    :func:`curate_corpus`. When batches arrive with increasing doc
    ids, sequential appends equal the one-shot funnel with the same
    ``substring_n`` (the keep-first global argmin coincides with
    first-in-time — the contract streaming/substring.py proves).

    State layout under ``state_dir``:

    - ``dedup_corpus/`` + ``index/`` — the dedup-stage survivors and
      their fingerprint/band index, maintained append-only by
      streaming/dedup.dedup_batch_against_corpus (each doc is
      sketched exactly once, on arrival; the index is pre-
      decontamination on purpose — a near-dup of a contaminated-but-
      kept-for-dedup doc must still die, matching what a one-shot
      rebuild's dedup stage sees).
    - ``shards_frag/batch=<id>/`` — each batch's packed shard tree,
      an INDEPENDENT shard sequence per batch (no cross-batch
      coordination on the write path).
    - ``shards/`` — the compacted global tree, produced by the
      :func:`compact_curated_shards` maintenance pass.

    Per batch: quality gate (stateless codegen filter) → exact + near
    dedup vs state (one index probe, no corpus re-sketch) →
    decontaminate (stateless vs the benchmark gram set) → pack +
    fragment shard write. Returns (batch manifest, stage counts).

    Append-equals-rebuild holds whenever confirmed near-duplicates
    are transitive on the data (the `incremental_dedup` gate's
    documented contract); the incremental_dedup gate's 'curate' rows
    value-verify the whole composition against a sequential SQL
    replay.
    """
    import os

    _validate_lm_gate_args(lm_model, max_lm_nll)
    _validate_dsir_gate_args(dsir_model, min_dsir_logw)
    # reporting-only input count overlapped with the first content
    # stage, exactly as in curate_corpus (guide §2.6; r17)
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    input_count = pool.submit(new_docs.count)
    stats: dict[str, int] = {"input": 0}
    # try spans the stages before the future is consumed (see
    # curate_corpus — an early failure must not strand the thread)
    try:
        if html_input:
            from cod_stats_spark.functions.html import extract_text

            new_docs = new_docs.withColumn(
                text_col,
                extract_text(
                    F.col(text_col),
                    min_words=html_min_words,
                    blocklist=html_boilerplate,
                ),
            ).where(F.length(F.col(text_col)) > 0)
            stats["after_html"] = new_docs.count()
        if url_col is not None and (domain_blocklist or domain_allowlist):
            from cod_stats_spark.functions.url import domain_gate

            new_docs = domain_gate(
                new_docs, url_col,
                blocklist=domain_blocklist, allowlist=domain_allowlist,
            )
            stats["after_domain_gate"] = new_docs.count()
        gated = new_docs.filter(
            T.quality_score(F.col(text_col)) >= min_quality
        ).persist(StorageLevel.MEMORY_AND_DISK)
        after_quality = gated.count()
        stats["input"] = input_count.result()
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
    stats["after_quality"] = after_quality

    if qc_model is not None:
        gated = _model_gate(gated, qc_model, min_qc_score, text_col,
                            id_col, stats)
    if lm_model is not None:
        gated = _lm_gate(gated, lm_model, max_lm_nll, text_col,
                         id_col, stats)
    if dsir_model is not None:
        gated = _dsir_gate(gated, dsir_model, min_dsir_logw, text_col,
                           id_col, stats)

    if line_sep is not None:
        from cod_stats_spark.streaming.line_dedup import (
            line_batch_against_corpus,
        )

        gated = _replace_text(
            gated,
            line_batch_against_corpus(
                spark,
                gated,
                os.path.join(state_dir, "line_census"),
                text_col=text_col,
                id_col=id_col,
                sep=line_sep,
                min_chars=line_min_chars,
                # count-additive census: the batch tag makes an
                # at-least-once replay re-scrub against its original
                # snapshot instead of double-merging (the substring
                # census rule)
                batch_id=int(batch_id),
                # r15: the crawl-scale posture — a fixed-size Bloom
                # seen-set instead of the growing census; the state
                # dir's mode marker freezes the choice
                state_mode=line_state_mode,
                bloom_bits=line_bloom_bits,
                bloom_hashes=line_bloom_hashes,
            ),
            text_col, id_col, stats, "after_line_dedup",
        )

    from cod_stats_spark.streaming.dedup import dedup_batch_against_corpus

    deduped = dedup_batch_against_corpus(
        spark,
        gated,
        text_col,
        id_col,
        os.path.join(state_dir, "dedup_corpus"),
        os.path.join(state_dir, "index"),
        threshold=jaccard_threshold,
        num_hashes=num_hashes,
        bands=bands,
        # at-least-once replay safety: without the tag a replayed epoch
        # collides with its own first-run index rows, comes back empty,
        # and OVERWRITES its shard fragments with nothing (r10 review)
        batch_id=int(batch_id),
    )
    stats["after_dedup"] = deduped.count()

    if semantic_centroids is not None:
        from cod_stats_spark.streaming.semantic import (
            semantic_batch_against_corpus,
        )

        deduped = semantic_batch_against_corpus(
            spark,
            deduped,
            os.path.join(state_dir, "semantic_state"),
            semantic_centroids,
            vec_col=embedding_col,
            id_col=id_col,
            threshold=semantic_threshold,
            batch_id=int(batch_id),
        ).drop("cluster", "centroid_cosine")
        stats["after_semantic"] = deduped.count()

    if substring_n is not None:
        from cod_stats_spark.streaming.substring import (
            substring_batch_against_corpus,
        )

        deduped = _replace_text(
            deduped,
            substring_batch_against_corpus(
                spark,
                deduped,
                os.path.join(state_dir, "substring_census"),
                text_col=text_col,
                id_col=id_col,
                n=substring_n,
                min_count=substring_min_count,
                # the census merge is count-additive; tagging the
                # commit with the batch id makes an at-least-once
                # replay re-scrub against the original snapshot
                # instead of double-merging
                batch_id=int(batch_id),
            ),
            text_col, id_col, stats, "after_substring",
        )

    if benchmark is not None:
        clean = decontaminate(
            deduped, benchmark, text_col, id_col,
            ngram_n=decontam_ngram_n, min_overlap=decontam_min_overlap,
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        clean = deduped
    stats["after_decontamination"] = clean.count()
    clean_persisted = benchmark is not None

    if semantic_benchmark is not None:
        from cod_stats_spark.operators.decontaminate import (
            semantic_decontaminate,
        )

        sclean = semantic_decontaminate(
            clean, semantic_benchmark, embedding_col, id_col,
            threshold=semantic_decon_threshold,
            method=semantic_decon_method,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        stats["after_semantic_decon"] = sclean.count()
        if clean_persisted:
            clean.unpersist()
        clean, clean_persisted = sclean, True

    manifest = export_training_shards(
        clean,
        os.path.join(state_dir, "shards_frag", f"batch={int(batch_id)}"),
        text_col=text_col,
        id_col=id_col,
        token_budget=token_budget,
        min_quality=0.0,
        salt=f"{salt}|{int(batch_id)}",
    )
    stats["shards"] = manifest.count()
    gated.unpersist()
    if substring_n is not None:
        # release the span-scrubbed cache: a long-running foreachBatch
        # loop calls this per micro-batch, and an unpersisted stage
        # cache per epoch would accumulate until eviction thrashing
        deduped.unpersist()
    if clean_persisted:
        clean.unpersist()
    return manifest, stats


def stream_curate_to_corpus(
    spark,
    docs_stream: DataFrame,
    benchmark: DataFrame | None,
    state_dir: str,
    checkpoint_path: str | None = None,
    compact_every: int | None = None,
    **append_kwargs,
):
    """Structured-Streaming wrapper for :func:`curate_corpus_append`:
    every micro-batch runs the WHOLE incremental funnel (quality gate →
    dedup vs the persisted fingerprint/band index → decontaminate →
    fragment shard write) with the streaming epoch id as the batch id,
    so fragment shard trees arrive as ``shards_frag/batch=<epoch>``
    and the :func:`compact_curated_shards` maintenance pass runs on
    whatever cadence the deployment compacts on. Returns the
    StreamingQuery. The exactly-once contract is the file source's +
    the checkpoint's, same as streaming/dedup.stream_dedup_to_corpus;
    kwargs pass through to curate_corpus_append.

    ``compact_every``: after every Nth epoch, run the funnel's whole
    maintenance pass in-loop (single-writer by construction): compact
    the dedup index, the semantic state tree if the funnel maintains
    one, and the fragment shard tree (:func:`compact_curated_shards`).
    A replayed epoch re-running maintenance is a no-op — index/state
    compaction has the per-leaf-dir check, and the shard compactor
    consumes each fragment batch exactly once (``_APPLIED`` markers),
    so a cycle with nothing new — or an empty fragment tree — costs a
    root listing. Since r12 the shard pass is incremental: per cycle
    it reads only the unconsumed fragments and writes only their
    shard dirs, so in-loop maintenance cost tracks batch size, not
    corpus lifetime."""

    def batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        import os as _os

        curate_corpus_append(
            spark, batch_df, benchmark, state_dir,
            batch_id=int(epoch_id), **append_kwargs,
        )
        if compact_every and (int(epoch_id) + 1) % int(compact_every) == 0:
            from cod_stats_spark.streaming.compaction import (
                compact_dedup_index,
                compact_semantic_state,
            )
            from cod_stats_spark.streaming._state import (
                _fs_for,
                prune_state_versions,
            )

            compact_dedup_index(spark, _os.path.join(state_dir, "index"))
            sem = _os.path.join(state_dir, "semantic_state")
            if _fs_for(spark, sem).exists(sem):
                compact_semantic_state(spark, sem)
            # the versioned census states keep every snapshot for the
            # replay window; the maintenance pass bounds retention to
            # the window the foreachBatch at-least-once source can
            # actually replay (r14 — unpruned this is O(state ×
            # batches) forever)
            for census in ("substring_census", "line_census"):
                cdir = _os.path.join(state_dir, census)
                cfs = _fs_for(spark, cdir)
                if cfs.exists(cdir):
                    prune_state_versions(cdir, keep_last=2, fs=cfs)
            compact_curated_shards(spark, state_dir)

    writer = docs_stream.writeStream.foreachBatch(batch_fn).outputMode("append")
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()


_APPLIED = re.compile(r"^_APPLIED\.b(\d+)\.o(\d+)\.n(\d+)$")


def compact_curated_shards(
    spark,
    state_dir: str,
    full_rebuild: bool = False,
    prune_fragments: bool = False,
) -> "DataFrame | None":
    """Maintenance pass for the append path: renumber the per-batch
    fragment shard sequences (``shards_frag/batch=N/shard_id=M``)
    into ONE contiguous global sequence at ``state_dir/shards``
    clustered one file per shard — the compact_shards contract
    applied across batches.

    INCREMENTAL by default (r11 verdict's top next item): each
    fragment batch is consumed exactly once. A consumed batch is
    recorded by an atomic ``_APPLIED.b{batch}.o{offset}.n{count}``
    marker at the destination root (name-encoded like the
    ``_COMMIT.v{N}`` protocol — creation is the atomic event, content
    never read; parquet readers ignore ``_``-prefixed files). A cycle
    reads ONLY the unconsumed ``batch=`` dirs, assigns offsets
    continuing from the recorded tail (max ``o+n`` over markers), and
    writes ONLY the new shard dirs via dynamic partition overwrite —
    per-cycle cost is proportional to NEW fragments, not corpus size.

    Replay contract: markers are created AFTER the batch's shard dirs
    land, in increasing batch order. A crash between write and marker
    leaves the batch unconsumed; the rerun recomputes the SAME tail
    offset (markers didn't advance) and dynamic overwrite rewrites a
    superset of the crashed dirs, so reruns converge. A funnel epoch
    replay that rewrites an already-consumed ``batch=`` fragment dir
    is ignored outright (the marker, not the dir, is the consumption
    record) — fragment content is deterministic given the dedup
    state, so the consumed copy is identical.

    Incremental == one-shot rebuild whenever batch ids increase
    across consumption cycles (the streaming epoch counter does; the
    same ids-increase contract the substring census documents). A
    late-arriving SMALLER batch id still compacts correctly —
    contiguous, nothing lost — but its shards sort after the already
    frozen ones instead of interleaving where a rebuild would put
    them.

    ``full_rebuild=True`` is the repair path: re-derive the whole
    tree from ALL retained fragments from offset zero (the pre-r12
    behavior), deleting the destination tree first — dynamic
    overwrite alone would leave stale shard dirs beyond the rebuilt
    range — and re-recording the markers to match. Use it if
    fragments were edited in place or marker state is suspect. It
    REFUSES when a consumed batch's fragments are gone (pruned):
    those shards exist only in the tree it is about to delete, so a
    rebuild would silently lose them.

    ``prune_fragments=True``: delete each fragment ``batch=`` dir
    after its marker commits (marker-first, so a replayed epoch that
    recreates the dir is still seen as consumed). Default keeps
    fragments as the rebuild source of truth.

    A tree compacted by the pre-r12 full rebuild has no markers; the
    first incremental call treats every fragment as unconsumed and
    effectively rebuilds once (fragments were never pruned before
    markers existed, so the set is complete), recording markers from
    then on.

    Empty / fully-consumed fragment tree (scheduled compaction firing
    before the first batch lands, or again right after a cycle) is a
    NO-OP: returns the existing compacted table if one exists, else
    ``None`` — never an error, so the pass is safe on any schedule.

    Driver state is one (batch, shard_count) row per NEW ingest cycle
    plus one parsed marker per lifetime batch — the same bounded
    prefix-sum shape pack_sequences uses; the renumbering itself is a
    codegen map lookup, so each cycle is one clustering shuffle over
    the new fragments only. Returns the compacted table."""
    import os

    from cod_stats_spark.streaming._state import _fs_for

    frag_dir = os.path.join(state_dir, "shards_frag")
    dest = os.path.join(state_dir, "shards")
    fs = _fs_for(spark, state_dir)

    def _has_parquet(d: str) -> bool:
        return any(
            f.endswith(".parquet") for f in fs.list_files(d)
        ) if fs.exists(d) else False

    def _existing() -> "DataFrame | None":
        return spark.read.parquet(dest) if _has_parquet(dest) else None

    # consumption record: marker names at the destination root
    markers = [
        (int(m.group(1)), int(m.group(2)), int(m.group(3)), name)
        for name, m in (
            (n, _APPLIED.match(n)) for n in fs.list_names(dest)
        )
        if m
    ]
    if full_rebuild:
        missing = [
            b
            for b, _o, _n, _name in markers
            if not _has_parquet(os.path.join(frag_dir, f"batch={b}"))
        ]
        if missing:
            raise ValueError(
                "compact_curated_shards: full_rebuild=True but consumed "
                f"batches {sorted(missing)} have no fragments on disk "
                "(pruned?) — their shards exist only in the compacted "
                "tree, which a rebuild would delete; restore the "
                "fragments or stay incremental"
            )
        # delete the WHOLE tree (markers + shard dirs): dynamic
        # overwrite below only replaces dirs the rebuild writes, so
        # stale dirs beyond the rebuilt range would otherwise survive
        # and the returned table would mix old and new rows. The
        # delete MUST be verified — a silent failure would both
        # resurrect that bug and leave two marker generations whose
        # max(o+n) poisons every later incremental offset
        fs.delete(dest)
        if fs.exists(dest):
            raise IOError(
                f"compact_curated_shards: could not delete {dest} for "
                "the full rebuild — aborting rather than mixing stale "
                "shard dirs and duplicate markers into the new tree"
            )
        markers = []
    consumed = {b for b, _o, _n, _name in markers}
    offset = max((o + n for _b, o, n, _name in markers), default=0)

    # unconsumed fragment batches, increasing batch id
    new_batches = sorted(
        b
        for b in (
            int(name.split("=", 1)[1])
            for name in fs.list_names(frag_dir)
            if name.startswith("batch=")
        )
        if b not in consumed
        and _has_parquet(os.path.join(frag_dir, f"batch={b}"))
    )
    if not new_batches:
        return _existing()

    frag = spark.read.option("basePath", frag_dir).parquet(
        *[os.path.join(frag_dir, f"batch={b}") for b in new_batches]
    )
    counts = {
        int(r["batch"]): int(r["n"])
        for r in frag.groupBy("batch")
        .agg((F.max("shard_id") + 1).alias("n"))
        .collect()
    }
    offsets: dict[int, int] = {}
    for b in new_batches:
        offsets[b] = offset
        offset += counts.get(b, 0)
    omap = F.map_from_arrays(
        F.array(*[F.lit(int(b)) for b in offsets]),
        F.array(*[F.lit(int(v)) for v in offsets.values()]),
    )
    renum = frag.withColumn(
        "shard_id", F.col("shard_id") + omap[F.col("batch").cast("int")]
    ).drop("batch")
    (
        renum.repartition(F.col("shard_id"))
        .write.partitionBy("shard_id")
        # dynamic: replace only the shard dirs this cycle writes —
        # the frozen prefix of the tree is never touched or re-read
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(dest)
    )
    for b in new_batches:
        fs.create_text(
            os.path.join(
                dest, f"_APPLIED.b{b}.o{offsets[b]}.n{counts.get(b, 0)}"
            ),
            "",
        )
        if prune_fragments:
            fs.delete(os.path.join(frag_dir, f"batch={b}"))
    return spark.read.parquet(dest)
