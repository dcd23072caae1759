"""Near-duplicate cluster resolution: pairs -> components -> one kept
representative per component — the operator a 100 TB dedup run
actually terminates in.

The pair generators (dedup.minhash_lsh_pairs, dedup.simhash_near_pairs,
dedup.ngram_jaccard_pairs, tokens.winnow_near_dup_pairs,
similarity.embedding_near_dup_pairs_lsh) emit near-dup *edges*; this
module composes them with the shared connected-components machinery
(graph.connected_components — bounded driver union-find + distributed
min-label fallback) and a deterministic keep rule into the dedup
DECISION per document. It is the corpus-scale analog of the
reference's group-collect + HAVING + greedy-keep chain
(textalyzer/src/duplication.rs:104-121,298-336): "same content"
generalizes to "connected by any near-dup pair edge", and the greedy
keep generalizes to one survivor per component.

Scale notes: the pair graph is orders of magnitude smaller than the
corpus (only docs that matched anything appear); the final label join
is one hash shuffle on doc_id; the quality keep rule is two narrow
aggregations on the labels table — no window over components, so a
pathological mega-component cannot skew a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from textalyzer_spark.operators.graph import connected_components

#: method name -> (callable path, (left id, right id) output columns)
_METHODS = {
    "minhash": "minhash_lsh_pairs",
    "simhash": "simhash_near_pairs",
    "jaccard": "ngram_jaccard_pairs",
    "winnow": "winnow_near_dup_pairs",
}


def near_dup_pairs(
    df: DataFrame,
    method: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    **method_kwargs,
) -> DataFrame:
    """Dispatch to a registered near-dup pair generator; returns the
    generator's native output (always including ``doc_a``/``doc_b``)."""
    if method == "minhash":
        from textalyzer_spark.operators.dedup import minhash_lsh_pairs

        return minhash_lsh_pairs(
            df, id_col=id_col, text_col=text_col, **method_kwargs
        )
    if method == "simhash":
        from textalyzer_spark.operators.dedup import simhash_near_pairs

        return simhash_near_pairs(
            df, id_col=id_col, text_col=text_col, **method_kwargs
        )
    if method == "jaccard":
        from textalyzer_spark.operators.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(
            df, id_col=id_col, text_col=text_col, **method_kwargs
        )
    if method == "winnow":
        from textalyzer_spark.operators.tokens import winnow_near_dup_pairs

        return winnow_near_dup_pairs(
            df, id_col=id_col, text_col=text_col, **method_kwargs
        )
    raise ValueError(
        f"unknown near-dup method {method!r}; one of "
        f"{sorted(_METHODS)} — or pass precomputed pairs= to near_dedup"
    )


def near_dedup(
    df: DataFrame,
    method: str = "minhash",
    keep: str = "min_id",
    pairs: DataFrame | None = None,
    quality: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iters: int = 12,
    driver_max_edges: int = 1_000_000,
    driver_max_edge_bytes: int = 128 << 20,
    **method_kwargs,
) -> DataFrame:
    """Near-duplicate cluster resolution over the WHOLE corpus:
    ``(doc_id, component, keep boolean)`` — one row per input document
    (docs in no pair are their own singleton component and are kept).

    ``component`` is the minimum doc_id in the document's connected
    component of the near-dup pair graph. The ``keep`` rule picks
    exactly one survivor per component, deterministically:

    * ``keep="min_id"`` — the minimal doc_id (== the component label),
      matching :func:`~textalyzer_spark.operators.dedup.exact_dedup`'s
      keep-min-id convention;
    * ``keep="quality"`` — the highest
      :func:`~textalyzer_spark.operators.quality.quality_score` doc
      (tie -> minimal doc_id). Pass ``quality=`` a precomputed
      ``(doc_id, quality_score)`` table to reuse scores; otherwise it
      is computed from ``df``.

    ``pairs=`` accepts a precomputed edge table with ``doc_a``/
    ``doc_b`` columns (e.g. embedding_near_dup_pairs_lsh output
    renamed) and skips the ``method`` dispatch.
    """
    if pairs is None:
        pairs = near_dup_pairs(df, method, id_col, text_col, **method_kwargs)
    docs = df.select(F.col(id_col).alias("doc_id")).distinct()
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = connected_components(
        edges,
        docs,
        max_iters=max_iters,
        driver_max_edges=driver_max_edges,
        driver_max_edge_bytes=driver_max_edge_bytes,
    )

    if keep == "min_id":
        return labels.select(
            "doc_id",
            "component",
            (F.col("doc_id") == F.col("component")).alias("keep"),
        )
    if keep != "quality":
        raise ValueError(f"unknown keep rule {keep!r}: min_id | quality")

    if quality is None:
        from textalyzer_spark.operators.quality import quality_score

        quality = quality_score(df, id_col=id_col, text_col=text_col)
    return quality_keep(labels, quality)


def quality_keep(labels: DataFrame, quality: DataFrame) -> DataFrame:
    """The quality keep rule over ANY ``(doc_id, component)`` label
    table (single-corpus near_dedup or the incremental maintenance
    labels): highest ``quality_score`` per component survives, tie ->
    minimal doc_id; missing scores rank below every real score."""
    q = quality.select(
        F.col("doc_id"), F.col("quality_score").alias("_q")
    )
    lq = labels.join(q, "doc_id", "left").withColumn(
        "_q", F.coalesce(F.col("_q"), F.lit(float("-inf")))
    )
    # NO localCheckpoint here despite the three consumers (qmax,
    # keep_ids, final select): Catalyst's ReusedExchange dedupes the
    # identical quality subplan across them inside ONE query, and an
    # eager materialization barrier measured SLOWER (5.54 s vs 4.81 s
    # at sf0.1 — A/B in BENCH.md). The fan-out rule applies to
    # multi-ACTION pipelines, not single-action subplan fan-out.
    # two narrow aggs instead of a per-component window: a mega
    # component (boilerplate family) would otherwise pin one task
    qmax = lq.groupBy("component").agg(F.max("_q").alias("_qmax"))
    keep_ids = (
        lq.join(qmax, "component")
        .filter(F.col("_q") == F.col("_qmax"))
        .groupBy("component")
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    return (
        lq.join(keep_ids, "component")
        .select(
            "doc_id",
            "component",
            (F.col("doc_id") == F.col("_keep_id")).alias("keep"),
        )
    )
