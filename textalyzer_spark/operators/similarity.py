"""Approximate-nearest-neighbor similarity search over an embedding
column (``array<float>``).

The operator family (driver brief):

* :func:`cosine_topk` — exact baseline: query side broadcast, corpus
  scored in place, map-side partial top-k so the only exchange is
  n_partitions x n_queries x k candidate rows.
* :func:`lsh_cosine_topk` — random-hyperplane LSH buckets (sign-bit
  signatures via one Arrow numpy matmul); only bucket-colliding
  (query, vector) pairs are scored. Recall < 1 by construction;
  multiple hash tables raise it.
* :func:`ivf_cosine_topk` — IVF: mini k-means coarse quantizer
  (quantized centroid updates for cross-engine reproducibility),
  queries probe their n_probe nearest cells.
* :func:`embedding_near_dup_pairs` / ``_lsh`` — all-pairs exact
  baseline and the bucketed scale path (id-only bucket join, exact
  numpy verify, optional mega-bucket guard).

Every signature/assignment stage is Arrow-batched numpy — the
interpreted-Catalyst-HOF rule (BENCH.md) applies throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (JVM-side)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _partial_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-PARTITION top-k per query over ``(query_id, vec_id,
    cosine)`` — the map-side combine of a distributed top-k. Each scan
    partition emits at most n_queries x k rows, so the final exact
    window sees n_partitions x n_queries x k rows instead of the full
    scored set (at 10^12 corpus rows: the difference between a
    terabyte-scale sort exchange and a few megabytes).

    Selection uses the same pinned total order as the final rank
    (cosine desc, vec_id asc): any global top-k row is necessarily in
    its partition's top-k under the same comparator, so the result is
    exact, not approximate.
    """
    from collections.abc import Iterator

    import pandas as pd

    id_type = dict(scored.dtypes)["vec_id"]
    q_type = dict(scored.dtypes)["query_id"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = pdf if acc is None else pd.concat((acc, pdf))
            # keep the accumulator bounded between batches
            acc = (
                acc.sort_values(
                    ["query_id", "cosine", "vec_id"],
                    ascending=[True, False, True],
                )
                .groupby("query_id", sort=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    return scored.mapInPandas(
        run, f"query_id {q_type}, vec_id {id_type}, cosine double"
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query:
    ``(query_id, vec_id, cosine, rank)``; ``cosine`` rounded to 4
    decimals, rank by (rounded cosine desc, vec_id asc) — fully pinned
    so results are reproducible across engines. Self-matches
    (query_id == vec_id) are excluded.

    The corpus never shuffles for the join: the query side is
    broadcast and each corpus partition emits its local scores, then
    :func:`_partial_topk` combines map-side so the only exchange is
    n_partitions x n_queries x k candidate rows — the final per-query
    window is exact and tiny at any corpus size.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v_vec"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_cosine(F.col("q_vec"), F.col("v_vec")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        _partial_topk(scored, k)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs:
    ``(vec_a, vec_b, cosine)`` for all pairs with cosine >= threshold,
    vec_a < vec_b, cosine rounded to 4 decimals.

    Brute-force all-pairs (the exact baseline the LSH variant is
    measured against). The join is a self-cross restricted by id
    ordering; at 10^12 vectors use :func:`lsh_cosine_topk` buckets
    as the candidate generator and this only as the verifier.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    a = v.select(F.col("vid").alias("vec_a"), F.col("vec").alias("va"))
    b = v.select(F.col("vid").alias("vec_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_cosine(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs_lsh(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket_docs: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed embedding near-duplicate pairs — the scale path
    :func:`embedding_near_dup_pairs`'s docstring promises:
    ``(vec_a, vec_b, cosine)``, vec_a < vec_b, cosine rounded to 4
    decimals.

    Candidate generation: vectors colliding in >=1 of ``n_tables``
    hyperplane-sign buckets (an equi-join on (table, bucket) — NO
    cartesian product in the plan). Candidates are exact-verified
    with the true cosine, so precision is exact; recall follows the
    (1 - theta/pi)^n_bits S-curve and is pytest-measured against the
    brute-force baseline. At a real near-dup threshold (>=0.9,
    theta <= 26 deg) recall is high and the bucket join touches a
    vanishing fraction of the n^2 pairs; tune n_bits up with corpus
    size to keep buckets small.

    ``max_bucket_docs`` is the mega-bucket guard (same rationale as
    ``minhash_lsh_pairs``): a family of f byte-identical embeddings
    lands whole in one bucket of every table and fans out f^2/2 rows
    per table. Default OFF here because the registered query's tiny
    n_bits=4 buckets at low threshold would trip any useful cap; set
    it (e.g. 10_000) on duplicate-heavy production corpora.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    vs = _hyperplane_buckets(
        vectors.withColumnRenamed(id_col, "vec_id"),
        "vec_id", dim, n_bits, n_tables, seed, vec_col,
    )
    # bucket-join IDs ONLY: a candidate row carrying both 64-dim
    # double arrays is ~1 KB, and a dense bucket can emit millions of
    # pairs — id-only join + dedup shuffles ~16 bytes/row instead,
    # then the vectors attach via two equi-joins (auto-broadcast when
    # the vectors side is small; plain shuffled hash join at 10^12)
    if max_bucket_docs is not None:
        ok = (
            vs.groupBy("table", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= max_bucket_docs)
            .select("table", "bucket")
        )
        vs = vs.join(ok, ["table", "bucket"])
    a = vs.select("table", "bucket", F.col("vec_id").alias("vec_a"))
    b = vs.select("table", "bucket", F.col("vec_id").alias("vec_b"))
    pair_ids = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vv = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    cands = (
        pair_ids.join(
            vv.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va")),
            "vec_a",
        )
        .join(
            vv.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb")),
            "vec_b",
        )
    )

    # exact verify in an Arrow-batched numpy pass: on low-threshold /
    # near-uniform corpora the bucket join can emit millions of
    # candidates, and the interpreted-HOF cosine (2*dim ops per pair,
    # outside codegen) was the wall-time hot spot at sf0.1
    id_type = dict(vectors.withColumnRenamed(id_col, "vec_id").dtypes).get(
        "vec_id", "bigint"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ma = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["va"]])
            mb = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["vb"]])
            dots = np.einsum("ij,ij->i", ma, mb)
            na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
            nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
            cos = np.round(dots / (na * nb), 4)
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"][keep],
                    "vec_b": pdf["vec_b"][keep],
                    "cosine": cos[keep],
                }
            )

    return cands.mapInPandas(
        score, f"vec_a {id_type}, vec_b {id_type}, cosine double"
    )


def _assign_nearest(v: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """``(vec_id, vec, cluster int)`` — nearest centroid by cosine;
    ties pick the LARGEST cluster index (the same pinned tiebreak as
    the DuckDB oracle's ``ORDER BY sim DESC, cluster DESC``).

    Arrow-batched numpy: one (batch x n_clusters) matmul per batch.
    The previous Catalyst formulation (array_max over per-centroid
    higher-order-function cosines) ran interpreted at n_clusters x
    2*dim ops per row — the engine's no-interpreted-HOF rule applies
    to the quantizer too."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    c_mat = np.asarray(centroids, dtype=np.float64)
    c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
    n_clusters = len(centroids)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["vec"]])
            v_norm = np.sqrt((mat * mat).sum(axis=1))
            sims = (mat @ c_mat.T) / (v_norm[:, None] * c_norm[None, :])
            # argmax with ties -> largest index: argmax on the reversed
            # axis finds the FIRST max there, i.e. the last one here
            cluster = n_clusters - 1 - np.argmax(sims[:, ::-1], axis=1)
            out = pdf[["vec_id", "vec"]].copy()
            out["cluster"] = cluster.astype(np.int32)
            yield out

    id_type = dict(v.dtypes).get("vec_id", "bigint")
    return v.mapInPandas(
        run, f"vec_id {id_type}, vec array<double>, cluster int"
    )


def _quantize(x: float) -> float:
    """floor(x*1e6 + 0.5)/1e6 — a rounding both engines compute
    bit-identically (Python round() is banker's, DuckDB round() is
    half-away; floor is floor everywhere)."""
    import math

    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer, then each
    query scores only the vectors in its ``n_probe`` nearest cells.
    Output schema/ordering identical to :func:`cosine_topk`.

    The quantizer is mini k-means on the DataFrame: centroids live on
    the driver (n_clusters x dim floats — tiny), assignment is a
    broadcast argmax projection, the update step is one groupBy over
    (cluster, dim). Scored fraction ~= n_probe / n_clusters; recall
    depends on how clustered the corpus is (pytest-checked vs brute
    force).

    Updated centroids are quantized to 1e-6 (:func:`_quantize`) each
    iteration: floating-point partial-sum order in a distributed avg
    is nondeterministic (shuffle-fetch order), so unquantized
    centroids differ in the last ulp run-to-run AND engine-to-engine.
    Quantization makes the quantizer reproducible — and gives the
    whole operator a value-exact DuckDB twin (oracles.py unrolls the
    same k-means as chained CTEs). 1e-6 jitter on a coarse quantizer
    is semantically nil.
    """
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    # deterministic init: first n_clusters vectors by id
    init = v.orderBy("vec_id").limit(n_clusters).collect()
    centroids = [list(r["vec"]) for r in init]

    for _ in range(iters):
        assigned = _assign_nearest(v, centroids)
        sums = (
            assigned.select(
                "cluster", F.posexplode("vec").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new_cents = {}
        for r in sums:
            new_cents.setdefault(r["cluster"], {})[r["dim"]] = _quantize(r["mean"])
        centroids = [
            [new_cents[c][d] for d in sorted(new_cents[c])]
            if c in new_cents
            else centroids[c]
            for c in range(n_clusters)
        ]

    assigned = _assign_nearest(v, centroids)

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    # n_probe nearest cells per query: rank the per-centroid sims
    sims = [
        _cosine(F.col("q_vec"), F.array(*[F.lit(c) for c in cen])).alias(f"_s{i}")
        for i, cen in enumerate(centroids)
    ]
    q_cells = q.select("query_id", "q_vec", *sims)
    cell_structs = F.array(
        *[
            F.struct(F.col(f"_s{i}").alias("sim"), F.lit(i).alias("cluster"))
            for i in range(n_clusters)
        ]
    )
    q_probed = q_cells.select(
        "query_id",
        "q_vec",
        F.explode(
            F.slice(F.reverse(F.array_sort(cell_structs)), 1, n_probe)
        ).alias("cell"),
    ).select("query_id", "q_vec", F.col("cell.cluster").alias("cluster"))

    scored = (
        assigned.join(F.broadcast(q_probed), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_cosine(F.col("q_vec"), F.col("vec")), 4).alias("cosine"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes, precomputed driver-side.

    Deterministic from the seed, identical on every executor, no
    stored model. The same constants are embedded (full-precision
    repr) in the DuckDB oracle SQL, so the bucket assignment has a
    value-exact cross-engine twin."""
    import random

    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def lsh_table_planes(
    dim: int, n_bits: int, n_tables: int, seed: int
) -> list[list[list[float]]]:
    """Per-table hyperplane sets; table t uses seed + 7919*t (reusing
    one signature across tables would make every table identical)."""
    return [
        _hyperplanes(dim, n_bits, seed + 7919 * t) for t in range(n_tables)
    ]


def _hyperplane_buckets(
    df: DataFrame,
    id_alias: str,
    dim: int,
    n_bits: int,
    n_tables: int,
    seed: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, _vec_<id> array<double>, table int, bucket string)`` —
    one row per (vector, table); bucket is the n_bits sign-bit string
    of the vector against that table's hyperplanes.

    Arrow-batched numpy: ONE matmul of the (batch x dim) matrix
    against the stacked (n_tables*n_bits x dim) plane matrix per
    batch. The previous Catalyst higher-order-function formulation
    ran interpreted (outside whole-stage codegen) at n_tables x
    n_bits x dim ~ 2k multiplies per row and was slower than the
    brute-force scorer it was meant to beat (BENCH.md lesson)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    planes = lsh_table_planes(dim, n_bits, n_tables, seed)
    p_mat = np.asarray(planes, dtype=np.float64).reshape(n_tables * n_bits, dim)
    vec_field = f"_vec_{id_alias}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_field]]
            )
            signs = (mat @ p_mat.T) > 0  # (batch, n_tables*n_bits)
            bucket_cols = []
            for t in range(n_tables):
                bits = signs[:, t * n_bits : (t + 1) * n_bits].astype(np.uint8)
                bucket_cols.append(
                    ["".join("1" if b else "0" for b in row) for row in bits]
                )
            yield pd.DataFrame(
                {
                    id_alias: pdf[id_alias],
                    vec_field: pdf[vec_field],
                    "buckets": [
                        [bucket_cols[t][i] for t in range(n_tables)]
                        for i in range(len(pdf))
                    ],
                }
            )

    id_type = dict(df.dtypes).get(id_alias, "bigint")
    wide = df.select(
        F.col(id_alias),
        F.col(vec_col).cast("array<double>").alias(vec_field),
    ).mapInPandas(
        run,
        f"{id_alias} {id_type}, {vec_field} array<double>, buckets array<string>",
    )
    return wide.select(
        id_alias,
        vec_field,
        F.posexplode("buckets").alias("table", "bucket"),
    )


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Random-hyperplane LSH ANN: ``(query_id, vec_id, cosine, rank)``.

    Each of ``n_tables`` tables buckets vectors by an ``n_bits``
    sign-bit signature; a (query, vector) pair is scored iff it
    collides in >=1 table. Expected candidate fraction per table is
    ~(1 - theta/pi)^n_bits for angle theta. Scoring + top-k identical
    to :func:`cosine_topk`, so output schema/ordering match exactly.
    """
    vs = _hyperplane_buckets(
        vectors.withColumnRenamed(id_col, "vec_id"),
        "vec_id", dim, n_bits, n_tables, seed, vec_col,
    )
    qs = _hyperplane_buckets(
        queries.withColumnRenamed(query_id_col, "query_id"),
        "query_id", dim, n_bits, n_tables, seed, vec_col,
    )
    cands = (
        vs.join(F.broadcast(qs), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.col("_vec_query_id").alias("q_vec"),
            F.col("_vec_vec_id").alias("v_vec"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("q_vec"), F.col("v_vec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
