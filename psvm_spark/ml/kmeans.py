"""Distributed Lloyd's k-means over the embeddings table.

The reference's training loop (SURVEY.md A10) is "iterate: distributed
pass + tiny driver-side solve"; k-means is the clustering instance of
the same shape, and the IVF index (queries/llm.py sim_ivf) needs it to
train a real coarse quantizer at scale.

Spark-first design, one shuffle per iteration:

- **Assignment is narrow.** Centroids (k x d doubles — bounded by k,
  never by the corpus) are embedded as an array *literal* in the plan,
  so per-row argmin runs inside the scan projection: no join, no
  shuffle, no Python. At 100 TB this pass is scan-speed.
- **Update is one map-side-combined shuffle.** posexplode(embedding)
  -> partial sums per (cluster, dim) -> k x d cells cross the wire.
  The new centroids (k rows) come to the driver — the same bounded
  driver-side step as the reference's rank-0 Cholesky [psvm:
  matrix_manipulation.cc, SURVEY.md A8] — and are re-embedded as next
  iteration's literals.
- **Determinism.** Init = the k lowest vec_ids' vectors (content-
  stable, no RNG); argmin ties break toward the lowest cluster id via
  array_position-of-min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from psvm_spark.catalog import load_table
from psvm_spark.queries._util import lit_double_matrix


def _dist_expr() -> str:
    # squared L2 distance from `emb` to each row of the `cents` literal
    return (
        "transform(cents, c -> aggregate(zip_with(emb, c, (a, b) -> "
        "CAST((a - b) * (a - b) AS DOUBLE)), CAST(0.0 AS DOUBLE), (s, x) -> s + x))"
    )


def lloyd(
    spark: SparkSession, sf_dir: str, k: int = 4, n_iter: int = 5
) -> tuple[DataFrame, list[float], list[list[float]]]:
    """Run ``n_iter`` Lloyd iterations.

    Returns (assignments, inertia history, centroids), where assignments
    is (vec_id, label, cluster, dist2) under the returned centroids —
    the centroids the *final* assignment pass used, so downstream users
    (the IVF quantizer) see a consistent (centroids, assignment) pair.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    init = [
        [float(x) for x in r.emb]
        for r in emb.orderBy("vec_id").limit(k).select("emb").collect()
    ]
    cents = init
    history: list[float] = []
    assigned = None
    used = init
    for it in range(n_iter):
        used = cents
        lit = lit_double_matrix(cents)
        assigned = (
            emb.withColumn("cents", lit)
            .withColumn("d", F.expr(_dist_expr()))
            .select(
                "vec_id",
                "label",
                "emb",
                (F.expr("array_position(d, array_min(d))").cast("int") - 1).alias(
                    "cluster"
                ),
                F.expr("array_min(d)").alias("dist2"),
            )
        )
        # inertia + new centroids in ONE distributed pass each
        history.append(
            assigned.agg(F.sum("dist2").alias("i")).collect()[0]["i"]
        )
        if it == n_iter - 1:
            break  # keep (centroids, assignment) consistent for callers
        cell = (
            assigned.select("cluster", F.posexplode("emb").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        rows = cell.collect()
        d = len(cents[0])
        nxt = [list(c) for c in cents]  # empty cluster keeps its centroid
        sums: dict[int, list[float]] = {}
        counts: dict[int, int] = {}
        for r in rows:
            sums.setdefault(r.cluster, [0.0] * d)[r.dim] = r.s
            counts[r.cluster] = r.n
        for c, vec in sums.items():
            nxt[c] = [v / counts[c] for v in vec]
        cents = nxt
    return assigned.select("vec_id", "label", "cluster", "dist2"), history, used
