"""Connected components over a candidate-pair graph (dedup clustering).

Near-dup detection emits *pairs* (MinHash bands, SimHash buckets, shared
shingles); a pipeline needs *clusters* — transitively closed groups from
which one representative per cluster is kept.  This is min-label
propagation as a driver-coordinated DataFrame loop: each iteration every
vertex takes the minimum label among itself and its neighbors, so labels
converge to the minimum vertex id of each component (deterministic,
integer-exact — safe to oracle against a recursive-CTE transitive
closure).

Scale (100 TB):
- The edge set is the *pruned candidate* graph (LSH bands / inverted
  index), never all-pairs — millions of edges per billion docs, not n^2.
- Each iteration is one shuffle (join on dst) + one map-side-combined
  min-aggregation; `localCheckpoint` truncates lineage so plan size and
  scheduler cost stay O(1) per iteration instead of growing with the
  loop (same pattern as ml/failsafe.py driver-iterate training).
- Iterations = graph diameter.  Dup clusters are shallow (stars/cliques
  around a template), so propagation converges in a handful of rounds;
  for adversarially long chains the known fix is large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce"),
  which this loop structure accommodates without new primitives.
- Early-exit via a `changed` count per round — an O(V) aggregate, cheap
  relative to the join, and it stops exactly at the fixpoint.

Reference parity: the reference engine has no graph surface; this is
part of the beyond-reference LLM-pipeline tier (SURVEY.md section 2.2
extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "a", dst: str = "b", max_iter: int = 25
) -> DataFrame:
    """Return DataFrame[v, component]: min vertex id reachable from v.

    ``edges`` is an undirected pair list; both endpoints of every edge
    appear in the output.  Raises if ``max_iter`` rounds don't converge
    (diameter larger than max_iter — raise it or pre-contract stars).
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Size the working partitioning to the measured edge count: the loop
    # below runs O(diameter) tiny jobs, and on a small graph (the common
    # case after candidate pruning) 32-task rounds are pure scheduler
    # overhead.  The count is free — e is already materialized.  At real
    # scale the gate never fires and e keeps its natural partitioning.
    n_edges = e.count()
    spark = e.sparkSession
    if n_edges < 200_000:
        parts = max(2, spark.sparkContext.defaultParallelism // 8)
        e = e.repartition(parts, "d").localCheckpoint(eager=True)
    labels = (
        e.select(F.col("s").alias("v")).distinct().withColumn("label", F.col("v"))
    ).localCheckpoint(eager=True)
    # Convergence test: labels only ever decrease, so sum(label) strictly
    # decreases until the fixpoint — a one-column aggregate on the
    # already-materialized table replaces a join-and-count per round.
    prev_sum = None
    for _ in range(max_iter):
        labels = (
            e.join(labels, e.d == labels.v)
            .select(F.col("s").alias("v"), "label")
            .union(labels)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            return labels.select("v", F.col("label").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
