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
  around a template), so propagation converges in a handful of rounds.
  For adversarially long chains a diameter guard switches to
  large-star/small-star contraction (Kiveris et al., "Connected
  Components in MapReduce"), which converges in O(log^2 n) rounds
  independent of diameter — a 10k-hop path finishes in ~10 contraction
  rounds instead of 10k propagation rounds.
- Early-exit via a `changed` count per round — an O(V) aggregate, cheap
  relative to the join, and it stops exactly at the fixpoint.

Reference parity: the reference engine has no graph surface; this is
part of the beyond-reference LLM-pipeline tier (SURVEY.md section 2.2
extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_components(e: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al.) over an edge
    set ``e`` with columns (s, d) containing both orientations.

    Returns DataFrame[v, component] where component is the minimum
    vertex id of v's connected component.  Each round is two
    groupBy-min + join passes; the edge set contracts geometrically, so
    rounds are O(log^2 n) regardless of graph diameter.
    """
    # canonical orientation: a > b (edges point from larger to smaller)
    cur = (
        e.filter(F.col("s") != F.col("d"))
        .select(F.greatest("s", "d").alias("a"), F.least("s", "d").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    vertices = e.select(F.col("s").alias("v")).distinct().localCheckpoint(eager=True)
    for _ in range(max_rounds):
        # large-star: every neighbor larger than u links to min(N(u) + {u})
        adj = cur.select("a", "b").union(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = adj.groupBy("a").agg(F.min("b").alias("mn"))
        mins = mins.select("a", F.least("mn", F.col("a")).alias("m"))
        large = (
            adj.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: orient large -> small, link every smaller neighbor
        # (and u itself) to the minimum
        adj2 = large.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        mins2 = adj2.groupBy("a").agg(F.min("b").alias("m"))
        nxt = (
            adj2.join(mins2, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixpoint: both distinct canonical sets equal (cheap on the
        # contracted set — by now edges ~ number of non-root vertices)
        if nxt.count() == cur.count() and nxt.exceptAll(cur).limit(1).count() == 0:
            cur = nxt
            break
        cur = nxt
    else:
        raise RuntimeError(f"_star_components: no fixpoint in {max_rounds} rounds")
    # fixpoint edges form stars (v, root); roots and absorbed singletons
    # label themselves
    return (
        vertices.join(cur, vertices.v == cur.a, "left")
        .select("v", F.coalesce("b", "v").alias("component"))
    )


def _driver_components(e: DataFrame) -> DataFrame:
    """Exact union-find on the driver for SMALL candidate graphs.

    A distributed iteration costs O(diameter) scheduler rounds — seconds
    of fixed overhead regardless of data size — while a few thousand
    edges union-find in microseconds.  Only reachable behind the
    measured edge-count gate in :func:`connected_components`; the
    threshold (50k edges ~ a few MB) keeps the driver safe by
    construction, unlike an unconditional collect."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    # collect() is bounded by the caller's edge-count gate; a
    # toLocalIterator would pay one job per partition instead of one
    for s, d in e.select("s", "d").collect():
        ra, rb = find(s), find(d)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(v, find(v)) for v in parent]
    # Arrow-backed local frame (_util.local_df): the previous
    # createDataFrame(list).coalesce(1) made every downstream action
    # replay 32 pickled slices through ONE Python worker serially —
    # measured 3.6 s per action on a 2k-row result vs 0.07 s via Arrow.
    from psvm_spark.queries._util import local_df

    return local_df(e.sparkSession, rows, "v long, component long").coalesce(1)


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    star_after: int = 8,
    driver_threshold: int = 50_000,
    assume_unique: bool = False,
) -> DataFrame:
    """Return DataFrame[v, component]: min vertex id reachable from v.

    ``edges`` is an undirected pair list; both endpoints of every edge
    appear in the output.  Three regimes, chosen by measured size/shape:

    - **<= driver_threshold edges**: exact union-find on the driver —
      the LSH-pruned dup graph of a small corpus is a few thousand
      edges, and per-round scheduler overhead dwarfs the actual work
      (measured: 10s of distributed rounds vs ms of union-find at
      1.5k edges).  Set ``driver_threshold=0`` to force distribution.
    - **large, shallow**: min-label propagation, one shuffle per round.
    - **large, deep** (no fixpoint after ``star_after`` rounds):
      large-star/small-star contraction, diameter-independent rounds.

    Raises if ``max_iter`` propagation rounds AND the contraction cap
    are both exhausted.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    # ``assume_unique``: the caller guarantees edges are canonical
    # (src < dst) and deduplicated — then BOTH union branches are unique
    # and disjoint (s < d vs s > d), so the distinct() below would be a
    # pure extra shuffle of the whole edge set.  Candidate-pair
    # generators that end in groupBy(ia, ib) qualify; label-contracted
    # graphs do NOT (both orientations of a pair can appear).
    if not assume_unique:
        e = e.distinct()
    e = e.localCheckpoint(eager=True)
    # Size the working partitioning to the measured edge count: the loop
    # below runs O(diameter) tiny jobs, and on a small graph (the common
    # case after candidate pruning) 32-task rounds are pure scheduler
    # overhead.  The count is free — e is already materialized.  At real
    # scale the gate never fires and e keeps its natural partitioning.
    n_edges = e.count()
    spark = e.sparkSession
    if n_edges <= driver_threshold:
        return _driver_components(e)
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
    for i in range(max_iter):
        if i == star_after:
            # diameter guard: propagation is pay-per-hop; hand the graph
            # to the contraction algorithm instead of looping to the cap
            return _star_components(e)
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
