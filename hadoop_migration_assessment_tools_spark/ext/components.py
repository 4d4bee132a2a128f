"""[EXT] Connected components over duplicate-pair graphs (cluster-then-survive dedup).

Near-dup detectors (MinHash/SimHash/Jaccard — ext/dedup.py) emit PAIRS; a real
training-data pipeline needs CLUSTERS: if A~B and B~C, all three are one duplicate
group even when A~C was never directly observed. This module closes that gap with
the alternating large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) — the standard O(log n)-round
formulation used by large-scale dedup pipelines.

Scale design:
- No adjacency lists are ever materialized (no collect_list): each star round is a
  groupBy-min plus an equi-join back to the edge list — all codegen'd, all
  map-side-combinable, skew handled by AQE.
- Each round ends in `localCheckpoint` to cut lineage (iterative DataFrame loops
  otherwise stack O(rounds) of plan on every action).
- Convergence is detected by a canonical-edge checksum (count + sum of xxhash64),
  one tiny agg action per round — never a driver-side edge collect.
- Rounds are O(log n) in the worst case; duplicate clusters in practice have tiny
  diameter, so 3-5 rounds is typical.

Reference scope note: the reference (google/hadoop-migration-assessment-tools) has no
graph operator — this is part of the [EXT] LLM-pipeline layer the Spark engine adds
on top of the reference's event-log surface (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.checkpoints import free_local_checkpoint

__all__ = [
    "connected_components",
    "pagerank_fixed_point",
    "dup_clusters",
    "dedup_by_components",
]


def _canonical(edges: DataFrame) -> DataFrame:
    """Orient every edge (larger, smaller), drop self-loops and duplicates."""
    src, dst = edges.columns[0], edges.columns[1]
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.greatest(F.col(src), F.col(dst)).alias("src"),
            F.least(F.col(src), F.col(dst)).alias("dst"),
        )
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    """(edge_count, order-independent hash) of a canonical edge set — one agg action."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    Implemented as: undirected view -> per-node min neighbor (groupBy, map-side
    combined) -> join back -> filter dst > src. No adjacency materialization.
    """
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = und.groupBy("src").agg(F.min("dst").alias("_mn"))
    m = F.least(F.col("src"), F.col("_mn"))
    return (
        und.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), m.alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient (larger=key, smaller=val); connect every val — and the key itself —
    to the minimum val of the key's neighborhood.

    The input may carry duplicate edges (r14: the mid-round ``_canonical``
    distinct was dropped — ``_large_star`` already emits oriented self-loop-free
    edges, duplicates don't change any groupBy-min, and the loop's outer
    ``_canonical`` dedups the round's output anyway; that distinct was a full
    extra shuffle per iteration)."""
    src, dst = edges.columns[0], edges.columns[1]
    oriented = edges.filter(F.col(src) != F.col(dst)).select(
        F.greatest(F.col(src), F.col(dst)).alias("src"),
        F.least(F.col(src), F.col(dst)).alias("dst"),
    )
    mins = oriented.groupBy("src").agg(F.min("dst").alias("_mn"))
    joined = oriented.join(mins, "src")
    vals = joined.filter(F.col("dst") != F.col("_mn")).select(
        F.col("dst").alias("src"), F.col("_mn").alias("dst")
    )
    keys = mins.select(F.col("src"), F.col("_mn").alias("dst"))
    return vals.union(keys)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node in the (undirected) edge list with its component id
    (= the minimum node id in the component). Returns (node, component).

    Nodes that appear in no edge are unknown to this function — union isolated
    nodes as (id, id) at the call site if the full vertex set matters.
    """
    # One ACTION per round (r14): the lazy checkpoint materializes inside the
    # checksum aggregation itself, where the eager form paid a separate
    # materialization job before each checksum — docs_dup_clusters profiled as
    # pure scheduler latency (39 stages, 2.7 s task time, 6.5 s wall), so
    # halving the per-round driver round-trips is the dominant lever. Old
    # round checkpoints are freed once the next round is materialized.
    cur = _canonical(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    cur = cur.localCheckpoint(eager=False)
    prev_sig = _checksum(cur)
    for _ in range(max_iter):
        if prev_sig[0] == 0:
            break
        nxt = _canonical(_small_star(_large_star(cur))).localCheckpoint(eager=False)
        sig = _checksum(nxt)
        free_local_checkpoint(cur)
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    # Converged star graph: every edge is (member, root). Roots label themselves.
    return (
        cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        .union(cur.select(F.col("dst").alias("node"), F.col("dst").alias("component")))
        .distinct()
    )


def dup_clusters(pairs: DataFrame, left: str = "id_a", right: str = "id_b") -> DataFrame:
    """Cluster summary over a duplicate-pair list: one row per component with its
    size and extrema. The component id doubles as the survivor (min member)."""
    labels = connected_components(pairs, src=left, dst=right)
    return labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max("node").alias("max_member"),
    )


def dedup_by_components(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id", left: str = "id_a", right: str = "id_b"
) -> DataFrame:
    """Drop every clustered row except the component minimum (deterministic
    survivor), keeping rows that belong to no duplicate pair. One broadcast-able
    anti-join when the victim set is small relative to the corpus."""
    labels = connected_components(pairs, src=left, dst=right)
    victims = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(victims, id_col, "left_anti")


# --- fixed-point PageRank -------------------------------------------------------------


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank in SCALED-INTEGER arithmetic over a directed edge list.

    rank_0(v) = scale div n; each round
        rank_{t+1}(v) = ((100 - damping_pct) * (scale div n)
                         + damping_pct * SUM_{u -> v} (rank_t(u) div outdeg(u))) div 100
    — every operation is 64-bit integer div/sum, so two engines that replay the
    same formula agree BIT FOR BIT (float PageRank never certifies: parallel
    double sums are order-dependent and libm exp/log differ across engines).
    The truncation of each `div` loses mass (ranks sum to slightly under
    `scale`), which is harmless for ranking and exactly reproducible.

    Every node must have outdeg >= 1 (true for symmetrized duplicate graphs;
    dangling-mass redistribution is deliberately out of scope). Returns
    (node, rank_fp, outdeg).

    Scale shape (r13): outdegree is STATIC across rounds, so it rides the
    checkpointed edge list (the GraphX adjacency pattern) — per round there is
    exactly ONE shuffle join of ranks onto the degree-annotated edges keyed by
    src and one groupBy(dst) with map-side partial sums. The former per-round
    ranks-onto-deg join was a full extra shuffle of the rank table every
    iteration (5 shuffles on a 1e11-edge graph). `localCheckpoint` per round
    cuts the iterative lineage exactly as connected_components does. The tiny
    n-count is crossJoin-broadcast, never collected per row.
    """
    # checkpoint the canonical edge set ONCE (connected_components discipline):
    # without the cut, the caller's full edge derivation re-executes per round.
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    degd = deg.select(F.col("_s").alias("_d2"), F.col("outdeg").alias("_outdeg_d"))
    # degree-annotated edges, checkpointed: outdeg of the SOURCE (the per-round
    # contribution divisor) and of the DESTINATION (so rank rows leave the last
    # groupBy already carrying their own outdeg — no final degree join). The
    # dst-side join is LEFT so contract-violating sink nodes (outdeg 0) drop
    # from the OUTPUT (the old inner final-join behavior) without perturbing
    # the edge set the contributions flow over.
    ed = (
        e.join(deg, "_s")
        .join(degd, e["_d"] == degd["_d2"], "left")
        .select("_s", "_d", "outdeg", "_outdeg_d")
        .localCheckpoint(eager=True)
    )
    free_local_checkpoint(e)
    nodes = ed.select(F.col("_s").alias("node"), "outdeg").distinct()
    n_df = nodes.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    base_pct = 100 - int(damping_pct)

    ranks = (
        nodes.join(F.broadcast(n_df))
        .select(
            "node", F.expr(f"{int(scale)} div _n").alias("rank_fp"), "_n", "outdeg"
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(int(iterations)):
        nxt = (
            ed.join(
                ranks.select("node", "rank_fp", "_n"), ed["_s"] == F.col("node")
            )
            .groupBy(F.col("_d").alias("node"))
            .agg(
                F.sum(F.expr("rank_fp div outdeg")).cast("long").alias("_msum"),
                F.first("_n").alias("_n"),
                F.first("_outdeg_d").cast("long").alias("outdeg"),
            )
            .select(
                "node",
                F.expr(
                    f"({base_pct} * ({int(scale)} div _n) + {int(damping_pct)} * _msum) div 100"
                ).alias("rank_fp"),
                "_n",
                "outdeg",
            )
        )
        old = ranks
        ranks = nxt.localCheckpoint(eager=True)
        free_local_checkpoint(old)
    return ranks.filter(F.col("outdeg").isNotNull()).select("node", "rank_fp", "outdeg")
