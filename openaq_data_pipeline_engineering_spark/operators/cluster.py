"""Connected components over a candidate-pair edge list — the step that
turns near-duplicate PAIRS into dedup CLUSTERS with one survivor each.

The reference has no graph step (its dedup is single-key row_number,
glue_jobs/process_openaq_raw.py:131-135); this belongs to the
training-pipeline extension surface: MinHash/SimHash/embedding LSH all
emit pairs, and corpus dedup needs the transitive closure of those
pairs (A~B, B~C ⇒ {A,B,C} is one duplicate group).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, a node adopts the minimum label among itself
and its neighbors; converged when no label changes. Rounds needed =
graph diameter, and near-dup components are small and dense (they exist
because their members are mutually similar), so 3-5 rounds is typical.

Scale posture (100 TB):
- The edge list is LSH-bounded (pairs only within buckets), so the
  graph is orders of magnitude smaller than the corpus — this runs on
  candidate pairs, never on all docs.
- Each round is ONE join (labels broadcast when provably small) plus
  one groupBy shuffle; the pointer-doubling shortcut rides the same
  join as extra (node -> label) edges. ``localCheckpoint`` truncates
  lineage each round so the plan does not grow with iterations (a
  20-round unpersisted loop would otherwise re-plan a 20-deep join
  tree).
- The convergence check (sum of labels — exact, since labels only
  decrease) rides the SAME action that materializes the round's lazy
  checkpoint: one action per round, and the aggregated frame is the
  (small) label table, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """Label each node of the undirected graph ``edges`` with the MIN
    node id of its connected component (deterministic cluster id).

    Returns a DataFrame (node, cluster_id) covering every node that
    appears in at least one edge. Isolated nodes (no edges) are the
    caller's concern — they are their own singleton clusters by
    definition and need no propagation.
    """
    # Both directions in ONE pass (2-way explode) instead of a
    # self-union whose two branches each re-execute the upstream
    # candidate-pair pipeline before the checkpoint materializes it
    # (r12, guide §1.2 redundant passes). Same rows, same multiset.
    und = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
            )
        ).alias("__e")
    ).select(F.col("__e.s").alias("es"), F.col("__e.d").alias("ed"))
    if checkpoint:
        # Materialize the edge list ONCE: it is consumed every round, and
        # upstream it is typically a full LSH pipeline (shingle → minhash →
        # band join) that would otherwise re-execute per iteration (AQE
        # never reuses shuffle output across separate query executions).
        # LAZY checkpoint: the n_edges count below both materializes it
        # and serves the partition right-sizing — one job, not two. Then
        # coalesce to the materialized edge count — candidate graphs are
        # far smaller than their producing pipeline's shuffle width
        # (coalesce only ever narrows, so a 1e9-edge graph keeps its
        # parallelism).
        und = und.localCheckpoint(eager=False)
        n_edges = und.count()
        und = und.coalesce(max(1, n_edges // 100_000 + 1))
        # The label table (<= 2 * n_edges rows of two longs) broadcasts
        # only when provably small; a huge candidate graph keeps the
        # planner's shuffle join (broadcast of a multi-GB label table
        # would OOM the driver at real scale).
        broadcast_labels = n_edges <= 5_000_000
    else:
        broadcast_labels = False
    labels = (
        und.select(F.col("es").alias("node"))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
    )
    if checkpoint:
        labels = labels.localCheckpoint(eager=False)
    # Convergence witness: labels only ever DECREASE (each round takes a
    # min over a set containing a value <= the current label), so the
    # label table changed iff sum(cluster_id) changed — the sum rides the
    # same action that materializes the round's checkpoint, replacing the
    # old separate changed-rows count job (2 actions/round -> 1).
    prev_sum = labels.agg(F.sum("cluster_id")).first()[0]
    for _ in range(max_iterations):
        # One fused join per round. Pointer-doubling shortcut (adopt the
        # label OF the label, compressing paths to O(log diameter) rounds
        # on chain graphs) is expressed as EXTRA EDGES instead of a
        # second join: rel = und ∪ {(node -> its current label)}, so a
        # single rel⋈labels + min-groupBy yields
        # min(neighbor labels ∪ {label(label(node))}). The node's own
        # label is dominated (label(label(n)) <= label(n) because labels
        # start at the node id and only decrease), and the pointer edge
        # guarantees every node appears in the output — so the old
        # 3-join round (neighbor-min, keep-own left join, shortcut
        # join) collapses to one join with the same fixed point
        # (min node id per component) and label sequence. The label
        # table is broadcast: rounds never shuffle the edge list.
        rel = und.union(
            labels.select(
                F.col("node").alias("es"), F.col("cluster_id").alias("ed")
            )
        )
        label_side = labels.select(
            F.col("node").alias("ln"), F.col("cluster_id").alias("lc")
        )
        if broadcast_labels:
            label_side = F.broadcast(label_side)
        new_labels = (
            rel.join(label_side, F.col("ed") == F.col("ln"))
            .groupBy(F.col("es").alias("node"))
            .agg(F.min("lc").alias("cluster_id"))
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_sum = new_labels.agg(F.sum("cluster_id")).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def dedup_clusters(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Near-dup dedup verdict per document: (doc_id, cluster_id,
    is_survivor). The survivor of each cluster is its min doc_id — keep
    survivors, drop the rest, and the corpus has one copy per
    duplicate group."""
    labels = connected_components(edges, src, dst, max_iterations)
    return labels.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_survivor"),
    )
