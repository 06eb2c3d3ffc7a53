"""Duplicate clustering: connected components over near-dup pairs.

Pair lists (``dedup_*_pairs``) aren't actionable on their own — a
training-data pipeline needs *clusters* so it can keep one canonical
document per group.  This is connected components on the similarity
graph.

Spark mapping: iterative min-label propagation expressed as DataFrame
joins — the standard open-source formulation for Pregel-free engines
(GraphX/GraphFrames implement the same alternating-join scheme).
Each iteration: every node adopts the minimum label in its closed
neighborhood; convergence when no label changes.  Iteration count is
bounded by the graph diameter of the largest component, which for
near-dup clusters is tiny (dup groups are dense, diameter 2-3);
``max_iter`` guards pathological chains.

Scale shape per iteration: one shuffle on node id (groupBy) over the
edge list — no driver-side data, only a scalar convergence check
(an aggregated count).  At 100 TB the edge list is the near-dup pair
output, orders of magnitude below corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         max_iter: int = 20) -> DataFrame:
    """Pairs ``(a, b)`` → ``(doc, cluster)`` with cluster = min node id
    of the component.  Nodes not in any pair are absent (singletons
    are implicit — left-join the corpus afterwards if needed).
    """
    edges = (pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
             .union(pairs.select(F.col(b_col).alias("u"),
                                 F.col(a_col).alias("v")))
             .distinct())
    # pin the edge list: every iteration's plan references it, and
    # without this each round re-derives the full near-dup pair join
    # (the expensive upstream) instead of re-reading |E| rows —
    # measured 55s -> ~15s on the sf0.01 cluster queries.  Bounded by
    # the near-dup pair output, far below corpus size.
    edges = edges.localCheckpoint(eager=True)
    # min label in the closed neighborhood, iterated to fixpoint;
    # explicit column renames everywhere — labels derives from edges,
    # so attribute-based join conditions would be ambiguous self-joins
    labels = (edges.groupBy("u").agg(F.min("v").alias("lbl"))
              .select(F.col("u").alias("node"),
                      F.least("u", "lbl").alias("lbl")))
    for it in range(max_iter):
        neigh = (edges
                 .join(labels.select(F.col("node").alias("__nbr"), "lbl"),
                       F.col("v") == F.col("__nbr"))
                 .groupBy("u").agg(F.min("lbl").alias("nlbl")))
        new_labels = (labels
                      .join(neigh.select(F.col("u").alias("__n"), "nlbl"),
                            F.col("node") == F.col("__n"), "left")
                      .select("node",
                              F.least("lbl", F.coalesce("nlbl", "lbl"))
                              .alias("lbl")))
        # cut the iteration's lineage: the label table is |V(pairs)|
        # rows (near-dup nodes only, far below corpus size), and
        # without this the plan doubles every round
        new_labels = new_labels.localCheckpoint(eager=True)
        # the convergence check is a full job over the label table;
        # dup-cluster diameters are 2-3, so checking every 2nd
        # iteration (and always the last allowed one) halves the
        # action count without ever breaking early: a zero-change
        # iteration means fixpoint regardless of when it's observed
        check = it % 2 == 1 or it == max_iter - 1
        if check:
            changed = (new_labels
                       .join(labels.select(F.col("node").alias("__o"),
                                           F.col("lbl")
                                           .alias("old_lbl")),
                             F.col("node") == F.col("__o"))
                       .filter(F.col("lbl") != F.col("old_lbl"))
                       .count())
        labels = new_labels
        if check and changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations (component diameter exceeds max_iter); "
            f"raise max_iter — silent partial labels would split true "
            f"clusters and let duplicates through")
    return labels.select(F.col("node").alias("doc"),
                         F.col("lbl").alias("cluster"))


def semantic_dedup(emb: DataFrame, k: int = 8, tau: float = 0.4,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space, then drop
    near-duplicates only *within* a cluster — the cluster assignment
    bounds the pair search so the quadratic step never sees the whole
    corpus.

    Deterministic & oracle-exact by construction:

    - centroids = the embeddings of the ``k`` smallest ids (no
      iterative k-means in the declared query; the Lloyd-refined
      scale twin is the persisted IVF index in
      ``similarity.build_ivf_index``);
    - assignment = argmax cosine with centroid-id tiebreak, computed
      as one map-side-combined ``max(struct(...))`` aggregation (the
      k-way scored rows for a vector never leave their scan
      partition);
    - intra-cluster pairs (id_a < id_b) with cosine >= ``tau`` mark
      the higher id as dropped; the canonical (lowest-id) member of
      every dup group survives.

    Scale shape: the centroid set is broadcast; assignment is one
    shuffle of (id, cluster) with map-side combine; the pair join
    shuffles by cluster id only.  At 100 TB, k grows with the corpus
    (SemDeDup uses ~100k clusters) so per-cluster membership — and
    with it the quadratic verify — stays bounded.

    Returns ``(vec_id, cluster_id, kept)``.
    """
    from .similarity import dot_col, norm_col

    v = emb.select(F.col(id_col).alias("vid"),
                   F.col(vec_col).alias("vec"),
                   norm_col(vec_col).alias("vn"))
    cents = (v.orderBy("vid").limit(k)
             .select(F.col("vid").alias("cid"),
                     F.col("vec").alias("cvec"),
                     F.col("vn").alias("cn")))
    scored = (v.join(F.broadcast(cents))
              .withColumn("cos", dot_col("vec", "cvec")
                          / (F.col("vn") * F.col("cn")))
              .withColumn("ncid", -F.col("cid")))
    # argmax via struct-max: (cos, -cid) is unique per vid (cid is
    # unique), so vn/vec ride along without ever being compared
    assign = (scored.groupBy("vid")
              .agg(F.max(F.struct("cos", "ncid", "vn", "vec")).alias("m"))
              .select("vid", (-F.col("m.ncid")).alias("cluster_id"),
                      F.col("m.vn").alias("vn"), F.col("m.vec").alias("vec")))
    return _dedup_within_clusters(assign, tau, id_col)


def _dedup_within_clusters(assign: DataFrame, tau: float,
                           id_col: str) -> DataFrame:
    """The SemDeDup drop step shared by :func:`semantic_dedup` and
    :func:`semantic_dedup_indexed`: intra-cluster pairs (id_a < id_b)
    with cosine >= ``tau`` mark the higher id dropped; the canonical
    (lowest-id) member of every dup group survives.  ``assign`` must
    have columns (vid, cluster_id, vn, vec); the pair join shuffles on
    cluster_id only, so per-cluster membership bounds the quadratic."""
    from .similarity import dot_col

    a = assign.select(F.col("vid").alias("id_a"), "cluster_id",
                      F.col("vec").alias("va"), F.col("vn").alias("na"))
    b = assign.select(F.col("vid").alias("id_b"),
                      F.col("cluster_id").alias("cb"),
                      F.col("vec").alias("vb"), F.col("vn").alias("nb"))
    dropped = (a.join(b, (F.col("cluster_id") == F.col("cb"))
                      & (F.col("id_a") < F.col("id_b")))
               .withColumn("cos", dot_col("va", "vb")
                           / (F.col("na") * F.col("nb")))
               .filter(F.col("cos") >= tau)
               .select(F.col("id_b").alias("vid")).distinct()
               .withColumn("__d", F.lit(True)))
    return (assign.join(dropped, "vid", "left")
            .select(F.col("vid").alias(id_col), "cluster_id",
                    F.col("__d").isNull().alias("kept")))


def semantic_dedup_indexed(spark, emb: DataFrame, index_path: str,
                           tau: float = 0.4, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """SemDeDup on a persisted IVF index (the scale twin of
    :func:`semantic_dedup`): cluster assignment uses
    ``similarity.build_ivf_index``'s Lloyd-refined centroids read from
    ``<index_path>/centroids``, so the cluster count grows with the
    corpus (build the index with num_cells ~ sqrt(n) or the SemDeDup
    paper's ~100k at web scale) instead of the declared form's pinned
    k — making "k grows with corpus" a code path, not a docstring
    claim.

    Assignment is scan-local (centroids ride into the plan as a
    literal; no shuffle, no crossJoin — same machinery as
    ``ivf_topk``); the drop step shuffles on cell id only, so cell
    size bounds the quadratic.  ``cluster_id`` is the IVF cell
    number.  Equivalence at fixed centroids and recall vs the
    declared form are locked in tests/test_dedup.py."""
    import os

    from .similarity import _with_cell

    cent_rows = (spark.read.parquet(os.path.join(index_path, "centroids"))
                 .orderBy("cell").collect())
    cents = [[float(x) for x in r.v] for r in cent_rows]
    assign = (_with_cell(emb, cents, id_col, vec_col)
              .select(F.col("id").alias("vid"),
                      F.col("cell").cast("long").alias("cluster_id"),
                      F.col("__vn").alias("vn"),
                      F.col("__v").alias("vec")))
    return _dedup_within_clusters(assign, tau, id_col)


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """The end-to-end dedup decision: every doc mapped to its cluster
    (singletons keep themselves) and flagged ``keep`` iff it is the
    cluster's canonical (minimum-id) member."""
    cc = connected_components(pairs)
    return (docs.join(cc, docs[id_col] == cc.doc, "left")
            .select(docs[id_col],
                    F.coalesce("cluster", docs[id_col]).alias("cluster"))
            .withColumn("keep", F.col(id_col) == F.col("cluster")))
