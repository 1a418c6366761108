"""Distributed connected components over an edge DataFrame.

The missing last step of every near-dup dedup pipeline: pair emitters
(``operators.dedup``) produce edges, but a keep/drop decision needs
*clusters* — each document labeled with its component's canonical id.

Algorithm: hash-min label propagation with pointer jumping.
Every node starts labeled with its own id; each round
  1. neighbor-min — a node adopts the minimum label among itself and
     its neighbors (one shuffle: edges joined to labels on the
     neighbor end, then a min-aggregate on node id);
  2. pointer jump — a node re-reads the label *of its label*
     (labels self-joined on label -> node), which short-circuits
     label chains and gives O(log diameter) convergence instead of
     O(diameter) (the Hash-to-Min idea from Rastogi et al.,
     "Finding Connected Components in Map-Reduce", ICDE 2013).

Scale story (100 TB): state per round is one (node, label) row per
vertex — linear, evenly hash-partitioned on node id, no driver-side
collect of graph data. Both shuffles key on node id, so AQE reuses
the partitioning between rounds. Each round eagerly
``localCheckpoint``s the label frame: lineage would otherwise double
per iteration and the convergence-check action would replay the whole
chain. Near-dup graphs have tiny components (bounded cluster sizes),
so round counts are small; convergence detection costs NO extra job —
the changed-label count rides the checkpoint's own materialization as
an ``Observation`` (each node's previous label is carried through the
min-aggregate, so changed = sum(label != old_label)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 1,
    *,
    edges_unique: bool = False,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id of its connected component.

    Returns a DataFrame ``(node, label)`` covering every vertex that
    appears in ``edges`` (isolated vertices never enter; callers
    left-join and coalesce to their own id). Deterministic; raises if
    ``max_iter`` rounds don't converge (near-dup graphs converge in
    O(log max-component-diameter) rounds).

    ``edges_unique=True`` skips the symmetrize-dedup shuffle (round-10
    optimization, guide §2.4: a ``distinct`` on data that is already
    unique): every pair emitter in this package yields distinct
    ``(a, b)`` pairs with ``a < b``, so the two union arms cannot
    collide and the dedup is a full shuffle of the edge list for
    nothing. Duplicate edges would not change the labels (min-label
    propagation is idempotent under edge multiplicity) — the flag only
    controls whether the per-round join fans out over duplicates, so
    leave it False for edge sources of unknown multiplicity.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(
        sym.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    if not edges_unique:
        sym = sym.distinct()
    # Cache the (static) symmetrized edge list: it is re-joined every
    # round and must not be recomputed from the pair pipeline each time.
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    label_t = labels.schema["label"].dataType
    for i in range(max_iter):
        # 1. neighbor-min: candidate labels = own ∪ neighbors', min per
        # node. The node's previous label rides along as max(own) (each
        # node contributes exactly one own row) so convergence is
        # decidable from this round's rows alone — no join against the
        # previous labels, no second action.
        nbr = sym.join(labels, sym.v == labels.node).select(
            F.col("u").alias("node"), "label", F.lit(None).cast(label_t).alias("own")
        )
        stepped = (
            labels.select("node", "label", F.col("label").alias("own"))
            .union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("own").alias("old_label"))
        )
        # 2. pointer jump: follow label -> label(label). Label values are
        # always vertex ids present in `labels`, so the join never misses;
        # coalesce only guards the theoretical empty case.
        ptr = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = stepped.join(
            ptr, stepped.label == ptr.p_node, "left"
        ).select(
            "node",
            F.coalesce("p_label", "label").alias("label"),
            "old_label",
        )

        if (i + 1) % checkpoint_every == 0:
            # convergence count rides the checkpoint's materialization
            obs = Observation(f"cc_round_{i}")
            jumped = jumped.observe(
                obs,
                F.sum((F.col("label") != F.col("old_label")).cast("long")).alias(
                    "n_changed"
                ),
            )
            labels = jumped.drop("old_label").localCheckpoint(eager=True)
            if int(obs.get["n_changed"] or 0) == 0:
                return labels
        else:
            # lineage-growing round: no action, no convergence probe
            labels = jumped.drop("old_label")
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def cluster_documents(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    *,
    pairs_unique: bool = False,
) -> DataFrame:
    """Assign every document to a near-dup cluster.

    ``pairs`` are undirected near-dup edges (from any pair emitter).
    Output: ``(doc_id, cluster_id, cluster_size, is_canonical)`` where
    ``cluster_id`` is the component's minimum doc_id, and the canonical
    (keep) document is the one whose id equals it. Documents in no pair
    form singleton clusters.
    """
    from pyspark.sql import Window

    comp = connected_components(
        pairs, src=pair_a, dst=pair_b, edges_unique=pairs_unique
    )
    labeled = (
        docs.select(id_col)
        .join(comp, F.col(id_col) == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce("label", F.col(id_col)).alias("cluster_id"),
        )
    )
    return labeled.select(
        id_col,
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
        (F.col("cluster_id") == F.col(id_col)).alias("is_canonical"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the UNDIRECTED graph ``edges`` (each edge walks
    both ways), ``iters`` fixed power-iteration rounds from the
    uniform start: ``r'(v) = (1-d)/N + d·Σ_{u~v} r(u)/deg(u)``.

    Per round: edges join ranks on the source end (both keyed on the
    vertex id — AQE reuses the partitioning between rounds, like
    :func:`connected_components`) and a dst-keyed sum-aggregate with
    map-side combine. State is one (node, rank) row per vertex;
    nothing graph-sized ever reaches the driver. Undirected graphs
    have no dangling nodes (every vertex has out-degree ≥ 1), so no
    sink-mass redistribution term is needed.

    Determinism contract (shared with the unrolled SQL oracle): ranks
    round to 6 dp after every round, so both engines feed identical
    literals into the next iteration regardless of summation order.
    Fixed ``iters`` (no convergence test) keeps the unrolled oracle
    exactly equivalent.
    """
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    both = persist_tracked(both)
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("__deg"))
    nodes = both.select(F.col("u").alias("node")).distinct()
    n_nodes = nodes.count()  # one long — model-sized driver state
    ranks = nodes.withColumn(
        "rank", F.round(F.lit(1.0 / n_nodes), 6)
    )
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contrib = (
            both.join(ranks, both["u"] == ranks["node"])
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
        )
        ranks = contrib.groupBy("node").agg(
            F.round(
                F.lit(base) + F.lit(damping) * F.sum("__c"), 6
            ).alias("rank")
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def cluster_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    *,
    pairs_unique: bool = False,
) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup cluster
    keep the HIGHEST-``score_col`` document (ties to the lowest id),
    not the lowest-id one.

    What production dedup actually wants: when a boilerplate-stripped
    page near-duplicates its full-chrome twin, min-id keeps whichever
    crawled first — this keeps the better copy (longer / higher
    quality score) and drops the rest. Output:
    ``(id_col, cluster_id, cluster_size, is_kept)`` over every doc.

    Scale: the components come from :func:`connected_components`
    (one (node,label) row per vertex per round); the keeper choice
    adds one score join and one per-cluster window pass — both keyed
    on ``cluster_id``, no new corpus-wide structure. ``score_col``
    must be deterministic and engine-stable (exact ints like
    ``n_chars``, or 4-dp-rounded ratios) so the argmax cannot flip
    between engines.
    """
    from pyspark.sql import Window

    clustered = cluster_documents(
        docs, pairs, id_col, pair_a, pair_b, pairs_unique=pairs_unique
    )
    scored = clustered.join(docs.select(id_col, score_col), id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return scored.select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    pairs_unique: bool = False,
) -> DataFrame:
    """Leakage-free train/val/test assignment: near-dup CLUSTERS are
    the unit of splitting, so two near-duplicate documents can never
    land on opposite sides of a train/eval boundary — the structural
    fix for what ``split_leakage_audit`` measures (a doc-level random
    split leaks every cross-split near-dup pair into evaluation).

    Split choice is the engine's deterministic md5 keep-hash over the
    cluster id against cumulative ``weights`` thresholds — reproducible
    on any cluster shape. Adding corpus later keeps an earlier doc's
    assignment stable AS LONG AS its cluster identity survives: a new
    document that bridges two existing clusters merges them under the
    smaller min-id, moving the other component's docs to that
    cluster's split (re-audit with ``split_leakage_audit`` after
    corpus growth; within any single corpus version the no-straddle
    guarantee is absolute). Output: ``(id_col, cluster_id, split)``
    over every document (singletons are their own cluster).

    Scale: one distributed-CC pass over the pair edges plus a narrow
    hash expression — no new corpus-wide structure beyond
    :func:`cluster_documents`.
    """
    from delta_lake_pyspark_scd2_spark.functions.hashing import keep_hash

    if len(weights) != 3 or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must be 3 shares summing to 1: {weights}")
    mod = 1_000_000
    t_train = int(round(weights[0] * mod))
    t_val = int(round((weights[0] + weights[1]) * mod))
    clustered = cluster_documents(
        docs, pairs, id_col, pair_a, pair_b, pairs_unique=pairs_unique
    )
    h = keep_hash(F.col("cluster_id"), mod)
    return clustered.select(
        id_col,
        "cluster_id",
        F.when(h < t_train, F.lit("train"))
        .when(h < t_val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    weight_col: str | None = None,
    iters: int = 3,
) -> DataFrame:
    """Semi-synchronous weighted label propagation (Raghavan et al.
    2007; parity scheduling per Cordasco & Gargano 2010) over the
    UNDIRECTED graph ``edges`` — community detection by majority vote:
    every node starts as its own community, then adopts the label with
    the largest incident edge-weight sum among its neighbors (ties
    toward the lower label). Unlike :func:`connected_components`
    (which converges to per-component minima regardless of structure),
    LPA splits a component into densely-connected communities — the
    refinement pass for near-dup cluster graphs and co-occurrence
    graphs.

    Fully synchronous LPA oscillates on bipartite-ish structure (two
    labels swap forever — the documented GraphX caveat); the parity
    schedule removes that: each round updates even-id nodes first,
    then odd-id nodes against the half-updated labels, which is
    oscillation-free while keeping everything set-at-a-time (each
    phase is still one distributed join + aggregate, NOT sequential).
    Node ids must therefore be integral (map string keys first).
    Ties prefer the node's CURRENT label when it is among the
    maximum-weight candidates (the standard stabilizing variant —
    without it, symmetric cliques churn through their tied labels
    instead of settling), else the lowest tied label wins.

    Scale shape per phase (the :func:`pagerank` contract): one
    vertex-keyed join of the edge table with the label table and one
    (node, label)-keyed sum with map-side combine, then a per-node
    argmax window (partitioned BY NODE — never a global sort). State
    is one (node, label) row per vertex; nothing graph-sized reaches
    the driver; lineage truncates per round with a lazy
    localCheckpoint.

    Determinism contract (shared with the unrolled SQL oracle): with
    integer weights every vote sum is EXACT (no rounding needed,
    unlike pagerank's doubles) and ties break toward the lower label,
    so fixed ``iters`` rounds chain identically in both engines.
    """
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    w = F.col(weight_col) if weight_col else F.lit(1)
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), w.alias("__w")
    )
    both = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"), F.col("__w"))
    )
    # Pre-partition the static edge list by the vote-join key ONCE
    # (round-11, guide §2.4 "two operations keyed the same way share
    # one exchange"): every phase joins `both` to the fresh labels on
    # ``u`` — unpartitioned, that is an edge-list-wide Exchange per
    # phase (2·iters of them); hash-partitioned in the cache, only the
    # vertex-sized label frame moves each phase. Partition count pinned
    # to the session's shuffle setting so the label exchange matches
    # and the cached side's Exchange is elided.
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    both = persist_tracked(both.repartition(n_shuffle, "u"))
    w_type = both.schema["__w"].dataType
    labels = (
        both.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for i in range(2 * iters):
        parity = i % 2
        # Vote rows from ONE edge×label join; the node's OWN label
        # rides in as a vertex-sized zero-weight union row instead of
        # a second labels join per phase (round-11, guide §2.3
        # "aggregate before you shuffle"): __own marks it, __real=0
        # keeps it out of the candidate set unless real votes exist —
        # own-label preference only applies among actual candidates,
        # exactly the pre-union semantics.
        votes_in = both.join(
            labels.select(
                F.col("node").alias("u"), F.col("label").alias("__cand")
            ),
            "u",
        ).select(
            F.col("v").alias("__n"),
            "__cand",
            F.col("__w").alias("__s"),
            F.lit(0).alias("__own"),
            F.lit(1).alias("__real"),
        )
        own_rows = labels.select(
            F.col("node").alias("__n"),
            F.col("label").alias("__cand"),
            F.lit(0).cast(w_type).alias("__s"),
            F.lit(1).alias("__own"),
            F.lit(0).alias("__real"),
        )
        # One aggregation per (node, candidate) then ONE winner pick:
        # max(struct(__s, is_own, -__cand)) — maximize the vote sum,
        # prefer the node's CURRENT label among ties (is_own = 1 beats
        # 0), else the lowest tied label wins (max of -cand = min
        # cand). Vote sums are exact integers, so the struct
        # comparison reproduces the window+min pick exactly.
        cand = (
            votes_in.unionAll(own_rows)
            .groupBy("__n", "__cand")
            .agg(
                F.sum("__s").alias("__s"),
                F.max("__own").alias("__is_own"),
                F.max("__real").alias("__real"),
            )
            .filter(F.col("__real") == 1)
            .groupBy("__n")
            .agg(
                F.max(
                    F.struct(
                        F.col("__s"),
                        F.col("__is_own"),
                        (-F.col("__cand")).alias("__negcand"),
                    )
                ).alias("__best")
            )
            .select(
                "__n",
                (-F.col("__best")["__negcand"]).alias("__pick"),
                F.col("__best")["__is_own"].alias("__tied"),
            )
        )
        labels = (
            labels.join(cand, labels["node"] == cand["__n"], "left")
            .select(
                "node",
                F.when(
                    (F.col("node") % 2 == parity)
                    & F.col("__pick").isNotNull(),
                    F.when(
                        F.col("__tied") == 1, F.col("label")
                    ).otherwise(F.col("__pick")),
                )
                .otherwise(F.col("label"))
                .alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels
