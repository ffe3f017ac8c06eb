"""Graph analytics beyond the reference's BFS (SURVEY §7.4 extension).

The reference's only traversal is the depth-limited BFS
(``/root/reference/app.py:512-549``); these operators add the batch
graph-analytics suite a Spark-native engine is expected to provide
over the same ``edges(src, dst, type, weight)`` DataFrame: degree
stats, weighted PageRank, connected components, triangle counting,
and hop-bounded single-source shortest paths.

Execution model: everything is DataFrame joins + aggregates. The
iterative algorithms (PageRank, components, SSSP) keep a driver-side
loop — Catalyst has no fixpoint operator — with ``localCheckpoint``
per iteration to cut lineage growth; per iteration the work is one
or two key-partitioned shuffles, which is exactly the Pregel
communication pattern and scales with the cluster. Component labels
use pointer-jumping (label = label-of-label) on top of one-hop min
propagation, so convergence is O(log diameter) iterations, not
O(diameter) — the difference between 13 and 5000 rounds on a
5000-node path graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """Per node: out_degree, in_degree, degree → one full-outer merge.

    Nodes appearing only as source (or only as target) get 0 for the
    other side. Two map-side-combinable aggregates on compact keys.
    """
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank, fixed iteration count → (id, rank).

    Per iteration: ``rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u) *
    w(u,v)/W_out(u) + dangling_mass/N)`` where ``W_out`` is u's total
    outgoing edge weight and ``dangling_mass`` is the summed rank of
    nodes with no outgoing edges (standard teleport redistribution,
    so ranks keep summing to 1). ``vertices`` is a 1-column (id)
    frame defining the node universe (isolated nodes included).

    The out-weight frame is computed once and reused every
    iteration; each iteration is one shuffle-join on ``src`` + one
    aggregate on ``dst`` + one scalar aggregate, checkpointed so the
    plan stays linear in the iteration count.
    """
    n_df = vertices.agg(F.count("*").alias("__n"))
    # NULL weights count as 0; a node whose out-weights sum to 0 has
    # no mass to distribute along edges, so it must be treated as
    # DANGLING (its rank routed through the teleport redistribution)
    # — otherwise share = w/0 is NULL and its mass silently vanishes.
    out_w = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum(F.coalesce("weight", F.lit(0.0))).alias("out_w")
    )
    # (src, dst, share-of-src's-out-weight), reused every iteration
    shares = (
        edges.join(out_w, edges["src"] == out_w["id"])
        .filter(F.col("out_w") > 0)
        .select(
            edges["src"],
            edges["dst"],
            (F.coalesce("weight", F.lit(0.0)) / F.col("out_w")).alias(
                "share"
            ),
        )
        .localCheckpoint(eager=False)
    )
    has_out = out_w.filter(F.col("out_w") > 0).select("id")

    ranks = (
        vertices.crossJoin(F.broadcast(n_df))
        .select("id", (F.lit(1.0) / F.col("__n")).alias("rank"))
        .localCheckpoint(eager=False)
    )

    for _ in range(iterations):
        contrib = (
            shares.join(ranks, shares["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") * F.col("share")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            ranks.join(has_out, "id", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        ranks = (
            vertices.join(contrib, "id", "left_outer")
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    (1.0 - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("__dang") / F.col("__n")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """Undirected connected components → (id, component).

    ``component`` is the minimum node id (string order) in each
    component. Per round: one-hop min-label propagation over the
    symmetrized edge set, then one pointer-jumping step
    (label ← label(label)), giving O(log diameter) convergence.
    Terminates early when a round changes nothing.

    Per-round cost is TWO jobs: the eager checkpoint (which carries a
    fused ``__chg`` flag — the comparison against the previous
    round's labels rides the same shuffle) and a narrow
    ``filter(__chg).take(1)`` over the checkpointed partitions. The
    change check used to be its own join job per round; for the
    small pair graphs the dedup/curation family feeds through here,
    that extra job per round was the dominant cost (optimization
    round 10, guide §2.4 — fewer passes, same values).
    """
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = vertices.select("id", F.col("id").alias("component")).localCheckpoint(
        eager=True
    )

    for _ in range(max_iterations):
        # one-hop: candidate label from each neighbor
        neigh = (
            sym.join(labels, sym["dst"] == labels["id"])
            .select(sym["src"].alias("id"), "component")
        )
        hop = (
            labels.unionByName(neigh)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: follow the label one more step; carry the
        # old label alongside so the convergence check needs no
        # second join job over the result
        lab2 = hop.select(
            F.col("id").alias("__lid"), F.col("component").alias("__lcomp")
        )
        old = labels.select(
            F.col("id").alias("__oid"), F.col("component").alias("__ocomp")
        )
        jumped = (
            hop.join(lab2, hop["component"] == lab2["__lid"], "left_outer")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("__lcomp", F.col("component"))
                ).alias("component"),
            )
            .join(old, F.col("id") == F.col("__oid"), "left_outer")
            .select(
                "id",
                "component",
                # null-safe: an id with no previous label (dangling
                # edge endpoint) counts as changed
                (~F.col("component").eqNullSafe(F.col("__ocomp"))).alias(
                    "__chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("__chg")).take(1)
        labels = jumped.select("id", "component")
        if not changed:
            break
    return labels


def incremental_components(
    labels: DataFrame, delta_edges: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Incremental connected components under NEW edges → (id,
    component), given the stored labeling of the base graph: contract
    every delta edge to the (base-label, base-label) super-edge it
    merges, solve components on that SUPER-graph — whose size is
    O(|delta|), not O(|V|) — then relabel the stored labeling through
    the broadcast old-label → merged-label map. Because base labels
    are component-minimum ids, the merged super-label is again the
    global minimum id, so the output is IDENTICAL to a full recompute
    on base ∪ delta (which is exactly what the oracle checks).

    The graph half of the IVM story (ivm_aggregate_delta /
    ivm_join_delta are the relational half): at 100 TB the nightly
    edge increment touches a super-graph of merge candidates many
    orders smaller than the vertex set; the stored labels are read
    once, joined once against a delta-sized broadcast, never
    re-propagated."""
    lab_s = labels.select(
        F.col("id").alias("src"), F.col("component").alias("ls")
    )
    lab_d = labels.select(
        F.col("id").alias("dst"), F.col("component").alias("ld")
    )
    sup_edges = (
        delta_edges.select("src", "dst")
        .join(lab_s, "src")
        .join(lab_d, "dst")
        .select(F.col("ls").alias("src"), F.col("ld").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sup_verts = (
        sup_edges.select(F.col("src").alias("id"))
        .union(sup_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    merged = connected_components(sup_verts, sup_edges, max_iterations)
    mapping = merged.select(
        F.col("id").alias("__old"), F.col("component").alias("__new")
    )
    return labels.join(
        F.broadcast(mapping), labels["component"] == F.col("__old"), "left"
    ).select(
        "id",
        F.coalesce(F.col("__new"), F.col("component")).alias("component"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over the undirected simple graph → (n_triangles).

    Edges are canonicalized (a < b, string order, self-loops and
    duplicates dropped) then the classic two-join enumeration counts
    each triangle exactly once (a < b < c). Both joins are plain
    equi-joins Catalyst can shuffle-hash; at scale the canonical edge
    frame is the natural bucketing candidate on ``a``.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = canon.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = canon.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = canon.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    return (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(
            e3,
            (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")),
            "left_semi",
        )
        .agg(F.count("*").alias("n_triangles"))
    )


def square_count(edges: DataFrame) -> DataFrame:
    """Global 4-cycle (square) count over the undirected simple graph
    → (n_squares).

    Uses the codegree identity: every square u-v-w-x is determined by
    its two diagonal pairs {u,w} and {v,x}, so

        n_squares = (1/2) * sum over unordered pairs {a,b}
                            of C(codeg(a,b), 2)

    where codeg is the number of common neighbors. One wedge
    self-join on the shared center enumerates ordered endpoint pairs
    with a < b (each wedge once), a groupBy counts codegrees, and a
    single integer aggregate finishes — the same shuffle shape (and
    the same worst case, sum of deg^2 wedges) as triangle counting.
    Counting stays in BIGINT the whole way: the pair sum is provably
    even, so the final halving is exact integer division. At scale
    the wedge join is the skew point — a hub of degree d emits
    C(d,2) wedge rows — and the mitigation is the same degree-cap /
    salt used for triangles, not a different algorithm.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # Symmetrize so each wedge center sees all its neighbors.
    sym = canon.union(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    w1 = sym.select(F.col("a").alias("c"), F.col("b").alias("u"))
    w2 = sym.select(F.col("a").alias("c2"), F.col("b").alias("v"))
    codeg = (
        w1.join(w2, (F.col("c") == F.col("c2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count("*").alias("cd"))
    )
    # sum(cd*(cd-1)) counts each square 4x (2 diagonals x 2 ordered
    # picks) — keep everything BIGINT and divide once at the end.
    return codeg.agg(
        F.expr("sum(cd * (cd - 1)) div 4").cast("bigint").alias("n_squares")
    )


def sssp_k(
    edges: DataFrame,
    start_id: str,
    max_hops: int,
    edge_type: str | None = None,
) -> DataFrame:
    """Hop-bounded single-source shortest paths → (id, min_weight).

    Min total edge weight over all directed paths of ≤ ``max_hops``
    hops from ``start_id`` (Bellman-Ford relaxation, one
    shuffle-join per hop). Complements :func:`..graph.graph_bfs`,
    which tracks hop distance + max weight among min-hop paths.
    """
    spark = edges.sparkSession
    e = edges
    if edge_type is not None:
        e = e.filter(F.col("type") == edge_type)
    e = e.select("src", "dst", F.coalesce("weight", F.lit(0.0)).alias("weight"))

    best = spark.createDataFrame(
        [(start_id, 0.0)], "id string, min_weight double"
    ).localCheckpoint(eager=True)
    frontier = best

    for _ in range(max_hops):
        relaxed = (
            frontier.join(e, frontier["id"] == e["src"])
            .select(
                e["dst"].alias("id"),
                (frontier["min_weight"] + e["weight"]).alias("min_weight"),
            )
            .groupBy("id")
            .agg(F.min("min_weight").alias("min_weight"))
        )
        # keep only strict improvements — they form the next frontier
        improved = (
            relaxed.alias("r")
            .join(best.alias("b"), "id", "left_outer")
            .filter(
                F.col("b.min_weight").isNull()
                | (F.col("r.min_weight") < F.col("b.min_weight"))
            )
            .select("id", F.col("r.min_weight").alias("min_weight"))
            .localCheckpoint(eager=True)
        )
        if not improved.take(1):
            break
        best = (
            best.unionByName(improved)
            .groupBy("id")
            .agg(F.min("min_weight").alias("min_weight"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return best


def neighbor_embedding_agg(
    edges: DataFrame, emb: DataFrame, dim: int = 64
) -> DataFrame:
    """Weighted mean of out-neighbor embeddings per node
    → (id, idx, nvec): the one-hop GNN-style feature aggregation
    nvec(u) = Σ_v w(u,v)·x(v) / Σ_v w(u,v) over edges u→v.

    The graph×vector fusion op: one equi-join (edges ⋈ embeddings on
    dst) then a scalar groupBy on (src, idx) after posexplode —
    map-side combinable, no array aggregation state. Output size is
    |nodes|·dim rows, the inherent cost of materializing a feature
    matrix; at 100 TB both sides shuffle on their join/group keys
    once. Requires positive edge weights (the model guarantees it);
    a zero-weight neighborhood would yield NULL, not 0.
    """
    e = edges.select("src", "dst", "weight")
    v = emb.filter(F.size("vector") == dim).select(
        F.col("node_id").alias("dst"), "vector"
    )
    ex = e.join(v, "dst").select(
        "src", "weight", F.posexplode("vector").alias("idx", "x")
    )
    nv = F.sum(F.col("weight") * F.col("x")) / F.sum("weight")
    return (
        ex.groupBy("src", "idx")
        .agg((F.floor(nv * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("nvec"))
        .select(F.col("src").alias("id"), "idx", "nvec")
    )


def kcore_peel(
    edges: DataFrame, k: int = 2, rounds: int = 4
) -> DataFrame:
    """k-core peeling, ``rounds`` synchronous rounds → (id, degree).

    Each round drops every node whose undirected degree is < k, then
    removes edges touching dropped nodes; the output is the degree
    table of the graph surviving round ``rounds`` (= the true k-core
    once no round changes anything — the fixed round count is what
    makes the DuckDB oracle an exact unrolled-CTE twin, like
    PageRank). Each round is one map-combinable degree aggregate and
    two semi-joins on node id; the frame only shrinks, so cost is
    monotone decreasing at any scale.
    """
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    # each round references the previous frame three times (degree +
    # two semi-joins); checkpointing per round keeps the lineage flat
    # instead of 3^rounds recomputations — same shape as
    # connected_components above
    cur = sym.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = cur.groupBy("src").agg(F.count("*").alias("c"))
        keep = deg.filter(F.col("c") >= k).select("src")
        cur = (
            cur.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    return cur.groupBy("src").agg(F.count("*").alias("degree")).select(
        F.col("src").alias("id"), "degree"
    )


def label_propagation(
    vertices: DataFrame, edges: DataFrame, rounds: int = 3
) -> DataFrame:
    """Synchronous label-propagation community detection, fixed round
    count → (id, label).

    Every node starts with its own id as label; each round a node
    adopts the most frequent label among its undirected neighbors,
    ties broken by the lexicographically smallest label (the
    deterministic variant — classic async LPA is order-dependent and
    would be uncheckable). Isolated nodes keep their label.

    Per round: one (node, label) count aggregate plus one
    row_number window over the node key — two key-partitioned
    shuffles, the Pregel communication pattern; the fixed round count
    makes the DuckDB twin an exact unrolled-CTE replay (same trick as
    PageRank / k-core). Frames are label tables the size of the
    vertex set, checkpointed per round to keep lineage flat.
    """
    from pyspark.sql import Window

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(
        F.col("id"), F.col("id").alias("label")
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("id").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        votes = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"), "label")
            .agg(F.count("*").alias("c"))
        )
        winner = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(winner, "id", "left")
            .select(
                "id", F.coalesce("new_label", "label").alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels


def jaccard_link_prediction(
    edges: DataFrame, top_k: int = 20
) -> DataFrame:
    """Common-neighbor Jaccard link prediction →
    (src, dst, common, jaccard) for the ``top_k`` highest-scoring
    non-adjacent pairs.

    Candidate pairs are generated by the postings equi-join on the
    shared neighbor — two rows of the symmetrized adjacency joined on
    the middle node — never an all-pairs product, so the cost is
    Σ_v deg(v)², the standard bound, and skewed hubs are the only
    hot keys (AQE skew-split applies). Pairs already connected by an
    edge are anti-joined out (link PREDICTION scores absent edges).
    jaccard = |N(a)∩N(b)| / (deg(a)+deg(b)−|∩|); ties rank by
    (src, dst) ascending for a deterministic top-k.
    """
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    a = sym.select(F.col("dst").alias("mid"), F.col("src").alias("a"))
    b = sym.select(F.col("dst").alias("mid"), F.col("src").alias("b"))
    common = (
        a.join(b, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    candidates = common.join(
        sym.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    scored = (
        candidates.join(deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            "common",
            (
                F.floor(
                    F.col("common").cast("double")
                    / (F.col("deg_a") + F.col("deg_b") - F.col("common"))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), F.col("src").asc(), F.col("dst").asc()
    ).limit(top_k)


def personalized_pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    source: str,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank with ALL teleport mass restarting at
    ``source`` → (id, rank): the random-walk-with-restart relevance
    score that powers graph-based recommendation ("nodes important
    FROM s's point of view", vs global PageRank's uniform restart).

    Per iteration: ``rank'(v) = (1-d)·1[v=s] + d·(Σ_{u→v} rank(u)·
    share(u,v) + dangling_mass·1[v=s])`` — dangling mass returns to
    the source, the standard PPR convention, so ranks still sum
    to 1. Identical plan shape (and cost) to ``pagerank``: the
    shares frame is built once, each round is one src-keyed
    shuffle-join + one dst aggregate + a scalar dangling aggregate.
    """
    out_w = edges.groupBy(F.col("src").alias("id")).agg(
        F.sum(F.coalesce("weight", F.lit(0.0))).alias("out_w")
    )
    shares = (
        edges.join(out_w, edges["src"] == out_w["id"])
        .filter(F.col("out_w") > 0)
        .select(
            edges["src"],
            edges["dst"],
            (F.coalesce("weight", F.lit(0.0)) / F.col("out_w")).alias(
                "share"
            ),
        )
        .localCheckpoint(eager=False)
    )
    has_out = out_w.filter(F.col("out_w") > 0).select("id")
    is_src = F.when(F.col("id") == source, 1.0).otherwise(0.0)
    ranks = vertices.select(
        "id", is_src.alias("rank")
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = (
            shares.join(ranks, shares["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") * F.col("share")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = ranks.join(has_out, "id", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
        )
        ranks = (
            vertices.join(contrib, "id", "left_outer")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * is_src
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("__dang") * is_src
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity of a community assignment over the
    undirected simple graph → one row
    (n_communities, n_intra_edges, modularity).

    ``Q = Σ_c (e_c/m − (deg_c/2m)²)`` where ``m`` is the undirected
    edge count, ``e_c`` the edges inside community ``c`` and
    ``deg_c`` its total degree — the standard quality score for LPA/
    Louvain output. Cost: one join of the canonical edge list against
    the label map per endpoint (broadcastable label frames at modest
    community counts; sort-merge at 100 TB) plus community-sized
    aggregates. Pure arithmetic in doubles with a fixed evaluation
    shape, so the DuckDB twin matches to 6dp.
    """
    canon = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    la = labels.select(F.col("id").alias("a"), F.col("label").alias("ca"))
    lb = labels.select(F.col("id").alias("b"), F.col("label").alias("cb"))
    lab = canon.join(la, "a").join(lb, "b").localCheckpoint(eager=True)
    m_df = lab.agg(F.count("*").alias("m"))
    intra = (
        lab.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("label"))
        .agg(F.count("*").alias("e_c"))
    )
    deg = (
        lab.select(F.col("a").alias("id"), F.col("ca").alias("label"))
        .union(lab.select(F.col("b").alias("id"), F.col("cb").alias("label")))
        .groupBy("label")
        .agg(F.count("*").alias("deg_c"))
    )
    per_c = deg.join(intra, "label", "left").select(
        "label",
        F.coalesce("e_c", F.lit(0)).alias("e_c"),
        "deg_c",
    )
    return (
        per_c.crossJoin(F.broadcast(m_df))
        .select(
            "label",
            (
                F.col("e_c").cast("double") / F.col("m")
                - (
                    F.col("deg_c").cast("double")
                    / (F.lit(2.0) * F.col("m"))
                )
                * (
                    F.col("deg_c").cast("double")
                    / (F.lit(2.0) * F.col("m"))
                )
            ).alias("q_c"),
            "e_c",
        )
        .agg(
            F.count("*").alias("n_communities"),
            F.sum("e_c").alias("n_intra_edges"),
            (
                F.floor(F.sum("q_c") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
            ).alias("modularity"),
        )
    )


def hits(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
) -> DataFrame:
    """HITS hubs-and-authorities, fixed iteration count →
    (id, hub, authority).

    Kleinberg's mutual-reinforcement recursion on the deduplicated
    directed adjacency: ``auth'(v) = Σ_{u→v} hub(u)`` then
    ``hub'(u) = Σ_{u→v} auth'(v)``, each half-step SUM-normalized
    (L1) so scores are comparable across graphs and every arithmetic
    step is a plain aggregate a SQL twin can unroll — the same
    fixed-iteration oracle trick as ``pagerank``. Nodes touching no
    edges hold score 0 after the first normalization.

    Scale shape: the adjacency is computed once, checkpointed, and
    reused 2×iterations times; every half-step is one shuffle
    equi-join (on src or dst) + one map-side-combinable sum + one
    scalar total — identical cost profile to one PageRank round, and
    the same bucketing/AQE-skew levers apply at 100 TB.
    """
    adj = (
        edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    )
    n_df = vertices.agg(F.count("*").alias("__n"))
    hubs = (
        vertices.crossJoin(F.broadcast(n_df))
        .select("id", (F.lit(1.0) / F.col("__n")).alias("hub"))
        .localCheckpoint(eager=False)
    )
    auths = None
    for _ in range(iterations):
        raw_a = (
            adj.join(hubs, adj["src"] == hubs["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("raw"))
        )
        tot_a = raw_a.agg(
            F.coalesce(F.sum("raw"), F.lit(1.0)).alias("__tot")
        )
        auths = (
            vertices.join(raw_a, "id", "left_outer")
            .crossJoin(F.broadcast(tot_a))
            .select(
                "id",
                (
                    F.coalesce("raw", F.lit(0.0)) / F.col("__tot")
                ).alias("authority"),
            )
            .localCheckpoint(eager=False)
        )
        raw_h = (
            adj.join(auths, adj["dst"] == auths["id"])
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("authority").alias("raw"))
        )
        tot_h = raw_h.agg(
            F.coalesce(F.sum("raw"), F.lit(1.0)).alias("__tot")
        )
        hubs = (
            vertices.join(raw_h, "id", "left_outer")
            .crossJoin(F.broadcast(tot_h))
            .select(
                "id",
                (
                    F.coalesce("raw", F.lit(0.0)) / F.col("__tot")
                ).alias("hub"),
            )
            .localCheckpoint(eager=False)
        )
    return hubs.join(auths, "id")


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node →
    (id, degree, triangles, coeff) over the undirected simple graph.

    ``coeff(v) = 2·T(v) / (deg(v)·(deg(v)−1))`` where ``T(v)`` is the
    number of triangles through v (0 when deg < 2). Triangles are
    enumerated once with the canonical a<b<c two-equi-join (the same
    plan as ``triangle_count`` but keeping the corner columns), then
    each triangle credits its three corners — a 3× explode, not a
    re-enumeration. Degrees come from the symmetrized distinct
    adjacency. All equi-joins; Σ deg² candidate bound; hub skew is
    the one hot-key risk and is AQE-splittable.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        canon.select(F.col("a").alias("id"))
        .union(canon.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    e1 = canon.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = canon.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = canon.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tris = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(
            e3,
            (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")),
        )
        .select("x", "y", "z")
    )
    corner_counts = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(corner_counts, "id", "left_outer")
        .select(
            "id",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.floor(
                    F.lit(2.0)
                    * F.coalesce("triangles", F.lit(0)).cast("double")
                    / (
                        F.col("degree").cast("double")
                        * (F.col("degree") - F.lit(1)).cast("double")
                    )
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
    )


def adamic_adar_link_prediction(
    edges: DataFrame, top_k: int = 20
) -> DataFrame:
    """Adamic–Adar link prediction → (src, dst, common, aa_score) for
    the ``top_k`` highest-scoring non-adjacent pairs.

    ``AA(a,b) = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg(z))`` — common neighbors
    weighted by the rarity of the shared hub, the classic refinement
    of the Jaccard score (same candidate generation: postings
    equi-join on the middle node, cost Σ_v deg(v)², never all-pairs).
    Every middle node on a candidate pair has degree ≥ 2 (it touches
    both endpoints), so ln(deg) ≥ ln 2 > 0 and the weight is finite.
    Existing edges are anti-joined out; ties rank (src, dst)
    ascending for a deterministic top-k.
    """
    sym = (
        edges.select("src", "dst")
        .union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    # Only deg >= 2 nodes can be the middle of a candidate pair, but
    # the weight column is computed for EVERY node before the join
    # filters it — the deg=1 rows must be dropped here or 1/ln(1)
    # raises under ANSI mode (and is +inf otherwise).
    mid_w = deg.filter(F.col("deg") >= 2).select(
        F.col("src").alias("mid"),
        (F.lit(1.0) / F.log(F.col("deg").cast("double"))).alias("w_mid"),
    )
    a = sym.select(F.col("dst").alias("mid"), F.col("src").alias("a"))
    b = sym.select(F.col("dst").alias("mid"), F.col("src").alias("b"))
    pair_scores = (
        a.join(b, "mid")
        .filter(F.col("a") < F.col("b"))
        .join(mid_w, "mid")
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"), F.sum("w_mid").alias("aa_raw"))
    )
    candidates = pair_scores.join(
        sym.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    scored = candidates.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        "common",
        (F.floor(F.col("aa_raw") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "aa_score"
        ),
    )
    return scored.orderBy(
        F.col("aa_score").desc(), F.col("src").asc(), F.col("dst").asc()
    ).limit(top_k)


def multi_source_bfs(
    edges: DataFrame, sources: DataFrame, max_hops: int
) -> DataFrame:
    """Level-synchronous BFS from MANY sources at once →
    (root, id, dist): min-hop distance from each source ``root`` to
    every node it reaches within ``max_hops`` (directed, unweighted;
    multi-edges collapse).

    All sources advance in the SAME frontier frame keyed (root, node)
    — k sources cost one BFS whose frontier is at most k× wider, not
    k sequential BFS jobs. Each round: frontier ⨝ adjacency on the
    node key (one shuffle), then a min-dist merge into the visited
    set; rounds are checkpointed so the plan stays linear in hops.
    This is the sampled-source primitive closeness/betweenness
    estimators build on at 100 TB, where all-pairs is off the table
    and k fixed sources give the standard unbiased estimate.
    """
    adj = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    visited = sources.select(
        F.col("id").alias("root"),
        F.col("id").alias("node"),
        F.lit(0).alias("dist"),
    ).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .select("root", F.col("dst").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
        )
        new = nxt.join(
            visited.select("root", "node"), ["root", "node"], "left_anti"
        ).localCheckpoint(eager=True)
        if not new.take(1):
            break
        visited = visited.unionByName(new).localCheckpoint(eager=False)
        frontier = new
    return visited.select("root", F.col("node").alias("id"), "dist")


def closeness_sampled(
    edges: DataFrame, sources: DataFrame, max_hops: int
) -> DataFrame:
    """Bounded-hop closeness centrality for a source sample →
    (id, n_reached, closeness) where
    ``closeness = (n_reached − 1) / Σ dist`` over nodes reached
    within ``max_hops`` (0.0 for sources that reach nothing —
    the harmonic-free Bavelas form on the reachable set, the
    standard bounded variant for huge graphs).

    Cost = one multi-source BFS (see ``multi_source_bfs``) + one
    aggregate per source; choosing k sources by a deterministic rule
    (instead of all n) is exactly how closeness is estimated at
    100 TB scale.
    """
    d = multi_source_bfs(edges, sources, max_hops)
    return (
        d.groupBy(F.col("root").alias("id"))
        .agg(
            (F.count("*") - F.lit(1)).alias("n_reached"),
            F.sum("dist").alias("sum_dist"),
        )
        .select(
            "id",
            "n_reached",
            F.when(
                F.col("sum_dist") > 0,
                F.floor(
                    F.col("n_reached").cast("double")
                    / F.col("sum_dist").cast("double")
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6),
            )
            .otherwise(F.lit(0.0))
            .alias("closeness"),
        )
    )


def betweenness_sampled(
    edges: DataFrame, sources: DataFrame, max_hops: int
) -> DataFrame:
    """Bounded-hop Brandes betweenness over a source sample →
    (id, betweenness): for each sampled root, shortest-path counts σ
    accumulate forward level-by-level, then dependencies
    ``δ(v) = Σ_{v→w, d(w)=d(v)+1} σ(v)/σ(w) · (1 + δ(w))``
    accumulate backward (Brandes 2001); betweenness(v) sums δ over
    roots, v ≠ root. Directed, unweighted (multi-edges collapse),
    paths truncated at ``max_hops`` — the k-source, h-hop estimate
    that replaces exact all-pairs betweenness on graphs where
    O(V·E) is off the table (the standard sampling estimator, scaled
    by the sample rate when an absolute value is needed).

    Scale shape: the forward pass is the multi-source BFS join
    pattern (frontier ⨝ adjacency per level, σ summed map-side); the
    backward pass replays the SAME per-level frames in reverse with
    one join per level against the next level's δ. Each level is
    checkpointed; total cost is 2·hops equi-join rounds on
    (root, node) keys — hub skew AQE-splittable, identical profile
    to ``max_hops`` PageRank rounds.
    """
    adj = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    lvl = sources.select(
        F.col("id").alias("root"),
        F.col("id").alias("node"),
        F.lit(1.0).alias("sig"),
    ).localCheckpoint(eager=True)
    levels = [lvl]
    seen = lvl.select("root", "node").localCheckpoint(eager=False)
    for _ in range(max_hops):
        cand = (
            levels[-1]
            .join(adj, levels[-1]["node"] == adj["src"])
            .groupBy("root", F.col("dst").alias("nnode"))
            .agg(F.sum("sig").alias("sig"))
            .withColumnRenamed("nnode", "node")
        )
        new = cand.join(seen, ["root", "node"], "left_anti").localCheckpoint(
            eager=True
        )
        if not new.take(1):
            break
        levels.append(new)
        seen = seen.unionByName(new.select("root", "node")).localCheckpoint(
            eager=False
        )
    # backward dependency accumulation, deepest level first
    delta_next = None  # δ of level ℓ+1 (None ⇒ all zero)
    deps = []
    for ell in range(len(levels) - 2, -1, -1):
        v = levels[ell].select(
            "root", F.col("node").alias("v"), F.col("sig").alias("sig_v")
        )
        w = levels[ell + 1].select(
            "root", F.col("node").alias("w"), F.col("sig").alias("sig_w")
        )
        vw = v.join(adj, v["v"] == adj["src"]).join(
            w,
            (F.col("dst") == w["w"])
            & (v["root"] == w["root"]),
        ).select(v["root"], "v", "sig_v", "w", "sig_w")
        if delta_next is not None:
            dn = delta_next.select(
                "root", F.col("v").alias("w"), F.col("delta").alias("dw")
            )
            vw = vw.join(dn, ["root", "w"], "left_outer").withColumn(
                "dw", F.coalesce("dw", F.lit(0.0))
            )
        else:
            vw = vw.withColumn("dw", F.lit(0.0))
        delta_l = (
            vw.groupBy("root", "v")
            .agg(
                F.sum(
                    F.col("sig_v") / F.col("sig_w") * (F.lit(1.0) + F.col("dw"))
                ).alias("delta")
            )
            .localCheckpoint(eager=True)
        )
        deps.append(delta_l)
        delta_next = delta_l
    if deps:
        acc = deps[0]
        for d in deps[1:]:
            acc = acc.unionByName(d)
        bc = (
            acc.filter(F.col("v") != F.col("root"))
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("delta").alias("bc"))
        )
    else:
        bc = sources.select(
            F.col("id"), F.lit(0.0).alias("bc")
        ).limit(0)
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return verts.join(bc, "id", "left_outer").select(
        "id",
        (
            F.floor(
                F.coalesce("bc", F.lit(0.0)) * F.lit(1e6) + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("betweenness"),
    )


def ktruss_peel(
    edges: DataFrame, k: int = 3, rounds: int = 2
) -> DataFrame:
    """k-truss peeling, ``rounds`` synchronous rounds →
    (a, b, support): edges of the undirected graph (canonical a<b,
    multi-edges and direction collapsed) whose triangle support
    survives ``rounds`` passes of "drop every edge in fewer than
    k−2 triangles", with the support recomputed on the final graph
    (left join: an edge that survived every peel round but sits in
    zero triangles of the final graph is kept with support 0 — in
    particular k<=2 keeps all edges, matching the 2-truss identity).
    The cohesion filter one notch above k-core: a k-truss edge sits
    in at least k−2 triangles of the truss itself (Cohen 2008).

    Scale shape: triangles enumerate once per round via the ordered
    a<b<c double equi-join (each triangle counted exactly once, cost
    bounded by Σ deg² like triangle counting — never all-pairs);
    support is an explode-to-3-edge-slots map-side-combinable count;
    the peel is one broadcast-eligible semi-join. The frame only
    shrinks; rounds checkpoint so lineage stays linear (same policy
    as kcore_peel above).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def support(u: DataFrame) -> DataFrame:
        e1 = u.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = u.select(F.col("a").alias("y"), F.col("b").alias("z"))
        e3 = u.select(F.col("a").alias("x"), F.col("b").alias("z"))
        tri = e1.join(e2, "y").join(e3, ["x", "z"])
        slots = (
            tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
            .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
            .unionAll(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
        )
        return slots.groupBy("a", "b").agg(F.count("*").alias("support"))

    cur = und
    for _ in range(rounds):
        sup = support(cur)
        # left join + coalesce: an edge in zero triangles has support
        # 0, which still satisfies k <= 2 (a semi-join against the
        # triangle-derived support frame would silently drop it).
        cur = (
            cur.join(sup, ["a", "b"], "left_outer")
            .filter(F.coalesce("support", F.lit(0)) >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return cur.join(support(cur), ["a", "b"], "left_outer").select(
        "a",
        "b",
        F.coalesce("support", F.lit(0)).cast("long").alias("support"),
    )


def scc_bounded(
    vertices: DataFrame, edges: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Strongly connected components, bounded-witness contract →
    (id, scc_id): two nodes share a label when they are connected by
    a chain of MUTUAL-reachability witnesses of ≤ ``max_hops`` hops
    each way. Always SOUND (a bounded mutual pair lies in one true
    SCC, and components of such pairs never span two SCCs), and
    COMPLETE for every SCC of directed diameter ≤ max_hops — in
    practice also for simple cycles up to length 2·max_hops (any
    split a+b of the cycle with a,b ≤ max_hops yields a witness
    pair). Longer-witness SCCs stay (partially) split rather than
    wrongly merged. This upgrades graph_reciprocal_edges (the 2-cycle
    special case) to bounded cycles — and states the bound instead of
    faking Tarjan.

    Method: materialize the ≤max_hops forward closure (u ⇝ v) by
    extending one hop per round (distinct + eager checkpoint so the
    frame, not the lineage, grows); witness pairs are the closure
    semi-joined with its own transpose; the label is the undirected
    connected component of the witness graph (pairwise bounded
    mutuality is NOT transitive, so a min-partner label would be
    inconsistent — the CC pass restores a well-defined equivalence).

    Scale shape: each extension is ONE equi-join of the closure with
    the edge list — cost is the size of the k-bounded closure, the
    honest price on a sparse graph; the CC pass is the existing
    pointer-jumping components over the (small) witness-pair frame.
    This is the FIXED-BUDGET tier; :func:`scc_exact` (round 5) is
    the exact upgrade — contraction + hop doubling + DAG certificate
    — whose labels equal true SCCs on any digraph.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    reach = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    for _ in range(max_hops - 1):
        ext = (
            reach.join(e, reach["v"] == e["src"])
            .select("u", F.col("dst").alias("v"))
        )
        reach = (
            reach.unionByName(ext)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    transpose = reach.select(
        F.col("v").alias("u"), F.col("u").alias("v")
    )
    mutual = reach.join(transpose, ["u", "v"], "left_semi")
    # The witness graph is tiny next to |V| (only nodes on bounded
    # cycles appear), so run the component rounds over WITNESS
    # vertices only and give every untouched vertex its identity
    # label with one left join — value-identical to CC over all
    # vertices (an isolated vertex's component is its own id), but
    # the per-round shuffles are witness-sized, not |V|-sized
    # (optimization round 10, guide §2.4).
    wverts = (
        mutual.select(F.col("u").alias("id"))
        .union(mutual.select(F.col("v").alias("id")))
        .distinct()
    )
    comps = connected_components(
        wverts,
        mutual.select(F.col("u").alias("src"), F.col("v").alias("dst")),
    ).select(F.col("id").alias("__wid"), "component")
    return (
        vertices.join(
            comps, vertices["id"] == F.col("__wid"), "left_outer"
        )
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("scc_id"),
        )
    )


def scc_exact(
    vertices: DataFrame,
    edges: DataFrame,
    initial_hops: int = 3,
    max_rounds: int = 10,
) -> DataFrame:
    """EXACT strongly connected components → (id, scc_id): labels
    equal true SCCs on any digraph (``scc_id`` = min node id, string
    order, matching :func:`connected_components`).

    Algorithm — contraction with hop-budget doubling and a DAG
    certificate (the exact upgrade of :func:`scc_bounded`):

    1. Find MUTUAL-reachability witness pairs within ``h`` hops each
       way (forward closure built by relation DOUBLING — log2(h)
       self-joins, covering all 2^t-hop paths per round, the same
       doubling shape as pointer-jumping components — intersected
       with its transpose).
    2. Contract: witnesses in one undirected component of the witness
       graph provably share a true SCC (mutual reachability is
       transitive), so merge them, relabel the edge list, drop
       self-loops. Contraction preserves reachability, so recursion
       on the contracted graph stays sound.
    3. When a round finds NO witnesses, attempt the certificate: if
       the contracted edges are strictly increasing under a
       topological key (min member id as BIGINT — works whenever ids
       are numeric strings, as the driver's are), the contracted
       graph is a DAG, hence cycle-free, hence every supernode IS a
       complete SCC — EXACT, stop. Certificate failure is never
       wrongness, only unproven-ness: DOUBLE ``h`` and continue (a
       chordless cycle of length L yields its first witness at
       h = ceil(L/2), so log rounds reach any cycle).
    4. Pigeonhole stop: once h ≥ |V| of the contracted graph, any
       cycle (length ≤ |V| ≤ h) would have produced a witness, so
       no-witnesses alone proves the DAG without the certificate.

    Scale shape: per round, closure doubling costs one equi-join of
    the bounded-reach frame with itself (the frame's size — not the
    full closure — is the honest price, and contraction keeps
    shrinking the graph); the witness-component pass is the existing
    pointer-jumping CC over a small pair frame; the certificate is
    one broadcast-joined filter over the contracted edge list. On
    real dependency/citation graphs the cycle core is tiny and this
    terminates in 2 rounds (witnesses, then certificate).

    Raises RuntimeError if ``max_rounds`` budgets are exhausted
    before the certificate or pigeonhole bound is reached —
    explicitly unfinished rather than silently approximate.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # original node -> current supernode label (min member id)
    labels = vertices.select(
        "id", F.col("id").alias("lbl")
    ).localCheckpoint(eager=True)
    h = initial_hops

    def _n_current() -> int:
        # supernode count, needed ONLY by the pigeonhole stop on a
        # no-witness round — computed on demand instead of once per
        # round (at round 0 distinct lbl = |V|, after a contraction
        # it is the contracted-graph size, exactly what the old
        # per-round count maintained)
        return labels.select("lbl").distinct().count()

    for _ in range(max_rounds):
        # forward closure to <= h hops by relation doubling
        reach = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        steps = 0
        while (1 << steps) < h:
            ext = (
                reach.alias("a")
                .join(
                    reach.alias("b"), F.col("a.v") == F.col("b.u")
                )
                .select(F.col("a.u").alias("u"), F.col("b.v").alias("v"))
            )
            reach = (
                reach.unionByName(ext)
                .filter(F.col("u") != F.col("v"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            steps += 1
        transpose = reach.select(
            F.col("v").alias("u"), F.col("u").alias("v")
        )
        # materialized once: consumed by the emptiness check, the
        # witness-vertex frame AND the component pass — lazily each
        # re-ran the semi-join over the checkpointed closure
        mutual = (
            reach.join(transpose, ["u", "v"], "left_semi")
            .localCheckpoint(eager=True)
        )

        if mutual.isEmpty():
            if h >= _n_current():
                break  # pigeonhole: no cycle can exceed |V| <= h
            key = labels.groupBy("lbl").agg(
                F.min(F.col("id").cast("long")).alias("k")
            )
            ks = key.select(F.col("lbl").alias("__s"), F.col("k").alias("ks"))
            kd = key.select(F.col("lbl").alias("__d"), F.col("k").alias("kd"))
            n_viol = (
                e.join(ks, e["src"] == ks["__s"])
                .join(kd, e["dst"] == kd["__d"])
                .filter(
                    F.col("ks").isNull()
                    | F.col("kd").isNull()
                    | (F.col("ks") >= F.col("kd"))
                )
                .count()
            )
            if n_viol == 0:
                break  # certificate: topological key => DAG => exact
            h *= 2
            continue

        # contract the witness components. The component rounds run
        # over WITNESS vertices only (nodes on ≤h-hop cycles — tiny
        # next to the contracted graph); labels/edges not touched by
        # any witness keep their current value via left joins —
        # value-identical to CC over every supernode (an isolated
        # vertex's component is its own id), with witness-sized
        # per-round shuffles (optimization round 10, guide §2.4).
        wverts = (
            mutual.select(F.col("u").alias("id"))
            .union(mutual.select(F.col("v").alias("id")))
            .distinct()
        )
        sup = connected_components(
            wverts,
            mutual.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        ).select(F.col("id").alias("__l"), F.col("component").alias("__c"))
        labels = (
            labels.join(sup, labels["lbl"] == sup["__l"], "left_outer")
            .select("id", F.coalesce("__c", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        rs = sup.select(F.col("__l").alias("__s"), F.col("__c").alias("cs"))
        rd = sup.select(F.col("__l").alias("__d"), F.col("__c").alias("cd"))
        e = (
            e.join(rs, e["src"] == rs["__s"], "left_outer")
            .join(rd, e["dst"] == rd["__d"], "left_outer")
            .select(
                F.coalesce("cs", "src").alias("src"),
                F.coalesce("cd", "dst").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"scc_exact: exactness not established within {max_rounds} "
            f"rounds (h reached {h}); raise max_rounds/initial_hops"
        )
    return labels.select("id", F.col("lbl").alias("scc_id"))


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient → one row
    (n_endpoints, assortativity).

    Pearson correlation of total degrees across the endpoints of the
    symmetrized edge set (each edge contributes both orientations, the
    standard undirected treatment): positive = hubs link to hubs
    (social-graph shape), negative = hubs link to leaves
    (star/hierarchy shape). Degrees are integers, so every sufficient
    statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT integer sum —
    order-free, engine-identical; only the final correlation runs in
    double. Plan: the degree frame (two map-side-combinable counts)
    joins the edge list twice by key — two shuffles total at any
    scale, no iteration. Returns NULL assortativity on zero-variance
    degree sequences (e.g. a pure cycle) rather than NaN."""
    deg = degrees(edges).select("id", "degree")
    sym = edges.select("src", "dst").unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    j = (
        sym.join(
            deg.select(F.col("id").alias("src"), F.col("degree").alias("x")),
            "src",
        )
        .join(
            deg.select(F.col("id").alias("dst"), F.col("degree").alias("y")),
            "dst",
        )
    )
    g = j.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    r = (n * sxy - sx * sy) / F.sqrt(denx * deny)
    return g.select(
        F.col("n").alias("n_endpoints"),
        F.when(
            (denx > 0) & (deny > 0),
            F.floor(r * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6),
        ).alias("assortativity"),
    )


def hyperanf(
    nodes: DataFrame,
    edges: DataFrame,
    hops: int = 4,
    m: int = 64,
    salt: str = "anf",
) -> DataFrame:
    """HyperANF (Boldi–Rosa–Vigna): the neighborhood function N(h) =
    Σ_v |ball(v, h)| estimated with per-node HyperLogLog registers →
    (hop, n_nodes, est_pairs) for h = 0..``hops``.

    The exact neighborhood function needs all-pairs reachability —
    quadratic state, the thing that cannot exist at 100 TB. HyperANF
    replaces each vertex's reachable SET with a fixed m-register HLL
    sketch and exploits that HLL union is element-wise register max:
      regs_h(v) = max(regs_{h-1}(v), regs_{h-1}(w) ∀ edge v→w)
    so one hop of ball growth is ONE edge-keyed equi-join + one
    (node, register) max-aggregate — constant state per vertex,
    per-round cost independent of ball size, lineage cut per round
    with localCheckpoint like every iterative operator here. This is
    how effective-diameter / average-distance metrics are actually
    computed on web-scale graphs.

    Determinism/parity: registers use the same md5-derived 60-bit
    hash and binary-string ρ as operators/sketch.py (no float log2),
    the identical Flajolet estimator with small-range linear
    correction, and each per-vertex estimate is fixed to 6dp AS A
    BIGINT (floor(est·1e6 + 0.5)) BEFORE the cross-vertex sum — the
    sum of longs is order-independent, so the oracle's replay matches
    bit-for-bit regardless of partitioning. est_pairs = that exact
    integer sum / 1e6.
    """
    from .dedup import stable_hash60

    w_rho = 51
    h = stable_hash60(F.concat(F.lit(salt), F.col("grp").cast("string")))
    regs = (
        nodes.select(F.col("id").alias("grp"))
        .withColumn("h", h)
        .withColumn("reg", F.pmod("h", F.lit(m)))
        .withColumn(
            "r", F.pmod(F.expr(f"h div {m}"), F.lit(1 << (w_rho - 1)))
        )
        .withColumn(
            "rho",
            F.when(F.col("r") == 0, F.lit(w_rho)).otherwise(
                F.lit(w_rho)
                - F.length(F.conv(F.col("r").cast("string"), 10, 2))
            ),
        )
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("mrho"))
        .localCheckpoint(eager=False)
    )
    e = edges.select(
        F.col("src").alias("grp"), F.col("dst").alias("nbr")
    ).distinct()
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))

    def hop_summary(reg_frame: DataFrame, hop: int) -> DataFrame:
        est = (
            reg_frame.groupBy("grp")
            .agg(
                F.sum(F.pow(F.lit(2.0), -F.col("mrho"))).alias("s_occ"),
                F.count("*").alias("n_occ"),
            )
            .withColumn("zeros", F.lit(m) - F.col("n_occ"))
            .withColumn(
                "s", F.col("s_occ") + F.col("zeros").cast("double")
            )
            .withColumn("raw", alpha * F.lit(float(m * m)) / F.col("s"))
            .withColumn(
                "est",
                F.when(
                    (F.col("raw") <= F.lit(2.5 * m))
                    & (F.col("zeros") > 0),
                    F.lit(float(m))
                    * F.log(F.lit(float(m)) / F.col("zeros")),
                ).otherwise(F.col("raw")),
            )
            .withColumn(
                "est6",
                F.floor(F.col("est") * F.lit(1e6) + F.lit(0.5)).cast(
                    "long"
                ),
            )
        )
        return est.agg(
            F.lit(hop).alias("hop"),
            F.count("*").alias("n_nodes"),
            (F.sum("est6").cast("double") / F.lit(1e6)).alias(
                "est_pairs"
            ),
        )

    out = hop_summary(regs, 0)
    for hop in range(1, hops + 1):
        prop = e.join(
            regs.select(F.col("grp").alias("nbr"), "reg", "mrho"), "nbr"
        ).select("grp", "reg", "mrho")
        regs = (
            regs.unionByName(prop)
            .groupBy("grp", "reg")
            .agg(F.max("mrho").alias("mrho"))
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(hop_summary(regs, hop))
    return out


def walk_counts(
    nodes: DataFrame, edges: DataFrame, hops: int = 4
) -> DataFrame:
    """Exact walk counting: w_h(v) = number of length-h directed
    walks starting at v → (hop, n_active, total_walks) for h =
    1..``hops``. The integer sparse-matrix-vector (SpMV) chain —
    w_h = A·w_{h-1} as one edge-keyed equi-join + one sum aggregate
    per hop, the primitive under reachability counting, Katz-style
    centralities, and message-passing feature counts.

    All-BIGINT arithmetic (walk counts are integers; the oracle's
    unrolled joins produce the identical integers — no float, no
    rounding anywhere). The walk vector SHRINKS as h grows (only
    nodes with at least one length-h walk keep rows), so per-round
    cost is bounded by the live frontier; counts grow at most
    (max out-degree)^h — BIGINT-safe on bounded-degree graphs, and
    the overflow point is a property of the graph, not the engine
    (swap to DECIMAL(38,0) for dense graphs at large h)."""
    e = edges.select("src", "dst").distinct()
    w = nodes.select(
        F.col("id"), F.lit(1).cast("long").alias("w")
    )
    out = None
    for h in range(1, hops + 1):
        w = (
            e.join(
                w.select(F.col("id").alias("dst"), "w"), "dst"
            )
            .groupBy("src")
            .agg(F.sum("w").alias("w"))
            .select(F.col("src").alias("id"), "w")
            .localCheckpoint(eager=False)
        )
        s = w.agg(
            F.lit(h).alias("hop"),
            F.count("*").alias("n_active"),
            F.sum("w").alias("total_walks"),
        )
        out = s if out is None else out.unionByName(s)
    return out


def katz_bounded(
    nodes: DataFrame, edges: DataFrame, hops: int = 4
) -> DataFrame:
    """Hop-bounded Katz centrality with β = 1/10 → (id, katz):
    katz(v) = Σ_{h=1..hops} β^h · (walks of length h ENDING at v) —
    the influence score that counts long paths at geometrically
    discounted weight, truncated at ``hops`` (the standard practical
    Katz; the full series needs spectral radius knowledge anyway).

    EXACT arithmetic: β = 1/10 makes β^h·w_h a decimal with ≤ 4
    digits, so the whole score is the INTEGER Σ w_h·10^(hops−h)
    divided once by 10^hops — walk counts come from the same
    all-BIGINT SpMV chain as walk_counts, run on REVERSED edges
    (in-walks measure received influence, matching Katz's A^T
    convention). One edge join + one sum per hop; the per-hop
    vectors join back on id at the end (hops tiny frames)."""
    e = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).distinct()
    w = nodes.select(F.col("id"), F.lit(1).cast("long").alias("w"))
    acc = nodes.select("id", F.lit(0).cast("long").alias("num"))
    for h in range(1, hops + 1):
        w = (
            e.join(w.select(F.col("id").alias("dst"), "w"), "dst")
            .groupBy("src")
            .agg(F.sum("w").alias("w"))
            .select(F.col("src").alias("id"), "w")
            .localCheckpoint(eager=False)
        )
        scale = 10 ** (hops - h)
        acc = (
            acc.join(
                w.select("id", (F.col("w") * F.lit(scale)).alias("__a")),
                "id",
                "left",
            )
            .select(
                "id",
                (F.col("num") + F.coalesce("__a", F.lit(0))).alias("num"),
            )
        )
    den = float(10 ** hops)
    return acc.select(
        "id", (F.col("num").cast("double") / F.lit(den)).alias("katz")
    )
