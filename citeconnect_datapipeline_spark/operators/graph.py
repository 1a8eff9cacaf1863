"""Iterative graph analytics: PageRank over a DataFrame edge list.

The reference stores a citation graph as per-paper reference-id
arrays (SURVEY.md §1.1) and only ever expands it hop-by-hop (D6).
Ranking the graph — which papers matter, which parts anchor the
co-purchase network — needs the iterative fixpoint the reference
never attempts. This is the join-based restatement of GraphX's
Pregel PageRank, same family as `neardup_components`' label
propagation.

Scale shape per iteration: ONE shuffle — contributions group on the
destination key; the rank/degree table stays partitioned on the same
key so the contribution join reuses the exchange. The driver loop
carries only the iteration counter (fixed iteration count — at scale
a convergence-delta aggregate, one scalar per round). Lineage is cut
by localCheckpoint every other round — see the in-loop comment for
why persist()+count() is not sufficient for iterative plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

DAMPING = 0.85
ITERATIONS = 5


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    checkpoint_every: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond")
    — the skew-hardened replacement for plain min-label propagation,
    which needs graph-DIAMETER rounds (a 10k-hop chain = 10k Spark
    jobs) and funnels every hub's traffic through one label row.
    Alternating stars converge in O(log^2 n) rounds on ANY shape:

    * large-star: every vertex points its LARGER neighbors at the
      minimum of its closed neighborhood — long tails collapse
      toward minima in parallel;
    * small-star: every vertex and its SMALLER neighbors re-point at
      that minimum — stars flatten to depth 1.

    Both steps are a groupBy-min + an equi-join re-emit (no
    collect_set, so a 10M-degree hub never materializes one giant
    row). The per-round driver state is a (count, hash-sum)
    convergence checksum, never data; every ``checkpoint_every``
    rounds the edge set is localCheckpoint-ed to cut lineage (the
    loop otherwise compounds a per-round plan that Catalyst
    re-analyzes quadratically). A non-converged loop RAISES instead
    of silently returning partial components.

    Returns (v, component) for every non-isolated vertex: component
    = min vertex id reachable. Isolated vertices never appear in
    ``edges`` and so are absent (trivially their own component) —
    same contract as ``operators.dedup.neardup_components``.
    """
    from pyspark.sql import Window

    def checksum(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            # decimal sum: a long sum of 64-bit hashes overflows
            # under ANSI mode; decimal(38,0) holds billions of them
            F.coalesce(
                F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("s"),
        ).first()
        return (row["n"], row["s"])

    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.least(F.col(src), F.col(dst)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .persist()
    )
    # Seeding prev with the INPUT checksum lets an already-star-
    # shaped graph (the common near-dup case after round 1) exit
    # after a single confirming round.
    prev = checksum(e)
    converged = False
    for round_no in range(1, max_rounds + 1):
        # Each star step computes its group-min with a WINDOW over
        # the grouping key — one shuffle per step, vs two for the
        # groupBy+re-join formulation (measured 2x on the bench).
        # large-star: (v, min(closed nbrs of u)) for every v > u
        sym = e.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).unionByName(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        ls = (
            sym.withColumn(
                "mn", F.min("v").over(Window.partitionBy("u"))
            )
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("hi"),
                F.least(F.col("u"), F.col("mn")).alias("lo"),
            )
            .filter(F.col("hi") != F.col("lo"))
        )
        # small-star: u and its smaller neighbors point at their min.
        # Duplicate emits collapse in the trailing distinct, which
        # also canonicalizes the set for the convergence checksum.
        ss = ls.withColumn(
            "mn", F.min("lo").over(Window.partitionBy("hi"))
        )
        out = (
            ss.select(F.col("lo").alias("hi"), F.col("mn").alias("lo"))
            .unionByName(ss.select("hi", F.col("mn").alias("lo")))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        if round_no % checkpoint_every == 0:
            out = out.localCheckpoint()  # eager: cuts lineage
        else:
            out = out.persist()
        cur = checksum(out)
        e.unpersist()
        e = out
        if stats is not None:
            stats["rounds"] = round_no
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        e.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds — raise max_rounds"
        )
    # fixpoint is a forest of depth-1 stars rooted at each
    # component's min: non-roots appear as hi, roots only as lo
    labels = (
        e.select(F.col("hi").alias("v"), F.col("lo").alias("label"))
        .unionByName(
            e.select(F.col("lo").alias("v"))
            .distinct()
            .withColumn("label", F.col("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    e.unpersist()
    return labels


def pagerank(
    edges: DataFrame,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """PageRank over directed ``(src, dst)`` edges, fixed iteration
    count, ranks normalized to sum to the vertex count (the classic
    1.0-per-vertex initialization). Duplicate edges collapse (the
    unweighted-graph convention). Dangling vertices (no out-edges)
    keep receiving but stop distributing — their mass re-enters
    through the (1-d) teleport term, the standard simplification."""
    # Weighted edges built ONCE as an adjacency aggregation: one
    # shuffle on src dedups (collect_set), folds out-degree into the
    # per-edge weight (1/|adj|), and leaves the exploded edge list
    # HASH-PARTITIONED ON src — the layout every per-round rank join
    # reuses. The rank table starts as a narrow projection of the
    # vertex table (same hash layout on v), so in-loop joins are
    # exchange-free: the only shuffle per iteration is the
    # contribution groupBy, which map-side combines to one row per
    # vertex before the wire.
    #
    # Broadcasting ranks instead (the tempting "vertices are small"
    # plan — round 1's shape) is a scale trap: it collects O(V) rows
    # to the driver and re-ships them to every executor EVERY round,
    # and at 100 TB the vertex table is only small relative to edges,
    # not in absolute terms. Co-partitioning costs nothing per round;
    # AQE still runtime-broadcasts when ranks is genuinely tiny — the
    # size guard stays accurate because it sees actual bytes.
    #
    # The pinned REPARTITION_BY_NUM (explicit N = the session's
    # shuffle-partition count) matters: an ENSURE_REQUIREMENTS
    # shuffle inside a cached plan is fair game for AQE partition
    # coalescing, which erases the layout downstream joins rely on
    # and re-shuffles the EDGE table every round (verified in the
    # plan test). A number-pinned repartition is AQE-stable, so the
    # cached layout survives and in-loop joins are exchange-free.
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    adj = edges.groupBy("src").agg(F.collect_set("dst").alias("ds"))
    w_edges = (
        adj.select(
            "src",
            F.explode("ds").alias("dst"),
            (F.lit(1.0) / F.size("ds")).alias("w"),
        )
        .repartition(n_part, F.col("src"))
        .persist()
    )
    vertices = (
        w_edges.select(F.col("src").alias("v"))
        .unionByName(w_edges.select(F.col("dst").alias("v")))
        .distinct()
        .repartition(n_part, F.col("v"))
        .persist()
    )
    ranks = vertices.select("v", F.lit(1.0).alias("rank"))
    for i in range(iterations):
        # shuffle_hash hints skip the per-round SMJ sorts: both joins
        # are already clustered on the key, and the build side is the
        # vertex-sized partition slice (V/N rows), the bounded side.
        r = ranks.hint("shuffle_hash")
        contribs = (
            w_edges.join(r, w_edges.src == r.v)
            .select(
                F.col("dst").alias("v2"),
                (F.col("rank") * F.col("w")).alias("c"),
            )
            .groupBy("v2")
            .agg(F.sum("c").alias("contrib"))
            .hint("shuffle_hash")
        )
        # localCheckpoint (eager): materializes AND truncates lineage.
        # persist()+count() is not enough for an iterative loop — the
        # logical plan still nests every previous round, and Catalyst
        # analysis time grows superlinearly with depth (measured:
        # round 9 cost 23 s of pure driver-side planning vs 1.3 s of
        # compute). Each eager checkpoint is ALSO a serial job
        # (~0.3 s submission floor locally), so the cadence is a
        # trade: measured at 5 iterations, every-other-round spent
        # 1.4 s MORE on checkpoint jobs than the planning it saved
        # (5.5 s vs 4.5 s wall, r8 verdict #6). Cut lineage only
        # every 4th round counted back from the end — plan depth
        # stays <= 4 (well under the measured depth-9 planning
        # cliff) and a 5-round run pays exactly ONE checkpoint. The
        # FINAL round always checkpoints: the static tables are
        # unpersisted below before the caller executes the returned
        # plan, so the result must already be materialized. On a
        # cluster use checkpoint() to HDFS for fault tolerance;
        # locally executor-memory blocks suffice.
        new_ranks = vertices.join(
            contribs, vertices.v == contribs.v2, "left"
        ).select(
            "v",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
            ).alias("rank"),
        )
        if i == iterations - 1 or (
            i > 0 and (iterations - 1 - i) % 4 == 0
        ):
            new_ranks = new_ranks.localCheckpoint()
        ranks = new_ranks
    # The final-round localCheckpoint is eager and cuts lineage, so
    # the static tables can be released before returning.
    vertices.unpersist()
    w_edges.unpersist()
    return ranks


_PAGERANK_ORACLE_HEAD = """
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    verts AS (
        SELECT src AS v FROM edges UNION SELECT dst FROM edges
    ),
    r0 AS (SELECT v, 1.0 AS rank FROM verts)
"""

# One unrolled iteration: contributions grouped on dst, teleport fold.
_PAGERANK_ORACLE_ITER = """
    , c{i} AS (
        SELECT e.dst AS v, SUM(r.rank / deg.d) AS contrib
        FROM edges e
        JOIN r{prev} r ON e.src = r.v
        JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    ),
    r{i} AS (
        SELECT verts.v, 0.15 + 0.85 * COALESCE(c{i}.contrib, 0) AS rank
        FROM verts LEFT JOIN c{i} ON verts.v = c{i}.v
    )
"""

_PAGERANK_ORACLE = (
    _PAGERANK_ORACLE_HEAD
    + "".join(
        _PAGERANK_ORACLE_ITER.format(i=i, prev=i - 1)
        for i in range(1, ITERATIONS + 1)
    )
    + f"""
    SELECT v, ROUND(rank, 6) AS rank
    FROM r{ITERATIONS}
    ORDER BY ROUND(rank, 6) DESC, v
    LIMIT 20
    """
)



def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-intermediate cache: the DISTINCT directed
    co-purchase edge list (src, dst), repartitioned on src and
    eagerly localCheckpoint-ed — the artifact BOTH fixpoint
    consumers (`part_copurchase_pagerank`, `lpa_communities_topk`)
    need, built once per process like the near-dup pair table. A
    deployment materializes this at ingest; rebuilding the basket
    explode per consuming query benchmarks an anti-pattern and was
    the suite's top contention source once LPA joined the registry
    (~19 s in-suite for the pair, ~5 s each isolated)."""
    from ..memo import shared_intermediate

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        # r13 (guide §2.3): the edge list is DISTINCT (src, dst), so
        # duplicate part-sets contribute nothing — dedup the sorted
        # set BEFORE the quadratic pair expansion (the weighted twin
        # of this move carries multiplicity in _support_pruned_edges;
        # here plain dedup suffices). 10x-replicated baskets on the
        # scaled probe pay the explode once instead of 10 times.
        baskets = (
            li.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
            .select("ps")
            .dropDuplicates(["ps"])
        )
        n_part = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
        return (
            baskets.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            "ps",
                            lambda x: F.transform(
                                "ps",
                                lambda y: F.struct(
                                    x.alias("src"), y.alias("dst")
                                ),
                            ),
                        )
                    )
                ).alias("p")
            )
            .select("p.src", "p.dst")
            .filter(F.col("src") != F.col("dst"))
            # r13 (guide §2.4): repartition FIRST — hash(src) clusters
            # (src, dst), so the dedup runs locally above the pinned
            # exchange and the r12 shape's separate distinct exchange
            # (a second full pass of the pair list over the wire)
            # disappears. Cold-build cost is what the bench gates on
            # for this artifact's six consumers.
            .repartition(n_part, F.col("src"))
            .dropDuplicates(["src", "dst"])
            .localCheckpoint()
        )

    return shared_intermediate(
        spark, "copurchase_edges", (sf_dir,), build
    )


@query("part_copurchase_pagerank", oracle=_PAGERANK_ORACLE)
# The fixed-iteration fixpoint unrolls into {ITERATIONS} plain CTE
# stages, so even the "iterative" flagship gets a full hash oracle:
# 6-dp rounding absorbs cross-engine float summation-order noise
# (double error ~1e-13 on ~1.0-scale ranks).
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph: parts appearing in
    the same order are linked (both directions), and rank finds the
    parts that anchor baskets — the reference's 'importance score'
    (metadata_enricher.py:91-129) upgraded from a per-row formula to
    a whole-graph fixpoint.

    Edge build: the process-shared memoized distinct edge list
    (`_copurchase_edges` — one groupBy into basket arrays, map-side
    pair expansion, built once and reused by `lpa_communities_topk`).
    Top-20 by rounded rank with a part-key tie-break for a
    deterministic result set."""
    return (
        pagerank(_copurchase_edges(spark, sf_dir))
        .select("v", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "v")
        .limit(20)
    )


@query(
    "copurchase_pmi_topk",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    part_n AS (
        SELECT l_partkey, COUNT(*) AS c FROM baskets GROUP BY l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS total FROM lineitem),
    pair_n AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS cab
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT p.pa, p.pb, CAST(p.cab AS BIGINT) AS cab,
           ROUND(ln(CAST(p.cab AS DOUBLE) * n.total
                    / (ca.c * cb.c)), 6) AS pmi
    FROM pair_n p
    JOIN part_n ca ON p.pa = ca.l_partkey
    JOIN part_n cb ON p.pb = cb.l_partkey
    CROSS JOIN n
    WHERE p.cab >= 3
    ORDER BY pmi DESC, pa, pb
    LIMIT 20
    """,
)
def copurchase_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over co-purchased part pairs —
    the association-scoring step a recommender or data-curation
    pipeline runs on top of the raw co-occurrence graph (PageRank's
    edge list, unweighted, answers 'what is central'; PMI answers
    'what is SURPRISINGLY together'). Minimum support 3 discards
    noise pairs, the standard market-basket guard.

    Same basket-array edge build as PageRank (one groupBy, map-side
    pair expansion) aggregated to pair counts; part marginals are a
    small keyed aggregate broadcast back onto the pairs. Top-20 with
    full tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    # r13 (guide §2.3): collapse DUPLICATE part-sets before the
    # quadratic pair expansion — every count below is additive over
    # basket multiplicity m, so identical baskets pay the O(|ps|²)
    # explode and the pair exchange once with weight m instead of m
    # times (the _support_pruned_edges move; 10x on the scaled
    # probe). The set-grain exchange is shared by all three branches
    # (pair counts, part marginals, total) via AQE exchange reuse,
    # same as the r13 shared-basket form it extends. Integer-exact.
    sets = baskets.groupBy("ps").agg(F.count("*").alias("m"))
    pair_counts = (
        sets.select(
            "m",
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ps"), i + 2, F.size(F.col("ps"))
                            ),
                            lambda y: F.struct(
                                x.alias("pa"), y.alias("pb")
                            ),
                        ),
                    )
                )
            ).alias("p"),
        )
        .select("p.pa", "p.pb", "m")
        .groupBy("pa", "pb")
        .agg(F.sum("m").alias("cab"))
        .filter(F.col("cab") >= 3)
    )
    # part marginals and the basket total derive from the SAME
    # set-grain aggregate the pair stage reads (r12 re-scanned
    # lineitem per branch; r13 wave 1 shared the basket aggregate;
    # this keeps that sharing at set grain). collect_set already
    # dedups per order, so the weighted explode gives exactly the
    # distinct (order, part) counts.
    part_counts = (
        sets.select(F.explode("ps").alias("l_partkey"), "m")
        .groupBy("l_partkey")
        .agg(F.sum("m").alias("c"))
    )
    # PMI denominator (total basket count) as a broadcast 1-row
    # aggregate folded into the plan — a driver-side .count() here
    # was a full extra job plus a serial barrier before the scoring
    # stage could submit (same fix as tfidf_top_terms).
    total = sets.agg(
        F.sum("m").cast("double").alias("n_total")
    )
    # item-keyed equi-joins, NO forced hint: part_counts is
    # part-domain grain (linear in the lake), so size-aware AQE
    # must pick broadcast vs shuffle (r8 guard)
    ca = part_counts.alias("ca")
    cb = part_counts.alias("cb")
    return (
        pair_counts.join(ca, pair_counts.pa == F.col("ca.l_partkey"))
        .join(cb, pair_counts.pb == F.col("cb.l_partkey"))
        .crossJoin(F.broadcast(total))
        .select(
            "pa",
            "pb",
            "cab",
            F.round(
                F.log(
                    F.col("cab").cast("double")
                    * F.col("n_total")
                    / (F.col("ca.c") * F.col("cb.c"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "pa", "pb")
        .limit(20)
    )


def _support_pruned_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered (u < v) co-purchase edges with support >= 2 — the
    shared graph front half of `copurchase_triangles`,
    `copurchase_link_prediction`, `kcore_peel_stats` and
    `clustering_coefficient_topk`. In-basket pair expansion happens
    inside one row (transform over the sorted part set), so the only
    shuffles are the basket groupBy and the (u, v) support count.

    r12 (guide §2.4): memoized + eagerly pinned, the
    `_copurchase_edges` pattern — a deployment materializes this
    graph artifact at ingest. The four consumers (triangles, link
    prediction, k-core, clustering coefficient) reference the edge
    list 3-6x each under DIFFERENT required distributions (hash u /
    hash v / hash (u,v)), so only the (u, v) aggregate exchange was
    reused at runtime and the final agg + support filter re-ran once
    per consuming stage; the pinned list is built once per process
    (the bench's cold pass re-measures memo consumers with the cache
    invalidated, so the gate never sees a warm-flattered number)."""
    from ..memo import shared_intermediate

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        baskets = li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("ps")
        )
        # r13 (guide §2.3 shuffle fewer bytes): collapse DUPLICATE
        # part-sets before the quadratic pair expansion. Pair support
        # is additive over basket multiplicity (cab = Σ m over the
        # distinct sets containing the pair — exactly COUNT(*) over
        # per-basket pairs), so identical baskets pay the O(|ps|²)
        # explode and the (u, v) exchange ONCE with weight m instead
        # of m times. Popular small baskets repeat heavily (10x by
        # construction on the scaled probe: 18M pair instances → 1.8M
        # weighted rows); the extra set-grain exchange is basket-sized
        # (the cheap side of the quadratic trade).
        sets = baskets.groupBy("ps").agg(F.count("*").alias("m"))
        return (
            sets.select(
                "m",
                F.explode(
                    F.flatten(
                        F.transform(
                            "ps",
                            lambda x, i: F.transform(
                                F.slice(
                                    F.col("ps"),
                                    i + 2,
                                    F.size(F.col("ps")),
                                ),
                                lambda y: F.struct(
                                    x.alias("u"), y.alias("v")
                                ),
                            ),
                        )
                    )
                ).alias("p"),
            )
            .select("p.u", "p.v", "m")
            .groupBy("u", "v")
            .agg(F.sum("m").alias("cab"))
            .filter(F.col("cab") >= 2)
            .select("u", "v")
            # pin the artifact's parallelism: AQE coalesces the (now
            # 10x smaller) agg output to a handful of partitions, and
            # a localCheckpoint freezes that — every consumer's wedge
            # scan then runs 10-20 map tasks on 32 cores (measured
            # 30.7 -> 42 s on the sf1 wedge). One small pinned
            # exchange at defaultParallelism (scale-adaptive: cores
            # locally, cluster cores at scale) restores it.
            .repartition(
                spark.sparkContext.defaultParallelism, F.col("u")
            )
            .localCheckpoint()
        )

    return shared_intermediate(
        spark, "support_pruned_edges", (sf_dir,), build
    )


@query(
    "copurchase_triangles",
    oracle="""
    WITH baskets AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair_n AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS cab
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    e AS (SELECT u, v FROM pair_n WHERE cab >= 2),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    per_vertex AS (
        SELECT a AS vtx FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT vtx, COUNT(*) AS n_triangles
    FROM per_vertex
    GROUP BY vtx
    ORDER BY n_triangles DESC, vtx
    LIMIT 20
    """,
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the support-pruned co-purchase graph —
    the clustering-cohesion metric (parts that form buying CLIQUES,
    not just pairs) that PageRank's centrality and PMI's surprise
    both miss. Support >= 2 prunes noise edges FIRST, which is also
    what bounds the computation: triangle join cost is sum(deg^2)
    and pruning cuts degree before any wedge is built.

    Standard ordered-edge formulation (each undirected edge kept once
    as u < v): wedges from e1(a,b) JOIN e2(b,c), closed by e3(a,c).
    Every triangle is found exactly once with a < b < c, then each of
    its three vertices gets one count. Two shuffles on vertex keys +
    the final rollup; at 100 TB the ordered-edge trick (join only the
    higher-degree-ordered direction) is the classic skew guard."""
    # The builder returns the edge list eagerly pinned (r12): the
    # three self-join sides need three DIFFERENT distributions, so
    # exchange reuse only covered the (u, v) aggregate shuffle and
    # the support filter re-ran per side. (The round-3 persist-leak
    # concern doesn't apply to localCheckpoint: nothing to unpersist,
    # the RDD is dropped with the plan.)
    e = _support_pruned_edges(spark, sf_dir)
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    per_vertex = (
        tri.select(F.col("a").alias("vtx"))
        .unionByName(tri.select(F.col("b").alias("vtx")))
        .unionByName(tri.select(F.col("c").alias("vtx")))
    )
    out = (
        per_vertex.groupBy("vtx")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "vtx")
        .limit(20)
    )
    return out


@query(
    "copurchase_link_prediction",
    oracle="""
    WITH baskets AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair_n AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS cab
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    e AS (SELECT u, v FROM pair_n WHERE cab >= 2),
    und AS (
        SELECT u AS a, v AS b FROM e
        UNION ALL SELECT v AS a, u AS b FROM e
    ),
    deg AS (SELECT a AS vtx, COUNT(*) AS d FROM und GROUP BY a),
    wedge AS (
        SELECT n1.a AS x, n2.a AS y, COUNT(*) AS common
        FROM und n1 JOIN und n2
          ON n1.b = n2.b AND n1.a < n2.a
        GROUP BY n1.a, n2.a
    ),
    cand AS (
        SELECT w.x, w.y, w.common
        FROM wedge w
        LEFT JOIN e ON e.u = w.x AND e.v = w.y
        WHERE e.u IS NULL
    )
    SELECT c.x AS part_a, c.y AS part_b,
           CAST(c.common AS BIGINT) AS common_neighbors,
           ROUND(c.common * 1.0 / (da.d + db.d - c.common), 6)
               AS jaccard_score
    FROM cand c
    JOIN deg da ON da.vtx = c.x
    JOIN deg db ON db.vtx = c.y
    ORDER BY common_neighbors DESC, jaccard_score DESC,
             part_a, part_b
    LIMIT 20
    """,
)
def copurchase_link_prediction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Common-neighbors link prediction over the support-pruned
    co-purchase graph: the top pairs of parts that are NOT yet
    co-purchased together but share the most co-purchase neighbors
    (with the neighborhood-Jaccard score as the normalized
    tie-breaker) — the classic "customers who bought these also
    bought..." candidate generator, and the graph-native sibling of
    the recommendation joins the reference builds imperatively
    (citation overlap in analysis/citation_analyzer.py).

    Same wedge join as `copurchase_triangles` (cost sum(deg^2),
    bounded by the support->=2 prune cutting degree first), minus the
    closing-edge join, plus an anti join against the existing edge
    set — predicted links are by definition the OPEN wedges. Degree
    table is |vertices| rows on the same vertex key. Scores are
    int-ratio exact, so both engines rank identically; top-20 is a
    TakeOrdered."""
    e = _support_pruned_edges(spark, sf_dir)
    und = e.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).unionByName(e.select(F.col("v").alias("a"), F.col("u").alias("b")))
    deg = und.groupBy(F.col("a").alias("vtx")).agg(
        F.count("*").alias("d")
    )
    n1 = und.select(F.col("a").alias("x"), "b")
    n2 = und.select(F.col("a").alias("y"), "b")
    wedge = (
        n1.join(n2, "b")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("common"))
    )
    cand = wedge.join(
        e,
        (F.col("x") == F.col("u")) & (F.col("y") == F.col("v")),
        "left_anti",
    )
    return (
        cand.join(
            deg.select(F.col("vtx").alias("x"), F.col("d").alias("da")),
            "x",
        )
        .join(
            deg.select(F.col("vtx").alias("y"), F.col("d").alias("db")),
            "y",
        )
        .select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            F.col("common").cast("long").alias("common_neighbors"),
            F.round(
                F.col("common")
                * 1.0
                / (F.col("da") + F.col("db") - F.col("common")),
                6,
            ).alias("jaccard_score"),
        )
        .orderBy(
            F.desc("common_neighbors"),
            F.desc("jaccard_score"),
            "part_a",
            "part_b",
        )
        .limit(20)
    )


BIB_POSTING_CAP = 50  # max citing orders per part in the pair stage


@query(
    "bib_coupling_topk",
    oracle=f"""
    WITH cohort AS (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ),
    posting AS (
        SELECT DISTINCT l.l_partkey AS p, l.l_orderkey AS o
        FROM lineitem l JOIN cohort c ON l.l_orderkey = c.o_orderkey
    ),
    bounded AS (
        SELECT p, o FROM posting
        QUALIFY COUNT(*) OVER (PARTITION BY p) <= {BIB_POSTING_CAP}
    ),
    pairs AS (
        SELECT a.o AS o1, b.o AS o2,
               CAST(COUNT(*) AS BIGINT) AS shared_parts
        FROM bounded a JOIN bounded b ON a.p = b.p AND a.o < b.o
        GROUP BY 1, 2
    )
    SELECT o1, o2, shared_parts
    FROM pairs
    WHERE shared_parts >= 2
    ORDER BY shared_parts DESC, o1, o2
    LIMIT 20
    """,
)
def bib_coupling_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bibliographic coupling: the top order pairs by number of
    SHARED parts — the dual of the co-purchase/co-citation family
    (two papers are coupled when they cite the same references;
    order~paper, part~reference; the reference scores exactly this
    overlap imperatively in its citation analyzer). Pairs sharing
    >= 2 parts, top-20, computed WITHIN the urgent-priority cohort —
    coupling is a cohort analysis by construction (papers of one
    venue/field), and the cohort predicate is what keeps the
    order-side pair expansion tractable: posting lists shrink by the
    cohort's selectivity and the pair volume by its square (~25x
    here), the same lever the hot-key cap provides per-part.

    Scale shape: the inverted-index pair expansion of the dedup
    family applied to the ORDER side — ONE groupBy builds the
    distinct posting list per part (collect_set folds the dedup into
    the same shuffle), pairs stream out map-side as TWO nested
    codegen explodes (generator nodes, not interpreted lambdas —
    this pair volume is ~450 pairs/part, where the dedup family's
    per-bucket slice form pays interpreted-HOF cost per element),
    and ONE (o1, o2) count shuffle finishes — two exchanges total
    where the self-join form pays four. The posting CAP (drop parts
    cited by > BIB_POSTING_CAP=50 orders) bounds the quadratic term
    exactly like the hot-shingle cap: a part in millions of orders
    contributes O(M^2) pairs and zero coupling signal. No broadcast
    hints — both sides are corpus-grain."""
    li = load_table(spark, sf_dir, "lineitem")
    cohort = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    buckets = (
        li.join(cohort, li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("l_partkey").alias("p"))
        .agg(F.collect_set("l_orderkey").alias("ds"))
        .filter(
            (F.size("ds") > 1) & (F.size("ds") <= BIB_POSTING_CAP)
        )
    )
    e1 = buckets.select("ds", F.explode("ds").alias("o1"))
    pairs = e1.select("o1", F.explode("ds").alias("o2")).filter(
        F.col("o1") < F.col("o2")
    )
    return (
        pairs.groupBy("o1", "o2")
        .agg(F.count("*").alias("shared_parts"))
        .filter(F.col("shared_parts") >= 2)
        .orderBy(F.desc("shared_parts"), "o1", "o2")
        .limit(20)
    )


HITS_ROUNDS = 2  # unrolled hub/authority refinement rounds


@query(
    "hits_authorities",
    oracle=f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem
    ),
    a1 AS MATERIALIZED (
        SELECT p, CAST(COUNT(*) AS DOUBLE) AS a
        FROM edges GROUP BY p
    ),
    h1 AS MATERIALIZED (
        SELECT e.o, ROUND(SUM(a1.a), 6) AS h
        FROM edges e JOIN a1 ON a1.p = e.p
        GROUP BY e.o
    ),
    a2 AS MATERIALIZED (
        SELECT e.p, ROUND(SUM(h1.h), 6) AS a
        FROM edges e JOIN h1 ON h1.o = e.o
        GROUP BY e.p
    ),
    tot AS (SELECT SUM(a) AS t FROM a2)
    SELECT a2.p AS p_partkey,
           a2.a AS authority,
           ROUND(a2.a / tot.t, 6) AS authority_share
    FROM a2 CROSS JOIN tot
    ORDER BY a2.a DESC, a2.p
    LIMIT 10
    """,
)
def hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hub/authority scoring over the order->part
    bipartite citation graph, 2 (HITS_ROUNDS) refinement rounds
    unrolled declaratively: a1 = in-degree, h1(order) = sum of its
    parts' authorities, a2(part) = sum of its orders' hub scores —
    i.e. one step of power iteration on the co-citation matrix
    A^T A, the companion of `part_copurchase_pagerank` (authority =
    'cited by well-read papers', the reference's citation-impact
    notion beyond raw counts). Scores stay UN-normalized through the
    rounds (scale-invariant ranking; per-round 6 dp rounding
    re-synchronizes engines) and the output reports each top-10
    authority's share of the total, folded in as a 1-row broadcast.

    Scale shape (r13, guide §2.4): the whole 2-round chain runs at
    EDGE GRAIN over ONE scan — each HITS half-step is a window
    aggregate over the key it refines (authority counts over p, hub
    sums over o), so the r12 shape's three edge-list derivations and
    two join-backs collapse into exactly three exchanges (p, o, p).
    The leading number-pinned repartition on p lets the distinct
    dedup AND the first window share one exchange (hash(p) already
    clusters (o, p)); no joins, no broadcast of vertex-grain state.
    Values are bit-identical: per-step sums are integer-valued
    doubles (counts and their sums), so summation order cannot move
    the 6-dp rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    edges = (
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .repartition(n_part, F.col("p"))
        .dropDuplicates(["o", "p"])
    )
    # round 1: authority = in-degree, attached per edge (window rides
    # the repartition's hash(p) layout — no second exchange)
    e1 = edges.withColumn(
        "a1",
        F.count(F.lit(1))
        .over(Window.partitionBy("p"))
        .cast("double"),
    )
    # hub score per order, attached per edge (one exchange on o)
    e2 = e1.withColumn(
        "h", F.round(F.sum("a1").over(Window.partitionBy("o")), 6)
    )
    # round 2: authority = sum of incident hub scores (one exchange)
    a2 = e2.groupBy("p").agg(F.round(F.sum("h"), 6).alias("a"))
    tot = a2.agg(F.sum("a").alias("t"))
    return (
        a2.join(F.broadcast(tot))
        .select(
            F.col("p").alias("p_partkey"),
            F.col("a").alias("authority"),
            F.round(F.col("a") / F.col("t"), 6).alias(
                "authority_share"
            ),
        )
        .orderBy(F.desc("authority"), "p_partkey")
        .limit(10)
    )


KCORE_K = 3  # peel target: the 3-core
KCORE_ROUNDS = 2  # unrolled peel rounds in the portable query


@query(
    "kcore_peel_stats",
    oracle=f"""
    WITH baskets AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair_n AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS cab
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    -- every CTE below is referenced 2-3x (degree agg, next peel,
    -- scalar edge count); MATERIALIZED stops DuckDB re-inlining the
    -- quadratic pair join per reference (14 s -> <1 s at sf0.1)
    e0 AS MATERIALIZED (SELECT u, v FROM pair_n WHERE cab >= 2),
    d0 AS MATERIALIZED (
        SELECT vtx, COUNT(*) AS deg FROM (
            SELECT u AS vtx FROM e0 UNION ALL SELECT v FROM e0
        ) GROUP BY vtx
    ),
    s1 AS (SELECT vtx FROM d0 WHERE deg >= {KCORE_K}),
    e1 AS MATERIALIZED (
        SELECT e.u, e.v FROM e0 e
        JOIN s1 a ON e.u = a.vtx JOIN s1 b ON e.v = b.vtx
    ),
    d1 AS MATERIALIZED (
        SELECT vtx, COUNT(*) AS deg FROM (
            SELECT u AS vtx FROM e1 UNION ALL SELECT v FROM e1
        ) GROUP BY vtx
    ),
    s2 AS (SELECT vtx FROM d1 WHERE deg >= {KCORE_K}),
    e2 AS MATERIALIZED (
        SELECT e.u, e.v FROM e1 e
        JOIN s2 a ON e.u = a.vtx JOIN s2 b ON e.v = b.vtx
    ),
    d2 AS (
        SELECT vtx, COUNT(*) AS deg FROM (
            SELECT u AS vtx FROM e2 UNION ALL SELECT v FROM e2
        ) GROUP BY vtx
    )
    SELECT 0 AS round, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges,
           CAST(MIN(deg) AS BIGINT) AS min_degree FROM d0
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e1),
           CAST(MIN(deg) AS BIGINT) FROM d1
    UNION ALL
    SELECT 2, CAST(COUNT(*) AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e2),
           CAST(MIN(deg) AS BIGINT) FROM d2
    ORDER BY round
    """,
)
def kcore_peel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling over the support-pruned co-purchase graph —
    the density primitive the rest of the graph family lacks:
    PageRank ranks, triangles count closure, components find
    reachability, but "which subgraph is DENSE enough to trust"
    (spam-farm detection, community cores, the usual prefilter
    before expensive clique work) is the k-core. Two unrolled peel
    rounds toward the 3-core (KCORE_K): each round drops nodes with
    degree < k and their edges; the output is the shrinkage curve
    (nodes, edges, min degree per round) — min_degree climbing
    toward k is the convergence certificate.

    Scale shape: the edge list is pinned ONCE (eager localCheckpoint
    — the CC-loop contract; unpinned, every round re-derives the
    basket explode), then each round is a degree aggregate + two
    semi-join filters keyed on the vertex — the exact shape
    distributed k-core runs at any scale. Fixpoint peeling is the
    production loop (same rounds, while-changed); 2 rounds unrolled
    keep the twin SQL-replayable."""
    e = _support_pruned_edges(spark, sf_dir)  # pinned by the builder
    rows = None
    for r in range(KCORE_ROUNDS + 1):
        deg = (
            e.select(F.col("u").alias("vtx"))
            .unionAll(e.select(F.col("v").alias("vtx")))
            .groupBy("vtx")
            .agg(F.count("*").alias("deg"))
        )
        stats = deg.agg(
            F.lit(r).alias("round"),
            F.count("*").alias("n_nodes"),
            F.min("deg").cast("bigint").alias("min_degree"),
        ).crossJoin(F.broadcast(e.agg(F.count("*").alias("n_edges"))))
        stats = stats.select("round", "n_nodes", "n_edges", "min_degree")
        rows = stats if rows is None else rows.unionAll(stats)
        if r < KCORE_ROUNDS:
            surv = deg.filter(F.col("deg") >= KCORE_K).select("vtx")
            e = (
                e.join(surv.withColumnRenamed("vtx", "u"), "u", "semi")
                .join(surv.withColumnRenamed("vtx", "v"), "v", "semi")
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
    return rows.orderBy("round")


ASSOC_MIN_PAIR = 3  # min co-purchase baskets for a rule
ASSOC_TOPK = 20
ASSOC_POSTING_CAP = 50  # same hot-item pair-stage cap as bib coupling


@query(
    "assoc_rules_topk",
    oracle=f"""
    WITH baskets AS MATERIALIZED (
        -- cap over the DISTINCT frame: DuckDB evaluates QUALIFY
        -- windows before DISTINCT, so the subquery is required for
        -- the cap to count distinct baskets like the Spark side
        SELECT * FROM (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        QUALIFY COUNT(*) OVER (PARTITION BY l_partkey)
                <= {ASSOC_POSTING_CAP}
    ),
    item_n AS (
        SELECT l_partkey, COUNT(*) AS cnt FROM baskets GROUP BY 1
    ),
    n_b AS (
        SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets
    ),
    pair_n AS MATERIALIZED (
        SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS cxy
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {ASSOC_MIN_PAIR}
    ),
    directed AS (
        SELECT x AS ante, y AS conseq, cxy FROM pair_n
        UNION ALL
        SELECT y, x, cxy FROM pair_n
    ),
    rules AS (
        SELECT d.ante, d.conseq, d.cxy,
               ROUND(d.cxy * 1.0 / n.n, 6) AS support,
               ROUND(d.cxy * 1.0 / ia.cnt, 6) AS confidence,
               ROUND((d.cxy * 1.0 / ia.cnt)
                     / (ic.cnt * 1.0 / n.n), 6) AS lift
        FROM directed d
        JOIN item_n ia ON ia.l_partkey = d.ante
        JOIN item_n ic ON ic.l_partkey = d.conseq
        CROSS JOIN n_b n
    )
    SELECT ante, conseq, CAST(cxy AS BIGINT) AS n_baskets,
           support, confidence, lift
    FROM rules
    ORDER BY lift DESC, ante, conseq
    LIMIT {ASSOC_TOPK}
    """,
)
def assoc_rules_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules (Agrawal market-basket mining) over the
    co-purchase graph: directed A->B rules with support (basket
    share), confidence (P(B|A)) and lift (confidence over B's base
    rate) — the recommendation primitive beside
    `copurchase_pmi_topk` (PMI is symmetric log-lift; rules add
    DIRECTION and the confidence a merchandiser acts on). Pairs
    below 3 (ASSOC_MIN_PAIR) co-baskets are dropped before the
    arithmetic; the hot-item posting cap (50, as in
    `bib_coupling_topk`) bounds the quadratic pair stage.

    Scale shape: one distinct on (basket, item), capped inverted
    pair expansion (the shared near-dup/coupling shape), then
    item-grain broadcast joins onto the pair table and a top-k
    TakeOrdered. No corpus-grain window, no uncapped self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    # r12 (guide §2.4): FOUR consumers read `baskets` (item counts,
    # basket total, both pair-join sides); un-pinned, each re-ran the
    # lineitem scan + distinct + posting-cap window. Pin it once —
    # the Spark twin of the oracle's MATERIALIZED CTE.
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn("_deg", F.count("*").over(w))
        .filter(F.col("_deg") <= ASSOC_POSTING_CAP)
        .drop("_deg")
        .localCheckpoint()
    )
    item_n = baskets.groupBy("l_partkey").agg(
        F.count("*").alias("cnt")
    )
    # r13 (guide §2.4): pair expansion happens IN-ROW over per-order
    # sorted item arrays (the _support_pruned_edges shape) instead of
    # the o-keyed self-join — the r12 form exchanged both join legs
    # on the basket key and re-read the pinned table twice. One
    # groupBy(order) collect_set (itself riding the pin), pairs from
    # the sorted array (x < y by construction), and the basket total
    # shares that same exchange as a 1-row count. Counts identical:
    # the basket rows are already (order, part)-distinct.
    orders_arr = baskets.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    # r13 (guide §2.3): collapse duplicate part-sets before the
    # quadratic pair expansion, carrying the multiplicity m — pair
    # support and the basket total are additive over m, so repeated
    # baskets pay the O(|ps|²) explode once (the
    # _support_pruned_edges / pmi move; integer-exact).
    sets = orders_arr.groupBy("ps").agg(F.count("*").alias("m"))
    n_b = sets.agg(F.sum("m").alias("n"))
    pair_n = (
        sets.select(
            "m",
            F.explode(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ps"), i + 2, F.size(F.col("ps"))
                            ),
                            lambda y: F.struct(
                                x.alias("x"), y.alias("y")
                            ),
                        ),
                    )
                )
            ).alias("p"),
        )
        .select("p.x", "p.y", "m")
        .groupBy("x", "y")
        .agg(F.sum("m").alias("cxy"))
        .filter(F.col("cxy") >= ASSOC_MIN_PAIR)
    )
    directed = pair_n.select(
        F.col("x").alias("ante"), F.col("y").alias("conseq"), "cxy"
    ).unionByName(
        pair_n.select(
            F.col("y").alias("ante"), F.col("x").alias("conseq"), "cxy"
        )
    )
    ia = item_n.select(
        F.col("l_partkey").alias("ante"), F.col("cnt").alias("cnt_a")
    )
    ic = item_n.select(
        F.col("l_partkey").alias("conseq"),
        F.col("cnt").alias("cnt_c"),
    )
    conf = F.col("cxy") * 1.0 / F.col("cnt_a")
    return (
        directed.join(ia, "ante")
        .join(ic, "conseq")
        .crossJoin(F.broadcast(n_b))
        .select(
            "ante",
            "conseq",
            F.col("cxy").cast("bigint").alias("n_baskets"),
            F.round(F.col("cxy") * 1.0 / F.col("n"), 6).alias(
                "support"
            ),
            F.round(conf, 6).alias("confidence"),
            F.round(
                conf / (F.col("cnt_c") * 1.0 / F.col("n")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "ante", "conseq")
        .limit(ASSOC_TOPK)
    )


@query(
    "degree_distribution_fit",
    oracle="""
    WITH baskets AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    deg AS (
        SELECT l_partkey, COUNT(*) AS degree
        FROM baskets GROUP BY 1
    ),
    hist AS (
        SELECT degree, COUNT(*) AS n_nodes
        FROM deg GROUP BY degree
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_degree_values,
           CAST(SUM(n_nodes) AS BIGINT) AS n_nodes,
           CAST(MAX(degree) AS BIGINT) AS max_degree,
           ROUND(-REGR_SLOPE(ln(n_nodes), ln(degree)), 6)
               AS powerlaw_alpha,
           ROUND(REGR_R2(ln(n_nodes), ln(degree)), 6) AS fit_r2
    FROM hist
    """,
)
def degree_distribution_fit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree-distribution power-law fit over the order->part
    bipartite graph — the graph-domain sibling of `zipf_alpha_fit`
    (rank domain) and `hill_tail_index` (value domain): OLS slope of
    ln(node count) against ln(degree) over the degree histogram. A
    heavy-tailed degree law (alpha ~ 2-3, decent R^2) is exactly
    when the posting caps and skew salting in this engine earn their
    keep; a thin tail means uniform partitioning is already safe —
    so this audit is the MEASUREMENT behind those design choices.

    Scale shape: one distinct + one degree aggregate (both
    edge-keyed, map-side combinable), then REGR_* streaming
    accumulators over the DEGREE-HISTOGRAM grain — bounded by the
    number of distinct degree values, never by nodes or edges."""
    li = load_table(spark, sf_dir, "lineitem")
    deg = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count("*").alias("degree"))
    )
    hist = deg.groupBy("degree").agg(
        F.count("*").alias("n_nodes")
    )
    ln_d = F.log(F.col("degree").cast("double"))
    ln_n = F.log(F.col("n_nodes").cast("double"))
    return hist.agg(
        F.count("*").cast("bigint").alias("n_degree_values"),
        F.sum("n_nodes").cast("bigint").alias("n_nodes"),
        F.max("degree").cast("bigint").alias("max_degree"),
        F.round(-F.regr_slope(ln_n, ln_d), 6).alias(
            "powerlaw_alpha"
        ),
        F.round(F.regr_r2(ln_n, ln_d), 6).alias("fit_r2"),
    )


LCC_MIN_DEG = 3  # clustering coefficient needs enough wedges to mean


@query(
    "clustering_coefficient_topk",
    oracle=f"""
    WITH baskets AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair_n AS MATERIALIZED (
        SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS cab
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    e AS MATERIALIZED (SELECT u, v FROM pair_n WHERE cab >= 2),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    t_per AS (
        SELECT vtx, COUNT(*) AS t FROM (
            SELECT a AS vtx FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY vtx
    ),
    deg AS (
        SELECT vtx, COUNT(*) AS d FROM (
            SELECT u AS vtx FROM e UNION ALL SELECT v FROM e
        ) GROUP BY vtx
    )
    SELECT d.vtx, CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles,
           ROUND(2.0 * COALESCE(t.t, 0) / (d.d * (d.d - 1)), 6)
               AS local_cc
    FROM deg d LEFT JOIN t_per t ON t.vtx = d.vtx
    WHERE d.d >= {LCC_MIN_DEG}
    ORDER BY local_cc DESC, degree DESC, d.vtx
    LIMIT 20
    """,
)
def clustering_coefficient_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Local clustering coefficient per vertex — how CLIQUE-like a
    part's co-purchase neighborhood is (2T(v)/deg(deg-1): the
    fraction of a vertex's neighbor pairs that also co-occur),
    ranked top-20. This separates the two kinds of hub the triangle
    COUNT conflates: a bundle anchor inside a buying clique (high
    LCC) vs a broad staple touching many unrelated baskets (high
    degree, LCC near 0) — the distinction a recommender or a
    negative-sampling scheme actually needs. Degree-gated at >= 3 so
    single-wedge vertices cannot post a trivial 1.0.

    Scale shape: shares the support-pruned ordered-edge lineage of
    `copurchase_triangles` (Catalyst reuses the pair-count exchange
    across the three triangle legs and the degree rollup); per-vertex
    triangle and degree tables are vertex-grain; the top-20 is a
    TakeOrdered. Support pruning bounds sum(deg^2) before any wedge
    is built — the same guard the triangle query documents.

    Reference anchor: the reference's citation-network metrics stop
    at degree (analytics/citation_network_analyzer.py); LCC is the
    cohesion upgrade."""
    e = _support_pruned_edges(spark, sf_dir)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    # explode-an-array instead of a 3-leg union: each union leg
    # re-plans the whole triangle lineage (3 lineitem scans each, 11
    # total); the explode keeps ONE reference (4 scans total)
    t_per = (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("vtx")
        )
        .groupBy("vtx")
        .agg(F.count("*").alias("t"))
    )
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("vtx"))
        .groupBy("vtx")
        .agg(F.count("*").alias("d"))
    )
    return (
        deg.join(t_per, "vtx", "left")
        .filter(F.col("d") >= LCC_MIN_DEG)
        .select(
            "vtx",
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            F.round(
                2.0
                * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("local_cc"),
        )
        .orderBy(F.desc("local_cc"), F.desc("degree"), "vtx")
        .limit(20)
    )


LPA_ROUNDS = 3  # fixed synchronous label-propagation rounds


def _lpa_round_sql(t: int) -> str:
    """One unrolled synchronous LPA round as DuckDB CTEs: neighbor
    label counts, then argmax with the (count desc, label asc)
    deterministic tie-break."""
    return f"""
    counts{t} AS (
        SELECT e.dst AS v, l.community AS label, COUNT(*) AS cnt
        FROM edges e JOIN labels{t - 1} l ON e.src = l.v
        GROUP BY 1, 2
    ),
    labels{t} AS (
        SELECT v, label AS community
        FROM counts{t}
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY v ORDER BY cnt DESC, label) = 1
    )"""


def lpa_communities(edges, rounds: int = None):
    """Library core of `lpa_communities_topk` (api.graph.
    lpa_communities): synchronous label propagation over a directed
    (src, dst) edge frame for a FIXED round count, ties to the
    smallest label — deterministic by construction. Returns the full
    (v, community) label table. The caller should pre-pin the edge
    frame's layout (repartition on src + localCheckpoint) so rounds
    reuse one shuffle; the registered query shows the pattern."""
    rounds = LPA_ROUNDS if rounds is None else rounds
    n_part = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    labels = edges.select(
        F.col("src").alias("v")
    ).distinct().select("v", F.col("v").alias("community"))
    for _ in range(rounds):
        # r13 (guide §2.4): ONE pinned exchange per round. The
        # number-pinned repartition on the destination key is the
        # round's only shuffle: hash(v2) clusters (v2, community), so
        # the count aggregate AND the struct-max argmax both run
        # locally above it, and the labels frame it produces is
        # co-partitioned with the pinned edge list (hash, n_part) so
        # the NEXT round's join is exchange-free too. The r12 shape
        # paid 2 aggregate exchanges per round (hash(v2, community)
        # then hash(v2)) plus a label re-exchange at the join.
        counts = (
            edges.join(
                labels.hint("shuffle_hash"), edges.src == labels.v
            )
            .select(F.col("dst").alias("v2"), "community")
            .repartition(n_part, F.col("v2"))
            .groupBy("v2", "community")
            .agg(F.count("*").alias("cnt"))
        )
        # argmax with (cnt desc, label asc) tie-break as ONE
        # struct-max aggregate: max((cnt, -label)) — cheaper than a
        # per-vertex rank window and identically deterministic
        labels = (
            counts.groupBy("v2")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt").alias("c"),
                        (-F.col("community")).alias("nl"),
                    )
                ).alias("m")
            )
            .select(
                F.col("v2").alias("v"),
                (-F.col("m.nl")).alias("community"),
            )
        )
    return labels


def _copurchase_lpa_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized (v, community) table: the fixed-round LPA labeling
    over the shared co-purchase edge list, built once per process and
    consumed by `lpa_communities_topk` AND `community_modularity`
    (the _copurchase_edges discipline one level up — a deployment
    materializes labels at ingest; the r9 settled bench showed the
    3-round loop re-run per consumer as the top suite entry).
    Pinned with localCheckpoint: vertex-grain, one row per part."""
    from ..memo import shared_intermediate

    def build() -> DataFrame:
        edges = _copurchase_edges(spark, sf_dir)
        return lpa_communities(edges, LPA_ROUNDS).localCheckpoint()

    return shared_intermediate(
        spark, "copurchase_lpa_labels", (sf_dir,), build
    )


@query(
    "lpa_communities_topk",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    edges AS (SELECT src, dst FROM pairs),
    labels0 AS (
        SELECT DISTINCT src AS v, src AS community FROM edges
    ),
    """
    + ",\n    ".join(_lpa_round_sql(t) for t in range(1, LPA_ROUNDS + 1))
    + f"""
    SELECT community,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM labels{LPA_ROUNDS}
    GROUP BY community
    ORDER BY n_members DESC, community
    LIMIT 20
    """,
)
def lpa_communities_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the co-purchase graph —
    the near-linear community detector (Raghavan et al. 2007) that
    answers the MESO question between `part_copurchase_pagerank`'s
    'which vertices anchor' and `neardup_components`' 'which
    vertices are connected': which parts form basket NEIGHBORHOODS
    (the cross-sell families a category manager or a sharding
    policy reads). Every vertex starts as its own label; each of
    the 3 (LPA_ROUNDS) SYNCHRONOUS rounds adopts the most frequent
    label among distinct neighbors, ties to the smallest label —
    fully deterministic (async LPA's update-order dependence is the
    documented reason for the synchronous variant), replayed
    round-for-round by unrolled oracle CTEs.

    Scale shape: the edge list (one groupBy off the basket table)
    is eagerly checkpointed ONCE and each round is one edge-keyed
    join + a (vertex, label) count + a struct-max argmax — no
    windows, no broadcast of vertex-grain state, the exact
    fixed-round discipline of the pagerank loop. Struct-max picks
    (count desc, label asc) in a single aggregate instead of a
    per-vertex rank window."""
    # The memoized edge table carries the layout pin (number-pinned
    # repartition on src + localCheckpoint): per-round label joins
    # reuse that ONE edge shuffle instead of re-exchanging the edge
    # list every round (12.4 s -> 4.9 s isolated when unpinned vs
    # pinned), and the build itself is shared with pagerank.
    return (
        _copurchase_lpa_labels(spark, sf_dir).groupBy("community")
        .agg(F.count("*").cast("bigint").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


_LPA_ORACLE_HEAD = (
    """
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    edges AS (SELECT src, dst FROM pairs),
    labels0 AS (
        SELECT DISTINCT src AS v, src AS community FROM edges
    ),
    """
    + ",\n    ".join(_lpa_round_sql(t) for t in range(1, LPA_ROUNDS + 1))
)


def modularity_cells(
    edges: DataFrame, labels: DataFrame, assume_symmetric: bool = False
) -> DataFrame:
    """Library core of `community_modularity`
    (api.graph.modularity_cells): undirected Newman modularity of
    any (src, dst) edge frame under any (v, community) labeling —
    per-community (n_members, internal_edges, degree, q_term) plus
    the global Q on every row, unordered.

    The undirected formula reads per-community degree off the c_src
    grain, which is only correct when every edge appears in BOTH
    directions. By default the edge list is therefore SYMMETRIZED
    here (union with its reverse + distinct — a no-op set-wise on an
    already-symmetric input, so internal callers with a guaranteed
    symmetric builder pass assume_symmetric=True to skip the extra
    exchange). A directed/asymmetric frame passed through the public
    api.graph entry thus gets the undirected Q of its symmetrized
    graph instead of a silently wrong number (r9 ADVICE #4).

    Edge-SET semantics: the default path's distinct() collapses
    repeated (src, dst) rows, so multiplicities do not weight Q.
    assume_symmetric=True asserts the input is BOTH symmetric and
    duplicate-free (true of the internal copurchase builder); pass a
    weighted graph through an explicit pre-aggregation instead."""
    if not assume_symmetric:
        edges = (
            edges.select("src", "dst")
            .union(
                edges.select(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                )
            )
            .distinct()
        )
    ls = labels.select(
        F.col("v").alias("src"), F.col("community").alias("c_src")
    )
    ld = labels.select(
        F.col("v").alias("dst"), F.col("community").alias("c_dst")
    )
    el = (
        edges.join(ls.hint("shuffle_hash"), "src")
        .join(ld.hint("shuffle_hash"), "dst")
        .select("c_src", "c_dst")
    )
    mm = el.agg(F.count("*").cast("double").alias("m"))
    cells = el.groupBy(F.col("c_src").alias("community")).agg(
        F.count("*").alias("degree"),
        F.sum(
            F.when(F.col("c_src") == F.col("c_dst"), 1).otherwise(0)
        ).alias("internal"),
    )
    members = labels.groupBy("community").agg(
        F.count("*").alias("n_members")
    )
    q = (
        cells.join(members, "community")
        .crossJoin(F.broadcast(mm))
        .select(
            "community",
            "n_members",
            "internal",
            "degree",
            (
                F.col("internal") / F.col("m")
                - (F.col("degree") / F.col("m"))
                * (F.col("degree") / F.col("m"))
            ).alias("qt"),
        )
    )
    qtot = q.agg(F.sum("qt").alias("q_total"))
    return q.crossJoin(F.broadcast(qtot)).select(
        "community",
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("internal").cast("bigint").alias("internal_edges"),
        F.col("degree").cast("bigint").alias("degree"),
        F.round("qt", 6).alias("q_term"),
        F.round("q_total", 6).alias("modularity"),
    )



@query(
    "community_modularity",
    oracle=_LPA_ORACLE_HEAD
    + f""",
    el AS (
        SELECT ls.community AS c_src, ld.community AS c_dst
        FROM edges e
        JOIN labels{LPA_ROUNDS} ls ON e.src = ls.v
        JOIN labels{LPA_ROUNDS} ld ON e.dst = ld.v
    ),
    mm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM el),
    cells AS (
        SELECT c_src AS community,
               COUNT(*) AS degree,
               SUM(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END)
                   AS internal
        FROM el GROUP BY 1
    ),
    members AS (
        SELECT community, COUNT(*) AS n_members
        FROM labels{LPA_ROUNDS} GROUP BY 1
    ),
    q AS (
        SELECT c.community, mem.n_members, c.internal, c.degree,
               c.internal / mm.m
                   - (c.degree / mm.m) * (c.degree / mm.m) AS qt
        FROM cells c
        JOIN members mem USING (community)
        CROSS JOIN mm
    ),
    qtot AS (SELECT SUM(qt) AS q_total FROM q)
    SELECT q.community,
           CAST(q.n_members AS BIGINT) AS n_members,
           CAST(q.internal AS BIGINT) AS internal_edges,
           CAST(q.degree AS BIGINT) AS degree,
           ROUND(q.qt, 6) AS q_term,
           ROUND(qtot.q_total, 6) AS modularity
    FROM q CROSS JOIN qtot
    ORDER BY ROUND(q.qt, 6) DESC, q.community
    LIMIT 20
    """,
)
def community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA communities over the co-purchase
    graph — the EVALUATION capstone of the graph family: pagerank
    says which vertices anchor, `lpa_communities_topk` says which
    neighborhoods exist, this says whether that partition is BETTER
    than chance (Q = sum_c [e_c/m - (d_c/m)^2], Newman 2004,
    directed form; the co-purchase edge list is symmetric by
    construction so per-community in-degree equals out-degree and
    one degree column suffices — documented assumption, asserted by
    the planted test). Top-20 communities by modularity
    contribution, each row carrying the global Q — the number a
    sharding or cross-sell review reads before trusting the
    communities.

    Scale shape: labels come from the same fixed-round synchronous
    LPA over the process-shared memoized edge table (ONE extra pass
    vs `lpa_communities_topk`); edges are labeled by two vertex-
    grain shuffle-hash joins (never broadcast — vertex-grain state),
    then everything is two map-side-combinable aggregates
    (community-grain cells, 1-row m and Q totals broadcast back).
    q_term arithmetic is exact-int ratios, so 6-dp rounding is
    engine-stable; Q sums community-grain terms (~1e-15 float
    noise, absorbed by the same pin)."""
    edges = _copurchase_edges(spark, sf_dir)
    labels = _copurchase_lpa_labels(spark, sf_dir)
    # the copurchase builder emits every pair in both directions, so
    # the symmetrize exchange in modularity_cells is skipped
    return modularity_cells(
        edges, labels, assume_symmetric=True
    ).orderBy(F.desc("q_term"), "community").limit(20)
