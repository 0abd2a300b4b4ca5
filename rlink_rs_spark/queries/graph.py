"""Iterative graph analytics as declarative dataflows (engine extra,
SURVEY §2.9 family): PageRank over the customer->supplier nation trade
graph derived from the TPC-H-ish fixtures.

Complements connected_components (operators/dedup.py): CC shows the
driver-looped iterate-to-fixpoint pattern; PageRank with a FIXED iteration
count needs no loop at all -- the iterations unroll into one declarative
plan in both engines, so Catalyst sees the whole computation and there is
no per-round driver barrier.

Determinism: rank mass is carried as BIGINT scaled by 1e9; each edge
contribution is rounded to an integer BEFORE the sum, so the per-node
aggregation is order-independent exact integer arithmetic (the same
power-sum trick as the stats/k-means oracles) -- a raw double sum would
make ranks depend on reduction order and break the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlink_rs_spark.queries.base import register
from rlink_rs_spark.tables import load_table

_PR_ITERS = 3
_PR_DAMP = "0.85"
_PR_SCALE = 1_000_000_000  # rank mass carried as round(rank * 1e9)


def _pagerank_oracle(iters: int) -> str:
    contrib = "CAST(ROUND((CAST(r.rank_s AS DOUBLE) * {d}) / CAST(o.outdeg AS DOUBLE)) AS BIGINT)"
    parts = [
        """edges AS (
      SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    )""",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST(ROUND({_PR_SCALE}.0 / n) AS BIGINT) AS rank_s FROM nodes, nn)",
    ]
    for t in range(1, iters + 1):
        prev = f"r{t - 1}"
        parts.append(
            f"c{t} AS (\n"
            f"  SELECT e.dst AS node, SUM({contrib.format(d=_PR_DAMP)}) AS mass\n"
            f"  FROM edges e JOIN {prev} r ON r.node = e.src\n"
            f"               JOIN outdeg o ON o.src = e.src\n"
            f"  GROUP BY e.dst\n)"
        )
        parts.append(
            f"r{t} AS (\n"
            f"  SELECT n.node,\n"
            f"         CAST(ROUND(((1 - {_PR_DAMP}) * {_PR_SCALE}.0) / nn.n) AS BIGINT)\n"
            f"         + COALESCE(c.mass, 0) AS rank_s\n"
            f"  FROM nodes n CROSS JOIN nn LEFT JOIN c{t} c ON c.node = n.node\n)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, rank_s / {_PR_SCALE}.0 AS rank FROM r{iters}"
    )


_PR_DESC = (
    f"PageRank ({_PR_ITERS} iterations, damping {_PR_DAMP}) over the "
    "customer->supplier nation trade graph (distinct edges from the "
    "orders/lineitem star join). The fixed iteration count UNROLLS into "
    "one declarative plan -- no driver loop, no per-round barrier, "
    "Catalyst optimizes across iterations (contrast connected_components' "
    "iterate-to-fixpoint loop). Rank mass is integer-scaled (1e9) with "
    "per-edge rounding before the sum, so aggregation is order-independent "
    "and the oracle hash-matches. Scale: per iteration one equi-join of "
    "the edge list against the rank table plus a map-side-combined sum on "
    "dst -- the textbook distributed PageRank dataflow; the 25-node "
    "fixture graph stands in for a billions-edge link graph whose edge "
    "table simply partitions."
)


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer-nation -> supplier-nation edges from the
    orders/lineitem star join, materialized once (see the checkpoint note
    inline). Shared by pagerank_trade_graph and trade_graph_triangles."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .select("src", "dst")
        .distinct()
        # materialize the edge list ONCE: the unrolled iterations reference
        # it 3x each (contrib, nodes, outdeg) and Spark does not reuse the
        # star-join subplan across them -- without this the plan scanned
        # lineitem 22 times. One eager job here, like connected_components;
        # on a cluster use reliable checkpoint() instead.
        .localCheckpoint(eager=True)
    )


@register("pagerank_trade_graph", _pagerank_oracle(_PR_ITERS), _PR_DESC)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _trade_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    nn = nodes.agg(F.count("*").alias("n"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node",
        F.round(F.lit(float(_PR_SCALE)) / F.col("n")).cast("long").alias("rank_s"),
    )
    damp = float(_PR_DAMP)
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(
                    (F.col("rank_s").cast("double") * damp) / F.col("outdeg").cast("double")
                )
                .cast("long")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.round(F.lit((1 - damp) * float(_PR_SCALE)) / F.col("n")).cast("long")
                    + F.coalesce(F.col("mass"), F.lit(0))
                ).alias("rank_s"),
            )
        )
    return ranks.select("node", (F.col("rank_s") / float(_PR_SCALE)).alias("rank"))


# --- triangle counting -------------------------------------------------------

_TRI_ORACLE = """
WITH dedges AS (
  SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM dedges WHERE src <> dst
),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
  FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
  GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
  GROUP BY node
)
SELECT d.node, d.degree, COALESCE(p.triangles, 0) AS triangles
FROM deg d LEFT JOIN per_node p ON p.node = d.node
"""


@register(
    "trade_graph_triangles",
    _TRI_ORACLE,
    "Per-node triangle counting + degrees on the undirected nation trade "
    "graph: the ordered-wedge two-join enumeration (a<b<c), each triangle "
    "counted exactly once.",
)
def trade_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered triangle enumeration (Suri & Vassilvitskii's MR algorithm
    shape): orient every undirected edge low->high, join wedges a-b-c
    (a<b<c) against the edge set to close them -- each triangle counted
    once, no candidate explosion from high-degree nodes being enumerated
    three ways. At 100 TB, orient edges from the lower-DEGREE endpoint
    instead of the lower id (degree ordering bounds wedge counts by
    arboricity, the standard skew guard); id ordering keeps the fixture
    oracle simple. All joins are equi-joins on node names -- the edge
    table partitions and the wedge join is the only wide exchange."""
    edges = _trade_edges(spark, sf_dir)
    # the oriented edge set is referenced four times (three wedge-join
    # sides + degrees); checkpoint it like _trade_edges so the distinct
    # shuffle runs once
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c")
        )
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
    )
