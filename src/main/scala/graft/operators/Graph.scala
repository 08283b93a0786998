package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Text

/** Iterative graph analytics over plain edge lists — the PageRank-style
  * workloads a corpus-analytics engine runs on link/co-occurrence
  * structure (domain authority for crawl prioritization, keyword
  * centrality). Same execution discipline as
  * [[TextPipeline.connectedComponents]]: the per-iteration state is the
  * NODE-sized rank table, edges are scanned once per iteration with the
  * rank table broadcast-or-shuffled by Catalyst's choice, lineage is cut
  * every round with `localCheckpoint`, and the only driver-side values
  * are one scalar per iteration (the dangling mass) plus the node count
  * — never node- or edge-sized collections.
  */
object Graph {

  /** PageRank with damping `d` over directed edges (src, dst), run for
    * exactly `iters` power iterations on the PROBABILITY formulation:
    * ranks sum to 1 every iteration, dangling-node mass (nodes with no
    * out-edges) is redistributed uniformly. Node ids may be any
    * equality-comparable type (strings work — no ordering is needed,
    * unlike components' min-label).
    *
    * Scale posture: the RAW edge list is touched exactly ONCE — parallel
    * edges collapse into a weighted (src, dst, w) table up front (one
    * edge-sized shuffle), which preserves multi-edge semantics exactly
    * (every parallel edge contributes rank/outDeg, and the weighted
    * out-degree is Σw). Each of the `iters` rounds then runs on the
    * collapsed graph — bounded by (#distinct node pairs), typically
    * orders of magnitude below the raw edge count — with a node-sized
    * rank join and a 1-row dangling aggregate broadcast back. Parallel
    * edges are deliberately honored (multi-edges mean stronger links);
    * pre-`distinct` the input for simple-graph semantics. */
  def pageRank(edges: DataFrame, iters: Int, d: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("w"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val outDeg = e.groupBy(col("src").as("oid"))
      .agg(sum("w").as("deg")).localCheckpoint()
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val withDeg = ranks
        .join(outDeg, col("id") === col("oid"), "left")
        .select(col("id"), col("rank"), col("deg"))
      // dangling mass stays DISTRIBUTED: a 1-row aggregate broadcast
      // back via cross join, so each iteration is ONE job (the
      // checkpoint) — no per-iteration driver collect at all
      val dang = withDeg.where(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
      val contribs = e
        .join(withDeg.where(col("deg").isNotNull)
            .select(col("id").as("cid"), (col("rank") / col("deg")).as("c")),
          col("src") === col("cid"))
        .groupBy(col("dst").as("nid"))
        .agg(sum(col("w") * col("c")).as("in_sum"))
      ranks = nodes
        .join(contribs, col("id") === col("nid"), "left")
        .crossJoin(broadcast(dang))
        .select(col("id"),
          (lit((1 - d) / n) +
            lit(d) * (coalesce(col("in_sum"), lit(0.0)) + col("dmass") / n))
            .as("rank"))
        .localCheckpoint()
      it += 1
    }
    ranks
  }

  /** q116: keyword centrality — PageRank over the word-adjacency
    * digraph of the corpus (edge w₁→w₂ per adjacent word pair, parallel
    * edges kept so frequent collocations weigh more), 10 iterations,
    * top 20 words. Engine-specific by design (iterative FP sums have no
    * stable cross-engine summation order), so the registry entry is
    * rows-only; GraphSpec pins a hand graph against an independently
    * computed power iteration, the Σrank = 1 invariant, and dangling
    * redistribution. */
  val q116_pagerank = QueryDef.unchecked("q116_pagerank") { (s, d) =>
    val words = Tables.documents(s, d)
      .select(col("doc_id"), Text.wordsOf(col("text")).as("ws"))
      .where(size(col("ws")) >= 2)
    // r12 (guide §4): adjacent pairs via arrays_zip of the two slices —
    // whole-stage codegen — instead of the interpreted
    // transform(sequence, element_at) lambda. Same (src, dst) stream.
    val edges = words.select(
      explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1))).as("e"))
      .select(col("e").getField("0").as("src"),
        col("e").getField("1").as("dst"))
    pageRank(edges, iters = 10)
      .select(col("id").as("word"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("word")).limit(20)
  }

  /** Per-node triangle participation counts over an undirected edge list
    * `(a, b)` (duplicates/self-loops tolerated — canonicalized and
    * deduplicated up front). Output: `(node, triangles)` for every node
    * in ≥ 1 triangle.
    *
    * Algorithm: degree orientation (the MapReduce triangle-counting
    * design of Suri & Vassilvitskii, WWW'11). Every edge is directed
    * from its lower endpoint to its higher endpoint under the total
    * order ≺ = (degree, id); for a triangle {x ≺ y ≺ z} exactly the
    * edges x→y, x→z, y→z exist, so enumerating each node's out-wedges
    * and closing them against the oriented edge set finds each triangle
    * EXACTLY once — same count as the naive id-ordered 3-way self-join
    * (the DuckDB oracle), orientation-independent.
    *
    * Why orientation matters at 100 TB: wedges come from the LOW-order
    * endpoint, and under degree orientation every out-degree is
    * O(√m) — a celebrity node with 10⁸ neighbors contributes zero
    * wedges from its own bucket (all its edges point INTO it), instead
    * of the deg²/2 ≈ 5·10¹⁵ wedge rows the naive id-ordering can emit;
    * total intersection work is bounded by O(m^1.5) regardless of skew.
    * The oriented edge table is `localCheckpoint`ed because it is
    * scanned twice (adjacency build + probe side) — materialize once,
    * same discipline as [[TextPipeline.connectedComponents]]'s edge
    * table. Everything is node- or edge-sized hash shuffles with
    * bounded array payloads; nothing is collected to the driver. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // r12: node ids normalized to long up front (the same contract as
    // [[TextPipeline.connectedComponents]]) so the closing stage can use
    // the native long-array sorted_intersect kernel; every caller
    // already passes numeric ids.
    val e = edges
      .select(least(col("a"), col("b")).cast("long").as("u"),
        greatest(col("a"), col("b")).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    // orient u↔v by (deg, id): low endpoint → high endpoint
    val oriented = e
      .join(deg.select(col("n").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("dg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst")))
          .as("o"))
      .select(col("o.src"), col("o.dst"))
      .localCheckpoint()
    // Edge-iterator closing: for oriented x→y, every w ∈ N⁺(x) ∩ N⁺(y)
    // closes the uniquely-oriented triangle (x→y, x→w, y→w) — so attach
    // both endpoints' out-neighbor ARRAYS (node-keyed, each O(√m) long
    // under the orientation) and intersect scan-locally. The wedge set
    // (Σ outdeg² rows — the quadratic blow-up) is never materialized or
    // shuffled: only edge-sized tables with bounded array payloads move,
    // and the sole data-sized explode emits 1 row per ACTUAL triangle
    // (the w-attribution), ≪ wedge count on any real graph.
    // r12 (guide §4 — StageBreakdown attributed 49.5 s of q117's task
    // time to this one stage, dominated by array_intersect's per-ROW
    // OpenHashSet build): sort each adjacency list once in the collect
    // aggregate (O(k log k) per node), then every edge's intersection
    // is a native two-pointer merge (sorted_intersect kernel) — zero
    // per-row allocation. Oriented edges are distinct by construction,
    // so the sorted lists are duplicate-free, as the kernel requires.
    val adj = oriented.groupBy(col("src").as("n"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val closed = oriented
      .join(adj.select(col("n").as("src"), col("nbrs").as("nu")), "src")
      // r12: INNER join on dst — a dst with no out-edges (orientation
      // sink) yielded nv = null → intersect with empty → w = [] →
      // filtered anyway; dropping those rows AT the join is the same
      // result one operator earlier and frees AQE's build-side choice.
      .join(adj.select(col("n").as("dst"), col("nbrs").as("nv")), Seq("dst"))
      .select(col("src"), col("dst"),
        graft.expressions.VectorExpressions.sortedIntersect(
          col("nu"), col("nv")).as("w"))
      .where(size(col("w")) > 0)
    // r12 (guide §4 — the closing stage measured 49.8 s of task time at
    // sf0.1, dominated by the interpreted transform/concat lambdas that
    // built the 3-per-triangle attribution array per EDGE row): emit the
    // w-member row first (codegen Generate — one row per ACTUAL
    // triangle, exactly as before), then fan each triangle to its 3
    // nodes with a plain CreateArray explode — every operator
    // whole-stage codegen, zero interpreted lambdas. Same multiset of
    // node rows, same counts.
    closed
      .select(col("src"), col("dst"), explode(col("w")).as("wn"))
      .select(explode(array(col("src"), col("dst"), col("wn"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** q117: co-purchase triangles — parts that co-occur in an order form
    * a clique; the 20 parts participating in the most triangles are the
    * densest-connected items in the co-purchase graph (the classic
    * "market-basket community core" signal). Exact: the DuckDB oracle
    * runs the naive id-ordered 3-way self-join; the Spark path is the
    * degree-oriented enumeration in [[triangleCounts]] — same triangles,
    * different (skew-proof) plan. Per-order pair fan-out is bounded by
    * the order's item count (≤ 7 in the fixture's TPC-H shape). */
  val q117_triangles = QueryDef(
    "q117_triangles",
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |            FROM lineitem),
      |e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
      |      FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
      |t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |      FROM e e1
      |      JOIN e e2 ON e2.a = e1.b
      |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |n AS (SELECT unnest([x, y, z]) AS node FROM t)
      |SELECT CAST(node AS BIGINT) AS p_partkey,
      |  COUNT(*) AS triangles
      |FROM n GROUP BY node
      |ORDER BY triangles DESC, p_partkey LIMIT 20""".stripMargin) { (s, d) =>
    // r12 optimization (guide §2.4 remove shuffles + §4 codegen): the
    // old shape was DISTINCT (ok, pk) [exchange 1] feeding a self-join
    // on ok — which re-exchanges BOTH join branches by ok and scans
    // lineitem twice. One collect_set aggregate keyed on ok dedups pk
    // in-aggregate and produces each order's item set in a single
    // exchange; the a<b fan-out is two codegen posexplodes over the
    // sorted set (bounded by the per-order item count, ≤ 7 here) with
    // an i<j filter — no interpreted lambdas. Same edge set, same
    // triangles, same output.
    val pairs = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      .where(size(col("ps")) >= 2)
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
      .select(col("a"), col("i"), posexplode(col("ps")).as(Seq("j", "b")))
      .where(col("j") > col("i"))
      .select(col("a"), col("b"))
    triangleCounts(pairs)
      .select(col("node").cast("long").as("p_partkey"), col("triangles"))
      .orderBy(col("triangles").desc, col("p_partkey")).limit(20)
  }

  val all: Seq[QueryDef] = Seq(q116_pagerank, q117_triangles)
}
