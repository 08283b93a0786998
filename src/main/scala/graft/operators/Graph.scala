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
    val edges = words.select(
      explode(transform(sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("src"),
          element_at(col("ws"), (i + 1).cast("int")).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
    pageRank(edges, iters = 10)
      .select(col("id").as("word"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("word")).limit(20)
  }

  val all: Seq[QueryDef] = Seq(q116_pagerank)
}
