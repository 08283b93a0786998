package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank: the distributed iteration must match an independently
  * written sequential power iteration (same probability formulation)
  * on hand graphs, conserve total mass, and honor dangling
  * redistribution and parallel-edge weighting. */
class GraphSpec extends SparkSpec {

  private def refRank(edges: Seq[(String, String)], iters: Int,
      d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(out.contains).map(r).sum
      val in = scala.collection.mutable.Map(nodes.map(_ -> 0.0): _*)
      for ((s, t) <- edges) in(t) += r(s) / out(s)
      r = nodes.map(nd => nd -> ((1 - d) / n + d * (in(nd) + dang / n))).toMap
    }
    r
  }

  private def sparkRank(edges: Seq[(String, String)], iters: Int)
      : Map[String, Double] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("pageRank matches the sequential power iteration (dangling node)") {
    // node d has no out-edges: its mass must redistribute uniformly
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "c" -> "d")
    val got = refRank(edges, 10, 0.85)
    val want = sparkRank(edges, 10)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"$k: $v vs ${want(k)}")
    }
    assert(math.abs(want.values.sum - 1.0) < 1e-9, s"mass not conserved: $want")
  }

  test("pageRank: symmetric ring is uniform; parallel edges carry weight") {
    val ring = Seq("x" -> "y", "y" -> "z", "z" -> "x")
    val r = sparkRank(ring, 8)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    // doubling a->b gives b a larger share than c (single a->c edge)
    val multi = Seq("a" -> "b", "a" -> "b", "a" -> "c",
      "b" -> "a", "c" -> "a")
    val m = sparkRank(multi, 10)
    assert(m("b") > m("c"), s"parallel edge ignored: $m")
    val seqM = refRank(multi, 10, 0.85)
    m.foreach { case (k, v) => assert(math.abs(v - seqM(k)) < 1e-9) }
  }

  /** Brute-force per-node triangle membership on a hand graph. */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      (x, y, z) = (nodes(i), nodes(j), nodes(k))
      if e((x, y)) && e((x, z)) && e((y, z))
    } yield Seq(x, y, z)
    tris.flatten.groupBy(identity).map { case (n, v) => n -> v.size.toLong }
  }

  test("triangleCounts matches brute force (skew hub, dup/self edges)") {
    import spark.implicits._
    // hub 0 touches everyone (degree skew); one clean triangle {1,2,3};
    // a chord 4-5 making {0,4,5}; dup edge and a self-loop must be inert
    val edges = Seq[(Long, Long)](
      0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L, 0L -> 5L, 0L -> 6L,
      1L -> 2L, 2L -> 3L, 1L -> 3L, 4L -> 5L, 4L -> 5L, 6L -> 6L)
    val got = Graph.triangleCounts(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refTriangles(edges), s"got $got")
    // triangle-free graph (star): empty result, not an error
    val star = Seq[(Long, Long)](0L -> 1L, 0L -> 2L, 0L -> 3L)
    assert(Graph.triangleCounts(star.toDF("a", "b")).count() == 0)
  }

  test("q117 on the fixture: rows exist and ordering contract holds") {
    val rows = SparkEntry.queries("q117_triangles")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)), "not sorted desc")
  }

  test("q116 on the fixture: 20 rows, mass-weighted head is deterministic") {
    val got = SparkEntry.queries("q116_pagerank")(spark, sf0001)
    val rows = got.collect()
    assert(rows.length == 20)
    val again = SparkEntry.queries("q116_pagerank")(spark, sf0001).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "q116 is not deterministic across runs")
  }
}
