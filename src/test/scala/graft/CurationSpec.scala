package graft

import org.apache.spark.sql.functions._

/** Independent recomputation checks for the curation wave (q134–q139):
  * rank fusion, quantile normalization, padding waste, systematic
  * weighted sampling, Cohen's kappa, and label-centroid similarity.
  * Each query's math is re-derived in plain Scala from rows collected
  * at sf0.001, so a regression in the distributed formulation (top-k
  * list ranking, the rank-keyed reference join, the two-level prefix
  * sum, the single-agg contingency fold, the checkpointed centroid
  * frame) surfaces as a value diff here even before the DuckDB oracle
  * runs.
  */
class CurationSpec extends SparkSpec {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docLens: Seq[(Long, String, Long)] =
    Tables.documents(spark, sf0001)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("q134: RRF equals the brute-force fusion of the two top-50 lists") {
    val termCounts = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).toLowerCase.split("[^a-z]+")
        r.getLong(0) -> ws.count(Set("spark", "join", "table")).toLong
      }.filter(_._2 > 0)
    val rTerms = termCounts.sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val rLen = docLens.sortBy { case (id, _, n) => (-n, id) }.take(50)
      .map(_._1).zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val fused = (rTerms.keySet ++ rLen.keySet).toSeq.map { id =>
      val rrf = rTerms.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rLen.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, rTerms.get(id), rLen.get(id), round4(rrf))
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(20)
    val got = SparkEntry.queries("q134_rank_fusion")(spark, sf0001)
      .collect().toSeq.map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))
    assert(got == fused)
  }

  test("q135: every doc maps to the cross-source mean at its in-source rank") {
    val ranked = docLens.groupBy(_._2).values.flatMap { ds =>
      ds.sortBy(d => (d._3, d._1)).zipWithIndex
        .map { case ((id, _, n), i) => (id, i + 1, n) }
    }.toSeq
    val ref = ranked.groupBy(_._2).view
      .mapValues(vs => round4(vs.map(_._3.toDouble).sum / vs.size)).toMap
    val expected = ranked.map { case (id, rk, _) => id -> ref(rk) }.toMap
    val got = SparkEntry.queries("q135_quantile_norm")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == expected)
    // the transform preserves in-source ordering (rank-monotone)
    docLens.groupBy(_._2).values.foreach { ds =>
      val sorted = ds.sortBy(d => (d._3, d._1)).map(d => got(d._1))
      assert(sorted == sorted.sorted)
    }
  }

  test("q136: waste equals the fold over hand-bucketed token counts") {
    val toks = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => math.max(
        r.getString(1).toLowerCase.split("[^a-z]+").count(_.nonEmpty), 1))
    val expected = toks.groupBy(n => (math.log(n) / math.log(2)).floor.toLong)
      .view.mapValues { ns =>
        val (cnt, mx, sm) = (ns.size.toLong, ns.max.toLong, ns.map(_.toLong).sum)
        (cnt, mx, sm, cnt * mx - sm,
          round4((cnt * mx - sm).toDouble / (cnt * mx)))
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q136_padding_waste")(spark, sf0001)
      .collect().toSeq.map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))))
    assert(got == expected)
  }

  test("q137: picks are the systematic sample points; multiplicities sum to 100") {
    val sorted = docLens.sortBy(_._1)
    val total = sorted.map(_._3).sum.toDouble
    val step = total / 100
    var cum = 0L
    val expected = sorted.flatMap { case (id, _, w) =>
      val picks = math.floor((cum + w) / step).toLong -
        math.floor(cum / step).toLong
      cum += w
      if (picks > 0) Some((id, w, picks)) else None
    }
    val got = SparkEntry.queries("q137_weighted_sample")(spark, sf0001)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    // exactly the 100 sample points land somewhere
    assert(got.map(_._3).sum == 100L)
  }

  test("q138: kappa equals the fold of q28's per-doc verdicts") {
    val preds = SparkEntry.queries("q28_lang_id")(spark, sf0001)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val n = preds.length.toDouble
    val po = preds.count(p => p._1 == p._2) / n
    val classes = Seq("de", "en", "es", "fr", "zh")
    val pe = classes.map(l =>
      preds.count(_._1 == l).toDouble * preds.count(_._2 == l)).sum / (n * n)
    val row = SparkEntry.queries("q138_kappa")(spark, sf0001).collect().head
    assert(row.getLong(0) == preds.length.toLong)
    assert(row.getDouble(1) == round4(po))
    assert(row.getDouble(2) == round4(pe))
    assert(row.getDouble(3) == round4((po - pe) / (1 - pe)))
    // kappa never exceeds observed agreement headroom
    assert(row.getDouble(3) <= 1.0)
  }

  test("q140: recipe rows fold from hand token counts; weights sum to 1") {
    val toks = Tables.documents(spark, sf0001)
      .select("source", "text").collect()
      .map(r => r.getString(0) ->
        r.getString(1).toLowerCase.split("[^a-z]+").count(_.nonEmpty).toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val z = toks.values.map(t => math.sqrt(t.toDouble)).sum
    val got = SparkEntry.queries("q140_mixture_alloc")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == toks.keySet)
    toks.foreach { case (s, t) =>
      val raw = math.sqrt(t.toDouble)
      val (gt, gw, gtt, ge) = got(s)
      assert(gt == t)
      assert(gw == round4(raw / z))
      assert(gtt == math.floor(raw / z * 1000000).toLong)
      assert(ge == round4(raw / z * 1000000 / t))
    }
    // the allocation is a (floored) partition of the 1M budget
    val targets = got.values.map(_._3).sum
    assert(targets <= 1000000L && targets > 1000000L - got.size)
    // sqrt upsampling: small sources get MORE epochs than large ones
    val bySize = toks.toSeq.sortBy(_._2).map { case (s, _) => got(s)._4 }
    assert(bySize == bySize.sorted.reverse)
  }

  test("q141: the interleave is the formula order and cycles sources") {
    val rows = SparkEntry.queries("q141_curriculum")(spark, sf0001)
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val srcs = docLens.map(_._2).distinct.sorted
    val k = srcs.length
    // pos is the declared formula of (rank, source index)
    rows.foreach { case (pos, _, src, rk) =>
      assert(pos == (rk - 1) * k + (srcs.indexOf(src) + 1))
    }
    // positions strictly increase and the first k cycle all sources once
    assert(rows.map(_._1) == rows.map(_._1).sorted)
    assert(rows.take(k).map(_._3) == srcs)
    // within a source, docs appear in (n_chars, doc_id) difficulty order
    val lenOf = docLens.map(d => d._1 -> d._3).toMap
    rows.groupBy(_._3).values.foreach { ds =>
      val ordered = ds.sortBy(_._1).map(d => (lenOf(d._2), d._2))
      assert(ordered == ordered.sorted)
    }
  }

  test("q139: centroid cosines equal the plain-Scala mean-vector products") {
    val byLabel = Tables.embeddings(spark, sf0001)
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val centroids = byLabel.view.mapValues { vs =>
      Array.tabulate(vs.head.length)(i => vs.map(_(i)).sum / vs.length)
    }.toMap
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val labels = centroids.keys.toSeq.sorted
    val expected = (for {
      a <- labels; b <- labels if a < b
      ca = centroids(a); cb = centroids(b)
    } yield (a.toLong, b.toLong,
      round4(ca.zip(cb).map { case (x, y) => x * y }.sum /
        (norm(ca) * norm(cb))) + 0.0)).toSeq
    val got = SparkEntry.queries("q139_centroid_sim")(spark, sf0001)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got == expected)
    got.foreach { case (_, _, c) => assert(c >= -1.0 && c <= 1.0) }
  }
}
