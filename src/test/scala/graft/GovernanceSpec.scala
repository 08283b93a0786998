package graft

import org.apache.spark.sql.functions._

/** Independent recomputation checks for the pipeline-governance wave
  * (q129–q133): constraint audit, ACF seasonality, co-occurrence lift,
  * the leakage-safe split, and PSI drift. Each query's math is
  * re-derived in plain Scala from rows collected at sf0.001, so a
  * regression in the distributed formulation (key-sized FK pre-agg, the
  * array-fold ACF, scan-local pair fan-out, cluster-keyed splitting,
  * the conditional-sum bin grid) surfaces as a value diff here even
  * before the DuckDB oracle runs.
  */
class GovernanceSpec extends SparkSpec {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q129: every audit row matches the direct predicate count") {
    val nOrders = Tables.orders(spark, sf0001).count()
    val nBadFk = Tables.orders(spark, sf0001)
      .where(col("o_orderkey") % 37 === 0).count()
    val nCust = Tables.customer(spark, sf0001).count()
    val nDup = Tables.customer(spark, sf0001)
      .where(col("c_custkey") % 41 === 0).count()
    val nDocs = Tables.documents(spark, sf0001).count()
    val nNull = Tables.documents(spark, sf0001)
      .where(col("doc_id") % 29 === 0).count()
    val got = SparkEntry.queries("q129_fk_audit")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "fk_orders_custkey" -> ((nOrders, nBadFk)),
      "unique_customer_custkey" -> ((nCust + nDup, nDup)),
      "notnull_documents_text" -> ((nDocs, nNull))))
    // non-vacuous: both the pass and the violation path carry rows
    got.values.foreach { case (checked, violations) =>
      assert(violations > 0 && violations < checked)
    }
  }

  test("q130: ACF equals the plain-Scala fold over the daily series") {
    val xs = Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("c"))
      .orderBy("d").collect().map(_.getLong(1).toDouble)
    val n = xs.length
    val mu = xs.sum / n
    val d2 = xs.map(x => (x - mu) * (x - mu)).sum
    val expected = (1 to 7).map { k =>
      k.toLong -> round4(
        (k until n).map(i => (xs(i) - mu) * (xs(i - k) - mu)).sum / d2)
    }
    val got = SparkEntry.queries("q130_acf")(spark, sf0001)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    assert(got == expected)
    // an autocorrelation is a normalized inner product: |r_k| <= 1
    got.foreach { case (_, r) => assert(math.abs(r) <= 1.0) }
  }

  test("q131: lift/jaccard equal the brute-force user-set overlap") {
    val ut = Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val nu = ut.map(_._1).distinct.length.toDouble
    val types = byType.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a < b
      inter = (byType(a) & byType(b)).size if inter > 0
    } yield (a, b, inter.toLong,
      round4(inter * nu / (byType(a).size.toDouble * byType(b).size)),
      round4(inter.toDouble / (byType(a) | byType(b)).size))).toSeq
    val got = SparkEntry.queries("q131_cooccur_lift")(spark, sf0001)
      .collect().toSeq.map(r =>
        (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
    assert(got == expected)
  }

  test("q132: no near-dup cluster straddles the train/test boundary") {
    val rows = SparkEntry.queries("q132_leakage_split")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // split is the declared function of the cluster rep
    rows.foreach { case (_, rep, split) =>
      assert(split == (if (rep % 5 == 4) "test" else "train"))
    }
    // THE leakage guarantee: one split per cluster
    rows.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._3).distinct.length == 1)
    }
    // reps agree with q48 for paired docs; singletons are their own rep
    val q48 = SparkEntry.queries("q48_dedup_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, rep, _) =>
      assert(rep == q48.getOrElse(id, id))
    }
    // both splits are inhabited at the fixture
    assert(rows.map(_._3).distinct.sorted.toSeq == Seq("test", "train"))
  }

  test("q133: PSI equals the hand-binned smoothed divergence") {
    val rows = Tables.documents(spark, sf0001)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // quantile_cont / Spark `percentile` interpolation, re-derived
    val sorted = rows.map(_._2.toDouble).sorted
    val cuts = (1 to 9).map { q =>
      val pos = q / 10.0 * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    def binOf(v: Long): Int = cuts.count(c => v > c)
    val binned = rows.map { case (s, v) => (s, binOf(v)) }
    val n = binned.length.toDouble
    val corpusBin = (0 to 9).map(b => binned.count(_._2 == b).toDouble)
    val expected = binned.groupBy(_._1).view.mapValues { ds =>
      val ns = ds.length.toDouble
      round4((0 to 9).map { b =>
        val p = (ds.count(_._2 == b) + 1.0) / (ns + 10.0)
        val q = (corpusBin(b) + 1.0) / (n + 10.0)
        (p - q) * math.log(p / q)
      }.sum)
    }.toMap
    val got = SparkEntry.queries("q133_psi_drift")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
    // PSI is an f-divergence-style score: non-negative before rounding
    got.values.foreach(psi => assert(psi >= -1e-9))
  }

  test("q149: AUC equals the all-pairs Mann-Whitney probability") {
    val rows = Tables.documents(spark, sf0001)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0) == "en", r.getLong(1)))
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    // the definition: P(score+ > score-) + half the ties, all pairs
    val wins = (for (p <- pos; q <- neg) yield {
      if (p > q) 2L else if (p == q) 1L else 0L
    }).sum
    val expected = round4(wins.toDouble / (2.0 * pos.length * neg.length))
    val row = SparkEntry.queries("q149_auc")(spark, sf0001).collect().head
    assert(row.getLong(0) == pos.length.toLong)
    assert(row.getLong(1) == neg.length.toLong)
    assert(row.getDouble(2) == expected)
  }

  test("q150: D equals the brute-force max CDF gap, at its smallest witness") {
    val rows = Tables.documents(spark, sf0001)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val a = rows.filter(_._1 == "src0").map(_._2)
    val b = rows.filter(_._1 == "src1").map(_._2)
    val values = (a ++ b).distinct.sorted
    val gaps = values.map { v =>
      (v, math.abs(a.count(_ <= v).toLong * b.length -
        b.count(_ <= v).toLong * a.length))
    }
    val m = gaps.map(_._2).max
    val row = SparkEntry.queries("q150_ks_test")(spark, sf0001).collect().head
    assert(row.getLong(0) == a.length.toLong)
    assert(row.getLong(1) == b.length.toLong)
    assert(row.getLong(2) == gaps.filter(_._2 == m).map(_._1).min)
    assert(row.getDouble(3) == round4(m.toDouble / (a.length.toLong * b.length)))
    // D is a sup of probability gaps: in [0, 1]
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }

  test("q152: the CUSUM extremum equals the plain-Scala deviation walk") {
    val xs = Tables.events(spark, sf0001)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("c"))
      .orderBy("d").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val n = xs.size.toLong
    val t = xs.map(_._2).sum
    var cum = 0L
    val devs = xs.zipWithIndex.map { case ((d, c), i) =>
      cum += c; (d, math.abs(n * cum - (i + 1) * t))
    }
    val m = devs.map(_._2).max
    val row = SparkEntry.queries("q152_changepoint")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == n)
    assert(row.getString(1) == devs.filter(_._2 == m).map(_._1).min)
    assert(row.getDouble(2) == round4(m.toDouble / n))
    // the walk returns to zero at the last day: S_n = 0 by construction
    assert(devs.last._2 == 0L)
  }

  test("q153: digit counts, Benford expectations, and chi2 re-derive") {
    val digits = Tables.orders(spark, sf0001)
      .select(floor(col("o_totalprice")).cast("long")).collect()
      .map(_.getLong(0).toString.head.asDigit.toLong)
    val n = digits.length.toLong
    val hist = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val chi2 = hist.map { case (d, obs) =>
      val exp = n * math.log10(1 + 1.0 / d)
      (obs - exp) * (obs - exp) / exp
    }.sum
    val got = SparkEntry.queries("q153_benford")(spark, sf0001)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(4)))
    assert(got.map(g => g._1 -> g._2).toMap == hist)
    got.foreach { case (d, _, exp, c2) =>
      assert(exp == round4(n * math.log10(1 + 1.0 / d)))
      assert(c2 == round4(chi2))
    }
    // the Benford expectations themselves partition n (sum of logs = 1)
    assert(math.abs(got.map(_._3).sum - n) < 0.01)
  }

  test("q157: the z statistic equals the hand-pooled two-proportion test") {
    val conv = Tables.events(spark, sf0001)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1) == "purchase" && r.getDouble(2) > 90))
      .groupBy(_._1).view.mapValues(_.exists(_._2)).toMap
    val (a, b) = conv.partition(_._1 % 2 == 0)
    val (n0, c0) = (a.size.toLong, a.values.count(identity).toLong)
    val (n1, c1) = (b.size.toLong, b.values.count(identity).toLong)
    val (p0, p1) = (c0.toDouble / n0, c1.toDouble / n1)
    val pp = (c0 + c1).toDouble / (n0 + n1)
    val z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
    val row = SparkEntry.queries("q157_ab_test")(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((n0, c0)))
    assert((row.getLong(3), row.getLong(4)) == ((n1, c1)))
    assert(row.getDouble(2) == round4(p0))
    assert(row.getDouble(5) == round4(p1))
    assert(row.getDouble(6) == round4(z))
    // non-vacuous: both variants populated, neither rate degenerate
    // (a pooled rate of exactly 0 or 1 makes the denominator 0)
    assert(n0 > 0 && n1 > 0 && pp > 0.0 && pp < 1.0)
  }
}
