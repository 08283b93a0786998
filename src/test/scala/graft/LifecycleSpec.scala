package graft

import org.apache.spark.sql.functions._

/** Independent recomputation checks for the lifecycle/corpus-statistics
  * wave (q142–q148): window funnel, cumulative user growth, per-source
  * Gini, cap-per-cluster election, the Zipf fit, DAU/WAU stickiness,
  * and word burstiness. Each query's math is re-derived in plain Scala
  * from rows collected at sf0.001 — the funnel clock fold, the
  * first-seen identity, the sorted-rank Gini, union-find caps, OLS on
  * the log-log curve, the cover-day WAU, and the zero-free VMR — so a
  * regression in the distributed formulation surfaces as a value diff
  * here even before the DuckDB oracle runs.
  */
class LifecycleSpec extends SparkSpec {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val events: Seq[(Long, Long, Long, String)] =
    Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
        col("event_id"), col("event_type"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  private lazy val docs: Seq[(Long, String, String, Long)] =
    Tables.documents(spark, sf0001)
      .select("doc_id", "text", "source", "n_chars").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private def wordsOf(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z]+").toSeq.filter(_.nonEmpty)

  test("q142: depths equal the greedy clock fold; reached is the tail sum") {
    val delta = 3L * 24 * 3600 * 1000000
    val code = Map("view" -> 1L, "click" -> 2L, "purchase" -> 3L)
    val depths = events.groupBy(_._1).values.map { evs =>
      evs.map(e => (e._2, e._3, code.getOrElse(e._4, 0L)))
        .sortBy(e => (e._1, e._2))
        .foldLeft((0L, 0L)) { case ((d, anchor), (tsm, _, c)) =>
          if (c == d + 1 && (d == 0 || tsm <= anchor + delta)) (d + 1, tsm)
          else (d, anchor)
        }._1
    }.toSeq
    val hist = depths.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = hist.keys.toSeq.sorted.map { d =>
      (d, hist(d), hist.filter(_._1 >= d).values.sum)
    }
    val got = SparkEntry.queries("q142_window_funnel")(spark, sf0001)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    // reached is non-increasing in depth, and the top row covers everyone
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    assert(got.head._3 == depths.size)
  }

  test("q143: the curve is the first-seen identity, ending at the user count") {
    val sampled = Tables.events(spark, sf0001)
      .where(col("event_id") % 97 === 0)
      .select(col("user_id"), date_format(to_date(col("ts")), "yyyy-MM-dd"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
    val firstSeen = sampled.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val newPerDay = firstSeen.values.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    var cum = 0L
    val expected = newPerDay.keys.toSeq.sorted.map { d =>
      cum += newPerDay(d); (d, newPerDay(d), cum)
    }
    val got = SparkEntry.queries("q143_user_growth")(spark, sf0001)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    assert(got.last._3 == firstSeen.size)
  }

  test("q147: DAU/WAU equal the brute-force trailing-window sets") {
    val ud = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect().toSeq
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct.sorted(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val expected = days.map { d =>
      val dau = ud.filter(_._2 == d).map(_._1).distinct.size.toLong
      val wau = ud.filter { case (_, a) =>
        !a.isAfter(d) && !a.isBefore(d.minusDays(6))
      }.map(_._1).distinct.size.toLong
      (d.toString, dau, wau, round4(dau.toDouble / wau))
    }
    val got = SparkEntry.queries("q147_stickiness")(spark, sf0001)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
    // a day's actives are inside its own trailing week: dau <= wau
    got.foreach { case (_, dau, wau, s) =>
      assert(dau <= wau && s > 0.0 && s <= 1.0)
    }
  }

  test("q144: Gini equals the sorted-rank identity, inside [0, 1)") {
    val expected = docs.groupBy(_._3).toSeq.map { case (src, ds) =>
      val xs = ds.map(d => (d._4, d._1)).sorted.map(_._1)
      val n = xs.size.toLong
      val sx = xs.sum
      val srx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (src, n, round4((2.0 * srx - (n + 1) * sx) / (n.toDouble * sx)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q144_gini")(spark, sf0001)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got == expected)
    got.foreach { case (_, _, g) => assert(g >= 0.0 && g < 1.0) }
  }

  test("q145: survivors equal union-find components capped at 2 by quality") {
    val sets = docs.filter(_._1 < 100)
      .map(d => d._1 -> wordsOf(d._2).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      inter = (sets(a) & sets(b)).size
      if inter.toDouble / (sets(a).size + sets(b).size - inter) >= 0.8
    } parent(find(math.max(a, b))) = find(math.min(a, b))
    val lens = docs.filter(_._1 < 100).map(d => d._1 -> d._4).toMap
    val expected = ids.groupBy(find).toSeq.flatMap { case (_, members) =>
      val rep = members.min
      members.sortBy(id => (-lens(id), id)).take(2)
        .zipWithIndex.map { case (id, i) => (id, rep, (i + 1).toLong) }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q145_cluster_cap")(spark, sf0001)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    // the cap binds: no cluster emits more than 2 survivors
    got.groupBy(_._2).values.foreach(c => assert(c.size <= 2))
  }

  test("q146: the fit equals plain-Scala OLS on the log-log curve") {
    val freq = docs.flatMap(d => wordsOf(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val top = freq.sortBy { case (w, c) => (-c, w) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    }
    val n = pts.size
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val sxx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val syy = pts.map(p => (p._2 - my) * (p._2 - my)).sum
    val sxy = pts.map(p => (p._1 - mx) * (p._2 - my)).sum
    val row = SparkEntry.queries("q146_zipf")(spark, sf0001).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(row.getDouble(1) == round4(sxy / sxx))
    assert(row.getDouble(2) == round4(my - sxy / sxx * mx))
    assert(row.getDouble(3) == round4(sxy * sxy / (sxx * syy)))
  }

  test("q148: VMR equals the zero-inclusive dispersion over all docs") {
    val nDocs = docs.size.toLong
    val perDoc = docs.flatMap { d =>
      wordsOf(d._2).groupBy(identity).map { case (w, os) =>
        (w, d._1, os.size.toLong)
      }
    }
    val byWord = perDoc.groupBy(_._1).view.mapValues { rows =>
      (rows.map(_._3).sum, rows.map(r => r._3 * r._3).sum, rows.size.toLong)
    }.toSeq
    val expected = byWord.sortBy { case (w, (s, _, _)) => (-s, w) }.take(20)
      .map { case (w, (s, q, df)) =>
        (w, s, df, round4((nDocs * q - s * s).toDouble / (nDocs * s)))
      }.sortBy(_._1)
    val got = SparkEntry.queries("q148_burstiness")(spark, sf0001)
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got == expected)
    // direct check of the zero-inclusive definition on the top word:
    // VMR = var/mean over per-doc counts INCLUDING absent docs
    val (w0, s0, _, vmr0) = got.maxBy(_._2)
    val counts = docs.map { d =>
      wordsOf(d._2).count(_ == w0).toDouble
    }
    val mu = counts.sum / nDocs
    val varP = counts.map(c => (c - mu) * (c - mu)).sum / nDocs
    assert(s0 == counts.sum.toLong)
    assert(vmr0 == round4(varP / mu))
  }

  test("q154: pattern hits equal java-regex counts over hand-built streams") {
    val code = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
      "signup" -> "s").withDefaultValue("e")
    val streams = events.groupBy(_._1).values.map { evs =>
      evs.sortBy(e => (e._2, e._3)).map(e => code(e._4)).mkString
    }.toSeq
    val expected = Seq("pe", "v[^c]*p").map { pat =>
      val hits = streams.map(s => pat.r.findAllMatchIn(s).size.toLong)
      (pat, hits.count(_ > 0).toLong, hits.sum)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q154_seq_pattern")(spark, sf0001)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got == expected)
    // occurrences dominate matching users (each match needs >= 1 hit)
    got.foreach { case (_, u, o) => assert(o >= u) }
  }

  test("q155: SCD2 rows equal the hand compaction; intervals tile") {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val expected = events.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      val changes = ordered.zip(None +: ordered.map(e => Some(e._4)))
        .collect { case (e, prev) if !prev.contains(e._4) => e }
      changes.zipWithIndex.map { case ((_, tsm, _, state), i) =>
        val from = fmt.format(java.time.Instant.ofEpochSecond(
          tsm / 1000000, (tsm % 1000000) * 1000))
        val to =
          if (i + 1 < changes.size)
            fmt.format(java.time.Instant.ofEpochSecond(
              changes(i + 1)._2 / 1000000, (changes(i + 1)._2 % 1000000) * 1000))
          else "current"
        (u, (i + 1).toLong, state, from, to,
          if (i + 1 == changes.size) 1L else 0L)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q155_scd2")(spark, sf0001)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5)))
    assert(got == expected)
    // SCD2 invariants: exactly one current row per user; consecutive
    // versions tile (valid_to of v = valid_from of v+1); states CHANGE
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.count(_._6 == 1L) == 1)
      rows.sortBy(_._2).sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5 == b._4)   // intervals tile, no gaps/overlaps
          assert(a._3 != b._3)   // a version exists only on a CHANGE
        case _ =>
      }
    }
  }

  test("q156: corrupt counts equal the deterministic mangle rule") {
    val rows = Tables.events(spark, sf0001)
      .select("event_type", "event_id", "props").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val expected = rows.groupBy(_._1).view.mapValues { es =>
      val corrupt = es.count(_._2 % 13 == 0).toLong
      // valid payloads are exactly the unmangled ones: {"k": <int>}
      val sumK = es.filter(_._2 % 13 != 0)
        .map(e => """\d+""".r.findFirstIn(e._3).get.toLong).sum
      (es.size.toLong, corrupt, sumK)
    }.toMap
    val got = SparkEntry.queries("q156_bad_records")(spark, sf0001)
      .collect().toSeq.map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(3))))
    assert(got.map(g => g._1 -> (g._2._1, g._2._2, g._2._3)).toMap == expected)
    // non-vacuous both ways: every type has corrupt AND valid payloads
    got.foreach { case (_, (n, c, _, rate)) =>
      assert(c > 0 && c < n)
      assert(rate == round4(c.toDouble / n))
    }
  }
}
