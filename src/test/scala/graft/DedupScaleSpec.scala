package graft

import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextPipeline}

/** Adversarial scale posture of the dedup family: on a MAJORITY-duplicate
  * corpus (60% of documents are near-dups — the realistic LLM-corpus
  * regime, where the loser set is O(corpus), not "small"), with the
  * broadcast threshold forced off, the pipeline must complete via
  * SHUFFLED anti/equi joins — no plan node may demand a broadcast that
  * would OOM at 100 TB — and still elect exactly the right survivors.
  *
  * This pins the round-7 fix that removed the unconditional
  * `broadcast(losers)` / `broadcast(clusters)` hints from
  * [[TextPipeline.dedupCorpus]], [[Similarity.dedupEmbeddings]] and the
  * streaming ingest epochs: the optimizer now chooses (AQE broadcasts
  * genuinely-small loser sets at runtime; statistics otherwise), so
  * forcing the threshold to -1 here proves no hint remains.
  */
class DedupScaleSpec extends SparkSpec {

  import spark.implicits._

  /** 100 docs in 40 near-dup groups: ids 0..39 are mutually-disjoint
    * base docs (8 unique words each), ids 40..99 duplicate doc (id % 40)
    * exactly — 60% duplicates, survivors are exactly 0..39 under both
    * first and quality election (identical texts tie on quality; min
    * doc_id breaks the tie). */
  private def dupHeavyDocs = {
    // letters-only words (the corpus tokenizer splits on [^a-z]+): group g
    // gets the two-letter prefix (g/26, g%26), so word sets are disjoint
    // across groups
    val base = (0 until 40).map { g =>
      val p = s"${('a' + g / 26).toChar}${('a' + g % 26).toChar}"
      (0 until 8).map(i => s"q${p}${('a' + i).toChar}").mkString(" ")
    }
    (0 until 100).map(id => (id.toLong, base(id % 40))).toDF("doc_id", "text")
  }

  /** 100 vectors in 40 groups, same shape: ids 40..99 duplicate vector
    * (id % 40); base vectors are one-hot-ish in distinct dimensions so
    * cross-group cosine is 0. */
  private def dupHeavyVecs = {
    val base = (0 until 40).map { g =>
      (0 until 64).map(d => if (d == g % 64) 1.0f else if (d == (g + 17) % 64) 0.5f else 0.0f)
    }
    (0 until 100).map(id => (id.toLong, base(id % 40))).toDF("vec_id", "embedding")
  }

  private def withForcedShuffleJoins[A](body: => A): A = {
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  private def assertShuffledAntiJoin(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan
    val broadcasts = plan.collect { case b: BroadcastExchangeExec => b }
    assert(broadcasts.isEmpty,
      s"plan demands a broadcast despite threshold -1 (a hint survives):\n$plan")
    val shuffledAnti = plan.collect {
      case j: SortMergeJoinExec if j.joinType == LeftAnti => j
      case j: ShuffledHashJoinExec if j.joinType == LeftAnti => j
    }
    assert(shuffledAnti.nonEmpty, s"no shuffled anti join in plan:\n$plan")
  }

  test("dedupCorpus (minhash-lsh, quality election) survives a 60%-duplicate " +
    "corpus with shuffled joins only") {
    withForcedShuffleJoins {
      val out = TextPipeline.dedupCorpus(dupHeavyDocs, tau = 0.8,
        method = "minhash-lsh", electBy = "quality")
      assertShuffledAntiJoin(out)
      val survivors = out.select("doc_id").as[Long].collect().sorted
      assert(survivors.toSeq == (0L until 40L), s"wrong survivors: ${survivors.toSeq}")
    }
  }

  test("dedupCorpus (exact, first election) survives a 60%-duplicate " +
    "corpus with shuffled joins only") {
    withForcedShuffleJoins {
      val out = TextPipeline.dedupCorpus(dupHeavyDocs, tau = 0.8,
        method = "exact", electBy = "first")
      assertShuffledAntiJoin(out)
      val survivors = out.select("doc_id").as[Long].collect().sorted
      assert(survivors.toSeq == (0L until 40L), s"wrong survivors: ${survivors.toSeq}")
    }
  }

  test("dedupEmbeddings (lsh) survives a 60%-duplicate corpus with " +
    "shuffled joins only") {
    withForcedShuffleJoins {
      val out = Similarity.dedupEmbeddings(dupHeavyVecs, threshold = 0.9)
      assertShuffledAntiJoin(out)
      val survivors = out.select("vec_id").as[Long].collect().sorted
      assert(survivors.toSeq == (0L until 40L), s"wrong survivors: ${survivors.toSeq}")
    }
  }

  test("small loser sets still broadcast at runtime (AQE) — removing the " +
    "hint did not forfeit the small-side plan") {
    // default threshold, AQE on: the 60-id loser set is far under 10 MB,
    // so the adaptive plan converts the anti join back to broadcast
    val out = TextPipeline.dedupCorpus(dupHeavyDocs, tau = 0.8,
      method = "minhash-lsh", electBy = "first")
    out.collect() // materialize so AQE finalizes the adaptive plan
    val finalPlan = out.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin") ||
      finalPlan.contains("BroadcastExchange"),
      s"expected AQE to broadcast the small loser set:\n$finalPlan")
  }
}
