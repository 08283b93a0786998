package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Graph, Multimodal, Relational, Similarity, TextPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared once as a
  * [[QueryDef]] (Spark builder + optional DuckDB oracle SQL) in the
  * operators package; this object is just the flattened registry the
  * driver consumes.
  */
object SparkEntry {

  /** All declared queries, in SURVEY.md §2.12 order. */
  val declared: Seq[QueryDef] =
    Relational.all ++ TextPipeline.all ++ Similarity.all ++ Multimodal.all ++
      Advanced.all ++ Graph.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word count — the reference's own flagship workload (MIT 6.824 Lab 1
    * wc plugin). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01_wordcount.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate LSH / IVF variants) → driver records rows-only check. */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
