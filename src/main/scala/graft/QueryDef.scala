package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark DataFrame builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle
  * (SURVEY.md §2.12). `oracle = None` → the driver records a weaker
  * rows-only check (used for engine-specific ops: LSH variants, sketches,
  * streaming).
  *
  * Contract: output column NAMES (and row order, via a total ORDER BY)
  * must match between the Spark build and the oracle SQL; every float
  * column is rounded, every timestamp rendered as a 'yyyy-MM-dd HH:mm:ss'
  * UTC string, every integer-valued column is BIGINT on both sides.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  def unchecked(name: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
