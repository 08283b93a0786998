package graft

import org.apache.spark.sql.DataFrame

/** E2 parity gate (SURVEY.md §3.2): every declared query Q1–Q27 runs as
  * Spark SQL TEXT ([[SqlEntry]]) and must produce exactly the rows of its
  * DataFrame builder ([[SparkEntry.queries]]). Exercises the parser →
  * analyzer path (CTEs, EXISTS subqueries, set ops, window frames, HOF
  * lambdas, broadcast hints) that the DataFrame DSL skips.
  *
  * Comparison is the driver's own stringify protocol (column-name order,
  * NULL → \N) on the ORDERED output — every declared query carries a
  * total ORDER BY, so ordered equality is well-defined. Column names must
  * match exactly; numeric widths are stringified so INT-vs-BIGINT drift
  * surfaces as a value diff, not a schema pass.
  */
class SqlParitySpec extends SparkSpec {

  private def rendered(df: DataFrame): (Seq[String], Seq[String]) = {
    val cols = df.columns.toSeq
    val order = cols.indices.sortBy(cols)
    val rows = df.collect().toSeq.map { r =>
      order.map { i =>
        val v = r.get(i)
        if (r.isNullAt(i)) "\\N" else v.toString
      }.mkString("|")
    }
    (cols, rows)
  }

  (SqlEntry.sql.keys ++ SqlEntry.extensionSql.keys).toSeq.sorted.foreach { name =>
    test(s"$name: spark.sql text matches the DataFrame builder") {
      val (dfCols, dfRows) = rendered(SparkEntry.queries(name)(spark, sf0001))
      val (sqlCols, sqlRows) = rendered(SqlEntry.run(spark, sf0001, name))
      assert(sqlCols.sorted === dfCols.sorted,
        s"$name column names diverge: sql=$sqlCols df=$dfCols")
      assert(sqlRows.size === dfRows.size,
        s"$name row counts diverge: sql=${sqlRows.size} df=${dfRows.size}")
      val firstDiff = sqlRows.zip(dfRows).indexWhere { case (a, b) => a != b }
      val diffClue =
        if (firstDiff < 0) ""
        else s"$name first differing row #$firstDiff:\n  sql=${sqlRows(firstDiff)}\n  df =${dfRows(firstDiff)}"
      assert(firstDiff === -1, diffClue)
    }
  }

  test("the SQL surface covers all 27 declared-contract queries") {
    assert(SqlEntry.sql.size === 27)
    assert((SqlEntry.sql.keys ++ SqlEntry.extensionSql.keys)
      .forall(SparkEntry.queries.contains),
      "every SQL text keys a registered query")
    assert(SqlEntry.sql.keySet.intersect(SqlEntry.extensionSql.keySet).isEmpty)
  }
}
