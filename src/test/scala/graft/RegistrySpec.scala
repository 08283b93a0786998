package graft

/** Contract-integrity guards for the driver-facing registry: Map-based
  * views silently deduplicate, so a copy-pasted QueryDef name would
  * drop a query from the round without any error — fail here instead. */
class RegistrySpec extends SparkSpec {

  test("declared query names are unique") {
    val names = SparkEntry.declared.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle key has a query; oracle SQL is non-empty and single-statement") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracle for unknown query $name")
      assert(sql.trim.nonEmpty && !sql.trim.endsWith(";"))
    }
  }

  test("query names follow the qNN_ prefix convention, ordered") {
    SparkEntry.declared.foreach { q =>
      assert(q.name.matches("q\\d{2,3}_[a-z0-9_]+"), s"bad name: ${q.name}")
    }
  }
}
