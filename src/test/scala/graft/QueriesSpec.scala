package graft

/** Contract guard: every registered query must build and execute on the
  * smoke scale factor, every oracle entry must reference a real query,
  * and the flagship entry must return rows (the driver's smoke check). */
class QueriesSpec extends SparkSpec {

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf0001).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry() smoke: > 0 rows (driver contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
