package graft

/** Contract checks on the driver surface: entry() returns rows; every query
  * runs at sf0.001 and returns a deterministic non-degenerate result; every
  * oracle key refers to an existing query. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracle without query: $orphan")
  }

  test("every query runs at sf0.001 and is deterministic across two runs") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val a = fn(spark, sf001).collect()
        val b = fn(spark, sf001).collect()
        if (a.sameElements(b)) None else Some(s"$name: nondeterministic")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
