package graft

/** Regression tripwire for fixture schema drift (round-8 postmortem): the
  * driver regenerated `events.parquet` with `ts` typed TIMESTAMP instead of
  * INT64 nanos and 14 registered queries silently vanished from the
  * correctness artifact because they threw at *plan* time. This spec
  * constructs — does not execute — every `SparkEntry.queries` DataFrame and
  * forces analysis, so any plan-time failure becomes a named test failure.
  */
class RegistrationSpec extends SparkTestBase {

  test("every registered query analyzes against the current fixtures") {
    val failures = SparkEntry.all.flatMap { d =>
      try {
        // Force analysis (resolution + type checks) without executing.
        d.fn(spark, SfDir).queryExecution.analyzed
        None
      } catch {
        case e: Throwable =>
          Some(s"${d.name}: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
      }
    }
    assert(failures.isEmpty, s"\n${failures.size} queries fail at plan time:\n  ${failures.mkString("\n  ")}")
  }

  test("every oracle name has a registered query and vice-versa names are unique") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
  }
}
