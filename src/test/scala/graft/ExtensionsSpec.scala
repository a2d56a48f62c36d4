package graft

import org.apache.spark.sql.SparkSession

/** [[GraftExtensions]] — the SQL-text surface of the ABI decode
  * expressions. Covers both entry points (withExtensions at session build;
  * register() on a live session), exact decode semantics from SQL text,
  * the INT-literal index contract, and whole-stage-codegen planning. */
class ExtensionsSpec extends SparkTestBase {

  /** 32-byte ABI word as hex (two's complement for negatives). */
  private def w(v: BigInt): String = {
    val u = if (v >= 0) v else BigInt(2).pow(256) + v
    val h = u.toString(16)
    ("0" * (64 - h.length)) + h
  }

  // sel ‖ uint(5) ‖ int256(−7): the two-word and signed shapes in one buffer
  private val twoWordHex = "aabbccdd" + w(5) + w(-7)
  // sel ‖ offset(0x40) ‖ scalar(9) ‖ len(2) ‖ 11 ‖ 22
  private val dynHex = "aabbccdd" + w(0x40) + w(9) + w(2) + w(11) + w(22)

  private def decodeChecks(s: SparkSession): Unit = {
    val r = s.sql(s"""
      SELECT abi_selector(unhex('$twoWordHex')) AS sel,
        abi_word(unhex('$twoWordHex'), 0) AS w0,
        abi_int_word(unhex('$twoWordHex'), 1) AS i1,
        abi_log_word(unhex('${w(42) + w(43)}'), 1) AS lg1,
        abi_array_len(unhex('$dynHex'), 0) AS alen,
        abi_array_elem(unhex('$dynHex'), 0, 1) AS e1,
        abi_array_elem(unhex('$dynHex'), 0, 2) AS beyond
      """).head()
    assert(r.getString(0) == "aabbccdd")
    assert(r.getLong(1) == 5L)
    assert(r.getLong(2) == -7L)
    assert(r.getLong(3) == 43L)
    assert(r.getLong(4) == 2L)
    assert(r.getLong(5) == 22L)
    assert(r.isNullAt(6)) // element index beyond decoded length → NULL
  }

  test("withExtensions-built session resolves the decode functions from SQL text") {
    // a second SparkSession over the SAME SparkContext: extensions are
    // per-session state, so this exercises the spark.sql.extensions path
    // without tearing down the suite-shared session
    spark.sparkContext // force the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try decodeChecks(s2)
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("register() installs the functions on a live session") {
    GraftExtensions.register(spark)
    decodeChecks(spark)
  }

  test("cdc_boundaries is callable from SQL text and matches the kernel") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      "SELECT cdc_boundaries('the quick brown fox jumps over the lazy dog') AS b")
      .collect()
    val viaSql = rows.head.getSeq[Int](0)
    val viaKernel = graft.functions.TextHash.cdcBoundariesKernel(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "the quick brown fox jumps over the lazy dog")).toIntArray.toSeq
    assert(viaSql == viaKernel)
    assert(viaSql.head == 1)
  }

  test("SQL-planned decode stays inside whole-stage codegen") {
    GraftExtensions.register(spark)
    val df = spark.sql(
      "SELECT SUM(abi_word(unhex(concat('aabbccdd', lpad(hex(id), 64, '0'))), 0)) AS s " +
        "FROM range(100)")
    assert(df.collect().head.getLong(0) == (0L until 100L).sum)
    // `*(N)` is the whole-stage-codegen span marker in the final-plan
    // rendering; the aggregate feeding on the SQL-planned decode must sit
    // inside a span (same pin as PlanSpec's Column-API variant)
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) [^\n]*abi_word""".r.findFirstIn(p).isDefined, p)
  }

  test("wrong-typed input fails at analysis, not as a runtime cast error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT abi_word('not binary', 0)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null && m.contains("BINARY")), e.toString)
  }

  test("index arguments must be INT literals; arity is enforced") {
    GraftExtensions.register(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT abi_word(unhex('aa'), id) FROM range(1)").collect()
    }
    assert(e1.getMessage.contains("INT literal") ||
      e1.getCause != null && e1.getCause.getMessage.contains("INT literal"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT abi_selector(unhex('aa'), 1)").collect()
    }
    assert(e2.getMessage.contains("expects 1 arguments") ||
      e2.getCause != null && e2.getCause.getMessage.contains("expects 1 arguments"))
  }
}
