package graft

import graft.domain.BigMacOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the aggregate()-stepped shrink-reachability expression
  * ([[BigMacOps.shrinkEmitExpr]]) against a direct breadth-first
  * reachability computed in plain Scala, on randomized verdict tables.
  * The production oracle checks the same recursion through per-level SQL
  * joins in DuckDB; this spec removes the shared-formulation blind spot by
  * checking a third, independent derivation — and it exercises range
  * shapes (sparse/dense ok flags, m up to 10) the fixture may not hit.
  */
class BigMacShrinkSpec extends SparkTestBase {

  private val Rounds = 6

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  /** Direct BFS: start at [1,m]; a failing reached range of length ≥ 2
    * spawns (i+1,j) and (i,j-1); collect every reached range that
    * verifies. Mirrors recursive_possible_sandwiches
    * (sandwich/mod.rs:447-555). */
  private def bfsEmit(m: Int, ok: Map[(Int, Int), Boolean]): Set[(Int, Int)] = {
    var lvl: Set[(Int, Int)] = Set((1, m))
    var emitted = lvl.filter(ok)
    for (_ <- 0 until Rounds) {
      lvl = lvl.filter(r => !ok(r) && r._2 - r._1 + 1 >= 2)
        .flatMap { case (i, j) => Seq((i + 1, j), (i, j - 1)) }
      emitted ++= lvl.filter(ok)
    }
    emitted
  }

  /** Every in-envelope range of a chain of m links. */
  private def envelope(m: Int): Seq[(Int, Int)] = for {
    i <- 1 to m; j <- i to m if (i - 1) + (m - j) <= Rounds
  } yield (i, j)

  private val caseGen: Gen[(Int, Map[(Int, Int), Boolean])] = for {
    m <- Gen.choose(1, 10)
    flags <- Gen.listOfN(m * m, Gen.oneOf(true, false))
  } yield (m, envelope(m).zip(flags).map { case (r, f) => r -> f }.toMap)

  private val rsType = ArrayType(StructType(Seq(
    StructField("i", IntegerType), StructField("j", IntegerType),
    StructField("m", IntegerType), StructField("ok", BooleanType))))

  /** Evaluate the expression for many segments in ONE job: one row per
    * case, explode the emitted set, group back by case id. */
  private def exprEmit(cases: Seq[(Int, Map[(Int, Int), Boolean])])
      : Map[Int, Set[(Int, Int)]] = {
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]
    cases.zipWithIndex.foreach { case ((m, ok), id) =>
      rows.add(Row(id,
        ok.toSeq.sortBy(_._1).map { case ((i, j), o) => Row(i, j, m, o) }))
    }
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("cid", IntegerType), StructField("rs", rsType))))
    df.select(col("cid"),
        explode(expr(BigMacOps.shrinkEmitExpr(Rounds))).as("r"))
      .select("cid", "r.i", "r.j").collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rs) =>
        cid -> rs.map(r => (r.getInt(1), r.getInt(2))).toSet }
  }

  test("aggregate()-stepped shrink emit equals direct BFS (120 random tables)") {
    val cases = (1 to 120).map(seed => sample(caseGen, seed.toLong))
    val got = exprEmit(cases)
    cases.zipWithIndex.foreach { case ((m, ok), id) =>
      val expected = bfsEmit(m, ok)
      assert(got.getOrElse(id, Set.empty) == expected,
        s"case $id (m=$m, ok=$ok): got ${got.getOrElse(id, Set.empty)}, " +
          s"expected $expected")
    }
  }

  test("all-failing chain emits nothing; all-ok chain emits only [1,m]") {
    val m = 7
    val allFail = (m, envelope(m).map(_ -> false).toMap)
    val allOk = (m, envelope(m).map(_ -> true).toMap)
    val got = exprEmit(Seq(allFail, allOk))
    assert(got.getOrElse(0, Set.empty).isEmpty)
    assert(got.getOrElse(1, Set.empty) == Set((1, m)))
  }
}
