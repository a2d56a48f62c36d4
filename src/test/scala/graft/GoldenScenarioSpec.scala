package graft

import graft.domain.InspectorOps
import org.apache.spark.sql.DataFrame

/** FIXTURES.md §C golden scenarios: hand-planted patterns with
  * closed-form expected outputs (the Spark analog of the reference's
  * pinned-tx-hash inspector tests, sandwich/mod.rs:1149-1510). */
class GoldenScenarioSpec extends SparkTestBase {
  import spark.implicits._

  // swTx-shaped rows: (block, tx_idx, tx_hash, eoa, pool, dir, tok_in, in, out)
  private def swTxOf(rows: (Long, Long, String, String, String, Long, Long, Double, Double)*): DataFrame =
    rows.toDF("block_number", "tx_idx", "tx_hash", "eoa", "pool",
      "dir", "tok_in", "sum_in", "sum_out")

  test("simple_sandwich: 1 frontrun + 2 victims + 1 backrun on one pool") {
    val df = swTxOf(
      (1L, 0L, "f", "attacker", "P", 0L, 7L, 100.0, 90.0), // frontrun buys
      (1L, 1L, "v1", "victimA", "P", 0L, 7L, 50.0, 44.0), // same direction
      (1L, 2L, "v2", "victimB", "P", 0L, 7L, 30.0, 26.0),
      (1L, 3L, "b", "attacker", "P", 1L, 8L, 90.0, 120.0)) // backrun sells
    val out = InspectorOps.sandwichesOf(df).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_victims") == 2)
    assert(r.getAs[String]("front_tx") == "f" && r.getAs[String]("back_tx") == "b")
    // revenue in the frontrun token: back_out − front_in = 120 − 100
    assert(r.getAs[Double]("back_out") - r.getAs[Double]("sum_in") == 20.0)
  }

  test("big_mac_sandwich: two stacked frontruns each keep their own victim set") {
    val df = swTxOf(
      (1L, 0L, "f1", "atk", "P", 0L, 7L, 10.0, 9.0),
      (1L, 1L, "v1", "vic1", "P", 0L, 7L, 5.0, 4.4),
      (1L, 2L, "b1", "atk", "P", 1L, 8L, 9.0, 11.0),
      (1L, 3L, "v2", "vic2", "P", 1L, 8L, 5.0, 4.4), // matches 2nd bracket dir
      (1L, 4L, "f2", "atk", "P", 0L, 7L, 10.0, 9.0))
    val out = InspectorOps.sandwichesOf(df).orderBy("front_idx").collect()
    // brackets: (f1→b1) with v1 (dir 0) and (b1→f2) with v2 (dir 1)
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("n_victims")).toSeq == Seq(1L, 1L))
  }

  test("sandwich_not: no pool overlap → no sandwich") {
    val df = swTxOf(
      (1L, 0L, "f", "atk", "P1", 0L, 7L, 100.0, 90.0),
      (1L, 1L, "v", "vic", "P2", 0L, 7L, 50.0, 44.0), // different pool
      (1L, 3L, "b", "atk", "P1", 1L, 8L, 90.0, 120.0))
    assert(InspectorOps.sandwichesOf(df).count() == 0)
  }

  test("sandwich_not: same direction back-run is not a bracket") {
    val df = swTxOf(
      (1L, 0L, "f", "atk", "P", 0L, 7L, 100.0, 90.0),
      (1L, 1L, "v", "vic", "P", 0L, 7L, 50.0, 44.0),
      (1L, 3L, "b", "atk", "P", 0L, 7L, 90.0, 80.0)) // same dir as front
    assert(InspectorOps.sandwichesOf(df).count() == 0)
  }

  test("sandwich_not: opposite-direction victim does not count") {
    val df = swTxOf(
      (1L, 0L, "f", "atk", "P", 0L, 7L, 100.0, 90.0),
      (1L, 1L, "v", "vic", "P", 1L, 8L, 50.0, 44.0), // counter-trading victim
      (1L, 3L, "b", "atk", "P", 1L, 8L, 90.0, 120.0))
    assert(InspectorOps.sandwichesOf(df).count() == 0)
  }

  // swaps-shaped rows for the arb classifier: (tx_hash, trace_idx, in, out)
  private def swapsOf(rows: (String, Long, Long, Long)*): DataFrame =
    rows.toDF("tx_hash", "trace_idx", "token_in_id", "token_out_id")

  test("triangle_arb: three chained swaps closing the cycle") {
    val out = InspectorOps.arbsOf(swapsOf(
      ("t", 1L, 10L, 11L), ("t", 2L, 11L, 12L), ("t", 3L, 12L, 10L))).collect()
    assert(out.length == 1 && out.head.getAs[String]("arb_type") == "triangle")
  }

  test("cross_pair_arb: two swaps there-and-back") {
    val out = InspectorOps.arbsOf(swapsOf(
      ("t", 1L, 10L, 11L), ("t", 2L, 11L, 10L))).collect()
    assert(out.length == 1 && out.head.getAs[String]("arb_type") == "cross_pair")
  }

  test("stable_arb vs long_tail: 4-leg cycles split on stable membership") {
    val out = InspectorOps.arbsOf(swapsOf(
      ("s", 1L, 2L, 11L), ("s", 2L, 11L, 12L), ("s", 3L, 12L, 13L), ("s", 4L, 13L, 2L),
      ("l", 1L, 20L, 21L), ("l", 2L, 21L, 22L), ("l", 3L, 22L, 23L), ("l", 4L, 23L, 20L)))
      .orderBy("tx_hash").collect()
    assert(out.map(_.getAs[String]("arb_type")).toSeq == Seq("long_tail", "stablecoin"))
  }

  test("arb_not: broken chain or open cycle is not an arb") {
    val out = InspectorOps.arbsOf(swapsOf(
      ("a", 1L, 10L, 11L), ("a", 2L, 12L, 13L), // discontinuous
      ("b", 1L, 10L, 11L), ("b", 2L, 11L, 12L))) // open-ended
    assert(out.count() == 0)
  }

  test("cross-block patterns never match (per-block partitioning)") {
    val df = swTxOf(
      (1L, 15L, "f", "atk", "P", 0L, 7L, 100.0, 90.0),
      (2L, 0L, "v", "vic", "P", 0L, 7L, 50.0, 44.0),
      (2L, 1L, "b", "atk", "P", 1L, 8L, 90.0, 120.0))
    assert(InspectorOps.sandwichesOf(df).count() == 0)
  }
}
