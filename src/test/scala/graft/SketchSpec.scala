package graft

import org.apache.spark.sql.functions._

/** Invariants + plan pins for the SketchOps approximate operators. */
class SketchSpec extends SparkTestBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, SfDir)

  test("sk1 KMV estimate lands within sketch-theory error of exact") {
    // std of the KMV estimator is ~1/sqrt(K-1) ≈ 12.6% at K=64; allow 5σ
    val rows = run("sk1_kmv_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_error") < 0.63,
        s"estimate off beyond 5 sigma: $r")
      assert(r.getAs[Double]("kmv_estimate") > 0.0)
    }
  }

  test("sk2 bloom filter has zero false negatives and a sane FP rate") {
    val rows = run("sk2_bloom_filter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_false_neg") == 0L,
        s"Bloom's contract violated: $r")
      // a saturated filter would show fp_rate near 1.0 — geometry must
      // keep it far below (expected ~7% at m/n ≈ 6, j = 2)
      assert(r.getAs[Double]("fp_rate") < 0.3, s"filter saturated: $r")
    }
  }

  test("sk2 bloom bit-table joins as broadcasts") {
    val p = run("sk2_bloom_filter").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sk5 quantile estimates are one-sided within the 1/16 bucket width") {
    val rows = run("sk5_quantile_sketch").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("one_sided_ok"),
        s"bucket lower bound above the exact quantile: $r")
      // log-linear geometry: bucket width / lower bound <= 1/16
      assert(r.getAs[Double]("rel_error") <= 0.0625, s"bucket too wide: $r")
    }
  }

  test("sk5 cumulative-count probe broadcasts the sketch, never cross-joins") {
    val p = run("sk5_quantile_sketch").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
