package graft

import graft.queries.GraphRankOps
import org.apache.spark.sql.functions._

/** Invariants + plan pins for the PageRank power iteration. */
class GraphRankSpec extends SparkTestBase {

  test("g7 rank mass is conserved at 1 over the full vector") {
    // no dangling nodes (every doc emits 4 out-links), so each iteration
    // maps a unit vector to a unit vector; the only slack is the 1e-6
    // per-node snap grid
    val agg = GraphRankOps.fullRanks(spark, SfDir)
      .agg(sum(col("pagerank")).as("mass"), count(lit(1)).as("n")).head()
    val (mass, n) = (agg.getAs[Double]("mass"), agg.getAs[Long]("n"))
    assert(math.abs(mass - 1.0) < 1e-6 * n, s"mass=$mass n=$n")
  }

  test("g7 authority ordering follows the in-link structure") {
    val rows = SparkEntry.queries("g7_pagerank")(spark, SfDir).collect()
    assert(rows.length == 20)
    val all = GraphRankOps.fullRanks(spark, SfDir)
    val meanDeg = all.agg(avg(col("in_degree"))).head().getDouble(0)
    // the top-20 by rank must sit above the mean in-degree on average —
    // rank is driven by in-links when all sources start uniform
    val topDeg = rows.map(_.getAs[Long]("in_degree").toDouble).sum / 20
    assert(topDeg > meanDeg, s"top-20 mean in-degree $topDeg <= corpus mean $meanDeg")
  }

  test("g7 power iteration joins stay equi-keyed; only the count broadcasts") {
    val p = SparkEntry.queries("g7_pagerank")(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the iteration join (edges x ranks) must be an equi join; the only
    // nested-loop shapes allowed are the 1-row count-broadcast crossJoins
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }
}
