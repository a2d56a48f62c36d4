package graft

import graft.streaming.TipStream
import graft.streaming.TipStream.{PoolQuote, PoolUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** R2/R5/S5: the stateful tip pipeline driven through a real Structured
  * Streaming query (MemoryStream → flatMapGroupsWithState → memory sink),
  * asserting state carries across micro-batches. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("R5 pool state carries across micro-batches and orders within a batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PoolUpdate]
    val q = TipStream.poolQuotes(input.toDS())
      .writeStream.format("memory").queryName("pool_quotes")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two updates to pool A arriving out of tx order
      input.addData(PoolUpdate("A", 1L, 5L, 2.0, 10.0), PoolUpdate("A", 1L, 2L, 1.5, 5.0))
      q.processAllAvailable()
      // batch 2: one more for A (state must remember px=2.0), one for B
      input.addData(PoolUpdate("A", 2L, 0L, 3.0, 1.0), PoolUpdate("B", 2L, 1L, 9.0, 2.0))
      q.processAllAvailable()
      val rows = spark.table("pool_quotes").as[PoolQuote].collect()
        .sortBy(r => (r.pool, r.nUpdates))
      assert(rows.map(_.postPx).toSeq == Seq(1.5, 2.0, 3.0, 9.0))
      // pre of the fold: None, then the in-batch 1.5, then cross-BATCH 2.0
      assert(rows.map(_.prePx).toSeq == Seq(None, Some(1.5), Some(2.0), None))
      assert(rows.find(r => r.pool == "A" && r.nUpdates == 3).get.cumVol == 16.0)
    } finally q.stop()
  }

  test("R5 tick boundary crossings are detected across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PoolUpdate]
    val q = TipStream.poolQuotes(input.toDS())
      .writeStream.format("memory").queryName("tick_quotes")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: price stays inside tick 0 (√P ∈ [1.0, 1.0001))
      input.addData(PoolUpdate("V3", 1L, 0L, 1.00002, 1.0),
        PoolUpdate("V3", 1L, 1L, 1.00009, 1.0))
      q.processAllAvailable()
      // batch 2: the move into tick 1 happens ACROSS the batch boundary —
      // only carried state can see it; then a drop back down to tick 0
      input.addData(PoolUpdate("V3", 2L, 0L, 1.00013, 1.0),
        PoolUpdate("V3", 2L, 1L, 1.00004, 1.0))
      q.processAllAvailable()
      val rows = spark.table("tick_quotes").as[PoolQuote].collect()
        .sortBy(_.nUpdates)
      assert(rows.map(TipStream.crossedBoundary).toSeq ==
        Seq(false, false, true, true))
      assert(TipStream.tickOf(rows(2).postPx) == 1L &&
        TipStream.tickOf(rows(3).postPx) == 0L)
    } finally q.stop()
  }

  test("R2/S5 tip mode follows a directory and write-behinds per micro-batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tip").toString
    val (src, out, ckpt) = (s"$tmp/src", s"$tmp/out", s"$tmp/ckpt")
    // seed the source with chain-fixture swaps, then start following it
    val swaps = graft.domain.ChainFixture.actions(spark, SfDir)
      .filter("action_type = 'swap'")
      .select("pool", "block_number", "tx_idx", "amount_in", "amount_out")
    swaps.limit(100).write.parquet(src)
    val q = TipStream.runTip(spark, src, out, ckpt)
    try {
      q.processAllAvailable()
      // a new "block" lands at the tip
      swaps.orderBy("block_number", "tx_idx").limit(50)
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val written = spark.read.parquet(out)
      assert(written.count() > 0)
      assert(written.select("pool").distinct().count() > 0)
    } finally q.stop()
  }
}
