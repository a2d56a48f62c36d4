package graft

/** Invariants for the RetrievalOps rankers. */
class RetrievalSpec extends SparkTestBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, SfDir)

  test("rt1 BM25 returns a full descending top-3 per query document") {
    val byQ = run("rt1_bm25_topk").collect().groupBy(_.getAs[Long]("q_doc"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
      val scores = sorted.map(_.getAs[Double]("bm25")).toSeq
      assert(scores == scores.sorted.reverse, s"q=$q not descending: $scores")
      assert(scores.forall(_ > 0.0))
      assert(!sorted.map(_.getAs[Long]("cand")).contains(q),
        "a query must not retrieve itself")
    }
  }

  test("rt2 RRF fuses both rankings consistently") {
    val byQ = run("rt2_hybrid_rrf").collect().groupBy(_.getAs[Long]("q_doc"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      val rrfs = sorted.map(_.getAs[Double]("rrf")).toSeq
      assert(rrfs == rrfs.sorted.reverse)
      sorted.foreach { r =>
        val expect = 1.0 / (r.getAs[Long]("r_lex") + 60.0) +
          1.0 / (r.getAs[Long]("r_vec") + 60.0)
        assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-12,
          s"rrf must equal the fusion of the recorded ranks: $r")
      }
    }
  }
}
