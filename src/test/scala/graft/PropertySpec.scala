package graft

import graft.ops.{AsOfJoin, ExactAgg, TopK}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.expr
import org.scalacheck.rng.Seed
import org.scalacheck.{Arbitrary, Gen}

/** Property-based checks of the reusable operator library: each core op is
  * compared against a trivially-correct driver-side reference on many
  * RANDOMIZED inputs (fixed seeds — reproducible), across several
  * partitionings. This is the class of bug the fixture can't plant: a
  * fencepost that only fires on a shape the hand-written cases missed. */
class PropertySpec extends SparkTestBase {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  private val doublesGen: Gen[List[Double]] =
    Gen.chooseNum(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6).map(x => math.rint(x * 64) / 64)))

  test("dsum is invariant under repartitioning and permutation (50 random sets)") {
    import spark.implicits._
    for (seed <- 1 to 50) {
      val xs = sample(doublesGen, seed.toLong)
      val expected = ExactAgg.dsumDriver(xs)
      for (parts <- Seq(1, 3, 7)) {
        val got = xs.toDF("x").repartition(parts)
          .agg(ExactAgg.dsum(col("x"))).head().getDouble(0)
        assert(got == expected, s"seed=$seed parts=$parts: $got != $expected")
      }
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(seed.toLong)).shuffle(xs)
      val gotShuffled = shuffled.toDF("x").agg(ExactAgg.dsum(col("x")))
        .head().getDouble(0)
      assert(gotShuffled == expected, s"seed=$seed permuted: $gotShuffled")
    }
  }

  private case class L(k: Long, ts: Long, v: Long)
  private val eventsGen: Gen[(List[L], List[L])] = for {
    nl <- Gen.chooseNum(0, 40)
    nr <- Gen.chooseNum(0, 40)
    mk = for {
      k <- Gen.chooseNum(0L, 3L)
      ts <- Gen.chooseNum(0L, 30L) // narrow range → many exact ts ties
      v <- Gen.chooseNum(0L, 999L)
    } yield L(k, ts, v)
    l <- Gen.listOfN(nl, mk)
    r <- Gen.listOfN(nr, mk)
  } yield (l, r)

  test("AsOfJoin.backward equals the brute-force reference (40 random workloads)") {
    import spark.implicits._
    for (seed <- 1 to 40) {
      val (ls, rsRaw) = sample(eventsGen, 1000L + seed)
      // right side must be unique per (key, ts) for a well-defined as-of:
      // keep the max-v row, exactly what the op's contract assumes
      val rs = rsRaw.groupBy(r => (r.k, r.ts)).map(_._2.maxBy(_.v)).toList
      val left = ls.map(l => (l.k, l.ts, l.v)).toDF("k", "ts", "lv")
      val right = rs.map(r => (r.k, r.ts, r.v)).toDF("k", "ts", "rv")
      val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rv", "last_rv")
        .select("k", "ts", "lv", "last_rv")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
        .sorted
      val expect = ls.map { l =>
        val m = rs.filter(r => r.k == l.k && r.ts <= l.ts)
        (l.k, l.ts, l.v,
          if (m.isEmpty) -1L else m.maxBy(_.ts).v)
      }.sorted
      assert(got.toSeq == expect, s"seed=$seed")
    }
  }

  test("CdcBoundaries kernel equals the SQL-form predicate on random text") {
    import spark.implicits._
    val textGen: Gen[String] = Gen.chooseNum(1, 400).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(5 -> Gen.alphaLowerChar, 1 -> Gen.const(' ')))
        .map(_.mkString))
    val texts = (1 to 60).map(seed => sample(textGen, 3000L + seed))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("n", org.apache.spark.sql.functions.length(col("text")))
    val native = df.select(col("doc_id"),
        graft.functions.TextHash.cdc_boundaries(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val sqlForm = df.select(col("doc_id"), expr(
        """filter(transform(sequence(1, n),
             i -> IF(i = 1 OR (i + 7 <= n
               AND substring(md5(substring(text, i, 8)), 1, 1) = '0'),
               i, CAST(NULL AS INT))),
           x -> x IS NOT NULL)""").as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native == sqlForm)
  }

  test("Sessionize.byGap equals the brute-force reference (40 random workloads)") {
    import graft.ops.Sessionize
    import spark.implicits._
    for (seed <- 1 to 40) {
      val (ls, _) = sample(eventsGen, 4000L + seed)
      if (ls.nonEmpty) {
        // unique tiebreak per row: v replaced by a running index
        val rows = ls.zipWithIndex.map { case (l, i) => (l.k, l.ts, i.toLong) }
        val got = Sessionize.byGap(rows.toDF("k", "ts", "tb"),
            Seq("k"), "ts", "tb", gapMicros = 5L)
          .select("k", "ts", "tb", "session_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sorted
        val expect = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
          val sorted = rs.sortBy(r => (r._2, r._3))
          var sess = 0L
          var prev = Long.MinValue
          sorted.map { r =>
            if (prev != Long.MinValue && r._2 - prev > 5L) sess += 1
            prev = r._2
            (k, r._2, r._3, sess)
          }
        }.sorted
        assert(got.toSeq == expect, s"seed=$seed")
      }
    }
  }

  test("TopK.perGroup equals sort-take under total orders (40 random workloads)") {
    import spark.implicits._
    for (seed <- 1 to 40) {
      val (ls, _) = sample(eventsGen, 2000L + seed)
      if (ls.nonEmpty) {
        val df = ls.map(l => (l.k, l.ts, l.v)).toDF("k", "ts", "v")
        val got = TopK.perGroup(df, Seq("k"),
            Seq(col("ts").desc, col("v").asc), 3)
          .select("k", "rank", "ts", "v").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .sorted
        val expect = ls.groupBy(_.k).toSeq.flatMap { case (k, rows) =>
          rows.sortBy(r => (-r.ts, r.v)).take(3).zipWithIndex
            .map { case (r, i) => (k, i + 1, r.ts, r.v) }
        }.sorted
        assert(got.toSeq == expect, s"seed=$seed")
      }
    }
  }

  private case class PmTx(block: Long, idx: Long, pf: Long,
    priv: Int, cb: Int, claimed: Boolean)
  private val pmGen: Gen[List[PmTx]] = for {
    nb <- Gen.chooseNum(1, 5)
    blocks <- Gen.sequence[List[List[PmTx]], List[PmTx]]((0 until nb).toList.map { b =>
      for {
        nt <- Gen.chooseNum(1, 30)
        txs <- Gen.sequence[List[PmTx], PmTx]((0 until nt).toList.map { i =>
          for {
            pf <- Gen.chooseNum(0L, 1000L)
            priv <- Gen.frequency((7, Gen.const(0)), (3, Gen.const(1)))
            cb <- Gen.frequency((9, Gen.const(0)), (1, Gen.const(1)))
            cl <- Gen.frequency((8, Gen.const(false)), (2, Gen.const(true)))
          } yield PmTx(b.toLong, i.toLong, pf, priv, cb, cl)
        })
      } yield txs
    })
  } yield blocks.flatten

  test("possibleMevOf equals the direct 2-sigma reference (40 random workloads)") {
    import spark.implicits._
    for (seed <- 1 to 40) {
      val txs = sample(pmGen, 4000L + seed)
      val df = txs.map(t => (t.block, t.idx, s"t${t.block}_${t.idx}", t.pf,
        t.priv, t.cb)).toDF("block_number", "tx_idx", "tx_hash",
        "priority_fee", "is_private", "coinbase_transfer")
      val claimed = txs.filter(_.claimed)
        .map(t => s"t${t.block}_${t.idx}").toDF("tx_hash")
      val got = graft.domain.InspectorOps.possibleMevOf(df, claimed)
        .select("tx_hash", "high_priority_fee").collect()
        .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
      // driver reference: exact long sums (the decimal sums are exact on
      // integer fees) → identical double mean/σ arithmetic
      val expect = txs.groupBy(_.block).toSeq.flatMap { case (_, rows) =>
        val n = rows.length.toDouble
        val mean = rows.map(_.pf).sum / n
        val sd = math.sqrt(math.max(
          rows.map(t => t.pf * t.pf).sum / n - mean * mean, 0.0))
        rows.filter(t => !t.claimed)
          .map(t => (t, if (t.pf > mean + 2.0 * sd) 1 else 0))
          .filter { case (t, hi) => t.cb == 1 || hi == 1 }
          .map { case (t, hi) => (s"t${t.block}_${t.idx}", hi) }
      }.sorted
      assert(got == expect, s"seed=$seed")
    }
  }
}
