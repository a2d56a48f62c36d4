package graft

import org.apache.spark.sql.functions._

/** Invariants + plan pins for the PipelineOps training-data operators. */
class PipelineSpec extends SparkTestBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, SfDir)

  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  test("t_decontaminate joins the eval gram set as a broadcast") {
    val p = plan("t_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t_decontaminate never flags an eval-set document") {
    val bad = run("t_decontaminate")
      .filter(pmod(col("doc_id"), lit(41)) === 0).count()
    assert(bad == 0)
  }

  test("t_repetition_stats is explode-free (row-local lambda algebra)") {
    val p = plan("t_repetition_stats")
    assert(!p.contains("Generate"), p)
  }

  test("t_pii_scrub redaction roundtrips byte-exactly on every document") {
    val r = run("t_pii_scrub")
      .agg(sum("n_docs").as("n"), sum("n_roundtrip_ok").as("ok"),
        sum("n_email_docs").as("e"), sum("n_phone_docs").as("p"),
        sum("n_ip_docs").as("i"))
      .head()
    assert(r.getLong(0) == r.getLong(1), s"roundtrip ${r.getLong(1)}/${r.getLong(0)}")
    assert(r.getLong(2) > 0 && r.getLong(3) > 0 && r.getLong(4) > 0,
      "every PII arm must be live")
  }

  test("t_hash_split partitions every document into exactly one split") {
    val total = Tables.documents(spark, SfDir).count()
    val splits = run("t_hash_split")
      .groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "valid", "test"), splits.toString)
    assert(splits.values.sum == total, splits.toString)
    // md5 is uniform: train ≈ 75% must dominate both holdouts.
    assert(splits("train") > splits("valid") && splits("train") > splits("test"))
  }

  test("t_seq_packing conserves tokens and fills bins contiguously") {
    val docs = Tables.documents(spark, SfDir)
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum("n")).head().getLong(0)
    val bins = run("t_seq_packing").collect()
    assert(bins.map(_.getAs[Long]("n_tokens")).sum == docs, "token conservation")
    bins.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val ids = rows.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0 && ids.sameElements(ids.head to ids.last),
        s"$src bins not contiguous: ${ids.mkString(",")}")
    }
  }

  test("d10_substring_dedup pairs are ordered and meet the share threshold") {
    val rows = run("d10_substring_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared") >= 2)
    }
  }
test("d14 url canonicalization folds every variance class and keeps id") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cases = Seq(
      // case fold + www strip + tracking strip + fragment strip + id kept
      ("HTTPS://WwW.News.Example.COM/a/7?utm_source=feed&ref=en&id=7#frag",
        "https://news.example.com/a/7?id=7"),
      // trailing slash folds into the no-slash variant
      ("https://news.example.com/a/7/?utm_source=feed&id=7",
        "https://news.example.com/a/7?id=7"),
      // no id param -> no query at all survives
      ("http://www.Site.org/Path/X?utm_campaign=z&ref=feed",
        "http://site.org/path/x"),
      // id anywhere in the query is found by the [?&] anchor
      ("http://site.org/p?id=42&utm_source=a", "http://site.org/p?id=42"),
      // www only strips as a HOST prefix, not mid-path
      ("http://host.com/www.keep/", "http://host.com/www.keep"))
    val out = cases.toDF("raw", "expected")
      .withColumn("canon", graft.queries.CorpusOps.canonicalUrl(col("raw")))
      .collect()
    for (r <- out)
      assert(r.getAs[String]("canon") == r.getAs[String]("expected"),
        s"${r.getAs[String]("raw")} -> ${r.getAs[String]("canon")}")
  }
}
