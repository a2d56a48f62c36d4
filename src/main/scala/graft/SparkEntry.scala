package graft

import graft.domain._
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query with (where ANSI SQL can express it) a DuckDB oracle over the
  * same parquet tables. Modules:
  *   - [[queries.Relational]]   scans/filters/joins/aggs/sorts (§2.1-2.8)
  *   - [[queries.EventOps]]     windows/as-of/range/sessions (§2.4-2.6, §2.9)
  *   - [[queries.TextOps]]      text analysis (training-data ops)
  *   - [[queries.DedupOps]]     exact/MinHash-LSH/SimHash/Jaccard dedup
  *   - [[queries.SimilarityOps]] ANN cosine (brute-force + sign-LSH)
  */
object SparkEntry {

  val modules: Seq[QueryModule] =
    Seq(Relational, EventOps, TextOps, DedupOps, SimilarityOps, ClassifyOps,
      InspectorOps, PricingOps, CexOps, MiscOps, FidelityOps)

  lazy val all: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship pipeline on sf0.001 (driver smoke-checks rows > 0): the
    * classify → label → as-of price → account shape of the reference's
    * block pipeline (SURVEY §3.1), expressed over the events table. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import graft.ops.ExactAgg._
    val e = Tables.events(spark, dir).withColumn("us", expr("ts div 1000"))
    // "classify": tag actions; "price": as-of latest view value per user;
    // "account": net per user session.
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"), col("value"))
    val views = e.filter(col("event_type") === "view")
      .groupBy("user_id", "us")
      .agg(max_by(col("value"), col("event_id")).as("px"))
    graft.ops.AsOfJoin.backward(purchases, views, Seq("user_id"), "us", "px", "last_px")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("gross"),
        dsum(col("value") * coalesce(col("last_px"), lit(0.0))).as("priced"))
      .orderBy("user_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** DuckDB-runnable oracle SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
