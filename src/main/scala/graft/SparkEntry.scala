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
    Seq(Relational, EventOps, TextOps, MultimodalOps, DedupOps, SimilarityOps, PipelineOps, QualityOps, SketchOps, RetrievalOps, ClassifyOps,
      AbiBreadthOps, IndirectOps, InspectorOps, PricingOps, CexOps, MiscOps,
      FidelityOps, streaming.StreamOracle)

  lazy val all: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship pipeline on sf0.001 (driver smoke-checks rows > 0): the full
    * reference lifecycle (SURVEY §3.1) — traces → classification (C1/C2) →
    * accounting (A1–A3) → inspectors → per-block MevBlock rollup (Q9/A4) —
    * one composed end-to-end run of the domain engine. */
  def entry(spark: SparkSession): DataFrame =
    queries("q9_mev_block")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** DuckDB-runnable oracle SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
