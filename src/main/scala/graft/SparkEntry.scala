package graft

import graft.domain._
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query with a DuckDB oracle over the same parquet tables. Modules:
  *   - [[queries.Relational]]    scans/filters/joins/aggs/sorts (§2.1-2.8)
  *   - [[queries.EventOps]]      windows/as-of/range/sessions + funnel/
  *     cohort/AB/anomaly event analytics (§2.4-2.6, §2.9)
  *   - [[queries.TextOps]]       text analysis + media sniff/decode
  *   - [[queries.MultimodalOps]] resize / frame-sample / audio / pixel dedup
  *   - [[queries.DedupOps]]      exact/LSH/SimHash/Jaccard/substring/CDC dedup
  *   - [[queries.SimilarityOps]] ANN (brute/LSH/IVF/PQ), k-means, SemDeDup,
  *     random projection, int8 quantization, hard negatives
  *   - [[queries.PipelineOps]]   decontamination/repetition/PII/splits/packing
  *   - [[queries.QualityOps]]    LM perplexity, DSIR, BPE, LR classifier,
  *     mixing, chunking, JSONL, sampling, Zipf, dataset card, DP release
  *   - [[queries.SketchOps]]     KMV/HLL distinct, Bloom, CMS, quantiles
  *   - [[queries.RetrievalOps]]  BM25, hybrid RRF
  *   - [[queries.GraphRankOps]]  PageRank authority ranking
  *   - domain modules (Classify/Indirect/Inspector/Pricing/Cex/Fidelity/
  *     Accounting over [[domain.ChainFixture]]) — the reference pipeline
  *   - [[streaming.StreamOracle]] / [[streaming.TipStream]] — streamed
  *     entries hash-checked against batch oracles (§2.9)
  */
object SparkEntry {

  val modules: Seq[QueryModule] =
    Seq(Relational, EventOps, TextOps, MultimodalOps, DedupOps, SimilarityOps, PipelineOps, QualityOps, SketchOps, RetrievalOps, GraphRankOps, CorpusOps, ClassifyOps,
      AbiBreadthOps, IndirectOps, RealAbiOps, RealAbiExtOps, RealAbiSwapOps, RealAbiZeroXOps, CensusOps, InspectorOps, BigMacOps, PricingOps, CexOps, MiscOps,
      FidelityOps, streaming.StreamOracle, streaming.TipInspect)

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
