package graft.queries

import graft.ops.ExactAgg
import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Distributed graph ranking for corpus curation: PageRank over the
  * document link graph. Web-scale pretraining pipelines weight documents
  * by the authority of their host (Common Crawl publishes harmonic
  * centrality / PageRank host rankings exactly for this), so the power
  * iteration itself has to run where the edges live — as repeated
  * equi-joins between an edge table and a rank table, never on the driver.
  *
  * Scale shape: edges are partitioned by src and ranks by node id; each of
  * the FIXED number of iterations is one join + one map-side-combinable
  * aggregation (the per-node contribution sum merges across partitions
  * like any partial agg). Rank sums go through [[ExactAgg]] so the vector
  * is bit-identical at any parallelism — a float PageRank would differ
  * run-to-run in the 15th digit and could reorder near-tied hosts.
  *
  * The fixture graph: every document emits 4 out-links whose targets are
  * md5-derived (uniform over doc ids) — deterministic, so the oracle
  * rebuilds the identical graph; parallel edges and self-loops are kept
  * (they are legal PageRank inputs and exercise the multi-edge sum).
  */
object GraphRankOps extends QueryModule {

  def defs: Seq[QueryDef] = Seq(pageRank)

  private val Damping = 0.85
  private val Teleport = 0.15
  private val OutDeg = 4
  private val Iters = 3

  /** Integer value of md5 hex chars [from, from+n) of column `h` (the
    * SketchOps nibble algebra — portable uniform bits in both engines). */
  private def nibbleVal(from: Int, n: Int): String =
    (0 until n).map { i =>
      val p = math.pow(16.0, (n - 1 - i).toDouble).toLong
      s"(instr('0123456789abcdef', substring(h,${from + i},1))-1)*${p}L"
    }.mkString("(", " + ", ")")

  private def nibbleValSql(from: Int, n: Int): String =
    (0 until n).map { i =>
      val p = math.pow(16.0, (n - 1 - i).toDouble).toLong
      s"(instr('0123456789abcdef', substring(h,${from + i},1))-1)*CAST($p AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** G7: PageRank power iteration (Page et al. 1999), [[Iters]] rounds at
    * damping 0.85 from the uniform vector, emitting the top-20 authority
    * documents with their in-degree. Every node has exactly [[OutDeg]]
    * out-links so no dangling-mass correction is needed and the rank mass
    * is conserved at 1 (asserted in GraphRankSpec on the full vector). */
  private val pageRank = QueryDef(
    "g7_pagerank",
    (s, dir) => {
      val r = fullRanks(s, dir)
      r.orderBy(col("pagerank").desc, col("doc_id").asc).limit(20)
    },
    Some {
      val nib = nibbleValSql(1, 8)
      // unrolled power iteration: s_k = per-node contribution sum over the
      // edge table, r_k = teleport + damped sum (same snap/exact-sum
      // algebra as the Spark side)
      val iters = (1 to Iters).map { k =>
        s"""s$k AS (SELECT e.dst AS v, ${ExactAgg.sqlSumR(
             s"r${k - 1}.pr / ${OutDeg}e0")} AS sm
          FROM ed e JOIN r${k - 1} ON r${k - 1}.v = e.src GROUP BY 1),
        r$k AS (SELECT d.doc_id AS v, ${ExactAgg.sqlSnap(
             s"${Teleport}e0 / nn.nd + ${Damping}e0 * COALESCE(s$k.sm, 0e0)")}
            AS pr
          FROM documents d CROSS JOIN nn LEFT JOIN s$k ON s$k.v = d.doc_id)"""
      }.mkString(",\n      ")
      s"""WITH nn AS (SELECT COUNT(*) AS nd FROM documents),
      hh AS (SELECT doc_id,
          md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS h
        FROM documents, LATERAL unnest([${(0 until OutDeg).mkString(", ")}])
          AS jj(j)),
      ed AS (SELECT doc_id AS src, $nib % nn.nd AS dst FROM hh, nn),
      r0 AS (SELECT doc_id AS v, CAST(1 AS DOUBLE) / nn.nd AS pr
        FROM documents, nn),
      $iters,
      indeg AS (SELECT dst AS v, COUNT(*) AS in_degree FROM ed GROUP BY 1)
      SELECT r.v AS doc_id, r.pr AS pagerank,
        COALESCE(i.in_degree, 0) AS in_degree
      FROM r$Iters r LEFT JOIN indeg i ON i.v = r.v
      ORDER BY pagerank DESC, doc_id ASC LIMIT 20"""
    })

  /** The full rank vector after [[Iters]] iterations — the query reads its
    * top-20; GraphRankSpec asserts mass conservation on the whole vector. */
  private[graft] def fullRanks(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val nn = docs.agg(count(lit(1)).as("nd"))
    val edges = docs
      .withColumn("j", explode(array((0 until OutDeg).map(lit(_)): _*)))
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":"),
        col("j").cast("string"))))
      .crossJoin(broadcast(nn))
      .select(col("doc_id").as("src"),
        (expr(nibbleVal(1, 8)) % col("nd")).as("dst"))
    var r = docs.crossJoin(broadcast(nn))
      .select(col("doc_id").as("v"), (lit(1.0) / col("nd")).as("pr"))
    for (_ <- 1 to Iters) {
      val summed = edges.join(r, edges("src") === r("v"))
        .select(col("dst").as("v"),
          (col("pr") / OutDeg).as("cst"))
        .groupBy("v").agg(ExactAgg.dsumR(col("cst")).as("sm"))
      r = docs.select(col("doc_id").as("v"))
        .join(summed, Seq("v"), "left")
        .crossJoin(broadcast(nn))
        .select(col("v"), ExactAgg.snap(lit(Teleport) / col("nd") +
          lit(Damping) * coalesce(col("sm"), lit(0.0))).as("pr"))
    }
    val indeg = edges.groupBy("dst").agg(count(lit(1)).as("in_degree"))
      .withColumnRenamed("dst", "v")
    r.join(indeg, Seq("v"), "left")
      .select(col("v").as("doc_id"), col("pr").as("pagerank"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
