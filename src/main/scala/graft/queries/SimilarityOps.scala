package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.ops.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over the embedding column (SURVEY-adjacent: the
  * training-data ANN path).
  *
  * Two tiers:
  *   - `s1_ann_bruteforce`: exact cosine top-k for a query subset — the
  *     correctness baseline. Dot products are computed as DECIMAL sums of
  *     per-element double products, so Spark and the DuckDB oracle agree
  *     bit-for-bit and the top-k ordering is total (cosine desc, id asc).
  *   - `s2_ann_lsh`: random-hyperplane (sign-LSH) bucketing — the scale
  *     path: signatures are a linear scan; candidates come from bucket
  *     equi-joins instead of the O(n²) product. Hyperplane weights derive
  *     from md5 (portable, seedless).
  *
  * At 100 TB: brute force only ever runs query-side (small) × corpus with
  * the corpus streamed per-partition; LSH turns the pair space into
  * bucket-local joins. Both shapes shuffle on compact keys, never on the
  * vectors themselves.
  */
object SimilarityOps extends QueryModule {

  private val Dim = 64
  private val NumQueries = 30
  private val NumPlanes = 8
  private val K = 5

  def defs: Seq[QueryDef] = Seq(s1BruteForce, s2AnnLsh)

  /** (vec_id, pos, x): exploded elements, x as double (exact float widen).
    * pos is 1-based to match the oracle's generate_series(1, dim) — it feeds
    * the md5-derived LSH weights, so both engines must see identical values. */
  private def elems(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "xf")))
      .select(col("vec_id"), (col("pos0") + 1).as("pos"), col("xf").cast("double").as("x"))

  /** Per-vector L2 norm via exact decimal sum of squares. */
  private def norms(el: DataFrame): DataFrame =
    el.groupBy("vec_id")
      .agg(sqrt(sum((col("x") * col("x")).cast(DecimalType(38, 20))).cast("double")).as("norm"))

  private val s1BruteForce = QueryDef(
    "s1_ann_bruteforce",
    (s, dir) => {
      val el = elems(s, dir)
      val nrm = norms(el)
      val q = el.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("pos"), col("x").as("qx"))
      val dots = q.join(el.filter(col("vec_id") >= NumQueries)
            .select(col("vec_id").as("c_id"), col("pos"), col("x").as("cx")), Seq("pos"))
        .groupBy("q_id", "c_id")
        .agg(sum((col("qx") * col("cx")).cast(DecimalType(38, 20))).cast("double").as("dot"))
      val cos = dots
        .join(nrm.select(col("vec_id").as("q_id"), col("norm").as("qn")), Seq("q_id"))
        .join(nrm.select(col("vec_id").as("c_id"), col("norm").as("cn")), Seq("c_id"))
        .select(col("q_id"), col("c_id"), (col("dot") / (col("qn") * col("cn"))).as("cos_sim"))
      TopK.perGroup(cos, Seq("q_id"), Seq(col("cos_sim").desc, col("c_id").asc), K)
        .select("q_id", "rank", "c_id", "cos_sim")
        .orderBy("q_id", "rank")
    },
    Some(s"""WITH el AS (
        SELECT vec_id, p.pos AS pos, CAST(embedding[p.pos] AS DOUBLE) AS x
        FROM embeddings, (SELECT unnest(generate_series(1, $Dim)) AS pos) p),
      nrm AS (SELECT vec_id, SQRT(CAST(SUM(CAST(x * x AS DECIMAL(38,20))) AS DOUBLE)) AS norm
              FROM el GROUP BY 1),
      dots AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          CAST(SUM(CAST(q.x * c.x AS DECIMAL(38,20))) AS DOUBLE) AS dot
        FROM el q JOIN el c ON q.pos = c.pos
        WHERE q.vec_id < $NumQueries AND c.vec_id >= $NumQueries
        GROUP BY 1, 2),
      cos AS (
        SELECT q_id, c_id, dot / (qn.norm * cn.norm) AS cos_sim
        FROM dots
        JOIN nrm qn ON qn.vec_id = q_id
        JOIN nrm cn ON cn.vec_id = c_id)
      SELECT q_id, rank, c_id, cos_sim FROM (
        SELECT q_id, c_id, cos_sim, CAST(ROW_NUMBER() OVER (
          PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC) AS INT) AS rank
        FROM cos)
      WHERE rank <= $K ORDER BY q_id, rank"""))

  /** Sign-LSH bucketing: signature = sign bits of $NumPlanes md5-derived
    * ±1-weighted projections; report bucket occupancy (the candidate
    * structure an ANN probe would join against). */
  private val s2AnnLsh = QueryDef(
    "s2_ann_lsh",
    (s, dir) => {
      val el = elems(s, dir)
      val planes = (0 until NumPlanes).map { h =>
        sum(when(substring(md5(concat(lit(s"$h:"), col("pos"))), 1, 1) >= "8",
          col("x")).otherwise(-col("x")).cast(DecimalType(38, 20))).as(s"p$h")
      }
      val bits = (0 until NumPlanes).map(h => when(col(s"p$h") > 0, "1").otherwise("0"))
      el.groupBy("vec_id")
        .agg(planes.head, planes.tail: _*)
        .select(col("vec_id"), concat(bits: _*).as("sig"))
        .groupBy("sig")
        .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
        .orderBy("sig")
    },
    Some {
      val sums = (0 until NumPlanes).map(h =>
        s"SUM(CAST(CASE WHEN substring(md5('$h:' || pos), 1, 1) >= '8' THEN x ELSE -x END AS DECIMAL(38,20))) AS p$h")
        .mkString(", ")
      val bits = (0 until NumPlanes)
        .map(h => s"CASE WHEN p$h > 0 THEN '1' ELSE '0' END").mkString(" || ")
      s"""WITH el AS (
          SELECT vec_id, p.pos AS pos, CAST(embedding[p.pos] AS DOUBLE) AS x
          FROM embeddings, (SELECT unnest(generate_series(1, $Dim)) AS pos) p),
        proj AS (SELECT vec_id, $sums FROM el GROUP BY 1),
        sigs AS (SELECT vec_id, $bits AS sig FROM proj)
        SELECT sig, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec
        FROM sigs GROUP BY 1 ORDER BY 1"""
    })
}
