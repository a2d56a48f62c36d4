package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.ops.TopK
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY-adjacent: the
  * training-data ANN path).
  *
  * Two tiers:
  *   - `s1_ann_bruteforce`: exact cosine top-k for a query subset — the
  *     correctness baseline. The query set (small by construction) is
  *     broadcast against the corpus; dot products and norms are per-row
  *     array folds (`zip_with` + `aggregate`) — the corpus is NEVER
  *     exploded or shuffled, the only shuffles are the two top-k phases.
  *   - `s2_ann_lsh`: random-hyperplane (sign-LSH) bucketing — signatures
  *     are computed per-row with array folds (zero shuffle), buckets come
  *     out of one tiny rollup. Hyperplane weights derive from md5
  *     (portable, seedless).
  *
  * Exactness: element products are computed in DOUBLE (deterministic per
  * element), then cast to DECIMAL(30,20) and summed exactly — decimal
  * addition is associative/commutative so any fold order gives the same
  * bits, and precision 30 < 38 leaves headroom so Spark's decimal-add
  * promotion never drops a digit of scale inside the fold. The oracle's
  * SUM(CAST(.. AS DECIMAL(38,20))) computes the identical value.
  *
  * At 100 TB: both queries are a single linear scan of the corpus plus
  * small-key shuffles — the brute-force Q×N pair stream exists only as a
  * broadcast nested-loop over the tiny query side, never as a shuffled
  * Q×N×D element join.
  */
object SimilarityOps extends QueryModule {

  private val NumQueries = 30
  private val NumPlanes = 8
  private val K = 5
  private val TopKSalt = 64

  def defs: Seq[QueryDef] = Seq(s1BruteForce, s2AnnLsh)

  /** Exact decimal fold of `elemExpr` (a SQL lambda-element expression in
    * DECIMAL(30,20)) over arrays — Σ is order-independent. */
  private def decSum(arrExpr: String): Column =
    expr(s"""CAST(aggregate($arrExpr, CAST(0 AS DECIMAL(30,20)),
      (acc, x) -> CAST(acc + x AS DECIMAL(30,20))) AS DOUBLE)""")

  /** Per-row squared-norm fold: Σ x². */
  private def normCol(embCol: String): Column =
    sqrt(decSum(s"""transform($embCol,
      a -> CAST(CAST(a AS DOUBLE) * CAST(a AS DOUBLE) AS DECIMAL(30,20)))"""))

  /** Per-row dot-product fold of two embedding arrays: Σ aᵢ·bᵢ. */
  private def dotCol(aCol: String, bCol: String): Column =
    decSum(s"""zip_with($aCol, $bCol,
      (a, b) -> CAST(CAST(a AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(30,20)))""")

  private val s1BruteForce = QueryDef(
    "s1_ann_bruteforce",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          normCol("embedding").as("qn"))
      val corpus = emb.filter(col("vec_id") >= NumQueries)
        .select(col("vec_id").as("c_id"), col("embedding"),
          normCol("embedding").as("cn"))
      val cos = corpus.crossJoin(broadcast(q))
        .select(col("q_id"), col("c_id"),
          (dotCol("q_emb", "embedding") / (col("qn") * col("cn"))).as("cos_sim"))
      // Two-phase top-k: rank within (q_id, salt) first so no single task
      // ever sorts a whole query's candidate list, then rank the ≤salt·K
      // survivors exactly.
      val local = TopK.perGroup(cos.withColumn("salt", pmod(col("c_id"), lit(TopKSalt))),
          Seq("q_id", "salt"),
          Seq(col("cos_sim").desc, col("c_id").asc), K, rankCol = "rank_local")
        .drop("rank_local", "salt")
      TopK.perGroup(local, Seq("q_id"), Seq(col("cos_sim").desc, col("c_id").asc), K)
        .select("q_id", "rank", "c_id", "cos_sim")
        .orderBy("q_id", "rank")
    },
    // DuckDB's DECIMAL→DOUBLE cast divides by 10^scale in floating point and
    // can be 1 ulp off the correctly-rounded value (Spark's cast is exact),
    // so the oracle converts through VARCHAR — DuckDB's string→double parse
    // IS correctly rounded, making both engines bit-identical.
    Some(s"""WITH el AS (
        SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                unnest(generate_series(1, len(embedding))) AS pos
              FROM embeddings)),
      nrm AS (SELECT vec_id,
                SQRT(CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,20))) AS VARCHAR) AS DOUBLE)) AS norm
              FROM el GROUP BY 1),
      dots AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          CAST(CAST(SUM(CAST(q.x * c.x AS DECIMAL(38,20))) AS VARCHAR) AS DOUBLE) AS dot
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
    * ±1-weighted projections, folded per-row over the embedding array (no
    * explode, no shuffle); report bucket occupancy (the candidate structure
    * an ANN probe would join against). */
  private val s2AnnLsh = QueryDef(
    "s2_ann_lsh",
    (s, dir) => {
      val planes = (0 until NumPlanes).map { h =>
        decSum(s"""zip_with(embedding, sequence(1, size(embedding)),
          (a, pos) -> CAST(CASE
            WHEN substring(md5(concat('$h:', pos)), 1, 1) >= '8'
            THEN CAST(a AS DOUBLE) ELSE -CAST(a AS DOUBLE)
          END AS DECIMAL(30,20)))""").as(s"p$h")
      }
      val bits = (0 until NumPlanes).map(h => when(col(s"p$h") > 0, "1").otherwise("0"))
      Tables.embeddings(s, dir)
        .select(col("vec_id") +: planes: _*)
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
          SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS x
          FROM (SELECT vec_id, embedding,
                  unnest(generate_series(1, len(embedding))) AS pos
                FROM embeddings)),
        proj AS (SELECT vec_id, $sums FROM el GROUP BY 1),
        sigs AS (SELECT vec_id, $bits AS sig FROM proj)
        SELECT sig, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec
        FROM sigs GROUP BY 1 ORDER BY 1"""
    })
}
