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
  * Determinism: the per-row folds run in DOUBLE with a FIXED left-to-right
  * order (Spark's `aggregate` higher-order function is a sequential fold),
  * so results are reproducible at any parallelism — the reduction order is
  * a property of the row, not the partitioning. The oracle's plain SUM may
  * associate differently; the residual is ≤ a few ulps, far inside the
  * comparison tolerance, and the double fold stays inside whole-stage
  * codegen (a decimal fold would be interpreted and ~3× slower).
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

  def defs: Seq[QueryDef] = Seq(s1BruteForce, s2AnnLsh, s3AnnIvf, s4AnnRecall)

  /** Sequential double fold of an array expression. */
  private def dblSum(arrExpr: String): Column =
    expr(s"aggregate($arrExpr, 0D, (acc, x) -> acc + x)")

  /** Per-row squared-norm fold: Σ x². */
  private def normCol(embCol: String): Column =
    sqrt(dblSum(s"""transform($embCol,
      a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE))"""))

  /** Per-row dot-product fold of two embedding arrays: Σ aᵢ·bᵢ. */
  private def dotCol(aCol: String, bCol: String): Column =
    dblSum(s"""zip_with($aCol, $bCol,
      (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE))""")

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
    Some(s"""WITH el AS (
        SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                unnest(generate_series(1, len(embedding))) AS pos
              FROM embeddings)),
      nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS norm
              FROM el GROUP BY 1),
      dots AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id, SUM(q.x * c.x) AS dot
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

  /** IVF (inverted-file) ANN — the scale path beside sign-LSH: a small
    * centroid codebook (here: 8 corpus vectors as deterministic pseudo-
    * centroids) broadcasts; every vector assigns to its max-dot centroid in
    * one linear scan (8 per-row folds); a query probes ONLY its own cell's
    * inverted list, then exact cosine ranks the cell. At 100 TB the
    * partition-by-cell layout makes each probe a partition-pruned scan. */
  private val s3AnnIvf = QueryDef(
    "s3_ann_ivf",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"), normCol("embedding").as("nrm"))
      val cents = emb.filter(col("vec_id").between(NumQueries, NumQueries + 7))
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      val assigned = emb.crossJoin(broadcast(cents))
        .withColumn("cdot", dotCol("embedding", "cent_emb"))
      val cells = TopK.perGroup(assigned, Seq("vec_id"),
          Seq(col("cdot").desc, col("cent_id").asc), 1, rankCol = "crank")
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id").as("cell"))
        .persist()
      val q = cells.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("qn"), col("cell"))
      val corpus = cells.filter(col("vec_id") >= NumQueries)
        .select(col("vec_id").as("c_id"), col("embedding"),
          col("nrm").as("cn"), col("cell").as("c_cell"))
      val cos = q.join(corpus, col("cell") === col("c_cell"))
        .select(col("q_id"), col("c_id"),
          (dotCol("q_emb", "embedding") / (col("qn") * col("cn"))).as("cos_sim"))
      TopK.perGroup(cos, Seq("q_id"), Seq(col("cos_sim").desc, col("c_id").asc), 3)
        .select("q_id", "rank", "c_id", "cos_sim")
        .orderBy("q_id", "rank")
    },
    Some(s"""WITH el AS (
        SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                unnest(generate_series(1, len(embedding))) AS pos FROM embeddings)),
      nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM el GROUP BY 1),
      cdots AS (
        SELECT v.vec_id, c.vec_id AS cent_id, SUM(v.x * c.x) AS cdot
        FROM el v JOIN el c ON v.pos = c.pos
        WHERE c.vec_id BETWEEN $NumQueries AND ${NumQueries + 7}
        GROUP BY 1, 2),
      cells AS (
        SELECT vec_id, cent_id AS cell FROM (
          SELECT vec_id, cent_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY cdot DESC, cent_id ASC) AS crank
          FROM cdots) WHERE crank = 1),
      cos AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          SUM(eq.x * ec.x) / (nq.nrm * nc.nrm) AS cos_sim
        FROM cells q
        JOIN cells c ON q.cell = c.cell
        JOIN el eq ON eq.vec_id = q.vec_id
        JOIN el ec ON ec.vec_id = c.vec_id AND ec.pos = eq.pos
        JOIN nrm nq ON nq.vec_id = q.vec_id
        JOIN nrm nc ON nc.vec_id = c.vec_id
        WHERE q.vec_id < $NumQueries AND c.vec_id >= $NumQueries
        GROUP BY 1, 2, nq.nrm, nc.nrm)
      SELECT q_id, rank, c_id, cos_sim FROM (
        SELECT q_id, c_id, cos_sim, CAST(ROW_NUMBER() OVER (
          PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC) AS INT) AS rank
        FROM cos) WHERE rank <= 3 ORDER BY q_id, rank"""))

  /** ANN retrieval-quality metric: recall@K of the IVF probe against the
    * exact brute-force top-K — the measurement every approximate index
    * ships with. Ground truth = s1's exact cosine top-K over the whole
    * corpus; retrieved = the IVF cell probe's top-K (s3's shape, widened
    * to K). recall@K = |truth ∩ retrieved| / K per query. A cell probe
    * can only MISS neighbors that fell in another cell, so recall < 1 on
    * some queries is the expected, informative outcome — not a bug. */
  private val s4AnnRecall = QueryDef(
    "s4_ann_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"), normCol("embedding").as("nrm"))
        .persist()
      // ground truth: exact top-K over the full corpus (s1's shape)
      val q = emb.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("qn"))
      val corpus = emb.filter(col("vec_id") >= NumQueries)
        .select(col("vec_id").as("c_id"), col("embedding"), col("nrm").as("cn"))
      val cosAll = corpus.crossJoin(broadcast(q))
        .select(col("q_id"), col("c_id"),
          (dotCol("q_emb", "embedding") / (col("qn") * col("cn"))).as("cos_sim"))
      val truth = TopK.perGroup(cosAll, Seq("q_id"),
          Seq(col("cos_sim").desc, col("c_id").asc), K)
        .select("q_id", "c_id")
      // retrieved: the IVF cell probe (s3's shape), widened to K
      val cents = emb.filter(col("vec_id").between(NumQueries, NumQueries + 7))
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      val assigned = emb.crossJoin(broadcast(cents))
        .withColumn("cdot", dotCol("embedding", "cent_emb"))
      val cells = TopK.perGroup(assigned, Seq("vec_id"),
          Seq(col("cdot").desc, col("cent_id").asc), 1, rankCol = "crank")
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id").as("cell"))
      val qc = cells.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("qn"), col("cell"))
      val cc = cells.filter(col("vec_id") >= NumQueries)
        .select(col("vec_id").as("c_id"), col("embedding"),
          col("nrm").as("cn"), col("cell").as("c_cell"))
      val cosIvf = qc.join(cc, col("cell") === col("c_cell"))
        .select(col("q_id"), col("c_id"),
          (dotCol("q_emb", "embedding") / (col("qn") * col("cn"))).as("cos_sim"))
      val retrieved = TopK.perGroup(cosIvf, Seq("q_id"),
          Seq(col("cos_sim").desc, col("c_id").asc), K)
        .select(col("q_id").as("r_q"), col("c_id").as("r_id"))
      truth
        .join(retrieved, col("q_id") === col("r_q") &&
          col("c_id") === col("r_id"), "left")
        .groupBy("q_id")
        .agg(sum(when(col("r_id").isNotNull, 1L).otherwise(0L)).as("n_hits"),
          (sum(when(col("r_id").isNotNull, 1L).otherwise(0L)).cast("double")
            / lit(K.toDouble)).as("recall"))
        .orderBy("q_id")
    },
    Some(s"""WITH el AS (
        SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                unnest(generate_series(1, len(embedding))) AS pos FROM embeddings)),
      nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM el GROUP BY 1),
      dots AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id, SUM(q.x * c.x) AS dot
        FROM el q JOIN el c ON q.pos = c.pos
        WHERE q.vec_id < $NumQueries AND c.vec_id >= $NumQueries
        GROUP BY 1, 2),
      cosall AS (
        SELECT q_id, c_id, dot / (qn.nrm * cn.nrm) AS cos_sim
        FROM dots JOIN nrm qn ON qn.vec_id = q_id
        JOIN nrm cn ON cn.vec_id = c_id),
      truth AS (
        SELECT q_id, c_id FROM (
          SELECT q_id, c_id, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC) AS rank
          FROM cosall) WHERE rank <= $K),
      cdots AS (
        SELECT v.vec_id, c.vec_id AS cent_id, SUM(v.x * c.x) AS cdot
        FROM el v JOIN el c ON v.pos = c.pos
        WHERE c.vec_id BETWEEN $NumQueries AND ${NumQueries + 7}
        GROUP BY 1, 2),
      cells AS (
        SELECT vec_id, cent_id AS cell FROM (
          SELECT vec_id, cent_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY cdot DESC, cent_id ASC) AS crank
          FROM cdots) WHERE crank = 1),
      retr AS (
        SELECT q_id, c_id FROM (
          SELECT q.vec_id AS q_id, c.vec_id AS c_id, ROW_NUMBER() OVER (
            PARTITION BY q.vec_id ORDER BY cs.cos_sim DESC, c.vec_id ASC) AS rank
          FROM cells q
          JOIN cells c ON q.cell = c.cell
          JOIN cosall cs ON cs.q_id = q.vec_id AND cs.c_id = c.vec_id
          WHERE q.vec_id < $NumQueries AND c.vec_id >= $NumQueries)
        WHERE rank <= $K)
      SELECT t.q_id, CAST(COUNT(r.c_id) AS BIGINT) AS n_hits,
        CAST(COUNT(r.c_id) AS DOUBLE) / ${K}.0e0 AS recall
      FROM truth t LEFT JOIN retr r ON r.q_id = t.q_id AND r.c_id = t.c_id
      GROUP BY 1 ORDER BY 1"""))

  /** Sign-LSH bucketing: signature = sign bits of $NumPlanes md5-derived
    * ±1-weighted projections, folded per-row over the embedding array (no
    * explode, no shuffle); report bucket occupancy (the candidate structure
    * an ANN probe would join against). */
  private val s2AnnLsh = QueryDef(
    "s2_ann_lsh",
    (s, dir) => {
      val planes = (0 until NumPlanes).map { h =>
        dblSum(s"""zip_with(embedding, sequence(1, size(embedding)),
          (a, pos) -> CASE
            WHEN substring(md5(concat('$h:', pos)), 1, 1) >= '8'
            THEN CAST(a AS DOUBLE) ELSE -CAST(a AS DOUBLE)
          END)""").as(s"p$h")
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
        s"SUM(CASE WHEN substring(md5('$h:' || pos), 1, 1) >= '8' THEN x ELSE -x END) AS p$h")
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
