package graft.queries

import graft.ops.ExactAgg
import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval operators — the RAG-side query surface over the corpus:
  * Okapi BM25 lexical ranking and hybrid lexical+vector fusion by
  * reciprocal-rank fusion (the document table and the embedding table
  * share ids, so both retrievers rank the same corpus).
  *
  * Scale shape: BM25's statistics (df table, avgdl) are vocabulary- and
  * scalar-sized; scoring joins the QUERY terms (a handful of rows,
  * broadcast) against the posting-list-shaped (doc, word, tf) table — the
  * corpus is never self-joined, and the per-query rollup is the only
  * corpus-sized shuffle. RRF consumes two rank columns — integers, so the
  * fusion arithmetic is exactly portable.
  */
object RetrievalOps extends QueryModule {

  def defs: Seq[QueryDef] = Seq(bm25TopK, hybridRrf)

  private val K1 = 1.2
  private val B = 0.75
  private val RrfK = 60

  /** Query documents: a fixed deterministic handful. */
  private def isQuery(c: org.apache.spark.sql.Column) = pmod(c, lit(97)) === 0

  /** (q_doc, cand, bm25) — snapped BM25 score of every candidate document
    * for every query document (candidates sharing ≥1 term; q itself
    * excluded). rt1 ranks it and rt2 fuses it with the vector ranking, so
    * the corpus-sized tf/df build runs ONCE per (JVM, dir) and both
    * consumers read the compact score table — the d4 verified-edge
    * persisted-intermediate pattern (a narrow derived table, not a cached
    * full-width scan, so column pruning is unaffected). */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    import graft.domain.ChainFixture
    ChainFixture.materializeWith(s,
      s"${ChainFixture.matRoot(s)}_bm25_${ChainFixture.dirKey(dir)}")(
      p => computeBm25Scores(s, dir).write.mode("overwrite").parquet(p))
  }

  private def computeBm25Scores(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dl = Tables.documents(s, dir)
      .select(col("doc_id").as("dl_doc"),
        size(split(col("text"), " ")).cast("double").as("dl"))
    val stats = Tables.documents(s, dir)
      .agg(count(lit(1)).as("n"),
        ExactAgg.snap(ExactAgg.dsum(size(split(col("text"), " ")).cast("double"))
          / count(lit(1))).as("avgdl"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val qterms = tf.filter(isQuery(col("doc_id")))
      .select(col("doc_id").as("q_doc"), col("word")).distinct()
    qterms
      .join(tf.withColumnRenamed("doc_id", "cand"), Seq("word"))
      .filter(col("cand") =!= col("q_doc"))
      .join(df, Seq("word"))
      .join(dl, col("cand") === col("dl_doc"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(
        (col("n") - col("df") + 0.5e0) / (col("df") + 0.5e0) + 1.0e0))
      .withColumn("term_score",
        col("idf") * (col("tf") * (K1 + 1.0e0)) /
          (col("tf") + lit(K1) * (lit(1.0e0 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy("q_doc", "cand")
      .agg(ExactAgg.dsumR(col("term_score")).as("bm25"))
  }

  /** Oracle CTEs ending in `bm` = (q_doc, cand, bm25) — the SQL
    * restatement of [[bm25Scores]]. */
  private def bm25Sql: String = {
    import ExactAgg.{sqlSnap, sqlSum, sqlSumR}
    s"""tf AS (SELECT doc_id, wo.word AS word, COUNT(*) AS tf
      FROM documents, LATERAL unnest(string_split(text,' ')) AS wo(word)
      GROUP BY 1, 2),
    dl AS (SELECT doc_id AS dl_doc,
        CAST(len(string_split(text,' ')) AS DOUBLE) AS dl
      FROM documents),
    stats AS (SELECT COUNT(*) AS n,
        ${sqlSnap(s"${sqlSum("CAST(len(string_split(text,' ')) AS DOUBLE)")} / COUNT(*)")}
          AS avgdl
      FROM documents),
    dfT AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
    qt AS (SELECT DISTINCT doc_id AS q_doc, word FROM tf
           WHERE doc_id % 97 = 0),
    bm AS (
      SELECT q.q_doc, t.doc_id AS cand,
        ${sqlSumR(s"""ln((n - df + 0.5e0) / (df + 0.5e0) + 1.0e0)
          * (tf * ($K1 + 1.0e0))
          / (tf + $K1 * (1.0e0 - $B + $B * dl / avgdl))""")} AS bm25
      FROM qt q
      JOIN tf t ON t.word = q.word AND t.doc_id <> q.q_doc
      JOIN dfT ON dfT.word = t.word
      JOIN dl ON dl.dl_doc = t.doc_id
      CROSS JOIN stats
      GROUP BY 1, 2)"""
  }

  /** RT1: Okapi BM25 top-k — the lexical retriever: score every candidate
    * for each query document (k1 = 1.2, b = 0.75, positive idf), keep the
    * top 3 by (snapped score desc, id asc). Scores are snapped BEFORE
    * ranking so the order is engine-identical. */
  private val bm25TopK = QueryDef(
    "rt1_bm25_topk",
    (s, dir) => {
      bm25Scores(s, dir)
        .withColumn("rank", row_number().over(Window.partitionBy("q_doc")
          .orderBy(col("bm25").desc, col("cand").asc)))
        .filter(col("rank") <= 3)
        .select(col("q_doc"), col("rank").cast("long").as("rank"),
          col("cand"), col("bm25"))
        .orderBy("q_doc", "rank")
    },
    Some(s"""WITH $bm25Sql
      SELECT q_doc, CAST(rank AS BIGINT) AS rank, cand, bm25 FROM (
        SELECT q_doc, cand, bm25, ROW_NUMBER() OVER (
          PARTITION BY q_doc ORDER BY bm25 DESC, cand ASC) AS rank
        FROM bm)
      WHERE rank <= 3 ORDER BY q_doc, rank"""))

  /** RT2: hybrid retrieval by reciprocal-rank fusion (Cormack et al.) —
    * fuse the BM25 ranking with the embedding-cosine ranking of the SAME
    * corpus (documents and vectors share ids): score = 1/(60 + r_lex)
    * + 1/(60 + r_vec) over the intersection of both candidate sets. Ranks
    * are integers, so the fusion arithmetic is exactly portable; cosine
    * ranks order by the snapped cosine. */
  private val hybridRrf = QueryDef(
    "rt2_hybrid_rrf",
    (s, dir) => {
      val lex = bm25Scores(s, dir)
        .withColumn("r_lex", row_number().over(Window.partitionBy("q_doc")
          .orderBy(col("bm25").desc, col("cand").asc)))
        .select("q_doc", "cand", "r_lex")
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .withColumn("nrm", sqrt(expr(
          "aggregate(transform(emb, x -> x * x), 0D, (acc, x) -> acc + x)")))
      val q = emb.filter(isQuery(col("vec_id")))
        .select(col("vec_id").as("q_doc"), col("emb").as("q_emb"),
          col("nrm").as("qn"))
      val vec = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_doc"))
        .withColumn("cos", ExactAgg.snap(
          expr("aggregate(zip_with(q_emb, emb, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
            / (col("qn") * col("nrm"))))
        .withColumn("r_vec", row_number().over(Window.partitionBy("q_doc")
          .orderBy(col("cos").desc, col("vec_id").asc)))
        .select(col("q_doc"), col("vec_id").as("cand"), col("r_vec"))
      lex.join(vec, Seq("q_doc", "cand"))
        .withColumn("rrf",
          lit(1.0e0) / (col("r_lex") + lit(RrfK.toDouble)) +
            lit(1.0e0) / (col("r_vec") + lit(RrfK.toDouble)))
        .withColumn("rank", row_number().over(Window.partitionBy("q_doc")
          .orderBy(col("rrf").desc, col("cand").asc)))
        .filter(col("rank") <= 3)
        .select(col("q_doc"), col("rank").cast("long").as("rank"), col("cand"),
          col("rrf"), col("r_lex").cast("long").as("r_lex"),
          col("r_vec").cast("long").as("r_vec"))
        .orderBy("q_doc", "rank")
    },
    Some(s"""WITH $bm25Sql,
      lex AS (SELECT q_doc, cand, ROW_NUMBER() OVER (
          PARTITION BY q_doc ORDER BY bm25 DESC, cand ASC) AS r_lex
        FROM bm),
      el AS (SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                unnest(generate_series(1, len(embedding))) AS pos
              FROM embeddings)),
      nrm AS (SELECT vec_id, SQRT(SUM(x * x)) AS nrm FROM el GROUP BY 1),
      cosr AS (
        SELECT q_doc, cand, ROW_NUMBER() OVER (
            PARTITION BY q_doc ORDER BY cos DESC, cand ASC) AS r_vec
        FROM (
          SELECT q.vec_id AS q_doc, c.vec_id AS cand,
            ${ExactAgg.sqlSnap("SUM(q.x * c.x) / (MAX(nq.nrm) * MAX(nc.nrm))")}
              AS cos
          FROM el q
          JOIN el c ON c.pos = q.pos AND c.vec_id <> q.vec_id
          JOIN nrm nq ON nq.vec_id = q.vec_id
          JOIN nrm nc ON nc.vec_id = c.vec_id
          WHERE q.vec_id % 97 = 0
          GROUP BY 1, 2)),
      fused AS (
        SELECT l.q_doc, l.cand, l.r_lex, v.r_vec,
          1.0e0 / (l.r_lex + $RrfK.0e0) + 1.0e0 / (v.r_vec + $RrfK.0e0) AS rrf
        FROM lex l JOIN cosr v ON v.q_doc = l.q_doc AND v.cand = l.cand)
      SELECT q_doc, CAST(rank AS BIGINT) AS rank, cand, rrf,
        CAST(r_lex AS BIGINT) AS r_lex, CAST(r_vec AS BIGINT) AS r_vec
      FROM (SELECT q_doc, cand, rrf, r_lex, r_vec, ROW_NUMBER() OVER (
          PARTITION BY q_doc ORDER BY rrf DESC, cand ASC) AS rank
        FROM fused)
      WHERE rank <= 3 ORDER BY q_doc, rank"""))
}
