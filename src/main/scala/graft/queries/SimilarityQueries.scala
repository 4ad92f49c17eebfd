package graft.queries

import graft.similarity.Similarity
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search query surface over `embeddings` (SURVEY.md §2.D).
  * Query set = every 50th vector (deterministic, scales with the
  * table); corpus = the full table. */
object SimilarityQueries {
  val K = 10
  val Dim = 64

  private def embs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  private def asIdVec(df: DataFrame): DataFrame =
    df.select(col("vec_id").as("id"), col("embedding").as("vec"))

  def queriesDf(spark: SparkSession, dir: String): DataFrame =
    asIdVec(embs(spark, dir).filter(col("vec_id") % 50 === 0))

  def annBruteforceTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(queriesDf(spark, dir), asIdVec(embs(spark, dir)), K)

  def annLshTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(queriesDf(spark, dir), asIdVec(embs(spark, dir)), K, Dim)

  def annIvfTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(queriesDf(spark, dir), asIdVec(embs(spark, dir)), K)

  def annPqTopk(spark: SparkSession, dir: String): DataFrame =
    graft.similarity.Pq.pqTopK(queriesDf(spark, dir), asIdVec(embs(spark, dir)), K, Dim)

  def annIvfPqTopk(spark: SparkSession, dir: String): DataFrame =
    graft.similarity.Pq.ivfPqTopK(queriesDf(spark, dir), asIdVec(embs(spark, dir)), K, Dim)

  def knnLabelVote(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embs(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    Similarity.knnLabelVote(queriesDf(spark, dir), corpus, K)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce_topk" -> (annBruteforceTopk _),
    "ann_lsh_topk" -> (annLshTopk _),
    "ann_ivf_topk" -> (annIvfTopk _),
    "ann_pq_topk" -> (annPqTopk _),
    "ann_ivfpq_topk" -> (annIvfPqTopk _),
    "knn_label_vote" -> (knnLabelVote _))

  /** Left-fold cosine identical to VectorFunctions.dot/norm (see
    * DedupQueries for the list_reduce rationale). */
  private val cosineSql =
    """list_reduce(list_transform(list_zip(q.embedding, c.embedding),
      |       z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (x, y) -> x + y)
      | / (sqrt(list_reduce(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
      |  * sqrt(list_reduce(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)))""".stripMargin

  private val knnSql =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $cosineSql AS cosine
       |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
       |  WHERE q.vec_id % 50 = 0),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= $K""".stripMargin

  val oracles: Map[String, String] = Map(
    "ann_bruteforce_topk" -> knnSql,
    "knn_label_vote" ->
      s"""WITH nn AS ($knnSql),
         |votes AS (
         |  SELECT nn.query_id, e.label, count(*) AS votes
         |  FROM nn JOIN embeddings e ON nn.neighbor_id = e.vec_id
         |  GROUP BY nn.query_id, e.label),
         |best AS (
         |  SELECT query_id, label, votes,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY votes DESC, label) AS rk
         |  FROM votes)
         |SELECT query_id, label AS predicted_label, votes
         |FROM best WHERE rk = 1""".stripMargin)
}
