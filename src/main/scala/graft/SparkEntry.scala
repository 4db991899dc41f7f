package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.search.Search
import graft.vector.VectorOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is a named entry in
  * `queries` with matching DuckDB SQL in `oracleSql`. Column names are
  * aliased identically on both sides (the driver sorts columns by name
  * before hashing). All float outputs are rounded to absorb
  * reduction-order drift; every query has a total order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end retrieval heart (`/root/reference/services/vectorDb.ts:11-24`):
    * top-5 nearest neighbours of vector 0 over the embeddings corpus. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_top5")(spark, "/root/testdata/sf0.001")

  /** The query vector: embedding of vec_id = 0, as a 1-row frame with
    * column `qvec` (broadcast by the search operators). */
  private def queryVec(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A9/A10/A11: cosine scoring + brute-force kNN top-k + projection
    "knn_top5" -> ((s, dir) => {
      Search.knn(Tables.embeddings(s, dir), queryVec(s, dir), 5)
        .select(col("vec_id"), col("sim"))
    }),
    // cosine over every row (scoring pass alone, deterministic order)
    "cosine_scores" -> ((s, dir) => {
      Tables.embeddings(s, dir).crossJoin(broadcast(queryVec(s, dir)))
        .select(col("vec_id"), VectorOps.cosine6(col("embedding"), col("qvec")).as("sim"))
        .orderBy(col("vec_id"))
    }),
    // ---- A8: append/union (incremental add, `vectorDb.ts:7-9`)
    "append_union" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val lo = e.filter(col("label") < 5)
      val hi = e.filter(col("label") >= 5)
      lo.unionByName(hi).groupBy(col("label")).agg(count("*").as("n"))
        .orderBy(col("label"))
    }),
    // ---- readiness predicate (`vectorDb.ts:58-60`): count > 0
    "readiness" -> ((s, dir) => {
      Tables.embeddings(s, dir).agg(count("*").as("n"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "knn_top5" ->
      """SELECT vec_id, sim FROM (
        |  SELECT e.vec_id,
        |         round(list_dot_product(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) /
        |               (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |                sqrt(list_dot_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[]))), 6) AS sim
        |  FROM embeddings e,
        |       (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q)
        |ORDER BY sim DESC, vec_id ASC LIMIT 5""".stripMargin,
    "cosine_scores" ->
      """SELECT e.vec_id,
        |       round(list_dot_product(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) /
        |             (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |              sqrt(list_dot_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[]))), 6) AS sim
        |FROM embeddings e,
        |     (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0) q
        |ORDER BY e.vec_id""".stripMargin,
    "append_union" ->
      """SELECT label, count(*) AS n FROM (
        |  SELECT * FROM embeddings WHERE label < 5
        |  UNION ALL
        |  SELECT * FROM embeddings WHERE label >= 5)
        |GROUP BY label ORDER BY label""".stripMargin,
    "readiness" -> "SELECT count(*) AS n FROM embeddings",
  )
}
