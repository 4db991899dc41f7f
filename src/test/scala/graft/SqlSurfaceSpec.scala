package graft

import org.apache.spark.sql.functions._

import graft.vector.VectorOps

/** The SQL surface: custom expressions registered via GraftExtensions
  * must be callable from spark.sql and agree with the Column API. */
class SqlSurfaceSpec extends SparkSpec {

  test("cos_sim / sorted_intersect_count / minhash_signature via spark.sql") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
      .createOrReplaceTempView("emb")

    val sqlSims = spark.sql(
      """SELECT e.vec_id, round(cos_sim(e.embedding, q.embedding), 6) AS sim
        |FROM emb e, (SELECT embedding FROM emb WHERE vec_id = 0) q
        |ORDER BY vec_id""".stripMargin).collect()
    val colSims = {
      val e = spark.table("emb")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      e.crossJoin(broadcast(q))
        .select(col("vec_id"), VectorOps.cosine6(col("embedding"), col("qvec")).as("sim"))
        .orderBy(col("vec_id")).collect()
    }
    assert(sqlSims.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      colSims.map(r => (r.getLong(0), r.getDouble(1))).toSeq)

    val ic = spark.sql(
      "SELECT sorted_intersect_count(array(1L,2L,5L,9L), array(2L,3L,5L,7L,9L)) AS c")
      .head().getLong(0)
    assert(ic == 3L)

    val jac = spark.sql(
      "SELECT sorted_jaccard(array(1L,2L,5L,9L), array(2L,3L,5L,7L,9L)) AS j")
      .head().getDouble(0)
    assert(math.abs(jac - 3.0 / 6.0) < 1e-12)

    val sig = spark.sql(
      "SELECT minhash_signature(array(42L, 7L, 99L), 8) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 8)
    val sig2 = spark.sql(
      "SELECT minhash_signature(array(99L, 42L, 7L), 8) AS s")
      .head().getSeq[Long](0)
    assert(sig == sig2) // set semantics: order-independent
  }

  test("vector_avg and simhash64 via spark.sql") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
      .createOrReplaceTempView("emb_va")
    val avg0 = spark.sql(
      "SELECT label, vector_avg(embedding) AS c FROM emb_va GROUP BY label ORDER BY label")
      .collect()
    assert(avg0.nonEmpty && avg0.forall(_.getSeq[Double](1).size == 64))
    val sh = spark.sql("SELECT simhash64('hello world hello') AS h").head().getLong(0)
    assert(sh != 0L)
  }

  test("minhash_signature: empty input -> null") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT minhash_signature(cast(array() as array<bigint>), 4) AS s").head()
    assert(r.isNullAt(0))
  }

  test("chunk_text generator matches the Column-API chunker row-for-row") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((0L, "abcdefghij"), (1L, ""), (2L, "xyz"),
        (3L, null.asInstanceOf[String]), (4L, "naïve ✓ façade row"))
      .toDF("doc_id", "text").createOrReplaceTempView("ct_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, c.pos, c.chunk
        |FROM ct_docs LATERAL VIEW chunk_text(text, 4, 1) c AS pos, chunk
        |ORDER BY doc_id, pos""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val viaCol = graft.text.Chunker.chunk(spark.table("ct_docs"), "text", 4, 1)
      .select(col("doc_id"), col("pos"), col("chunk"))
      .orderBy(col("doc_id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(viaSql == viaCol)
    assert(viaSql.exists(_._1 == 4L)) // non-ASCII text chunks too
    assert(!viaSql.exists(r => r._1 == 1L || r._1 == 3L)) // empty/null → 0 rows
  }

  test("end-to-end SQL retrieval: chunk → featurize → score → top-5, no Column API") {
    // the full ingest→retrieve path a SQL-only user runs; must agree
    // with the Column-API pipeline on the same corpus
    val viaSql = SparkEntry.queries("sql_retrieval_top5")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaSql.size == 5)
    assert(viaSql.map(_._3) == viaSql.map(_._3).sorted.reverse, "descending by sim")
    import spark.implicits._
    val qdf = Seq(Tuple1(graft.embed.Featurizer
      .featurizeCountsText("how does the engine scan tables", 64))).toDF("qvec")
    val ch = graft.text.Chunker
      .chunk(graft.io.Tables.documents(spark, sf0001), "text", 100, 20)
      .filter(graft.text.Chunker.nonEmpty(col("chunk")))
      .withColumn("cvec", graft.embed.Featurizer.featurizeCounts(64)(col("chunk")))
    val viaCol = ch.crossJoin(broadcast(qdf))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        VectorOps.cosine6(col("cvec"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("doc_id").asc, col("pos").asc).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaSql == viaCol, s"sql $viaSql != column $viaCol")
  }

  test("dot_product / l2_normalize / featurize / pdf_extract via spark.sql") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT dot_product(array(3.0D, 4.0D), array(4.0D, 3.0D)) AS d").head().getDouble(0)
    assert(dot == 24.0)
    val norm = spark.sql(
      "SELECT l2_normalize(array(3.0D, 4.0D)) AS v").head().getSeq[Double](0)
    assert(math.abs(norm(0) - 0.6) < 1e-12 && math.abs(norm(1) - 0.8) < 1e-12)
    // normalized-dot identity, entirely in SQL
    val one = spark.sql(
      """SELECT round(dot_product(l2_normalize(array(1.0D, 2.0D, 2.0D)),
        |                         l2_normalize(array(1.0D, 2.0D, 2.0D))), 6) AS s"""
        .stripMargin).head().getDouble(0)
    assert(one == 1.0)
    val fc = spark.sql("SELECT featurize_counts('a b a', 8) AS v").head().getSeq[Double](0)
    assert(fc.size == 8 && fc.sum == 3.0) // raw counts: 3 tokens
    val fn = spark.sql("SELECT featurize('a b a', 8) AS v").head().getSeq[Double](0)
    assert(math.abs(math.sqrt(fn.map(x => x * x).sum) - 1.0) < 1e-12) // normalized
    // pdf_extract: non-PDF bytes -> empty string, null -> null
    val bad = spark.sql("SELECT pdf_extract(encode('nope', 'UTF-8')) AS t").head().getString(0)
    assert(bad == "")
    assert(spark.sql("SELECT pdf_extract(cast(null AS BINARY)) AS t").head().isNullAt(0))
  }
}
