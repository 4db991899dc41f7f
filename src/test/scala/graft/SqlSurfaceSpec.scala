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

  test("random_project via spark.sql matches the Column API") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf0001/embeddings.parquet").limit(20)
      .createOrReplaceTempView("emb_rp")
    val viaSql = spark.sql(
      "SELECT random_project(embedding, 64, 16) AS p FROM emb_rp ORDER BY vec_id")
      .collect().map(_.getSeq[Double](0))
    val viaCol = spark.table("emb_rp")
      .select(graft.vector.VectorOps.randomProject(col("embedding"),
        graft.vector.VectorOps.rpSigns(64, 16)).as("p"))
      .orderBy(col("vec_id")).collect().map(_.getSeq[Double](0))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("zvalue via spark.sql matches the Column API and hand Morton codes") {
    GraftExtensions.register(spark)
    val z = spark.sql("SELECT zvalue(2L, 1L, 4) AS z, zvalue(3L, 3L, 2) AS z2").head()
    assert(z.getLong(0) == 6L && z.getLong(1) == 15L)
    import spark.implicits._
    val viaCol = Seq((7L, 5L)).toDF("x", "y")
      .select(graft.store.ZOrder.zValue(col("x"), col("y"), 8)).head().getLong(0)
    Seq((7L, 5L)).toDF("x", "y").createOrReplaceTempView("zv_t")
    val viaSql = spark.sql("SELECT zvalue(x, y, 8) FROM zv_t").head().getLong(0)
    assert(viaCol == viaSql)
    // hilbert_index: the bits=1 classics, SQL ≡ Column kernel, int args cast
    val h = spark.sql(
      "SELECT hilbert_index(1L, 0L, 1) AS a, hilbert_index(1, 1, 1) AS b")
      .head()
    assert(h.getLong(0) == 3L && h.getLong(1) == 2L)
    val hCol = Seq((9L, 4L)).toDF("x", "y")
      .select(graft.store.Hilbert.hValue(col("x"), col("y"), 5)).head().getLong(0)
    val hSql = spark.sql("SELECT hilbert_index(9L, 4L, 5)").head().getLong(0)
    assert(hCol == hSql)
  }

  test("nfc_normalize: composes decomposed text, identity on NFC, null-safe, via SQL") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = Seq((0L, "café"), (1L, "café"), (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    val out = rows.select(col("id"), graft.functions.NfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    assert(out(0L).contains("café"), "decomposed must compose")
    assert(out(1L).contains("café"))
    assert(out(2L).contains(""))
    assert(out(3L).isEmpty)
    // NFC at ingest makes exact-dedup hashes agree across source
    // encodings (chars embedded directly: Spark SQL's chr() is
    // byte-level, not code-point like DuckDB's)
    val viaSql = spark.sql(
      "SELECT md5(nfc_normalize('café')) = md5(nfc_normalize('café')) AS eq")
      .head().getBoolean(0)
    assert(viaSql, "composed and decomposed forms must hash identically after NFC")
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

  test("end-to-end SQL dedup: minhash LSH banding + exact jaccard rerank, no Column API") {
    // the dedup pipeline a SQL-only user runs from the registered
    // primitives: shingle → minhash → band self-join → exact rerank
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf0001/documents.parquet")
      .createOrReplaceTempView("dd_docs")
    val viaSql = spark.sql(
      """WITH sig AS (
        |  SELECT doc_id, minhash_signature(token_shingle_hashes(text, 3), 32) AS sig
        |  FROM dd_docs),
        |banded AS (
        |  SELECT doc_id, band, slice(sig, band * 4 + 1, 4) AS bandsig
        |  FROM sig LATERAL VIEW explode(sequence(0, 7)) t AS band
        |  WHERE sig IS NOT NULL),
        |cands AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id),
        |sets AS (SELECT doc_id, token_shingle_hashes(text, 3) AS ss FROM dd_docs)
        |SELECT id_a, id_b, round(sorted_jaccard(sa.ss, sb.ss), 6) AS jaccard
        |FROM cands JOIN sets sa ON cands.id_a = sa.doc_id
        |           JOIN sets sb ON cands.id_b = sb.doc_id
        |WHERE round(sorted_jaccard(sa.ss, sb.ss), 6) >= 0.7
        |ORDER BY id_a, id_b""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // same composition through the Column API
    import graft.functions.{MinHashSignature, SortedJaccard, TokenShingleHashes}
    val docs = spark.table("dd_docs")
    val sig = docs.select(col("doc_id").as("id"),
      MinHashSignature(TokenShingleHashes(col("text"), 3), 32).as("sig"))
    val banded = sig.filter(col("sig").isNotNull)
      .select(col("id"), posexplode(transform(sequence(lit(0), lit(7)),
        b => slice(col("sig"), b * 4 + lit(1), lit(4)))))
      .select(col("id"), col("pos").as("band"), col("col").as("bandsig"))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandsig") === col("b.bandsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val sets = docs.select(col("doc_id"), TokenShingleHashes(col("text"), 3).as("ss"))
    val viaCol = cands
      .join(sets.select(col("doc_id").as("id_a"), col("ss").as("sa")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("ss").as("sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(SortedJaccard(col("sa"), col("sb")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
      .orderBy(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaSql.nonEmpty, "the corpus plants near-dup pairs; SQL dedup must find some")
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
