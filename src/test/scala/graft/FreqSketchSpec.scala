package graft

import org.apache.spark.sql.functions._

import graft.analysis.FreqSketch

/** Count-min sketch: the one-sided error guarantee (estimates never
  * undercount), exactness when the geometry is collision-free,
  * cell-sum mergeability across corpus shards, and the bounded-state
  * claim (cell count <= depth*width at any input size). */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  // skewed fixture: term t0 x 32, t1 x 16, ..., t5 x 1
  private lazy val skewed = (0 to 5)
    .flatMap(i => Seq.fill(32 >> i)(s"t$i"))
    .toDF("term")

  private def exact = skewed.groupBy("term").agg(count(lit(1)).as("n"))

  test("estimates are upper bounds on the true counts (one-sided error)") {
    // deliberately tiny width => collisions are likely; est >= true must hold
    val sk = FreqSketch.sketch(skewed, "term", 2, 4)
    val joined = FreqSketch.estimate(sk, skewed, "term", 2, 4)
      .join(exact, "term").collect()
    assert(joined.length == 6)
    joined.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n"),
        s"undercount for ${r.getAs[String]("term")}: $r")
    }
  }

  test("join-size estimate: upper bound always, exact under collision-free geometry") {
    val a = Seq(1L, 1L, 1L, 2L, 2L, 3L, 7L).toDF("k")
    val b = Seq(1L, 2L, 2L, 2L, 3L, 9L).toDF("k")
    val exact = 3 * 1 + 2 * 3 + 1 * 1 // = 10 (keys 1, 2, 3; 7 and 9 match nothing)
    // tight width: collisions may only INFLATE
    val tight = FreqSketch.joinSizeEstimate(a, "k", b, "k", 3, 4)
      .head().getLong(0)
    assert(tight >= exact, s"estimate $tight must upper-bound $exact")
    // wide width: 5 distinct keys in 512 cells -> collision-free, exact
    val wide = FreqSketch.joinSizeEstimate(a, "k", b, "k", 3, 512)
      .head().getLong(0)
    assert(wide == exact, s"collision-free estimate must be exact: $wide vs $exact")
  }

  test("collision-free geometry reproduces the exact counts and ranking") {
    val got = FreqSketch.heavyHitters(skewed, "term", 3, 512, 6)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = (0 to 5).map(i => (s"t$i", (32 >> i).toLong))
    assert(got.toSeq == want, s"got ${got.toSeq}")
  }

  test("merging per-shard sketches equals the whole-corpus sketch") {
    val (a, b) = (skewed.filter(col("term") <= "t2"), skewed.filter(col("term") > "t2"))
    val merged = FreqSketch.merge(
      FreqSketch.sketch(a, "term", 3, 64), FreqSketch.sketch(b, "term", 3, 64))
    val whole = FreqSketch.sketch(skewed, "term", 3, 64)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("state is bounded by depth*width regardless of key cardinality") {
    val many = (0 until 10000).map(i => s"k$i").toDF("term")
    assert(FreqSketch.sketch(many, "term", 3, 64).count() <= 3L * 64)
  }

  test("grouped heavy hitters: sketches are isolated per group") {
    // group g1 is heavy on "x", g2 on "y" — cross-group leakage (a
    // shared cell table) would inflate the other group's estimate
    val items = (Seq.fill(10)(("g1", "x")) ++ Seq.fill(2)(("g1", "y")) ++
      Seq.fill(10)(("g2", "y")) ++ Seq.fill(2)(("g2", "x"))).toDF("g", "term")
    val got = FreqSketch.heavyHittersByGroup(items, "g", "term", 3, 512, 1)
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3))).toSeq.sorted
    assert(got == Seq(("g1", "x", 10L), ("g2", "y", 10L)), s"got $got")
  }

  private def estimates(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("est"))).toSeq.sorted

  test("persisted store: write + append + compact all preserve estimates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cmsk").toString + "/sk"
    val (a, b) = (skewed.filter(col("term") <= "t2"), skewed.filter(col("term") > "t2"))
    FreqSketch.writeSketch(a, "term", 3, 64, dir)
    FreqSketch.appendToSketch(b, "term", dir)
    val whole = estimates(
      FreqSketch.estimate(FreqSketch.sketch(skewed, "term", 3, 64), skewed, "term", 3, 64))
    assert(estimates(FreqSketch.estimateFromStore(skewed, "term", dir)) == whole)
    FreqSketch.compactSketch(spark, dir)
    assert(estimates(FreqSketch.estimateFromStore(skewed, "term", dir)) == whole)
    // compaction actually compacted: one cell file
    val files = new java.io.File(s"$dir/cells").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 compacted cell file, got $files")
  }

  test("probing a missing store fails loudly") {
    val e = intercept[IllegalArgumentException] {
      FreqSketch.estimateFromStore(skewed, "term", "/tmp/graft-no-such-store")
    }
    assert(e.getMessage.contains("no sketch store"))
  }

  test("streaming maintenance: drained stream's estimates ≡ batch-built sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cmstream").toString + "/sk"
    val rows = skewed.collect().map(_.getString(0)).toSeq
    val input = MemoryStream[String]
    val q = graft.streaming.StreamIngest.sketchMaintenanceSink(
      input.toDF().toDF("term"), "term", 3, 64, dir).start()
    rows.grouped(13).foreach { g => input.addData(g); q.processAllAvailable() }
    q.stop()
    val whole = estimates(
      FreqSketch.estimate(FreqSketch.sketch(skewed, "term", 3, 64), skewed, "term", 3, 64))
    assert(estimates(FreqSketch.estimateFromStore(skewed, "term", dir)) == whole)
  }
}
