package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-path robustness: malformed-record policy on JSONL reads and
  * the small-files compaction write. A 100 TB ingest cannot fail on
  * one bad record (PERMISSIVE quarantines it) and cannot leave a
  * million kilobyte files behind (compact bounds file count/size). */
class IngestRobustnessSpec extends SparkSpec {

  private def writeJsonl(lines: String*): String = {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.write(java.nio.file.Paths.get(s"$dir/part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE quarantines malformed JSONL rows instead of failing") {
    val dir = writeJsonl(
      """{"doc_id": 1, "text": "good row"}""",
      """{"doc_id": 2, "text": "broken""",            // truncated JSON
      """{"doc_id": 3, "text": "another good row"}""")
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt_record").isNull)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    df.unpersist()
  }

  test("DROPMALFORMED drops bad rows; FAILFAST raises on them") {
    val dir = writeJsonl(
      """{"doc_id": 1, "text": "ok"}""",
      """not json at all""")
    val dropped = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() == 1)
    val failing = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "FAILFAST").json(dir)
    assertThrows[org.apache.spark.SparkException] { failing.count() }
  }

  test("compact bounds records per file and range-clusters the layout") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-compact").toString
    val df = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(37) // simulate many small append outputs
    graft.store.CorpusStore.compact(df, out, "doc_id",
      recordsPerFile = 250, numPartitions = 2)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    // 2 range partitions × ~ceil(500/250) files each ≈ 4-6 (range bounds
    // are sample-estimated, so splits are not exactly even) — not 37
    assert(files.length >= 4 && files.length <= 6, s"got ${files.length} files")
    // the cap is the hard invariant: no output file exceeds it
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 250, s"${f.getName} has $n rows > cap")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    // range clustering: a doc_id range predicate must prune files
    // (footer min/max stats disjoint across the range partitions)
    val pruned = back.filter(col("doc_id") < 100)
    assert(pruned.count() == 100)
  }
}
