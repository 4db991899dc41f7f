package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.plans.Skew
import graft.search.Ann
import graft.streaming.AnswerStream

class SkewAnswerSpec extends SparkSpec {
  import spark.implicits._

  test("salted count/sum match direct groupBy on skewed data") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val direct = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1)))
    val salted = Skew.saltedCount(li, "l_returnflag", 16, Seq("l_orderkey"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(direct.toSeq == salted.toSeq)
    val directSum = li.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("s"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    val saltedSum = Skew.saltedSum(li, "l_returnflag", "l_quantity", 16, Seq("l_orderkey"))
      .select(col("l_returnflag"), round(col("sum_value"), 2).as("s"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(directSum.toSeq == saltedSum.toSeq)
  }

  test("salted broadcast join matches plain join") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet").limit(1000)
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(o, "l_orderkey").count()
    val salted = Skew.saltedBroadcastJoin(li, o, "l_orderkey", 8, Seq("l_linenumber"))
      .count()
    assert(plain == salted)
  }

  test("answer accumulation: running concat state across micro-batches (App.tsx:199-206)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AnswerStream.Token]
    val q = AnswerStream.toMemorySink(
      AnswerStream.accumulate(spark, input.toDS(), idleTimeout = None),
      "answers").start()
    input.addData(AnswerStream.Token(1L, 0, "Hel"), AnswerStream.Token(1L, 1, "lo "))
    q.processAllAvailable()
    input.addData(AnswerStream.Token(1L, 2, "wor"), AnswerStream.Token(1L, 3, "ld"),
      AnswerStream.Token(2L, 0, "hi"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("answers").as[AnswerStream.RunningAnswer].collect()
    val latest = out.groupBy(_.answerId)
      .map { case (id, rows) => id -> rows.map(_.answer).maxBy(_.length) }
    assert(latest(1L) == "Hello world")
    assert(latest(2L) == "hi")
  }

  test("answer accumulation: late lower-seq token across micro-batches slots in, not appended") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AnswerStream.Token]
    val q = AnswerStream.toMemorySink(
      AnswerStream.accumulate(spark, input.toDS(), idleTimeout = None),
      "answers_ooo").start()
    // seq 1 and 3 arrive a batch BEFORE seq 0 and 2 — the old
    // sort-within-batch state machine would emit "lo ld" + "Helwor"
    input.addData(AnswerStream.Token(1L, 1, "lo "), AnswerStream.Token(1L, 3, "ld"))
    q.processAllAvailable()
    input.addData(AnswerStream.Token(1L, 0, "Hel"), AnswerStream.Token(1L, 2, "wor"),
      AnswerStream.Token(1L, 1, "lo ")) // duplicate delivery: must not double-append
    q.processAllAvailable()
    q.stop()
    val out = spark.table("answers_ooo").as[AnswerStream.RunningAnswer].collect()
      .filter(_.answerId == 1L).map(_.answer)
    assert(out.contains("")) // batch 1: nothing contiguous yet (gap at seq 0)
    assert(out.maxBy(_.length) == "Hello world")
  }

  test("as-of join: latest prior match, inclusive ties, null before first right row") {
    import graft.plans.AsOf
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L), (4L, "v", 10L))
      .toDF("event_id", "key", "t")
    val right = Seq(("u", 10L, 1.5), ("u", 15L, 2.5)) // none for key v
      .toDF("key", "t", "x")
    val out = AsOf.asOfJoin(left, right, "key", "t", Seq("x"))
      .select(col("event_id"), col("asof_x")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(1.5)) // inclusive: right at t=10 matches left at t=10
    assert(out(2L).contains(2.5)) // latest prior (t=15), not first
    assert(out(3L).isEmpty)       // before any right row -> null
    assert(out(4L).isEmpty)       // key with no right rows -> null
  }

  test("range join: bin-crossing matches kept, bounds inclusive, outside dropped") {
    import graft.plans.RangeJoin
    val l = Seq((1L, "u", "2026-01-01 00:59:30"), (2L, "u", "2026-01-01 05:00:00"))
      .toDF("lid", "key", "lts").withColumn("lts", to_timestamp(col("lts")))
    val r = Seq(
        (10L, "u", "2026-01-01 01:30:00"), // in-window, lands in the NEXT bin
        (11L, "u", "2026-01-01 00:59:30"), // equal ts: inclusive lower bound
        (12L, "u", "2026-01-01 01:59:30"), // exactly +1h: inclusive upper bound
        (13L, "u", "2026-01-01 02:00:00"), // past the window: dropped
        (14L, "v", "2026-01-01 01:00:00")) // different key: dropped
      .toDF("rid", "key", "rts").withColumn("rts", to_timestamp(col("rts")))
    val pairs = RangeJoin.intervalJoin(l, r, "key", "lts", "rts", 0L, 3600L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs == Set((1L, 10L), (1L, 11L), (1L, 12L)))
  }

  test("IVF over a label-partitioned corpus prunes partitions") {
    val dir = Files.createTempDirectory("graft-ivf-part").toString + "/corpus"
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    graft.store.CorpusStore.overwrite(emb, dir, partitionBy = Seq("label"))
    val corpus = spark.read.parquet(dir)
      .select(col("vec_id"), col("embedding"), col("label")) // column order
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val result = Ann.ivfTopK(corpus, q, 5, 3)
    assert(result.count() == 5)
    // the probe semi-join keys on the partition column → with a static
    // probe list this is partition pruning; assert label reaches the scan
    // as a partition filter (dynamic pruning subquery or pushed filter)
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters"),
      s"no partition pruning in plan:\n${plan.take(2000)}")
  }
}
