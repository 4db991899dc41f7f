package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/** KMV bottom-k distinct sketch: error bound, merge-order invariance
  * (the set-property claim), exact-below-k behavior, null handling,
  * and grouped use. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf0001/lineitem.parquet")

  test("estimate is within the 1/sqrt(k) band of the exact distinct count") {
    val k = 1024
    val exact = li.select(col("l_orderkey")).distinct().count().toDouble
    val est = li.agg(KmvSketch.distinctEstimate(col("l_orderkey"), k))
      .collect()(0).getDouble(0)
    // relative error ~ 1/sqrt(k-2) ≈ 3.1%; allow 4 sigma
    assert(math.abs(est - exact) / exact < 4.0 / math.sqrt(k - 2.0),
      s"est $est vs exact $exact")
  }

  test("estimate is invariant to partitioning (merge order): 1 vs 16 partitions") {
    def run(parts: Int): Double =
      li.repartition(parts)
        .agg(KmvSketch.distinctEstimate(col("l_orderkey"), 256))
        .collect()(0).getDouble(0)
    assert(run(1) == run(16))
  }

  test("fewer than k distinct keys: reports the exact distinct-hash count") {
    val df = (1L to 500L).flatMap(i => Seq(i, i)).toDF("x") // 500 distinct, k=1024
    val est = df.agg(KmvSketch.distinctEstimate(col("x"), 1024))
      .collect()(0).getDouble(0)
    assert(est == 500.0)
  }

  test("nulls are ignored") {
    val df = ((1L to 100L).map(Option(_)) ++ Seq.fill(50)(None: Option[Long])).toDF("x")
    val est = df.agg(KmvSketch.distinctEstimate(col("x"), 1024))
      .collect()(0).getDouble(0)
    assert(est == 100.0)
  }

  test("grouped sketches: per-group bounded state, independent estimates") {
    val out = li.groupBy(col("l_returnflag"))
      .agg(KmvSketch.distinctEstimate(col("l_partkey"), 64).as("d"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    for ((flag, e) <- exact)
      assert(math.abs(out(flag) - e) / e < 4.0 / math.sqrt(62.0),
        s"$flag: est ${out(flag)} vs exact $e")
  }

  test("registered SQL aggregate ≡ Column API, grouped") {
    graft.GraftExtensions.register(spark)
    li.createOrReplaceTempView("kmv_li")
    val viaSql = spark.sql(
      """SELECT l_returnflag, kmv_distinct(l_partkey, 128) AS d
        |FROM kmv_li GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaCol = li.groupBy(col("l_returnflag"))
      .agg(KmvSketch.distinctEstimate(col("l_partkey"), 128).as("d"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaCol)
  }

  test("sketchSet: ascending bottom-k contents; set ops exact below k") {
    import graft.analysis.SketchSetOps
    // distinct keys far below k=64 → sketches hold EVERYTHING and all
    // three outputs are exact (modulo hash collisions — none here)
    val df = Seq.tabulate(30)(i => (i.toLong, if (i < 20) "a" else "x")) // a: 0..19
      .++(Seq.tabulate(15)(i => (i + 10L, "b")))                        // b: 10..24
      .toDF("k", "g")
    val sk = df.filter(col("g") === "a")
      .agg(KmvSketch.sketchSet(col("k"), 64)).head().getSeq[Long](0)
    assert(sk.size == 20 && sk == sk.sorted, "full contents, ascending")
    assert(sk.toSet == (0L until 20L).map(KmvSketch.hash).toSet)
    val row = SketchSetOps.kmvSetOps(df, "k", "g", "a", "b", 64).head()
    // |A|=20, |B|=15, |A∩B|=10 (10..19), |A∪B|=25
    assert(row.getDouble(0) == 25.0, s"union ${row.getDouble(0)}")
    assert(row.getDouble(1) == 10.0, s"intersect ${row.getDouble(1)}")
    assert(row.getDouble(2) == 0.4, s"jaccard ${row.getDouble(2)}")
  }

  test("kmvSetOps: full-sketch estimates land in the error band; order-invariant") {
    import graft.analysis.SketchSetOps
    val k = 256
    val sliced = li.filter(col("l_returnflag").isin("A", "R"))
    val exact = sliced.select(col("l_returnflag"), col("l_partkey")).distinct()
      .collect().groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)).toSet }
    val u = (exact("A") ++ exact("R")).size.toDouble
    val i = (exact("A") & exact("R")).size.toDouble
    val row = SketchSetOps.kmvSetOps(li, "l_partkey", "l_returnflag", "A", "R", k).head()
    val band = 4.0 / math.sqrt(k - 2.0)
    assert(math.abs(row.getDouble(0) - u) / u < band, s"union ${row.getDouble(0)} vs $u")
    assert(math.abs(row.getDouble(1) - i) / i < 2 * band, s"inter ${row.getDouble(1)} vs $i")
    // sketch contents are a set property — partitioning cannot move them
    val repart = SketchSetOps.kmvSetOps(li.repartition(16), "l_partkey",
      "l_returnflag", "A", "R", k).head()
    assert(row == repart, "estimates must be merge-order-invariant")
  }

  test("Scala hash and its SQL replay fragment agree") {
    val keys = Seq(-5L, 0L, 1L, 7919L, 1000000007L, 123456789012L)
    val sqlHashes = spark.sql(
      s"SELECT ${KmvSketch.hashSql("x")} FROM VALUES ${keys.map(k => s"($k)").mkString(",")} AS t(x)")
      .collect().map(_.getLong(0))
    assert(sqlHashes.toSeq == keys.map(KmvSketch.hash))
  }
}
