package graft

import org.apache.spark.sql.functions._

import graft.analysis.{Curation, CurationThresholds}
import graft.io.Tables

/** The curation gate is a real parameter surface, not baked constants:
  * thresholds move the keep/drop boundary, defaults reproduce the
  * oracle query's decisions. */
class CurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  test("default thresholds fire every branch on the synthetic corpus") {
    val reasons = Curation.keep(docs, "doc_id", "text")
      .groupBy(col("reason")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons.keySet == Set("ok", "low_quality", "repetitive_words", "repetitive_bigram"),
      s"expected all four branches, got $reasons")
  }

  test("thresholds parameterize the gate monotonically") {
    val everything = Curation.keep(docs, "doc_id", "text",
      CurationThresholds(minQuality = -1.0, maxDupWordFrac = 2.0, maxTop2Frac = 2.0))
    assert(everything.filter(col("keep") === 0).count() == 0,
      "vacuous thresholds must keep every document")
    val nothing = Curation.keep(docs, "doc_id", "text",
      CurationThresholds(minQuality = 2.0, maxDupWordFrac = -1.0, maxTop2Frac = -1.0))
    assert(nothing.filter(col("keep") === 1).count() == 0,
      "impossible thresholds must drop every document")
    // tightening ONE threshold can only move rows from keep to drop
    val default = Curation.keep(docs, "doc_id", "text")
      .filter(col("keep") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val tighter = Curation.keep(docs, "doc_id", "text",
      CurationThresholds(minQuality = 0.55))
      .filter(col("keep") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(tighter.subsetOf(default), "tightening must be monotone")
    assert(tighter.size < default.size, "0.55 must actually drop more docs here")
  }

  test("unigramKl: closed-form smoothed divergence; identical corpora diverge 0") {
    import spark.implicits._
    val a = Seq((1L, "a a b")).toDF("id", "text")
    val b = Seq((2L, "a c")).toDF("id", "text")
    val row = graft.analysis.CorpusDrift.unigramKl(a, b, "text").collect().head
    assert(row.getLong(0) == 3 && row.getLong(1) == 3 && row.getLong(2) == 2)
    // P = (2+1)/6, (1+1)/6, (0+1)/6 over {a,b,c}; Q = 2/5, 1/5, 2/5
    val expected = 0.5 * math.log(0.5 / 0.4) +
      (1.0 / 3) * math.log((1.0 / 3) / 0.2) +
      (1.0 / 6) * math.log((1.0 / 6) / 0.4)
    assert(row.getDouble(3) == math.rint(expected * 1e6) / 1e6)
    val self = graft.analysis.CorpusDrift.unigramKl(a, a, "text").collect().head
    assert(self.getDouble(3) == 0.0)
  }

  test("logOddsTerms: closed-form z with the informative prior; symmetric slices mirror") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y", "a"),
      (2L, "x x z", "b")
    ).toDF("id", "text", "g")
    // replicate the exact formula: ya,yb per term, na=nb=3, alpha0=1
    def z(ya: Long, yb: Long): Double = {
      val na = 3.0; val nb = 3.0; val a0 = 1.0
      val aw = a0 * (ya + yb) / (na + nb)
      val d = math.log((ya + aw) / (na + a0 - ya - aw)) -
        math.log((yb + aw) / (nb + a0 - yb - aw))
      val se = math.sqrt(1.0 / (ya + aw) + 1.0 / (yb + aw))
      graft.vector.VectorOps.round6(d / se)
    }
    val got = graft.analysis.CorpusDrift.logOddsTerms(docs, "text", "g", "a", "b", 1.0, 3)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    // y and z are count-mirrored under EQUAL slice totals → equal |z|,
    // opposite sign; tie breaks term-ascending; the evenly-shared term
    // x scores exactly 0
    assert(z(1L, 0L) == -z(0L, 1L), "mirrored counts must mirror z")
    assert(z(2L, 2L) == 0.0, "an evenly-shared term must score 0")
    assert(got == Seq(("y", z(1L, 0L)), ("z", z(0L, 1L)), ("x", z(2L, 2L))),
      s"got $got")
    assert(math.abs(got.head._2) > math.abs(got.last._2),
      "a slice-exclusive term must outrank the shared one")
  }

  test("chiSquareDrift: identical mixes score 0; disjoint mixes hit the closed form") {
    import spark.implicits._
    val a = Seq.fill(10)("x").++(Seq.fill(10)("y")).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("id", "c")
    val self = graft.analysis.CorpusDrift.chiSquareDrift(a, a, "c").head()
    assert(self.getAs[Double]("chi2") == 0.0 &&
      self.getAs[Long]("n_categories") == 2L)
    // a: 10 x; b: 10 y — fully disjoint 2×2 → chi2 = N = 20
    val ax = Seq.tabulate(10)(i => (i.toLong, "x")).toDF("id", "c")
    val by = Seq.tabulate(10)(i => (i.toLong, "y")).toDF("id", "c")
    val r = graft.analysis.CorpusDrift.chiSquareDrift(ax, by, "c").head()
    assert(r.getAs[Double]("chi2") == 20.0, s"got $r")
    // an empty slice has no distribution
    val empty = ax.filter(col("id") < 0)
    assert(graft.analysis.CorpusDrift.chiSquareDrift(ax, empty, "c")
      .head().isNullAt(3))
  }

  test("benfordDigits: digit extraction exact on powers of ten; frequencies sum to 1") {
    import spark.implicits._
    // 10.00, 100.00, 999.99, 0.01 → digits 1,1,9,1 ; zero/negative dropped
    val df = Seq(10.0, 100.0, 999.99, 0.01, 0.0, -5.0).toDF("v")
    val rows = graft.analysis.CorpusDrift.benfordDigits(df, "v", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 3L, 9L -> 1L), s"got $rows")
    val freqs = graft.analysis.CorpusDrift.benfordDigits(df, "v", 2)
      .agg(sum(col("freq"))).head().getDouble(0)
    assert(math.abs(freqs - 1.0) < 1e-9)
    // the nine Benford probabilities themselves sum to 1
    val p = (1 to 9).map(d => math.log10(1.0 + 1.0 / d)).sum
    assert(math.abs(p - 1.0) < 1e-12)
  }

  test("ksStatistic: identical slices gap 0; disjoint ranges gap 1; closed-form shift") {
    import spark.implicits._
    val a = (0 until 10).map(_.toDouble).toDF("v")
    assert(graft.analysis.CorpusDrift.ksStatistic(a, a, "v", 1.0)
      .head().getAs[Double]("ks") == 0.0)
    val b = (100 until 110).map(_.toDouble).toDF("v")
    assert(graft.analysis.CorpusDrift.ksStatistic(a, b, "v", 1.0)
      .head().getAs[Double]("ks") == 1.0, "disjoint supports must gap 1")
    // half of b shifted out of a's support → CDF gap peaks at 0.5
    val c = ((0 until 5) ++ (100 until 105)).map(_.toDouble).toDF("v")
    val r = graft.analysis.CorpusDrift.ksStatistic(a, c, "v", 1.0).head()
    assert(r.getAs[Double]("ks") == 0.5, s"got $r")
    // empty slice → null
    assert(graft.analysis.CorpusDrift.ksStatistic(a, a.filter(col("v") < 0), "v", 1.0)
      .head().isNullAt(2))
  }

  test("giniConcentration: uniform mass 0; closed-form on a skewed fixture") {
    import spark.implicits._
    val even = Seq.tabulate(20)(i => (i.toLong % 4, i)).toDF("k", "i")
    val ev = graft.analysis.CorpusDrift.giniConcentration(even, "k").head()
    assert(ev.getAs[Long]("n_keys") == 4L && ev.getAs[Double]("gini") == 0.0)
    // counts 1,1,1,7: G = Σ(2i−n−1)x_i/(n·Σx) = (−3·1 −1·1 +1·1 +3·7)/(4·10) = 18/40
    val skew = (Seq.fill(7)(0L) ++ Seq(1L, 2L, 3L)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "i")
    val r = graft.analysis.CorpusDrift.giniConcentration(skew, "k").head()
    assert(r.getAs[Long]("total") == 10L)
    assert(r.getAs[Double]("gini") == 0.45, s"got $r")
  }

  test("psi: identical slices diverge 0; out-of-range values clamp into edge bins") {
    import spark.implicits._
    // baseline 0..9 → width 0.9, exactly one value per bin (9 clamps in)
    val a = (0 until 10).map(_.toDouble).toDF("v")
    val self = graft.analysis.CorpusDrift.psi(a, a, "v").collect().head
    assert(self.getLong(0) == 10 && self.getLong(1) == 10)
    assert(self.getDouble(2) == 0.0)
    // current slice entirely OUTSIDE the baseline grid: -5 → bin 0,
    // 100 → bin 9; all other bins empty but add-one smoothed
    val b = Seq(-5.0, 100.0).toDF("v")
    val row = graft.analysis.CorpusDrift.psi(a, b, "v").collect().head
    val pa = (c: Long) => (c + 1.0) / 20.0
    val pb = (c: Long) => (c + 1.0) / 12.0
    val expected = (0 until 10).map { i =>
      val cb = if (i == 0 || i == 9) 1L else 0L
      (pa(1L) - pb(cb)) * math.log(pa(1L) / pb(cb))
    }.sum
    assert(row.getLong(0) == 10 && row.getLong(1) == 2)
    assert(row.getDouble(2) == math.rint(expected * 1e6) / 1e6)
  }

  test("psiTrend: baseline week is exactly 0, a shifted week registers, stable weeks stay low") {
    import spark.implicits._
    def ts(d: Int, i: Int) =
      new java.sql.Timestamp(
        java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00").getTime + i * 1000L)
    // week 2024-01-01: values 0..9 (the baseline grid); week -08: the
    // same distribution; week -15: all mass collapsed onto one value
    val ev = ((0 until 10).map(i => (ts(1, i), i.toDouble)) ++
      (0 until 10).map(i => (ts(8, i), i.toDouble)) ++
      (0 until 10).map(i => (ts(15, i), 9.0))).toDF("ts", "v")
    val out = graft.analysis.CorpusDrift.psiTrend(ev, "ts", "v", 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("2024-01-01") == 0.0, "baseline self-PSI must be exactly 0")
    assert(out("2024-01-08") == 0.0, "an identical week must also be 0")
    assert(out("2024-01-15") > 0.5, s"a collapsed week must alarm: ${out("2024-01-15")}")
  }

  test("kAnonymity: combinations below k surface rarest-first; nulls group together") {
    import graft.analysis.Curation
    import spark.implicits._
    // sizes: (a,1) 3 — safe at k=3; (b,1) 1; (b,2) 2; nulls share a
    // group of 2
    val rows: Seq[(String, Int)] = Seq(
      ("a", 1), ("a", 1), ("a", 1), ("b", 1), ("b", 2), ("b", 2),
      (null, 1), (null, 1))
    val df = rows.toDF("qa", "qb")
    val got = Curation.kAnonymity(df, Seq("qa", "qb"), 3L)
      .collect().map(r => (Option(r.getString(0)), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (Some("b"), 1, 1L), (None, 1, 2L), (Some("b"), 2, 2L)), s"got $got")
  }
}
