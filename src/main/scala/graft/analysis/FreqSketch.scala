package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Count-min frequency sketch (Cormode & Muthukrishnan 2005) over the
  * engine's portable polynomial hash — the bounded-state twin of the
  * exact `top_terms` aggregation, completing the sketch family
  * (`kmv_distinct` for cardinality, `percentile_sketch` for quantiles,
  * `bloom_prefilter` for membership, this for frequency).
  *
  * State is `depth × width` counter cells REGARDLESS of key
  * cardinality; cells are sums, so partial aggregation combines
  * map-side and two sketches over disjoint corpora merge by adding
  * cells ([[merge]]) — the associative/commutative shape that
  * parallelizes on any cluster. Estimates are upper bounds
  * (`est >= true count`, over-counting only from hash collisions —
  * spec-pinned), and because every cell index comes from the portable
  * hash family (`(fp·a + b + row·c) mod p mod width` on the
  * [[TextAnalysis.fingerprint]] key, [[graft.functions.KmvSketch.hash]]
  * seed family), the ESTIMATE itself replays bit-for-bit in any SQL
  * engine — no implementation-defined sketch state, same contract that
  * made `approx_distinct_parts` hash-checkable.
  *
  * At 100 TB: the exact top-terms groupBy shuffles one row per
  * distinct term (web-scale corpora: billions); the sketch shuffles at
  * most `depth·width` cells per map task, and the heavy-hitter probe
  * joins candidates against a broadcast-sized cell table.
  */
object FreqSketch {
  private val P = 1000000007L

  /** Cell column for hash row `row` — one member of the pairwise
    * independent family, seeded per row by the 104729 prime stride. */
  private def cell(fp: Column, row: Column, width: Int): Column =
    (fp * lit(2654435761L) + lit(7919L) + row * lit(104729L)) % lit(P) % lit(width)

  /** SQL fragment computing [[cell]] — kept beside the Scala so the
    * two can't drift (the `KmvSketch.hashSql` convention). `fp` and
    * `row` are SQL expressions. */
  def cellSql(fp: String, row: String, width: Int): String =
    s"(($fp) * 2654435761 + 7919 + ($row) * 104729) % 1000000007 % $width"

  /** Build the sketch: one `(row, col) -> cnt` cell table with at most
    * `depth·width` rows. The depth-way explode happens map-side and
    * collapses into per-task partial cells before any shuffle. */
  def sketch(items: DataFrame, termCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"depth >= 1, width >= 2: $depth x $width")
    items
      .select(TextAnalysis.fingerprint(col(termCol)).as("__fp"))
      .select(explode(sequence(lit(0L), lit(depth - 1L))).as("__row"), col("__fp"))
      .groupBy(col("__row"), cell(col("__fp"), col("__row"), width).as("__col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches built with the same geometry: cell-wise sum —
    * the distributed-corpus composition (build per shard, add). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("__row", "__col").agg(sum("cnt").as("cnt"))

  /** Point-query the sketch for every distinct probe term:
    * `est = min over rows of the term's cell` (0 when a cell was never
    * touched). The sketch side is at most `depth·width` rows —
    * broadcast — so probing any number of candidates is a map-side
    * join. */
  def estimate(sk: DataFrame, probes: DataFrame, termCol: String,
               depth: Int, width: Int): DataFrame =
    probes
      .select(col(termCol)).distinct()
      .withColumn("__fp", TextAnalysis.fingerprint(col(termCol)))
      .withColumn("__row", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("__col", cell(col("__fp"), col("__row"), width))
      .join(broadcast(sk), Seq("__row", "__col"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Top-k terms by estimated frequency — the heavy-hitters endpoint.
    * Total order `(est DESC, term ASC)`; distributed top-k, never a
    * global sort. */
  def heavyHitters(items: DataFrame, termCol: String, depth: Int,
                   width: Int, k: Int): DataFrame = {
    val sk = sketch(items, termCol, depth, width)
    estimate(sk, items, termCol, depth, width)
      .orderBy(col("est").desc, col(termCol).asc)
      .limit(k)
  }
}
