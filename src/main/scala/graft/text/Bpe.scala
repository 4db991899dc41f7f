package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
  * tokenizer-construction half of an LLM data pipeline (the counting
  * side of which is `token_counts` / `top_terms`).
  *
  * Classic BPE trains on the WORD-FREQUENCY DICTIONARY, not the raw
  * corpus: one corpus-scale pass builds `(word, freq)` (vocabulary-
  * sized — Heaps' law keeps it orders of magnitude below corpus rows),
  * and every merge iteration is then a distributed aggregation over
  * that dictionary: explode adjacent symbol pairs, `sum(freq)` per
  * pair (map-side combined), take the argmax under the total order
  * `(count DESC, pair ASC)`, and rewrite the dictionary by applying
  * the merge. The learned merge table is MODEL state — k rows of
  * `(left, right)` — exactly like k-means centroids, so the per-
  * iteration single-row collect is bounded by construction.
  *
  * Words are carried as `|`-delimited symbol strings (`"join"` →
  * `"|j|o|i|n|"`); applying a merge is a single left-to-right fold
  * over the symbols (emit, or coalesce with the accumulator's tail
  * when it is exactly `|l|` and the next symbol is `r`) — the greedy
  * single-scan semantics of the original algorithm, including
  * self-overlapping runs (`aaaa` + merge (a,a) → `aa aa`, never an
  * alternating leftover — spec-pinned). A plain substring replace of
  * `"|a|b|"` gets this WRONG: adjacent occurrences share the boundary
  * `|`, so non-overlapping replacement merges only alternate pairs.
  * The fold is expressible identically in any SQL engine with lambda
  * folds, so every iteration replays bit-for-bit as an unrolled CTE
  * chain in the oracle.
  */
object Bpe {
  /** `"join"` → `"|j|o|i|n|"`. */
  def piped(word: Column): Column =
    concat(regexp_replace(word, "(.)", "\\|$1"), lit("|"))

  /** Adjacent symbol pairs of a piped word as `"a b"` strings (space
    * join — symbols are `|`-free AND space-free, so the pair key is
    * unambiguous). Empty for single-symbol words. */
  def pairs(piped: Column): Column = {
    val arr = filter(split(piped, "\\|"), t => length(t) > 0)
    when(size(arr) >= 2,
      transform(sequence(lit(1), size(arr) - 1),
        i => concat(element_at(arr, i), lit(" "), element_at(arr, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** Greedy single-scan application of merge (l, r) to a piped word:
    * fold symbols left-to-right; when the accumulator ends in `|l|`
    * and the next symbol is `r`, rewrite that tail to `|lr|` (the
    * just-merged token's tail is `lr|`, so it can never chain-merge
    * within the same scan — exactly Sennrich's semantics). */
  def applyMerge(s: Column, l: String, r: String): Column = {
    val arr = filter(split(s, "\\|"), t => length(t) > 0)
    aggregate(arr, lit("|"), (acc, x) =>
      when(x === lit(r) && acc.endsWith(lit("|" + l + "|")),
        concat(acc.substr(lit(1), length(acc) - lit(l.length + 1)),
          lit(l + r + "|")))
        .otherwise(concat(acc, x, lit("|"))))
  }

  /** The word-frequency dictionary — the ONE corpus-scale pass every
    * trainer variant shares: tokenize, count, pipe. */
  private def dict(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(piped(col("w")).as("s"), col("f"))

  /** Greedy single-scan merge on a symbol vector — the local twin of
    * [[applyMerge]]'s fold (spec-pinned equal): after emitting `lr`
    * the scan continues PAST it, so a merged token never chain-merges
    * within the same pass. */
  private[graft] def applyMergeLocal(sym: Vector[String], l: String,
                                    r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  /** Unsigned UTF-8 byte order on the `"l r"` pair key — the binary
    * string order the distributed argmax (`orderBy(col("p").asc)`)
    * sorts by. */
  private def pairLt(a: (String, String), b: (String, String)): Boolean = {
    val x = (a._1 + " " + a._2).getBytes("UTF-8")
    val y = (b._1 + " " + b._2).getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** INCREMENTAL driver-side trainer — the production form: the
    * vocabulary-bounded dictionary (Heaps' law — model state, the
    * centroid-collect precedent) collects ONCE, and each merge
    * updates pair counts only for the words the merge touched
    * (classic BPE trainer bookkeeping: pair → count and
    * pair → containing-words index), instead of re-aggregating every
    * pair of every word per iteration. [[trainDistributed]] runs k
    * sequential corpus-dict aggregations — k Spark jobs whose
    * scheduling overhead dominates at real vocabulary sizes (k ≈ 30k);
    * this runs ONE. Selection order is identical: argmax by
    * `(count DESC, "l r" ASC)` in unsigned-UTF-8 order, greedy
    * single-scan application — ≡ [[trainDistributed]] row-for-row
    * (spec-pinned in BpeSpec). Returns the merge rows and the final
    * rewritten dictionary. */
  private def trainLocal(docs: DataFrame, textCol: String,
                         k: Int): (Seq[Row], Seq[(Vector[String], Long)]) = {
    import scala.collection.mutable
    val words: mutable.ArrayBuffer[(Vector[String], Long)] =
      mutable.ArrayBuffer(dict(docs, textCol).collect().map { r =>
        (r.getString(0).split("\\|").filter(_.nonEmpty).toVector, r.getLong(1))
      }.toIndexedSeq: _*)
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def wordPairs(sym: Vector[String]): Iterator[(String, String)] =
      if (sym.size < 2) Iterator.empty
      else sym.iterator.zip(sym.iterator.drop(1))
    def count(i: Int, sign: Long): Unit = {
      val (sym, f) = words(i)
      wordPairs(sym).foreach { p =>
        val nc = pairCounts.getOrElse(p, 0L) + sign * f
        if (nc == 0L) { pairCounts.remove(p); () } else pairCounts(p) = nc
        if (sign > 0L) { pairWords.getOrElseUpdate(p, mutable.Set.empty) += i; () }
      }
    }
    words.indices.foreach(count(_, 1L))
    val out = Seq.newBuilder[Row]
    var step = 1
    while (step <= k && pairCounts.nonEmpty) {
      val (best, cnt) = pairCounts.iterator.reduce[((String, String), Long)] {
        case (a @ (pa, ca), b @ (pb, cb)) =>
          if (cb > ca || (cb == ca && pairLt(pb, pa))) b else a
      }
      out += Row(step.toLong, best._1, best._2, cnt)
      // rewrite only the words holding this pair; the index may carry
      // stale entries from earlier rewrites — subtract/rewrite/re-add
      // is a no-op for those, so no containment check is needed
      pairWords.remove(best).foreach(_.toSeq.sorted.foreach { i =>
        count(i, -1L)
        words(i) = (applyMergeLocal(words(i)._1, best._1, best._2), words(i)._2)
        count(i, 1L)
      })
      step += 1
    }
    (out.result(), words.toSeq)
  }

  /** Train `k` merges with k sequential DISTRIBUTED dict aggregations
    * — the executable specification [[trainLocal]] is pinned against
    * (each iteration replays as one SQL CTE, which is how the oracle
    * verifies the semantics); production callers go through the
    * incremental trainer. Returns the merge rows and the final
    * (rewritten) dictionary the last merge produced. */
  private def train(docs: DataFrame, textCol: String,
                    k: Int): (Seq[Row], DataFrame) = {
    // the one corpus-scale pass; everything after runs on the dict
    val dictDf = dict(docs, textCol).cache()
    try {
      val out = Seq.newBuilder[Row]
      var words = dictDf
      var step = 1
      var done = false
      while (step <= k && !done) {
        val best = words
          .select(explode(pairs(col("s"))).as("p"), col("f"))
          .groupBy("p").agg(sum(col("f")).as("c"))
          .orderBy(col("c").desc, col("p").asc)
          .limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val pair = best(0).getString(0)
          val cnt = best(0).getLong(1)
          val Array(l, r) = pair.split(" ", 2)
          out += Row(step.toLong, l, r, cnt)
          words = words.withColumn("s", applyMerge(col("s"), l, r))
          step += 1
        }
      }
      // materialize the final dict's lineage before releasing the cache
      (out.result(), words.localCheckpoint(eager = true))
    } finally dictDf.unpersist()
  }

  private val mergeSchema = StructType(Seq(
    StructField("step", LongType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  /** Dictionary-size bound above which the incremental trainer's
    * dict collect is refused and training falls back to the k-job
    * distributed iteration. 2 M piped words ≈ a few hundred MB of
    * driver heap (symbols + pair index) — comfortably model state;
    * a 100 TB multilingual corpus's ~10⁸-word dict is not. The check
    * is ONE extra pre-pass (`approx_count_distinct` over the token
    * stream — no shuffle, HLL-bounded state); an estimate is the
    * right tool for a safety switch, and both paths are spec-pinned
    * equal so the switch never changes results. */
  val MaxLocalDictWords: Long = 2L * 1000 * 1000

  private def dictFitsLocal(docs: DataFrame, textCol: String,
                            bound: Long): Boolean =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .agg(approx_count_distinct(col("w")).as("n"))
      .head().getLong(0) <= bound

  /** Learn `k` merges over the word dictionary of `textCol` via the
    * incremental trainer ([[trainLocal]]) when the dictionary fits
    * driver memory (`maxLocalDictWords`, estimated by one HLL
    * pre-pass), else via the distributed iteration — same results
    * either way (spec-pinned across the switch). Returns
    * `(step, lhs, rhs, cnt)` — merge rank, the two merged symbols, and
    * the pair's dictionary-weighted count at selection time. */
  def merges(docs: DataFrame, textCol: String, k: Int,
             maxLocalDictWords: Long = MaxLocalDictWords): DataFrame = {
    val spark = docs.sparkSession
    val rows =
      if (dictFitsLocal(docs, textCol, maxLocalDictWords))
        trainLocal(docs, textCol, k)._1
      else train(docs, textCol, k)._1
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), mergeSchema)
  }

  /** [[merges]] computed by the k-job distributed iteration — the
    * executable spec the incremental trainer is pinned against
    * (BpeSpec asserts row-for-row equality). */
  def mergesDistributed(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(train(docs, textCol, k)._1, 1),
      mergeSchema)
  }

  /** The ENCODE side: corpus symbol vocabulary after `k` learned
    * merges — every word's post-merge symbols, counted weighted by
    * word frequency. This is the table a tokenizer ships: symbol →
    * corpus occurrence count (and its size tracks how far k compressed
    * the character alphabet toward whole words). */
  def vocab(docs: DataFrame, textCol: String, k: Int,
            maxLocalDictWords: Long = MaxLocalDictWords): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    if (!dictFitsLocal(docs, textCol, maxLocalDictWords))
      return vocabDistributed(docs, textCol, k)
    val (_, words) = trainLocal(docs, textCol, k)
    // the rewritten dict is already driver-side model state; the
    // vocabulary reduce over it is dict-bounded, not corpus-bounded
    words.flatMap { case (sym, f) => sym.map(_ -> f) }
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
      .toSeq.toDF("symbol", "n")
  }

  /** [[vocab]] computed by the distributed iteration — the executable
    * spec (BpeSpec pins vocab ≡ vocabDistributed). */
  def vocabDistributed(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val (_, words) = train(docs, textCol, k)
    words
      .select(explode(filter(split(col("s"), "\\|"), t => length(t) > 0))
        .as("symbol"), col("f"))
      .groupBy("symbol").agg(sum(col("f")).as("n"))
  }

  /** Collect a trained merge table into the driver-side model form
    * [[graft.functions.BpeEncode]] carries: `(lhs, rhs)` in rank
    * order. Model state — k rows, the centroid-collect precedent. */
  def mergeTable(docs: DataFrame, textCol: String, k: Int): Seq[(String, String)] =
    merges(docs, textCol, k).orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Encode a document column with a TRAINED merge table — the
    * per-document ingest-time operator a tokenizer user actually runs
    * (training sees the corpus once; THIS runs on every new document
    * forever after, with the table as a fixed reference object). One
    * row per `(id, symbol)` with its occurrence count in the doc —
    * fully keyed shuffle, no driver path; the encode itself is the
    * native [[graft.functions.BpeEncode]] kernel applied per token
    * inside whole-stage codegen. */
  def encodeSymbols(docs: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame =
    docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .select(col(idCol),
        explode(graft.functions.BpeEncode(col("__w"), merges)).as("symbol"))
      .groupBy(col(idCol), col("symbol")).agg(count(lit(1)).as("n"))
}
