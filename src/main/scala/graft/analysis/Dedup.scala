package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.embed.Featurizer

/** Deduplication operators for the training-data-pipeline north star:
  * exact (hash group-by), n-gram Jaccard near-dup, MinHash+LSH
  * candidates, SimHash fingerprints, embedding-cosine near-dup.
  *
  * Scale notes:
  *  - exact dedup is one shuffle on a 128-bit text hash (not the text
  *    itself) — at 100 TB you shuffle 16-byte keys, not documents.
  *  - n-gram Jaccard self-joins on shingles; the shingle explode stays
  *    inside partitions and the join shuffles by (shingle, group key).
  *    The `source` blocking key bounds candidate pairs — the same
  *    pattern LSH bands generalize.
  *  - MinHash signatures are fixed-width (numHashes longs) regardless of
  *    document size; the LSH band join shuffles only (band, bandHash)
  *    pairs, never O(N²).
  */
object Dedup {

  /** Character shingles (k-grams) of `text`, distinct. Short texts
    * (< k chars) yield their single truncated prefix shingle. */
  def shingles(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(length(text) - k, lit(0))),
      i => substring(text, i + lit(1), lit(k))))

  /** Exact dedup: group by md5(text), keep the minimum id as the
    * representative, count members. One row per distinct text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(encode(col(textCol), "UTF-8")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** The rows exact-dedup would drop — left-anti join of the corpus
    * against its representatives (SURVEY §2: semi/anti join `[EXT]`). */
  def exactDropped(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exact(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_anti")
  }

  /** n-gram Jaccard near-duplicate pairs within a blocking group.
    * Distinct k-shingles per doc; pairs sharing ≥1 shingle inside the
    * same `groupCol` block; Jaccard = |∩| / |∪| over shingle sets;
    * pairs with jaccard ≥ threshold, (id_a < id_b). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, k: Int, threshold: Double,
                        broadcastSmallSide: Boolean = true): DataFrame = {
    // One sorted distinct shingle-HASH array per doc, then a block-local
    // pair join with a merge-intersect per pair. Versus the exploded
    // shingle-equijoin (quadratic in per-shingle frequency — repeated
    // shingles across a block blow up the intermediate), this shuffles
    // one fixed array per doc and the per-pair work is an allocation-free
    // primitive-long merge inside codegen
    // (graft.functions.SortedArrayIntersectCount). Jaccard is defined
    // over the hashed shingle sets (the MinHash-literature convention);
    // the portable polynomial hash makes the oracle reproduce identical
    // sets, collisions included.
    val sets = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
      shinglesHashes(col(textCol), k).as("ss")) // already sorted distinct
    // broadcastSmallSide=true: broadcast one side, spread the streamed
    // side across all cores (a block-key-only join would ride the
    // source's partition count — a single parquet split at small sf →
    // near-serial pair generation). For a corpus past the broadcast
    // limit, pass false: plain shuffle join on the block key (at open
    // scale blocking keys are fine-grained — LSH bands — so the shuffle
    // spreads; pair with Skew.saltedBroadcastJoin for hot blocks).
    val a = sets.select(col("id").as("id_a"), col("grp"), col("ss").as("sa"))
      .repartition(col("id_a"))
    val b = sets.select(col("id").as("id_b"), col("grp"), col("ss").as("sb"))
    // Catalyst folds the jaccard threshold into the join condition; the
    // fused sorted_jaccard expression keeps that at ONE merge pass per
    // candidate pair (a numerator/denominator composition of
    // sorted_intersect_count would run the merge twice there — and a
    // nondeterministic pushdown barrier measured slower still).
    val joined =
      if (broadcastSmallSide) a.join(broadcast(b), Seq("grp"))
      else a.join(b, Seq("grp"))
    joined
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        round(graft.functions.SortedJaccard(col("sa"), col("sb")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature column: for seed i, min over shingles of
    * (h·(2i+1) + b_i) mod p over the portable polynomial shingle hashes.
    * One fused codegen pass per row (graft.functions.MinHashSignature) —
    * no explode, no shuffle. Null for docs with no shingles. */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column =
    graft.functions.MinHashSignature(shinglesHashes(text, k), numHashes)

  /** Portable polynomial hashes of the distinct k-shingles, sorted —
    * single-pass native expression (see
    * [[graft.functions.SortedShingleHashes]]); `shinglesHashesHof` is
    * the composed-builtin executable specification it is tested against. */
  def shinglesHashes(text: Column, k: Int): Column =
    graft.functions.SortedShingleHashes(text, k)

  def shinglesHashesHof(text: Column, k: Int): Column =
    sort_array(array_distinct(transform(
      sequence(lit(0), greatest(length(text) - k, lit(0))),
      i => polyHash(substring(text, i + lit(1), lit(k))))))

  /** HOF form of [[Featurizer.tokenHash]]: fold (h*31+code) mod 1e9+7. */
  def polyHash(s: Column): Column =
    aggregate(split(s, ""), lit(Featurizer.HashSeed),
      (h, c) => (h * 31 + ascii(c)) % Featurizer.HashMod)

  /** MinHash + LSH candidate pairs: split the signature into bands of
    * `rowsPerBand`, join docs sharing any identical band sub-signature,
    * emit distinct (id_a < id_b) candidates. The band join shuffles by
    * (band, sub-signature) — never an O(N²) stage; two docs collide with
    * probability jaccard^rowsPerBand per band, the LSH S-curve. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(rowsPerBand >= 1 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a positive multiple of rowsPerBand ($rowsPerBand)")
    // No explicit isNotNull filter on sig: a null signature (null text)
    // is dropped by the non-outer Generate below, and a filter here gets
    // predicate-pushed BELOW the projection, recomputing the whole
    // signature per row just to null-check it. Repartition spreads the
    // signature computation across cores (the doc scan is one split at
    // small scale).
    val sig = df.repartition(col(idCol))
      .select(col(idCol).as("id"),
        minhashSignature(col(textCol), k, numHashes).as("sig"))
    val numBands = numHashes / rowsPerBand
    val banded = sig.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)),
          b => slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)))))
      .select(col("id"), col("pos").as("band"), col("col").as("bandsig"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandsig") === col("b.bandsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** 32-bit SimHash over whitespace tokens: per bit j, sum ±1 weighted by
    * token count depending on bit j of the portable token hash; bit j of
    * the fingerprint is 1 iff the sum is positive. Single-pass native
    * expression; `simhash32Hof` is the executable spec it's tested against. */
  def simhash32(text: Column): Column = graft.functions.SimHash32(text)

  def simhash32Hof(text: Column): Column = {
    val toks = graft.text.TextAnalysis.tokens(text)
    val hashes = transform(toks, t => polyHash(t))
    val bits = (0 until 32).map { j =>
      val s = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(s > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-duplicate pairs: fingerprint each doc (simhash32),
    * then pairs within a blocking group whose Hamming distance is ≤
    * maxHamming. Fingerprints are 8 bytes regardless of doc size, so the
    * pair join streams tiny rows; at open scale the block key becomes
    * the fingerprint's high bits (prefix blocking). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, maxHamming: Int,
                   broadcastSmallSide: Boolean = true): DataFrame = {
    val fp = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
      simhash32(col(textCol)).as("fp"))
    val a = fp.select(col("id").as("id_a"), col("grp"), col("fp").as("fa"))
      .repartition(col("id_a"))
    val b = fp.select(col("id").as("id_b"), col("grp"), col("fp").as("fb"))
    val joined =
      if (broadcastSmallSide) a.join(broadcast(b), Seq("grp"))
      else a.join(b, Seq("grp"))
    joined
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding-cosine near-duplicate pairs inside a blocking group
    * (label = coarse cluster): pairs with cosine ≥ threshold. The block
    * join shuffles by group, never crossing the full corpus. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       groupCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"), col(groupCol).as("grp"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col(groupCol).as("grp"))
    a.join(b, Seq("grp"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", graft.vector.VectorOps.cosine6(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
