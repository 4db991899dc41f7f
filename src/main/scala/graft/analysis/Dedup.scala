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
  *  - n-gram Jaccard pair joins never broadcast a corpus side and never
  *    enumerate all pairs of any block: the group-blocked form is the
  *    count-form set-similarity join (equi-join shingle occurrences,
  *    count shared shingles per pair), the global form prefilters with
  *    MinHash+LSH bands and reranks with the exact fused merge-intersect.
  *  - MinHash signatures are fixed-width (numHashes longs) regardless of
  *    document size; the LSH band join shuffles only (band, bandHash)
  *    pairs, never O(N²).
  *  - SimHash pairs use pigeonhole bit-banding: exact all-pairs
  *    Hamming-≤-k semantics from k+1 per-band equi-joins.
  */
object Dedup {

  /** Repartition by `key` with an EXPLICIT partition count (the session's
    * `spark.sql.shuffle.partitions`). A bare `repartition(col)` emits
    * `REPARTITION_BY_COL`, which AQE is free to coalesce back down when
    * the *input bytes* are small — but these exchanges spread downstream
    * COMPUTE (shingle hashing, fingerprints, and most critically the
    * pair join+aggregate that rides this partitioning), which AQE's
    * size-based heuristic cannot see. Measured at sf0.1: the
    * ngramJaccardPairs join ran on AQE-coalesced partitions at 23.8 s vs
    * 2.0 s with the count pinned. */
  private def spread(df: DataFrame, key: Column): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    df.repartition(n, key)
  }

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
    * Distinct k-shingles per doc; Jaccard = |∩| / |∪| over the hashed
    * shingle sets (the MinHash-literature convention — the portable
    * polynomial hash makes the oracle reproduce identical sets,
    * collisions included); pairs with jaccard ≥ threshold, (id_a < id_b).
    *
    * Shape: the distributed count-form set-similarity join — explode
    * each doc's distinct shingle hashes, equi-join occurrences on
    * (group, shingle-hash), aggregate matches per (id_a, id_b) to get
    * |∩| directly, then join per-doc set sizes (|∪| = |A| + |B| − |∩|).
    * Nothing is ever broadcast, collected, or enumerated all-pairs on
    * the coarse group key (the round-2 scale defect): every stage is a
    * keyed shuffle of fixed-width (group, hash, id) rows — the shingle
    * ARRAYS never travel, and the pair aggregation's map-side combine
    * compresses the join output before its shuffle. Exactness is by
    * construction (every shared shingle is counted exactly once; a pair
    * with jaccard ≥ t > 0 shares ≥ 1 shingle, so no qualifying pair is
    * missed).
    *
    * Scale note: the occurrence join emits C(df, 2) rows per distinct
    * (group, shingle) — quadratic in the document frequency of the
    * hottest shingle. That is the inherent cost of EXACT pairwise
    * intersections on dense corpora: measured on the sf0.1 testdata,
    * 622,451 of the 622,500 in-group pairs (99.99%) share at least one
    * shingle, so EVERY exact candidate prefilter (shared-shingle,
    * rarity-ordered PPJoin prefix, length filter) keeps essentially all
    * pairs and only adds machinery — the candidate set, not the
    * algorithm, is the lower bound. On heavy-tailed real corpora prefer
    * [[minhashJaccardPairs]], which trades the exact candidate set for
    * the LSH S-curve and touches only colliding pairs. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, k: Int, threshold: Double): DataFrame = {
    // spread: the pair join + count aggregate below both RIDE this
    // partitioning (BHJ preserves the probe side; agg keys (id_a, id_b)
    // are subsumed by clustering on id), so its partition count is the
    // join's parallelism — pin it (see `spread`).
    val sets = spread(df, col(idCol))
      .select(col(idCol).as("id"), col(groupCol).as("grp"),
        shinglesHashes(col(textCol), k).as("ss")) // distinct per doc
    val toks = sets.select(col("id"), col("grp"), explode(col("ss")).as("h"))
    val sizes = sets.select(col("id"), size(col("ss")).as("n"))
    val inter = toks.as("a").join(toks.as("b"),
        col("a.grp") === col("b.grp") && col("a.h") === col("b.h") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("ic"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("jaccard",
        round(col("ic") / (col("na") + col("nb") - col("ic")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Scale-first n-gram Jaccard near-dup pairs: MinHash+LSH band
    * candidates ([[minhashCandidates]] — shuffles only (band, sub-sig)
    * keys, never a coarse-block pair explosion), reranked with the exact
    * fused merge-intersect Jaccard over the candidates' shingle sets.
    * No blocking column, no broadcast of any corpus side; recall follows
    * the LSH S-curve (jaccard^rowsPerBand per band), and every surviving
    * pair's score is EXACT. */
  def minhashJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                          k: Int, numHashes: Int, rowsPerBand: Int,
                          threshold: Double): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, k, numHashes, rowsPerBand)
    val sets = df.select(col(idCol).as("id"), shinglesHashes(col(textCol), k).as("ss"))
    cands
      .join(sets.select(col("id").as("id_a"), col("ss").as("sa")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("ss").as("sb")), Seq("id_b"))
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

  /** HOF form of the second polynomial (simhash64's high half):
    * fold (h*37+code) mod 998244353, seed 13. */
  def polyHashB(s: Column): Column =
    aggregate(split(s, ""), lit(graft.functions.SimHash64.SeedB),
      (h, c) => (h * graft.functions.SimHash64.MultB + ascii(c)) %
        graft.functions.SimHash64.ModB)

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
    // signature per row just to null-check it. `spread` spreads the
    // signature computation across cores (the doc scan is one split at
    // small scale) with a pinned partition count AQE can't coalesce.
    val sig = spread(df, col(idCol))
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

  /** 64-bit SimHash over whitespace tokens: per bit j, sum ±1 over
    * tokens by bit j of the token's bit source (j<32: the portable
    * polynomial hash; j≥32: a second independent polynomial — one
    * 30-bit hash alone cannot feed 64 fingerprint bits, see
    * [[graft.functions.SimHash64]]); fingerprint bit j is 1 iff the sum
    * is positive. Single-pass native expression; `simhash64Hof` is the
    * executable spec it's tested against. */
  def simhash64(text: Column): Column = graft.functions.SimHash64(text)

  def simhash64Hof(text: Column): Column = {
    val toks = graft.text.TextAnalysis.tokens(text)
    val hashes = transform(toks, t => polyHash(t))
    val hashesB = transform(toks, t => polyHashB(t))
    val bits = (0 until 64).map { j =>
      val hs = if (j < 32) hashes else hashesB
      val jj = if (j < 32) j else j - 32
      val s = aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, jj).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(s > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-duplicate pairs over the WHOLE corpus — EXACT
    * semantics (every pair with Hamming distance ≤ maxHamming, no
    * blocking column), generated scale-safely via pigeonhole banding
    * (Manku et al., WWW'07): split the 64-bit fingerprint into
    * maxHamming+1 bit-bands; any pair within distance maxHamming agrees
    * EXACTLY on at least one band, so the union of per-band equi-joins
    * has full recall. The join shuffles 8-byte (band, band-value) keys —
    * never O(N²) — and candidates dedup after the Hamming filter.
    * At maxHamming=2 each band key spans 21-22 bits (≥19 live after the
    * 4 structurally-dead modulus bits) — ~2M+ distinct values, versus
    * the 32-bit fingerprint's ≤2^11 that made band buckets quadratic at
    * corpus scale (the round-3 defect). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming in [0,64): $maxHamming")
    val bands = maxHamming + 1
    val cuts = (0 to bands).map(i => i * 64 / bands)
    // spread before the fingerprint so the single-split small-sf scan
    // doesn't serialize the SimHash computation (pinned count — AQE
    // would coalesce a bare by-col repartition of small input bytes)
    val fp = spread(df, col(idCol))
      .select(col(idCol).as("id"), simhash64(col(textCol)).as("fp"))
    val bandVals = (0 until bands).map { i =>
      val width = cuts(i + 1) - cuts(i)
      val mask = if (width >= 64) -1L else (1L << width) - 1 // 1L<<64 wraps to 1
      shiftright(col("fp"), cuts(i)).bitwiseAND(lit(mask))
    }
    val banded = fp.select(col("id"), col("fp"),
      posexplode(array(bandVals: _*)).as(Seq("band", "bval")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair can agree on several bands; dedup post-filter
  }

  /** Embedding-cosine near-duplicate pairs inside a blocking key
    * (`blockKey` — typically an LSH bucket, [[graft.search.Ann.lshBucket]],
    * or an IVF cluster id; fine-grained keys keep the per-block pair
    * join small and spread): pairs with cosine ≥ threshold. The block
    * join shuffles by key, never crossing the full corpus. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       blockKey: Column, threshold: Double): DataFrame = {
    val keyed = df.withColumn("grp", blockKey)
    val a = keyed.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("grp"))
    val b = keyed.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("grp"))
    a.join(b, Seq("grp"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", graft.vector.VectorOps.cosine6(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
