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
                        groupCol: String, k: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        explode(shingles(col(textCol), k)).as("sh"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.grp") === col("b.grp") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na")), "id_a")
      .join(broadcast(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb")), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature: for seed i, min over shingles of
    * (a_i · h(sh) + b_i) mod p, where h is the portable polynomial hash.
    * Fixed-size `Array[Long]` signature per doc. */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val p = Featurizer.HashMod
    val base = shinglesHashes(text, k)
    val perSeed = (0 until numHashes).map { i =>
      val a = 2L * i + 1 // odd multipliers
      val b = 7919L * (i + 1) % p
      array_min(transform(base, h => (h * a + b) % p))
    }
    array(perSeed: _*)
  }

  /** Portable polynomial hashes of the distinct k-shingles. */
  def shinglesHashes(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(length(text) - k, lit(0))),
      i => polyHash(substring(text, i + lit(1), lit(k)))))

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
    val sig = df.select(col(idCol).as("id"),
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
    * the fingerprint is 1 iff the sum is positive. */
  def simhash32(text: Column): Column = {
    val toks = graft.text.TextAnalysis.tokens(text)
    val hashes = transform(toks, t => polyHash(t))
    val bits = (0 until 32).map { j =>
      val s = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(s > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
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
