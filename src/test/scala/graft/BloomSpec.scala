package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFilter

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key probes true") {
    val keys = (0L until 500L).map(_ * 37 + 11)
    val bloom = keys.toDF("k").agg(BloomFilter.agg(col("k"), 4096, 3).as("bf"))
    val misses = keys.toDF("k").crossJoin(broadcast(bloom))
      .filter(!BloomFilter.mightContain(col("bf"), col("k"), 3))
      .count()
    assert(misses == 0)
  }

  test("empty filter rejects everything; false-positive rate is sane") {
    val empty = Seq.empty[Long].toDF("k")
      .agg(BloomFilter.agg(col("k"), 4096, 3).as("bf"))
    val probes = (0L until 1000L).toDF("k")
    assert(probes.crossJoin(broadcast(empty))
      .filter(BloomFilter.mightContain(col("bf"), col("k"), 3)).count() == 0)
    // 200 keys in 4096 bits / k=3: fp rate ~0.3%; 10k absent probes
    val bloom = (1000000L until 1000200L).toDF("k")
      .agg(BloomFilter.agg(col("k"), 4096, 3).as("bf"))
    val fp = (0L until 10000L).toDF("k").crossJoin(broadcast(bloom))
      .filter(BloomFilter.mightContain(col("bf"), col("k"), 3)).count()
    assert(fp < 200, s"fp=$fp") // generous bound; determinism is oracle-checked
  }

  test("position hashing is engine-portable integer arithmetic") {
    // the DuckDB oracle computes (((k % p) * a_i + 7919*(i+1)) % p) % m
    val as = Seq(2654435761L, 2246822519L, 3266489917L)
    for (k <- Seq(0L, 1L, 12345L, Long.MaxValue); i <- 0 until 3) {
      val p = BigInt(1000000007L)
      val expect = (((BigInt(k) % p) * as(i) + 7919 * (i + 1)) % p % 4096).toInt
      assert(BloomFilter.position(k, i, 4096) == expect, s"k=$k i=$i")
    }
  }

  test("bloom_agg / bloom_might_contain via spark.sql") {
    GraftExtensions.register(spark)
    val hit = spark.sql(
      """SELECT bloom_might_contain(
        |  (SELECT bloom_agg(id, 4096, 3) FROM range(0, 100)), 42L, 3) AS hit"""
        .stripMargin).head().getBoolean(0)
    assert(hit)
  }
}
