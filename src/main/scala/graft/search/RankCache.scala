package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-keyed RESULT cache — the serving-layer memo the reference's
  * session flow implies (one corpus live at a time, the same questions
  * re-asked against it): a ranking computed against corpus version `v`
  * is immutable — the corpus can't change under a named snapshot — so
  * it persists under `cache/v=<version>/q=<queryKey>/` and every
  * repeat probe is a file read of k rows instead of a corpus scan.
  *
  * Invalidation is STRUCTURAL, not temporal: the version tag is part
  * of the path, so a new snapshot simply misses the cache and
  * computes — no TTLs, no stale reads, no deletion races (stale
  * versions' entries become dead directories; clear them with the
  * snapshot retention sweep that already expires their corpora).
  * Keys must be deterministic (a query-vector hash, a term-bag
  * fingerprint); the cache stores whatever frame `compute` returns,
  * so any ranking operator composes. The k-row write is driver-cheap;
  * the payoff at 100 TB is every repeat probe skipping the scan.
  */
object RankCache {

  def entryPath(cacheDir: String, version: String, queryKey: String): String =
    s"$cacheDir/v=$version/q=$queryKey"

  /** Serve from cache, or compute-and-fill: the read-through memo.
    * A hit requires the committer's `_SUCCESS` marker, not just the
    * directory: an interrupted fill leaves a partial directory, and
    * "cache is semantically invisible" forbids ever serving it —
    * incomplete entries are recomputed and overwritten. */
  def cachedResult(spark: SparkSession, cacheDir: String, version: String,
                   queryKey: String)(compute: => DataFrame): DataFrame = {
    val path = entryPath(cacheDir, version, queryKey)
    if (!graft.io.Fs.exists(spark, s"$path/_SUCCESS")) {
      // checkpoint before writing: the computed plan must not re-run
      // during its own write, and the caller may hold lazy upstream
      compute.localCheckpoint().write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
