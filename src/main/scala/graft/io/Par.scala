package graft.io

/** Driver-side parallelism over INDEPENDENT Spark actions — the
  * fixed-uplift remedy for operators whose cost is many SMALL jobs
  * rather than data (an index build is two unrelated writes; a health
  * evaluation is two unrelated scans; at a few thousand rows each job
  * is ~100-300 ms of scheduling, and running them serially doubles
  * the operator's latency for no reason — Spark's scheduler runs
  * concurrent actions on one session natively, FAIR/FIFO within the
  * pool).
  *
  * Contract, shared with `SparkEntry.parUnit` (the round-15 opq
  * precedent): a DEDICATED pool sized to the thunk count — Spark
  * actions BLOCK their thread, so the global fork-join pool would
  * starve under action counts near core count; every thunk SETTLES
  * before the first failure rethrows, so no background write is still
  * in flight when the caller sees the error; `Await` gives the
  * happens-before edge for anything a thunk wrote. Use ONLY for
  * actions with no ordering dependency (two sides of one index, two
  * independent health reports) — anything sequenced (append → evaluate)
  * stays sequential. */
private[graft] object Par {

  def unit(thunks: (() => Unit)*): Unit = {
    join(thunks.map(t => () => { t(); () }): _*): Unit
  }

  /** Two independent driver-blocking computations, joined. */
  def join2[A, B](a: => A, b: => B): (A, B) = {
    val rs = join(() => a, () => b)
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B])
  }

  /** Three independent driver-blocking computations, joined. */
  def join3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val rs = join(() => a, () => b, () => c)
    (rs(0).asInstanceOf[A], rs(1).asInstanceOf[B], rs(2).asInstanceOf[C])
  }

  /** N independent computations of one type, joined IN ORDER (the
    * result sequence aligns with the input thunks — a union built
    * over it is deterministic). */
  def seq[A](thunks: Seq[() => A]): Seq[A] =
    join(thunks: _*).map(_.asInstanceOf[A])

  private def join(thunks: (() => Any)*): Seq[Any] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, thunks.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val settled = thunks.map(t =>
        Future(t()).transform(scala.util.Success(_)))
      Await.result(Future.sequence(settled),
          scala.concurrent.duration.Duration.Inf)
        .map(_.get) // rethrows the FIRST failure, after all settled
    } finally { pool.shutdown(); () }
  }
}
