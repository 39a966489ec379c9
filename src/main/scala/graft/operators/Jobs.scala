package graft.operators

/** Run independent driver-side actions as CONCURRENT Spark jobs (guide
  * §2.6: Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because the driver calls them
  * sequentially — 2-3 jobs in flight fills one job's scheduling tail with
  * the next job's tasks without fighting for cores).
  *
  * Use ONLY across tasks with NO ordering constraint between them:
  * disjoint output directories, or reads of frames that are already
  * pinned/materialized. Anything that is a commit protocol (the
  * append/compact write orders, staged-swap sequences) stays sequential
  * at its call site. Checkpoints' scope tracking is thread-local and
  * write leases are per-directory, so family-level tasks compose safely.
  * Failures propagate with their original exception type. */
private[graft] object Jobs {

  def concurrently(tasks: (() => Unit)*): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      val futs = tasks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = t()
      }))
      futs.foreach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdown()
  }
}
