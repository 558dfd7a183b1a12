package graft

/** Driver-side job overlap (optimization guide §2.6): Spark happily
  * runs several jobs at once inside one application — actions are
  * only sequential because driver code calls them sequentially.
  * Pipelines that run a handful of INDEPENDENT bounded actions
  * (per-table writes, key collects, read-back counts) submit them
  * from a small pool so the next job's tasks back-fill executors
  * freed by the current job's tail; at local bench scale this
  * collapses the per-job scheduling floor, at cluster scale it fills
  * stragglers' idle capacity. FIFO scheduling (the default) gives
  * exactly the back-fill behaviour. */
private[graft] object Threads {
  /** Run the thunks on up to `width` threads, return results in
    * order, rethrow the first failure. */
  def inParallel[T](work: Seq[() => T], width: Int = 4): Seq[T] = {
    if (work.size <= 1) work.map(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(width, work.size))
      try {
        val futs = work.map(w => pool.submit(
          new java.util.concurrent.Callable[T] { def call(): T = w() }))
        futs.map(_.get())
      } finally pool.shutdown()
    }
  }
}
