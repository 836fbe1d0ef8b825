package graft.core

/** Bounded overlap for INDEPENDENT Spark actions (optimization guide
  * §2.6 "Overlap independent jobs"): Spark's scheduler happily runs
  * several jobs at once inside one application — actions are only
  * sequential because caller code invokes them sequentially. Submitting
  * independent pieces (different store builds, independent read-only
  * audits) from a small pool lets the next job's tasks back-fill
  * executor slots freed by the current job's straggler tail, and
  * overlaps the per-job driver constants (planning, AQE updates, commit
  * protocol) that otherwise serialize.
  *
  * FIFO scheduling (the default) gives earlier tasks priority — exactly
  * the back-fill behavior wanted. Callers MUST only group tasks with no
  * data or lease dependency on each other (every maintained store here
  * leases its own root, so distinct-store tasks never contend).
  *
  * Results return in input order; the first failure propagates (after
  * all tasks settle, so no half-cancelled fixture states). */
object Par {

  def run[T](parallelism: Int)(tasks: Seq[() => T]): Seq[T] = {
    require(parallelism > 0, "Par.run: parallelism must be positive")
    if (tasks.size <= 1) return tasks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, tasks.size))
    try {
      val fs = tasks.map(t => pool.submit(
        new java.util.concurrent.Callable[T] { override def call(): T = t() }))
      // settle everything before surfacing the first failure — and
      // surface the task's OWN exception, not the pool's
      // ExecutionException wrapper (callers match on the real type:
      // store-op refusals, injected failpoints)
      val settled = fs.map(f => scala.util.Try(f.get()).recoverWith {
        case e: java.util.concurrent.ExecutionException
          if e.getCause != null => scala.util.Failure(e.getCause)
      })
      settled.map(_.get)
    } finally pool.shutdown()
  }

  /** The common 3-wide grouping: enough overlap to fill the tail, not
    * enough to thrash the scheduler (the guide's "2-3 jobs in flight is
    * plenty"). */
  def run3[T](tasks: (() => T)*): Seq[T] = run(3)(tasks)
}
