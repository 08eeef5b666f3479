package graft.operators

/** Overlap INDEPENDENT Spark actions from a bounded driver pool
  * (optimization guide §2.6: actions are only sequential because the
  * driver calls them sequentially; scheduling independent jobs
  * together lets the next job's tasks back-fill executors freed by
  * the current job's tail — and at delta scale, where each job is a
  * handful of tasks, it collapses the serialized per-job scheduling
  * latency that otherwise IS the cost). Used for the independent
  * table writes of one store publish and for independent store
  * builds inside one composite lifecycle query. Exceptions propagate
  * to the caller (first failure wins, the pool is drained).
  */
object Par {
  def jobs(work: (() => Unit)*): Unit = {
    if (work.size <= 1) { work.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(work.size)
    try {
      val fs = work.map(w => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = w()
      }))
      fs.foreach(_.get())
    } finally pool.shutdown()
  }
}
