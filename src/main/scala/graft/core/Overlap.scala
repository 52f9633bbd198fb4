package graft.core

/** Overlap independent driver-submitted Spark jobs (optimization
  * guide §2.6): Spark happily runs several jobs at once inside one
  * application — actions are only sequential because driver code
  * calls them sequentially — so a batch of independent collects
  * submitted from a small thread pool back-fills executor cores that
  * a single job's straggler tail (or its small input-split count)
  * would leave idle.
  *
  * The pool is DEDICATED and bounded: `ExecutionContext.global`'s
  * parallelism is the core count and its threads are shared with any
  * other library caller, so blocking Spark collects there can starve
  * the pool (and nested blocking Awaits can deadlock). A fixed pool
  * sized to the batch, shut down when the batch completes, cannot.
  * `Future.sequence` fails the whole batch on the first error — the
  * pool is then torn down with `shutdownNow` instead of leaking
  * detached sibling jobs — and the await is finite. Results come
  * back in task order.
  *
  * Job descriptions/groups are thread-local in Spark, so each
  * concurrent job is labelled independently in the UI.
  */
object Overlap {
  /** Jobs in flight at once. Guide §2.6: "2-3 jobs in flight is
    * plenty: enough to fill the tail, not so many that they fight for
    * executors" — measured here too: the profiler's 11 column jobs
    * fully concurrent at 10x data and 32 cores oversubscribed the
    * host (33.9 s vs 7.2 s at 8 cores); excess tasks queue on the
    * bounded pool and back-fill as slots free.
    */
  val MaxInFlight = 4

  def overlapped[A](tasks: Seq[(String, () => A)]): Seq[(String, A)] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(math.min(tasks.size, MaxInFlight), 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(
      Future.sequence(tasks.map { case (n, f) => Future((n, f())) }),
      1.hour)
    catch { case e: Throwable => pool.shutdownNow(); throw e }
    finally pool.shutdown()
  }
}
