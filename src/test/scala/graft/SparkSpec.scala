package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test` fork). */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"

  /** Shuffle-write bytes of `f`'s Spark jobs — the shared harness of
    * every scale-exhibit test. Deterministic bus drain before
    * registering and after running (a late stage-completed event must
    * not leak bytes into another measurement, and a fixed-interval
    * poll can declare quiet while events are still queued); the
    * listener is registered fresh per call and removed on exit, so
    * each measurement is self-contained and measurements compose
    * sequentially without a shared counter reset. */
  def shuffleMeasured[A](f: => A): (A, Long) = {
    val shuffle = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffle.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    def quiesce(): Unit =
      org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(
        spark.sparkContext, 30000L)
    quiesce()
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = f
      quiesce()
      (r, shuffle.get)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
