package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Per-query job/stage/task profile: run each named query (count() action,
  * same as Bench) under a listener and report how many Spark jobs, stages
  * and tasks it schedules plus wall seconds — the first diagnostic for
  * queries whose cost is fixed scheduling overhead rather than data
  * (guide §1: measure first; §2.4: remove shuffles outright).
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> q1,q2,... [reps]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.GraftSession.local(cpus, "graft-profile")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    // warmup
    spark.read.parquet(s"$sfDir/region.parquet").count()
    println(f"${"query"}%-28s ${"sec"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // one untimed run to absorb codegen/first-touch, then `reps` timed
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"$name warmup FAILED: ${e.getMessage}") }
      spark.sharedState.cacheManager.clearCache()
      // per-rep (secs, jobs, stages, tasks) snapshots so the printed row's
      // timing and scheduling counters describe the SAME run (ADVICE r13:
      // last-rep counters next to min-across-reps seconds mixed runs)
      val snaps = (1 to reps).map { _ =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        Thread.sleep(200) // let the async listener bus drain before snapshotting
        (dt, jobs.get, stages.get, tasks.get)
      }
      val best = snaps.minBy(_._1)
      println(f"$name%-28s ${best._1}%8.3f ${best._2}%6d ${best._3}%7d ${best._4}%7d")
    }
    spark.stop()
  }
}
