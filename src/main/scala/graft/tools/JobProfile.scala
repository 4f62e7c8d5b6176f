package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
import scala.util.control.NonFatal

/** Decomposes ONE bench query's wall time into its Spark jobs and the
  * driver-side gaps between them (planning, collects, fixture logic) —
  * the sf0.1 tables are small enough that per-query seconds are fixed
  * overhead, and this prints where that overhead actually sits.
  *
  * Usage: runMain graft.tools.JobProfile <queryName> [sfDir] [iters]
  */
object JobProfile {
  final case class JobRec(id: Int, desc: String, start: Long,
      var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <queryName> [sfDir] [iters]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query '$name'"))
    // untimed warm runs: fixture builds + codegen/JIT land here
    (1 to 2).foreach { _ =>
      try { fn(spark, sfDir).count(); () }
      catch { case NonFatal(e) => System.err.println(s"[prof] warm failed: $e"); throw e }
    }
    val jobs = mutable.ArrayBuffer[JobRec]()
    val byId = mutable.HashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val r = JobRec(j.jobId, desc, System.nanoTime(),
          stages = j.stageInfos.size,
          tasks = j.stageInfos.map(_.numTasks).sum)
        jobs += r; byId(j.jobId) = r
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
        byId.get(j.jobId).foreach(_.end = System.nanoTime())
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to iters).foreach { it =>
      jobs.clear(); byId.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t1 = System.nanoTime()
      Thread.sleep(200) // let listener events drain
      val wall = (t1 - t0) / 1e6
      println(f"\n=== $name iter $it: wall ${wall}%.0f ms, ${jobs.size} jobs ===")
      var prevEnd = t0
      var jobSum = 0.0
      var gapSum = 0.0
      jobs.foreach { r =>
        val gap = (r.start - prevEnd) / 1e6
        val dur = if (r.end > 0) (r.end - r.start) / 1e6 else -1.0
        jobSum += math.max(dur, 0); gapSum += math.max(gap, 0)
        val d = if (r.desc.length > 70) r.desc.take(70) + "…" else r.desc
        println(f"  gap ${gap}%7.1f ms | job ${r.id}%4d ${dur}%7.1f ms " +
          f"stages=${r.stages}%2d tasks=${r.tasks}%4d  $d")
        prevEnd = math.max(prevEnd, if (r.end > 0) r.end else r.start)
      }
      val tail = (t1 - prevEnd) / 1e6
      println(f"  tail gap ${math.max(tail, 0)}%7.1f ms (after last job)")
      println(f"  SUM jobs ${jobSum}%7.1f ms | driver gaps ${gapSum + math.max(tail, 0)}%7.1f ms | wall ${wall}%7.1f ms")
    }
    spark.stop()
  }
}
