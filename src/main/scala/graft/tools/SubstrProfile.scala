package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level breakdown of [[graft.ops.Curation.substringDedup]] on the
  * ScaleProbe curate fixture — the `_scale_curate_substr200k` shape. Runs
  * the operator end-to-end, then its first stages in isolation, and
  * prints the AQE FINAL plan (post-execution), which is where join
  * strategy choices (SMJ vs broadcast) are visible.
  *
  * Usage: runMain graft.tools.SubstrProfile [nDocs]
  */
object SubstrProfile {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 200000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "window", "order",
      "data", "column", "join", "small", "line", "customer", "query", "big",
      "vector", "stream", "filter", "sort", "group", "the", "a")
    val docsDf = spark.range(nDocs).map { i =>
      val sb = new java.lang.StringBuilder(600)
      var x = i * 6364136223846793005L + 1442695040888963407L
      val len = 60 + (math.abs(x) % 80).toInt
      var j = 0
      while (j < len) {
        x = x * 6364136223846793005L + 1442695040888963407L
        if (j > 0) sb.append(' ')
        sb.append(vocab((math.abs(x) % vocab.length).toInt))
        j += 1
      }
      (i, sb.toString)
    }.toDF("doc_id", "text").cache()
    docsDf.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[substr] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // per-stage wall/task-time breakdown of the steady-state run
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Int)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), wall,
            si.taskMetrics.executorRunTime, si.numTasks))
        }
    }
    // end-to-end, twice (second = steady state)
    val full = graft.ops.Curation.substringDedup(docsDf, "doc_id", "text", k = 8)
    time("full x1")(full.agg(sum(length(col("text_clean"))), sum(col("n_removed"))).collect())
    val q = full.agg(sum(length(col("text_clean"))), sum(col("n_removed")))
    spark.sparkContext.addSparkListener(listener)
    time("full x2")(q.collect())
    Thread.sleep(300)
    println("=== stages (steady run): id wall_ms task_ms ntasks name ===")
    stages.sortBy(-_._3).foreach { case (id, name, wall, task, n) =>
      println(f"[stage] $id%4d wall=$wall%6d task=$task%7d n=$n%3d  $name")
    }
    println("=== AQE final plan (post-execution) ===")
    println(q.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
