package graft.tools

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Isolated-JVM re-measurement of a single registered query — the bench
  * adjudication protocol (used ad hoc in rounds 14-15 to separate box
  * noise from plan changes) as a reusable main. A fresh JVM runs ONE
  * query: the first execution is untimed (fixture/cache builds,
  * whole-stage codegen, JIT), then `iters` timed repeats print
  * individually — steady-state spread in the same line. Compare the
  * steady band against the query's in-suite raw seconds: a mover whose
  * isolated band matches its OLD number was suite-position noise; one
  * matching the NEW number is a real change.
  *
  * Usage: runMain graft.tools.QueryProbe <queryName> [sfDir] [iters]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <queryName> [sfDir] [iters]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query '$name' — names " +
        s"come from SparkEntry.queries (${graft.SparkEntry.queries.size} registered)"))
    // untimed first run: fixture builds land here, like Bench's warm pass
    try { fn(spark, sfDir).count(); () }
    catch { case NonFatal(e) =>
      System.err.println(s"[probe] warm run failed: $e"); throw e }
    val ts = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val sortedTs = ts.sorted
    val median =
      if (ts.length % 2 == 1) sortedTs(ts.length / 2)
      else (sortedTs(ts.length / 2 - 1) + sortedTs(ts.length / 2)) / 2
    println(f"[probe] $name sf=$sfDir iters=$iters: " +
      ts.map(t => f"$t%.3f").mkString(" ") +
      f" (min ${ts.min}%.3f median $median%.3f)")
    spark.stop()
  }
}
