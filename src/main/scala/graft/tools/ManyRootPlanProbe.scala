package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, typedlit}

/**
 * Many-root planning-latency anchor for the partitioned-table serve
 * (COVERAGE planner narrative; reference per-partition indexes,
 * tests/vchordrq/partition.slt): a date-partitioned corpus with R
 * children, one index per child, measures how long the OPTIMIZER takes
 * to produce the served plan (optimizedPlan materialization — the pool
 * job runs inside it) as R grows.
 *
 * Round-11 baseline (per-root union-of-frames pool, one job): 0.44 s at
 * 4 roots, 0.55 at 8, 1.16 at 16, 3.09 at 32 — linear in R from
 * Catalyst analyzing R union branches + R per-index reads. The flat
 * multi-root read (IvfIndex.multiEstimateCandidates: ONE relation over
 * every root's probed cluster dirs) is what this probe grades.
 *
 *   java -Xmx16g -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
 *     graft.tools.ManyRootPlanProbe 4,8,16,32,128
 */
object ManyRootPlanProbe {
  def main(args: Array[String]): Unit = {
    val widths = (if (args.nonEmpty) args(0) else "4,8,16,32,128")
      .split(",").map(_.trim.toInt)
    val rowsPerRoot = sys.env.getOrElse("SPARK_GRAFT_ROOT_ROWS", "2000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def say(s: String): Unit = System.err.println(s"[manyroot] $s")
    val dim = 8
    val rule = graft.plans.AnnTopKRewrite(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    spark.conf.set("graft.ann.cost.enable", "false")
    val q = Array.fill(dim)(0.15f)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    widths.foreach { r =>
      val base = s"${sys.props("java.io.tmpdir")}/graft-manyroot-$r"
      val tableDir = s"$base-table"
      val fresh = !java.nio.file.Files.exists(java.nio.file.Paths.get(tableDir))
      if (fresh) {
        val rng = new scala.util.Random(181)
        (0 until r).foreach { p =>
          (0L until rowsPerRoot.toLong)
            .map(i => (p * rowsPerRoot + i, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
            .toDF("id", "vec")
            .write.mode("overwrite").parquet(s"$tableDir/part=$p")
        }
      }
      (0 until r).foreach { p =>
        val d = s"$base-idx$p"
        if (fresh || !java.nio.file.Files.exists(java.nio.file.Paths.get(d, "CURRENT")))
          graft.index.IvfIndex.build(spark.read.parquet(s"$tableDir/part=$p"),
            "id", "vec", d, graft.index.IvfConfig(lists = 4))
        graft.plans.AnnCatalog.register(s"$tableDir/part=$p", d, "id", "vec")
      }
      def planOnce(): Double = {
        val df = spark.read.parquet(tableDir)
          .orderBy(graft.functions.GraftFunctions.vecL2(col("vec"), typedlit(q.toSeq)))
          .limit(10).select("id")
        val t = System.nanoTime()
        val plan = df.queryExecution.optimizedPlan
        val sec = (System.nanoTime() - t) / 1e9
        require(plan.toString.contains(" IN "), s"$r-root query not served")
        sec
      }
      planOnce() // warm: index loads, cover memo, codegen
      val times = (1 to 3).map(_ => planOnce())
      val best = times.min
      out(s"plan_roots_$r") = best
      say(f"roots=$r%3d planning ${best}%.3f s (runs: ${times.map(t => f"$t%.3f").mkString(", ")})")
      (0 until r).foreach(p =>
        graft.plans.AnnCatalog.unregister(s"$tableDir/part=$p"))
    }
    val json = out.map { case (k, v) => s""""$k":${math.round(v * 1000) / 1000.0}""" }
      .mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
