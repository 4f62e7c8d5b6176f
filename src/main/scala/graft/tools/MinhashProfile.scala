package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Dedup

/** Decomposes dedup_minhash's per-run seconds (r18, guide §1): Catalyst
  * planning of the full pipeline plan vs the signature pass vs the
  * end-to-end run. JobProfile showed a repeatable ~0.5 s driver gap
  * with no job running early in every iteration — this separates "the
  * plan is expensive to build" from "a stage is slow".
  *
  * Usage: runMain graft.tools.MinhashProfile [sfDir] [iters]
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // footer + JIT warm
    def secs(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // untimed warm run (codegen, JIT)
    Dedup.minhashDedup(docs, "doc_id", "text", 0.4).count()
    Dedup.minhashSignatures(docs, "doc_id", "text").count()
    (1 to iters).foreach { i =>
      val tRdd = secs {
        import spark.implicits._
        docs.select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
          org.apache.spark.sql.functions.col("text")).as[(Long, String)].rdd
      }
      println(f"[minhash] iter $i: .rdd-alone ${tRdd}%.3f")
      val tBuild = secs(Dedup.minhashDedup(docs, "doc_id", "text", 0.4))
      val df = Dedup.minhashDedup(docs, "doc_id", "text", 0.4)
      val tPlan = secs(df.queryExecution.executedPlan)
      val tRun = secs(df.count())
      val tSig = secs(Dedup.minhashSignatures(docs, "doc_id", "text").count())
      println(f"[minhash] iter $i: build ${tBuild}%.3f plan ${tPlan}%.3f " +
        f"run-after-plan ${tRun}%.3f sigpass ${tSig}%.3f")
    }
    spark.stop()
  }
}
