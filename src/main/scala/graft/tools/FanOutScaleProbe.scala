package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B evidence for [[graft.core.FanOut]] at the scale it exists for
  * (r18, VERDICT #7): the four codec ops route input through FanOut,
  * which is a designed NO-OP at fixture scale — so its win was
  * design-verified only. This probe builds the case FanOut targets (one
  * LARGE single-row-group parquet file, whose scan is one task however
  * many cores the box has), prints the plan with and without the
  * fan-out (conf `graft.fanout.parts=1` disables it), and times the
  * feature pass both ways.
  *
  * Usage: runMain graft.tools.FanOutScaleProbe [nRows] [iters]
  */
object FanOutScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft-fanout-probe-$n"
    // one row group: coalesce(1) + a block size far above the file size.
    // Real media bytes are INCOMPRESSIBLE — the synthetic PNGs alone
    // dictionary-encode to ~0.4 MB for 50k rows (256 distinct blobs),
    // which no byte-based gate should treat as heavy — so each blob
    // carries deterministic pseudo-random padding after the PNG stream
    // (ImageIO stops at IEND; decode is unchanged) to give the file the
    // footprint the decode work actually represents.
    def pad(i: Long): Array[Byte] = {
      val png = graft.ops.Multimodal.syntheticPng(i)
      val out = java.util.Arrays.copyOf(png, png.length + 4096)
      var x = i * 6364136223846793005L + 1442695040888963407L
      var j = png.length
      while (j < out.length) {
        x = x * 6364136223846793005L + 1442695040888963407L
        out(j) = (x >>> 40).toByte
        j += 1
      }
      out
    }
    spark.range(n).map(i => (i, pad(i)))
      .toDF("id", "blob").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (1L << 30).toString)
      .parquet(dir)
    val df = spark.read.parquet(dir)
    val scanParts = df.rdd.getNumPartitions
    println(s"[fanout-probe] file rows=$n scan partitions=$scanParts " +
      s"bytes=${df.queryExecution.optimizedPlan.stats.sizeInBytes}")
    def features() = graft.ops.Multimodal.extractFeatures(df, "id", "blob",
      dim = 64)
    def timeIt(label: String): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        assert(features().count() == n)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[fanout-probe] $label: " +
        ts.map(t => f"$t%.2f").mkString(" ") +
        f" (min ${ts.min}%.2f)")
    }
    println("=== plan WITH FanOut (default) ===")
    features().explain("formatted")
    features().count() // warm
    timeIt("with-fanout")
    spark.conf.set("graft.fanout.parts", "1") // <= 1 disables the fan-out
    println("=== plan WITHOUT FanOut (graft.fanout.parts=1) ===")
    features().explain("formatted")
    features().count() // warm
    timeIt("without-fanout")
    spark.conf.unset("graft.fanout.parts")
    spark.stop()
  }
}
