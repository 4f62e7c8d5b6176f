package graft.tools

import org.apache.spark.sql.SparkSession

/** §6 I/O probe for the postings build (`_scale_kwbuild200k`, r18
  * VERDICT #8): measures the SAME buildPostings call under parquet
  * codec and row-group-size variants before touching the operator —
  * the key is write-bound, so the question is purely bytes-vs-CPU.
  * Reports build seconds, on-disk postings bytes, and the indexed
  * search time per variant (the clustering the read side depends on
  * must not regress).
  *
  * Usage: runMain graft.tools.KwBuildProbe [nDocs] [iters]
  */
object KwBuildProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val iters = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = s"${sys.props("java.io.tmpdir")}/graft-kwbuild-probe"
    // the ScaleProbe corpus, verbatim: 100 Zipf-ish tokens per doc
    val docsPath = s"$base/docs-$n"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$docsPath/_SUCCESS"))) {
      spark.range(n).map { i =>
        val sb = new java.lang.StringBuilder(800)
        var x = i * 2862933555777941757L + 3037000493L
        var j = 0
        while (j < 100) {
          x = x * 6364136223846793005L + 1442695040888963407L
          val u = (x >>> 11).toDouble / (1L << 53).toDouble
          if (j > 0) sb.append(' ')
          sb.append('w').append((u * u * 10000).toInt)
          j += 1
        }
        (i, sb.toString)
      }.toDF("doc_id", "text").write.mode("overwrite").parquet(docsPath)
    }
    val docs = spark.read.parquet(docsPath)
    docs.count()
    val terms = Seq("w8111", "w9222", "w9333")
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) return -1L
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    val variants = Seq(
      ("default", null, -1),
      ("zstd", "zstd", -1),
      ("lz4", "lz4", -1),
      ("uncompressed", "uncompressed", -1),
      ("snappy-8m-rg", "snappy", 8 << 20),
      ("zstd-8m-rg", "zstd", 8 << 20))
    variants.foreach { case (label, codec, blockSize) =>
      if (codec != null)
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
      else spark.conf.unset("spark.sql.parquet.compression.codec")
      if (blockSize > 0)
        spark.sparkContext.hadoopConfiguration
          .setInt("parquet.block.size", blockSize)
      else
        spark.sparkContext.hadoopConfiguration.unset("parquet.block.size")
      val dir = s"$base/idx-$label"
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Search.buildPostings(docs, "doc_id", "text", dir,
          nBuckets = 64)
        (System.nanoTime() - t0) / 1e9
      }
      val idx = graft.ops.Search.loadPostings(dir)
      idx.search(spark, terms, 100).collect() // warm
      val ts2 = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        idx.search(spark, terms, 100).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[kwbuild] $label%-14s build " +
        ts.map(t => f"$t%.2f").mkString(" ") +
        f" (min ${ts.min}%.2f) bytes ${dirBytes(s"$dir/postings")}%,d " +
        f"search-min ${ts2.min}%.3f")
    }
    // decomposition: the three independent passes buildPostings chains
    import org.apache.spark.sql.functions._
    def secs(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val t = split(col("text"), " ")
    (1 to iters).foreach { _ =>
      val tAgg = secs(docs.agg(count(lit(1)),
        coalesce(sum(size(t)), lit(0L)).cast("long")).head())
      val tNorms = secs(docs.select(col("doc_id").cast("long"), size(t).as("dl"))
        .write.mode("overwrite").parquet(s"$base/norms-probe"))
      println(f"[kwbuild] decomp: head-agg $tAgg%.2f norms-write $tNorms%.2f " +
        "(postings-write = build minus these)")
    }
    spark.conf.unset("spark.sql.parquet.compression.codec")
    spark.sparkContext.hadoopConfiguration.unset("parquet.block.size")
    spark.stop()
  }
}
