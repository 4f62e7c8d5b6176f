package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Synthetic N x 64-dim IVF build + ANN-vs-brute scale probe (invoked by
 * Bench per round at N=100k, and standalone for big-N anchors). The
 * standalone main exists because sbt's own JVM heap caps the probe around
 * 4M rows — run the 10M anchor in a dedicated JVM:
 *
 *   java -Xmx100g -XX:+UseG1GC \
 *     -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
 *     graft.tools.ScaleProbe 10000000
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0) else "100000"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = runN(spark, n.toInt)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","n":$n,"timings":$qs}""")
    spark.stop()
  }

  def run(spark: SparkSession): Seq[(String, Double)] =
    runN(spark, sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "100000").toInt)

  private def runN(spark: SparkSession, nRows: Int): Seq[(String, Double)] = scaleProbe(spark, nRows)

  private def scaleProbe(spark: org.apache.spark.sql.SparkSession, nRows: Int): Seq[(String, Double)] = {
    import spark.implicits._
    try {
      val n = nRows
      val dim = 64
      val df = spark.range(n).map { i =>
        val rng = new scala.util.Random(i)
        (i, Seq.fill(dim)(rng.nextFloat() * 2 - 1))
      }.toDF("id", "vec").repartition(32).cache()
      df.count()
      val dir = s"${sys.props("java.io.tmpdir")}/graft-bench-scale-$n"
      // config scales with n the way the reference's build guidance does
      // (BASELINE.md: hierarchical k-means + kmeans_dimension reduction +
      // bounded sampling are what make the 100M/20min and 1B/128GB claims):
      // >=500k rows adds a two-level centroid tree and clusters in a
      // 16-dim rotated-truncated space to keep the driver k-means bounded.
      val cfg =
        if (n >= 500000)
          graft.index.IvfConfig(lists = 256, kmeansAlgo = "hierarchical",
            kmeansDim = 16, lists1 = 16, samplingFactor = 128)
        else graft.index.IvfConfig(lists = 64, kmeansAlgo = "hierarchical")
      val t0 = System.nanoTime()
      val idx = graft.index.IvfIndex.build(df, "id", "vec", dir, cfg)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val q = Array.tabulate(dim)(j => ((j % 7) - 3) * 0.1f)
      val probes = math.max(8, math.ceil(math.sqrt(cfg.lists.toDouble)).toInt)
      // UNCACHED tier first — the disk-resident regime the reference's
      // economics target: ANN touches only the probed clusters' code
      // columns; brute decodes every stored vector
      val srcDir = s"$dir-src"
      df.write.mode("overwrite").parquet(srcDir)
      val coldIdx = graft.index.IvfIndex.load(spark, dir)
      val tc0 = System.nanoTime()
      coldIdx.search(q, 10, probes = probes, refine = 8).count()
      val tAnnUncached = (System.nanoTime() - tc0) / 1e9
      val tc1 = System.nanoTime()
      graft.ops.Knn.topK(spark.read.parquet(srcDir), "id", "vec", q, 10).count()
      val tBruteUncached = (System.nanoTime() - tc1) / 1e9
      // halfvec storage tier: same index shape, rerank vectors stored as
      // packed f16 — half the rerank bytes on an uncached scan
      val dir16 = s"$dir-f16"
      val t16 = System.nanoTime()
      graft.index.IvfIndex.build(df, "id", "vec", dir16, cfg.copy(storage = "f16"))
      val tBuild16 = (System.nanoTime() - t16) / 1e9
      // measured like the f32 uncached tier: a freshly loaded instance
      val idx16 = graft.index.IvfIndex.load(spark, dir16)
      val t16s = System.nanoTime()
      idx16.search(q, 10, probes = probes, refine = 8).count()
      val tAnn16 = (System.nanoTime() - t16s) / 1e9
      // serving model: index prewarmed (reference vchordrq_prewarm), same
      // memory residency the brute-force side gets from its cached df
      idx.prewarm()
      val t1 = System.nanoTime()
      val annIds = idx.search(q, 10, probes = probes, refine = 8).count()
      val tAnn = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      graft.ops.Knn.topK(df, "id", "vec", q, 10).count()
      val tBrute = (System.nanoTime() - t2) / 1e9
      // batch serving: nBatch queries in two jobs via searchMany vs the
      // brute partition-local-heap knnJoin — per-query job overhead
      // amortizes, which is where the index pays off in a batch engine
      val nBatch = 256
      val qs = Array.tabulate(nBatch) { i =>
        val rng = new scala.util.Random(1000 + i)
        i.toLong -> Array.fill(dim)(rng.nextFloat() * 2 - 1)
      }
      val t3 = System.nanoTime()
      idx.searchMany(qs, 10, probes = probes, refine = 8).count()
      val tBatch = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      graft.ops.Knn.knnJoin(df, "id", "vec", qs, 10).count()
      val tBruteBatch = (System.nanoTime() - t4) / 1e9
      df.unpersist()
      // B5 deep-tree probe economics: flat vs 3-level descent over 1024
      // synthetic centroids, 2000 probes each (driver-side cost only)
      val (tProbeFlat, tProbeTree) = graft.index.ProbeBench.run(spark)
      Seq(s"_scale_build_${n}" -> tBuild, s"_scale_ann_$n" -> tAnn,
        "_scale_probe2k_flat_1024" -> tProbeFlat,
        "_scale_probe2k_tree_1024" -> tProbeTree,
        s"_scale_brute_$n" -> tBrute,
        s"_scale_ann_uncached_$n" -> tAnnUncached,
        s"_scale_brute_uncached_$n" -> tBruteUncached,
        s"_scale_build_f16_$n" -> tBuild16,
        s"_scale_ann_f16_uncached_$n" -> tAnn16,
        s"_scale_annbatch${nBatch}_$n" -> tBatch,
        s"_scale_brutebatch${nBatch}_$n" -> tBruteBatch)
    } catch { case _: Throwable => Seq.empty }
  }
}
