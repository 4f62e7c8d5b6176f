package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb JVM/codegen/parquet-footer startup outside the timings
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }
    // warm the index build/search pipeline too (Dataset-map codegen,
    // shuffle writer, parquet committer) so per-query timings reflect
    // steady state rather than first-use JIT
    try {
      import spark.implicits._
      val tiny = (0L until 64L).map(i => (i, Seq.fill(8)(i.toFloat % 7 - 3)))
        .toDF("id", "vec")
      val wdir = s"${sys.props("java.io.tmpdir")}/graft-bench-warmup"
      val widx = graft.index.IvfIndex.build(tiny, "id", "vec", wdir,
        graft.index.IvfConfig(lists = 2))
      widx.search(Array.fill(8)(0.1f), 3, probes = 2).count()
      val widx16 = graft.index.IvfIndex.build(tiny, "id", "vec", s"$wdir-f16",
        graft.index.IvfConfig(lists = 2, storage = "f16"))
      widx16.search(Array.fill(8)(0.1f), 3, probes = 2).count()
      // warm the brute-force side too — both halves of the ANN-vs-brute
      // comparisons must start from steady-state JIT
      graft.ops.Knn.topK(tiny, "id", "vec", Array.fill(8)(0.1f), 3).count()
      graft.ops.Knn.knnJoin(tiny, "id", "vec",
        Array(0L -> Array.fill(8)(0.1f)), 3).count()
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // scale probe: synthetic 100k x 64-dim IVF build + ANN search vs brute
    // force — demonstrates the index path's advantage growing with N
    // (partition pruning + code-only estimate scan).
    val scale = scaleProbe(spark)
    val qs = (results ++ scale).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }

  private def scaleProbe(spark: org.apache.spark.sql.SparkSession): Seq[(String, Double)] = {
    import spark.implicits._
    try {
      val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "100000").toInt
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
