package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Codes-only (storeVectors=false) index anchors at the reference's
 * flagship geometry — the small-index economics of `rerank_in_table=true`
 * (reference: src/index/vchordrq/types.rs:19-45, rerank from the heap
 * crates/vchordrq/src/rerank.rs:111+) measured directly:
 *
 *   java -Xmx100g -XX:+UseG1GC \
 *     -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
 *     graft.tools.NovecScale <nRows> <dim> <bits> <src|nosrc> [lists] [passes]
 *
 * passes > 1 stages the build in cluster-range passes
 * (IvfConfig.buildPasses): peak scratch = index bytes + ONE pass's shuffle
 * instead of index + the full-table shuffle — the knob that fits a 1B-row
 * build under this sandbox's ~80 GB free disk. A background sampler
 * reports the observed peak (blockmgr shuffle dirs + index dir) as
 * `_novec_peak_disk_gb_*`.
 *
 * Modes:
 *   src    source table also written as parquet (disk-resident regime):
 *          uncached EXACT ANN via rerank-in-table, batch, and a range
 *          point are measured against it. Needs n*dim*4 bytes of disk
 *          for the source ON TOP of the index — 10M x 768d fits this
 *          box, 100M x 768d does not.
 *   nosrc  no source table anywhere (the generator IS the source: rows
 *          are deterministic in id, regenerated per scan). The build
 *          measures the true full-scale wall; queries are ESTIMATE-ONLY
 *          (searchMany(exactBudget=0, epsilon=0)) because exact rerank
 *          needs vectors this box cannot store at 100M x 768d — stated
 *          honestly in the key names.
 *
 * bits=1 is the reference index's own fast-scan tier (classic RaBitQ
 * binary codes, crates/rabitq/src/bit.rs) — 96 B/row at 768d, which is
 * what makes a single-shot 100M x 768d build (+ its one co-location
 * shuffle) fit a 250 GB box.
 */
object NovecScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 768
    val bits = if (args.length > 2) args(2).toInt else 8
    val withSrc = args.length <= 3 || args(3) == "src"
    // lists scales with N (the reference sizes lists ~ sqrt(n) tiers);
    // default 256 preserves the prior anchors' config byte-for-byte
    val lists = if (args.length > 4) args(4).toInt else 256
    val passes = if (args.length > 5) args(5).toInt else 1
    val lists1 = math.max(16, math.ceil(math.sqrt(lists.toDouble)).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def say(s: String): Unit = System.err.println(s"[novec] $s")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed(key: String)(body: => Unit): Unit = {
      val t = System.nanoTime(); body
      val sec = (System.nanoTime() - t) / 1e9
      out += (key -> sec); say(f"$key = $sec%.2fs")
    }
    val tag = s"${n}_d${dim}_b$bits"
    val gen = spark.range(n).map { i =>
      val rng = new scala.util.Random(i)
      (i, Array.fill(dim)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "vec")
    val dir = s"${sys.props("java.io.tmpdir")}/graft-novec-$tag"
    val srcDir = s"$dir-src"
    val df =
      if (withSrc) {
        val done = new java.io.File(s"$srcDir/_SUCCESS").exists()
        if (!done) gen.write.mode("overwrite").parquet(srcDir)
        else say(s"reusing source parquet at $srcDir")
        spark.read.parquet(srcDir)
      } else gen // generator-as-source: deterministic rows, no storage
    val cfg = graft.index.IvfConfig(lists = lists, bits = bits,
      kmeansAlgo = "hierarchical", kmeansDim = 16, lists1 = lists1,
      samplingFactor = 128, storeVectors = false, assignByTree = true,
      buildPasses = passes)
    var idx: graft.index.IvfIndex = null
    // SPARK_GRAFT_NOVEC_REUSE=1: reload a previously built index instead
    // of rebuilding — re-measures the query side only (the build anchor
    // comes from the original run)
    val reuse = sys.env.get("SPARK_GRAFT_NOVEC_REUSE").contains("1") &&
      new java.io.File(s"$dir/CURRENT").exists()
    // index bytes on disk — THE economics of the codes-only mode
    def du(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(q => try java.nio.file.Files.size(q)
            catch { case _: java.io.IOException => 0L })
          .sum()
        finally s.close()
      }
    }
    if (reuse) {
      say(s"reusing index at $dir (build untimed)")
      idx = graft.index.IvfIndex.load(spark, dir)
    } else {
      // peak transient disk demand during the build: shuffle scratch
      // (blockmgr dirs) + the accumulating index — what the staged build
      // exists to bound (single-shot 1B demanded ~94 GB vs 79 GB free)
      @volatile var sampling = true
      @volatile var peak = 0L
      val sampler = new Thread(() => {
        while (sampling) {
          val now = graft.index.IvfIndex.shuffleScratchBytes() + du(dir)
          if (now > peak) peak = now
          Thread.sleep(3000)
        }
      }, "novec-disk-sampler")
      sampler.setDaemon(true)
      sampler.start()
      timed(s"_novec_build_$tag") {
        idx = graft.index.IvfIndex.build(df, "id", "vec", dir, cfg)
      }
      sampling = false
      say(f"peak build disk (shuffle + index) = ${peak / 1e9}%.2f GB (passes=$passes)")
      out += (s"_novec_peak_disk_gb_$tag" -> peak / 1e9)
    }
    val bytes = du(dir)
    say(f"index bytes = ${bytes / 1e9}%.2f GB (${bytes.toDouble / n}%.0f B/row)")
    out += (s"_novec_index_gb_$tag" -> bytes / 1e9)
    val q = Array.tabulate(dim)(j => ((j % 7) - 3) * 0.1f)
    val probes = 16
    val nBatch = 256
    val qs = Array.tabulate(nBatch) { i =>
      val rng = new scala.util.Random(1000 + i)
      i.toLong -> Array.fill(dim)(rng.nextFloat() * 2 - 1)
    }
    if (withSrc) {
      val rt = Some((spark.read.parquet(srcDir), "id", "vec"))
      val cold = graft.index.IvfIndex.load(spark, dir)
      timed(s"_novec_ann_uncached_$tag") {
        cold.search(q, 10, probes = probes, refine = 8, rerankTable = rt).count()
      }
      // second single query, DIFFERENT vector (different cells/pages):
      // separates one-time JVM/codegen warmup from per-query cost — the
      // first Spark SQL query of a fresh JVM pays codegen+JIT measured at
      // 5-30x steady state on this box (COVERAGE round-5 note)
      val q2 = Array.tabulate(dim)(j => (((j + 3) % 5) - 2) * 0.12f)
      timed(s"_novec_ann_warm2_$tag") {
        cold.search(q2, 10, probes = probes, refine = 8, rerankTable = rt).count()
      }
      timed(s"_novec_brute_uncached_$tag") {
        graft.ops.Knn.topK(spark.read.parquet(srcDir), "id", "vec", q, 10).count()
      }
      timed(s"_novec_annbatch${nBatch}_$tag") {
        cold.searchMany(qs, 10, probes = probes, refine = 8, rerankTable = rt).count()
      }
      // selective sphere served codes-only + table fetch
      val kR = math.max(50, n / 1000)
      val radius = graft.ops.Knn.topK(spark.read.parquet(srcDir), "id", "vec", q, kR)
        .select("dist").collect().last.getDouble(0)
      cold.rangeSearch(q, radius, rerankTable = rt).count()
      timed(s"_novec_range_$tag") {
        cold.rangeSearch(q, radius, rerankTable = rt).count()
      }
    } else {
      // estimate-only serving (see header): code-scan economics at a
      // scale where no exact store exists on this box
      val cold = graft.index.IvfIndex.load(spark, dir)
      timed(s"_novec_annbatch${nBatch}_est_$tag") {
        cold.searchMany(qs, 10, probes = probes, epsilon = 0.0,
          exactBudget = 0).count()
      }
    }
    val qsJson = out.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"novec_scale","n":$n,"dim":$dim,"bits":$bits,"timings":$qsJson}""")
    spark.stop()
  }
}
