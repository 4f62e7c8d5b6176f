package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, typedlit}

/**
 * Index-served sphere-range vs full-scan crossover anchor (COVERAGE
 * §2.6, opclass strategy 2). Clustered corpus — 256 Gaussian clusters,
 * sigma 0.05 vs ~4.8 inter-center spread, the geometry real embedding
 * corpora have and the one the per-cell-radius triangle bound is
 * designed for — with a selective sphere (~0.1% of rows) around one
 * cluster's center. The indexed path reads only sphere-intersecting
 * cells' CODE columns plus candidate vectors; the exact filter decodes
 * every stored vector. Both paths run once untimed first (JIT + the
 * one-time cell-radius artifact), then three timed repetitions.
 *
 *   java -Xmx48g -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
 *     graft.tools.RangeScale 4000000
 */
object RangeScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // SPARK_GRAFT_SCALE_DIM: 64 default; 768 = BASELINE.md's flagship
    // geometry (key names carry the n, dims recorded in the JSON line)
    val dim = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIM", "64").toInt
    def say(s: String): Unit = System.err.println(s"[range-scale] $s")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed(key: String)(body: => Unit): Unit = {
      val t = System.nanoTime(); body
      val sec = (System.nanoTime() - t) / 1e9
      out += (key -> sec); say(f"$key = $sec%.2fs")
    }
    val gen = spark.range(n).map { i =>
      val c = (i % 256).toInt
      val crng = new scala.util.Random(9000 + c)
      val center = Array.fill(dim)(crng.nextFloat() * 2 - 1)
      val rng = new scala.util.Random(i)
      (i.toLong, center.map(x => x + rng.nextGaussian().toFloat * 0.05f))
    }.toDF("id", "vec")
    val dir = s"${sys.props("java.io.tmpdir")}/graft-range-scale-$n-d$dim"
    val src = s"$dir-src"
    timed("gen_write") { gen.write.mode("overwrite").parquet(src) }
    val df = spark.read.parquet(src)
    var idx: graft.index.IvfIndex = null
    timed("index_build") {
      idx = graft.index.IvfIndex.build(df, "id", "vec", dir,
        graft.index.IvfConfig(lists = 256, kmeansAlgo = "hierarchical",
          samplingFactor = 64))
    }
    val q = {
      val crng = new scala.util.Random(9000)
      Array.fill(dim)(crng.nextFloat() * 2 - 1)
    }
    var radius = 0.0
    timed("radius_calibration") {
      radius = graft.ops.Knn.topK(df, "id", "vec", q, math.max(50, n / 1000))
        .select("dist").collect().last.getDouble(0)
    }
    var hits = 0L
    timed("first_range") { hits = idx.rangeSearch(q, radius).count() }
    say(f"n=$n radius=$radius%.3f hits=$hits")
    def scan() = df.filter(graft.functions.GraftFunctions.sphereL2Contains(
      col("vec"), typedlit(q.toSeq), lit(radius)))
    val scanHits = scan().count()
    require(scanHits == hits, s"index path returned $hits rows, scan $scanHits")
    say(s"scan hits verified: $scanHits")
    (1 to 3).foreach { i =>
      timed(s"_range_indexed_${n}_r$i") { idx.rangeSearch(q, radius).count() }
      timed(s"_range_scan_${n}_r$i") { scan().count() }
    }
    val qs = out.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"range_scale","n":$n,"dim":$dim,"hits":$hits,"timings":$qs}""")
    spark.stop()
  }
}
