package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Embedding near-dup LSH-vs-brute crossover anchor (COVERAGE §2.6).
 *
 * Synthetic corpus: `n` deterministic 64-dim vectors plus n/100 planted
 * near-duplicates (base + 0.25·unit-noise ⇒ cosdist ≈ 0.03), searched at
 * tau = 0.05 — the REALISTIC near-dup regime (the sf0.1 bench corpus
 * deliberately sits at LSH's worst case, cosdist 0.40–0.50; production
 * near-dup thresholds look like this anchor). At this tau the closed-form
 * sizing (Dedup.lshTablesFor) picks 24-bit keys and ~38 tables for a 95%
 * boundary-pair recall floor; planted pairs at cosdist 0.03 survive with
 * p ≈ 0.996.
 *
 * Run in a dedicated JVM (sbt's heap caps the brute broadcast):
 *   java -Xmx16g -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
 *     graft.tools.DedupScale 200000 both    # crossover: brute AND lsh
 *   java -Xmx16g ... graft.tools.DedupScale 1000000 lsh   # scale path
 */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val mode = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dim = 64
    val nDup = n / 100
    // SPARK_GRAFT_DEDUP_CLUSTERED=1: draw base vectors around 256
    // Gaussian blob centers (the geometry real embedding corpora have)
    // instead of uniform — the regime where SemDeDup's nearest-centroid
    // clusters align with the data and boundary losses vanish
    val clustered = sys.env.get("SPARK_GRAFT_DEDUP_CLUSTERED").contains("1")
    val centers: Array[Array[Float]] =
      if (!clustered) null
      else Array.tabulate(256) { c =>
        val rng = new scala.util.Random(c * 977L + 13)
        Array.fill(dim)(rng.nextFloat() * 2 - 1)
      }
    def baseVec(i: Long): Array[Float] = {
      val rng = new scala.util.Random(i)
      if (!clustered) Array.fill(dim)(rng.nextFloat() * 2 - 1)
      else {
        val c = centers((i % 256).toInt)
        // blob spread sized so same-blob strangers sit at cosdist ~0.2-0.4
        // (NOT near-dups at tau=0.05) while planted twins stay at ~0.03
        Array.tabulate(dim)(j => c(j) + 0.4f * rng.nextGaussian().toFloat)
      }
    }
    val base = spark.range(n).map(i => (i.toLong, baseVec(i)))
    // planted near-dups: id n+i duplicates id i at cosdist ~ eps^2/2 = 0.03
    val dups = spark.range(nDup).map { i =>
      val v = baseVec(i)
      val rng = new scala.util.Random(i + 7777)
      val noise = Array.fill(dim)(rng.nextGaussian())
      val nn = math.sqrt(noise.map(x => x * x).sum)
      val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
      val eps = 0.25 * vn / nn
      (n + i, v.indices.map(j => (v(j) + eps * noise(j)).toFloat).toArray)
    }
    val df = base.union(dups).toDF("id", "vec").repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    def say(s: String): Unit = System.err.println(s"[dedup-scale] $s")
    val tau = 0.05
    val bits = 24
    val tables = graft.ops.Dedup.lshTablesFor(tau, bits)
    say(s"n=$n nDup=$nDup tau=$tau bits=$bits tables=$tables (auto) " +
      f"boundary-fnr=${graft.ops.Dedup.lshFalseNegativeRate(tau, bits, tables)}%.4f")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed(key: String)(body: => Unit): Unit = {
      val t = System.nanoTime(); body
      val sec = (System.nanoTime() - t) / 1e9
      out += (key -> sec); say(f"$key = $sec%.2fs")
    }
    // warm the JIT on a slice so both paths start from steady state
    graft.ops.Dedup.embeddingNearDup(df.limit(5000), "id", "vec", tau,
      lshBits = bits, lshTables = tables).count()
    var lshPairs = 0L; var lshPlanted = 0L
    timed(s"lsh_$n") {
      val pairs = graft.ops.Dedup.embeddingNearDup(df, "id", "vec", tau,
          lshBits = bits, lshTables = tables)
        .select(col("da"), col("db")).persist()
      lshPairs = pairs.count()
      lshPlanted = pairs.filter(col("db") === col("da") + n).count()
      pairs.unpersist()
    }
    say(s"lsh pairs=$lshPairs plantedFound=$lshPlanted/$nDup " +
      f"(plantedRecall=${lshPlanted.toDouble / nDup}%.4f)")
    if (mode == "both") {
      graft.ops.Dedup.embeddingNearDup(df.limit(5000), "id", "vec", tau,
        bruteCap = 5000).count()
      var brutePairs = 0L
      timed(s"brute_$n") {
        brutePairs = graft.ops.Dedup.embeddingNearDup(df, "id", "vec", tau,
          bruteCap = n + nDup).count()
      }
      say(s"brute pairs=$brutePairs (ground truth)")
    }
    if (mode == "semdedup" || mode == "all") {
      // SemDeDup on the same fixture: k-means clusters + in-cluster pairs.
      // Timed END TO END including centroid training (the honest number);
      // recall < 1 is the algorithm's cluster-boundary trade, reported.
      val k = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_K", "512").toInt
      graft.ops.Dedup.semDedupAuto(df.limit(5000), "id", "vec", tau, k = 16)
        .count() // JIT warm
      var semPairs = 0L
      var semPlanted = 0L
      timed(s"semdedup_$n") {
        val pairs = graft.ops.Dedup.semDedupAuto(df, "id", "vec", tau,
            k = k, maxCluster = 400000)
          .select(col("da"), col("db")).persist()
        semPairs = pairs.count()
        semPlanted = pairs.filter(col("db") === col("da") + n).count()
        pairs.unpersist()
      }
      say(s"semdedup k=$k pairs=$semPairs plantedFound=$semPlanted/$nDup " +
        f"(plantedRecall=${semPlanted.toDouble / nDup}%.4f)")
    }
    val qs = out.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"dedup_scale","n":$n,"timings":$qs,"lsh_pairs":$lshPairs,"planted_found":$lshPlanted}""")
    spark.stop()
  }
}
