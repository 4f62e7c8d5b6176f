package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedicated-JVM anchor for the SLICED KNN-join serve (round 16): one
  * N-row corpus, one registered IVF index, a B-row queries side driven
  * through the windowed rank-filter SQL shape — timed SERVED (the
  * sliced candidate machinery) and EXACT (`graft.ann.knn.join.enable`
  * off, the windowed cross join Spark would otherwise run, which
  * WindowGroupLimit prunes per partition but still scans N rows per
  * query). Prints both, plus the optimizer proof that the served run
  * was actually served. Run it ALONE (concurrent sbt contaminates):
  * `java -cp "target/scala-2.13/classes:/opt/spark/jars/&#42;"
  * graft.tools.KnnJoinAnchor [n=100000] [batch=1024] [k=5]` (plus the
  * build.sbt --add-opens flags on JDK 17+).
  */
object KnnJoinAnchor {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    val b = if (args.length > 1) args(1).toInt else 1024
    val k = if (args.length > 2) args(2).toInt else 5
    // recall is budget-dependent (ANN contract): pick budgets per N —
    // probes=16/64 + refine=16 holds ~0.99 at 100k; at 1M the refine
    // pool is the limiter (recall was probe-invariant 16 vs 32), so
    // deeper refine buys the rest
    val probes = if (args.length > 3) args(3).toInt else 16
    val refine = if (args.length > 4) args(4).toInt else 16
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def say(s: String): Unit = System.err.println(s"[kjanchor] $s")

    // deterministic CLUSTERED corpus (LCG — no Random, reproducible):
    // 256 planted centers + noise, the shape real embeddings have —
    // probe-limited recall on UNIFORM-random vectors is data-luck (the
    // repo's standing verify note), while partition pruning on clustered
    // data is exactly the at-scale mechanism this anchor measures
    def lcg(x0: Long): Long = x0 * 6364136223846793005L + 1442695040888963407L
    def unit(x0: Long): Float = {
      val x = lcg(x0); (((x >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0).toFloat
    }
    val kC = 256
    def cent(c: Int, j: Int): Float = unit(c * 131L + j)
    def rowVec(i: Long): Seq[Float] =
      Seq.tabulate(dim)(j => cent((i % kC).toInt, j) + 0.12f * unit(i * 17L + j))
    val tmp = s"${sys.props("java.io.tmpdir")}/graft-kjanchor2-$n"
    val tableDir = s"$tmp/table"
    val idxDir = s"$tmp/index"
    if (!new java.io.File(s"$tableDir/_SUCCESS").exists()) {
      say(s"building $n x $dim clustered corpus + index at $tmp")
      spark.range(n.toLong)
        .map(i => (i, rowVec(i)))
        .toDF("id", "vec")
        .write.mode("overwrite").parquet(tableDir)
      graft.index.IvfIndex.build(spark.read.parquet(tableDir), "id", "vec",
        idxDir, graft.index.IvfConfig(lists = 64, bits = 8, residual = true))
    }
    graft.plans.AnnCatalog.register(tableDir, idxDir, "id", "vec")
    val rule = graft.plans.AnnTopKRewrite(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule

    // queries: jittered data rows (the retrieval workload shape)
    val qs = Array.tabulate(b) { i =>
      val base = rowVec((i.toLong * 97L) % n)
      (i.toLong, base.zipWithIndex.map { case (v, j) =>
        v + 0.03f * unit((i.toLong + 3L * n) * 257L + j) })
    }
    val qdf = qs.toSeq.toDF("qid", "center")
    val wSpec = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(graft.functions.GraftFunctions.vecL2(col("vec"), col("center")),
        col("id"))
    def kj() = qdf.crossJoin(spark.read.parquet(tableDir))
      .withColumn("rn", row_number().over(wSpec))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id"), col("rn"))
    def timed(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val c = f(); ((System.nanoTime() - t0) / 1e9, c)
    }
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet // B*k rows
    // candidate union is ~B*k distinct ids: size the IN budget to fit
    // (the serve declines loudly past it by design). The serve is exact
    // over its candidate SUPERSET — overall recall is budget-dependent
    // like any ANN scan — so the anchor MEASURES content recall against
    // the exact run instead of claiming identity; probes/refine defaults
    // here are the suite's serving budgets.
    graft.core.Confs.withConfs(spark,
        "graft.ann.maxInList" -> math.max(8192, b * k * 2).toString,
        "graft.ann.probes" -> probes.toString,
        "graft.ann.refine" -> refine.toString) {
      val plan = kj().queryExecution.optimizedPlan.toString
      require(graft.plans.AnnTopKRewrite.inServed(plan),
        s"anchor run was NOT served:\n$plan")
      kj().count() // untimed: codegen + caches
      val (tServe, cServe) = timed(() => kj().count())
      val served = rows(kj())
      say(f"served: $tServe%.2fs ($cServe rows, ${tServe / b * 1000}%.2f ms/query)")
      graft.core.Confs.withConfs(spark, "graft.ann.knn.join.enable" -> "false") {
        kj().count() // untimed
        val (tExact, cExact) = timed(() => kj().count())
        val exact = rows(kj())
        val recall = (served & exact).size.toDouble / exact.size
        say(f"exact:  $tExact%.2fs ($cExact rows)")
        say(f"recall: $recall%.4f  speedup: ${tExact / tServe}%.1fx at " +
          f"n=$n b=$b k=$k probes=$probes refine=$refine")
        require(recall >= 0.95,
          f"anchor recall $recall%.4f below the 0.95 floor — raise probes/refine")
        println(f"""{"n":$n,"batch":$b,"k":$k,"probes":$probes,"refine":$refine,"served_sec":$tServe%.3f,"exact_sec":$tExact%.3f,"speedup":${tExact / tServe}%.2f,"recall":$recall%.4f}""")
      }
    }
    graft.plans.AnnCatalog.unregister(tableDir)
    spark.stop()
  }
}
