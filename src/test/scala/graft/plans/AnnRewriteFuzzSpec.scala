package graft.plans

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import graft.functions.GraftFunctions
import graft.index.{IvfConfig, IvfIndex}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * Seeded SHAPE FUZZ over the planner rule: random (k, query, prefilter,
 * projection, table-form, budget) combinations, each executed with the
 * rule active and compared row-for-row against a driver-side brute
 * force. The invariant is the rule's whole contract: WHATEVER it
 * decides — single-index serve, partitioned union serve, prefilter
 * escalation, or decline to the exact plan (forced sometimes by a tiny
 * maxInList) — the rows are the true top-k. Probes cover every cell
 * and refine is generous, so every serve runs in the exact regime and
 * any mismatch is a planner bug, not ANN slack (the ANN regime's
 * recall floors are spec'd elsewhere).
 */
class AnnRewriteFuzzSpec extends SparkSpec {

  private lazy val fixture: (String, String) = {
    import spark.implicits._
    val rng = new scala.util.Random(1013)
    def rows(n: Int, off: Long) =
      (0L until n.toLong).map(i => (off + i, Seq.fill(8)(rng.nextFloat() * 2 - 1)))
    // flat table + one index
    val flatDir = Files.createTempDirectory("graft-fuzz-flat").toString
    rows(300, 0).toDF("id", "vec").write.mode("overwrite").parquet(flatDir)
    val flatIdx = Files.createTempDirectory("graft-fuzz-flatidx").toString
    IvfIndex.build(spark.read.parquet(flatDir), "id", "vec", flatIdx,
      IvfConfig(lists = 4))
    AnnCatalog.register(flatDir, flatIdx, "id", "vec")
    // partitioned table + per-child indexes
    val partDir = Files.createTempDirectory("graft-fuzz-part").toString
    (0 to 2).foreach { p =>
      rows(150, 1000L + p * 150L).toDF("id", "vec")
        .write.mode("overwrite").parquet(s"$partDir/part=$p")
      val d = Files.createTempDirectory(s"graft-fuzz-pidx$p").toString
      IvfIndex.build(spark.read.parquet(s"$partDir/part=$p"), "id", "vec", d,
        IvfConfig(lists = 4))
      AnnCatalog.register(s"$partDir/part=$p", d, "id", "vec")
    }
    (flatDir, partDir)
  }

  private def bruteTopK(dir: String, q: Array[Float], k: Int,
                        pred: Long => Boolean): Seq[Long] = {
    import spark.implicits._
    spark.read.parquet(dir).select("id", "vec").as[(Long, Seq[Float])]
      .collect()
      .filter { case (id, _) => pred(id) }
      .map { case (id, v) => (K.l2(v.toArray, q), id) }
      .sorted.take(k).map(_._2).toSeq
  }

  test("40 seeded shapes: rule-active rows == brute force under serve, " +
       "escalation, partitioned union, and forced declines alike") {
    val (flatDir, partDir) = fixture
    val rng = new scala.util.Random(4242)
    val rule = AnnTopKRewrite(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      var served = 0
      var declined = 0
      (1 to 40).foreach { trial =>
        val dir = if (rng.nextBoolean()) flatDir else partDir
        val k = 1 + rng.nextInt(15)
        val q = Array.fill(8)(rng.nextFloat() * 2 - 1)
        val (predCol, predFn): (Option[org.apache.spark.sql.Column], Long => Boolean) =
          rng.nextInt(3) match {
            case 0 => (None, _ => true)
            case 1 =>
              val m = 2 + rng.nextInt(5); val r = rng.nextInt(m)
              (Some(col("id") % m === r), id => id % m == r)
            case _ =>
              val cut = 50 + rng.nextInt(400)
              (Some(col("id") % 1000 < cut), id => id % 1000 < cut)
          }
        val projectFirst = rng.nextBoolean()
        // sometimes strangle the IN budget so declines interleave with
        // serves; rows must be right EITHER way. Separately, sometimes
        // force the flat read's executor-side heap merge (directCollectMax
        // = 0) so both pool-collect paths run under random shapes.
        val budget = if (rng.nextInt(4) == 0) "3" else "8192"
        val directMax = if (rng.nextInt(3) == 0) "0" else "4000000"
        graft.core.Confs.withConfs(spark,
            "graft.ann.probes" -> "4", "graft.ann.refine" -> "50",
            "graft.ann.cost.enable" -> "false",
            "graft.ann.flat.directCollectMax" -> directMax,
            "graft.ann.maxInList" -> budget) {
          val base0 = spark.read.parquet(dir)
          val base1 = if (projectFirst) base0.select("id", "vec") else base0
          val base2 = predCol.map(base1.filter).getOrElse(base1)
          val df = base2
            .orderBy(GraftFunctions.vecL2(col("vec"),
              typedlit(q.toSeq)))
            .limit(k).select("id")
          val planStr = df.queryExecution.optimizedPlan.toString
          if (AnnTopKRewrite.inServed(planStr)) served += 1 else declined += 1
          val got = df.collect().map(_.getLong(0)).toSeq
          val want = bruteTopK(dir, q, k, predFn)
          assert(got == want,
            s"trial $trial (dir=${dir.takeRight(8)}, k=$k, budget=$budget, " +
            s"projectFirst=$projectFirst):\n got=$got\nwant=$want\n$planStr")
        }
      }
      info(s"shapes: $served served, $declined declined — all row-exact")
      assert(served > 0 && declined >= 0)
      assert(served + declined == 40)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filter(r => !(r eq rule))
      AnnCatalog.unregister(flatDir)
      (0 to 2).foreach(p => AnnCatalog.unregister(s"$partDir/part=$p"))
    }
  }
}
