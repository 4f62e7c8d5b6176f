package graft.plans

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import graft.functions.GraftFunctions
import graft.index.{IvfConfig, IvfIndex}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * Optimizer-rule pushdown — mirrors the reference's pushdown_plan.slt
 * EXPLAIN goldens: `ORDER BY <-> LIMIT k` over an indexed table becomes
 * an index-served plan; the expression form / un-indexed table stays a
 * full scan.
 */
class AnnRewriteSpec extends SparkSpec {

  private lazy val setup: (String, String) = {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val rows = (0L until 500L).map(i => i -> Seq.fill(8)(rng.nextFloat() * 2 - 1))
    val tableDir = Files.createTempDirectory("graft-ann-table").toString
    rows.toDF("id", "vec").write.mode("overwrite").parquet(tableDir)
    val indexDir = Files.createTempDirectory("graft-ann-index").toString
    IvfIndex.build(spark.read.parquet(tableDir), "id", "vec", indexDir, IvfConfig(lists = 8))
    (tableDir, indexDir)
  }

  private def withRule[T](f: => T): T = {
    val rule = AnnTopKRewrite(spark)
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ rule
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == rule)
  }

  test("ORDER BY vec_l2 LIMIT k over a registered table is index-served") {
    import spark.implicits._
    val (tableDir, indexDir) = setup
    AnnCatalog.register(tableDir, indexDir, "id", "vec")
    try withRule {
      val q = Array.fill(8)(0.2f)
      val df = spark.read.parquet(tableDir)
        .orderBy(GraftFunctions.vecL2(col("vec"), typedlit(q.toSeq)))
        .limit(10)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains(" IN "), s"expected candidate-id pushdown:\n$optimized")
      // physical scan must carry the pushed In filter
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("PushedFilters: [In(id"), physical)
      // ANN answer with full coverage settings == exact brute force
      spark.conf.set("graft.ann.probes", "8")
      spark.conf.set("graft.ann.refine", "50")
      val got = df.select("id").as[Long].collect().toSeq
      val data = spark.read.parquet(tableDir).as[(Long, Seq[Float])].collect()
      val want = data.map { case (id, v) => (K.l2(v.toArray, q), id) }
        .sorted.take(10).map(_._2).toSeq
      assert(got == want)
    } finally AnnCatalog.unregister(tableDir)
  }

  test("kill switch and un-registered tables keep the exact plan") {
    import spark.implicits._
    val (tableDir, indexDir) = setup
    val q = Array.fill(8)(0.1f)
    def plan(): String = spark.read.parquet(tableDir)
      .orderBy(GraftFunctions.vecL2(col("vec"), typedlit(q.toSeq)))
      .limit(5).queryExecution.optimizedPlan.toString
    // not registered -> no rewrite
    withRule { assert(!plan().contains(" IN ")) }
    // registered but disabled -> no rewrite
    AnnCatalog.register(tableDir, indexDir, "id", "vec")
    try withRule {
      spark.conf.set("graft.ann.enable", "false")
      try assert(!plan().contains(" IN "))
      finally spark.conf.set("graft.ann.enable", "true")
    } finally AnnCatalog.unregister(tableDir)
  }

  test("intervening filter disables the rewrite (semantics preserved)") {
    import spark.implicits._
    val (tableDir, indexDir) = setup
    AnnCatalog.register(tableDir, indexDir, "id", "vec")
    try withRule {
      val q = Array.fill(8)(0.3f)
      val df = spark.read.parquet(tableDir)
        .filter(col("id") > 250L)
        .orderBy(GraftFunctions.vecL2(col("vec"), typedlit(q.toSeq)))
        .limit(5)
      // plan keeps the user filter; no candidate-id IN list injected
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains(" IN "), optimized)
      val got = df.select("id").as[Long].collect().toSeq
      val data = spark.read.parquet(tableDir).as[(Long, Seq[Float])].collect()
      val want = data.filter(_._1 > 250L)
        .map { case (id, v) => (K.l2(v.toArray, q), id) }
        .sorted.take(5).map(_._2).toSeq
      assert(got == want)
    } finally AnnCatalog.unregister(tableDir)
  }
}
