package graft.core

import org.apache.spark.sql.DataFrame
import scala.util.control.NonFatal

/** Scale-adaptive input fan-out for CPU-heavy per-row operators.
  *
  * A corpus that arrives as few parquet row groups scans as few tasks,
  * so per-row kernel work (tokenize, md5 shingles, signature loops)
  * under-uses the box — the guide's "derive parallelism from input
  * size" case (§2). But a repartition is not free either: measured at
  * sf0.1 (tiny inputs), the extra exchange plus a 32-task stage costs
  * 200–400 ms, far more than the single-task stage it parallelizes. So
  * the fan-out is DOUBLY gated:
  *
  *  - only when the scan has fewer partitions than the session's
  *    parallelism (at real scale splits >> cores — no-op, no exchange);
  *  - only when the plan's estimated bytes per existing partition
  *    exceed `graft.fanout.minBytesPerPart` (default 32 MB) — i.e. the
  *    single-row-group-but-large case where one task would grind
  *    through hundreds of MB while the box idles. Tiny inputs skip the
  *    exchange entirely and win on fixed cost.
  *
  * Round-robin repartition keeps results engine-identical: every
  * consumer here aggregates, joins or sorts — none depend on row
  * placement.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val conf = spark.conf
    val target = conf.getOption("graft.fanout.parts")
      .orElse(conf.getOption("spark.graft.fanout.parts")).map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    if (target <= 1) return df
    val minBytesPerPart = conf.getOption("graft.fanout.minBytesPerPart")
      .orElse(conf.getOption("spark.graft.fanout.minBytesPerPart"))
      .map(_.toLong).getOrElse(32L << 20)
    try {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (bytes <= minBytesPerPart) return df // one extra part wouldn't pay
      // r18 (ADVICE): probe the partition count WITHOUT executing. Under
      // AQE, `toRdd` calls getFinalPhysicalPlan, which synchronously
      // MATERIALIZES every upstream query stage (runs the shuffle jobs)
      // just to read getNumPartitions — the probe's work is then thrown
      // away and re-run by the real action. So FanOut now restricts
      // itself to EXCHANGE-FREE plans (a plan with a shuffle already has
      // its parallelism decided by that exchange/AQE, not by the scan),
      // where toRdd builds the scan RDD lazily with no job.
      val hasExchange = df.queryExecution.sparkPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
      if (hasExchange) return df
      val parts = df.queryExecution.toRdd.getNumPartitions
      if (parts >= target || (bytes / parts) <= minBytesPerPart) df
      else df.repartition(target)
    } catch { case NonFatal(_) => df }
  }
}
