package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the double gate of the r17 scale-adaptive fan-out: tiny inputs
  * must NOT pay an exchange (the fixed cost exceeds the single-task
  * stage it would parallelize at fixture scale), while a scan whose
  * estimated bytes-per-partition exceed the floor spreads to the
  * session's parallelism. */
class FanOutSpec extends SparkSpec {

  test("tiny input: no exchange added (plan unchanged)") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"doc $i")).toDF("id", "text")
    val out = FanOut(df)
    assert(out.queryExecution.optimizedPlan == df.queryExecution.optimizedPlan,
      "FanOut must be a no-op below the bytes floor")
  }

  test("large-bytes single-partition input spreads to the session parallelism") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, s"doc $i")).toDF("id", "text")
      .coalesce(1)
    spark.conf.set("graft.fanout.minBytesPerPart", "1")
    try {
      val out = FanOut(df)
      assert(out.rdd.getNumPartitions ==
        spark.sparkContext.defaultParallelism,
        "past the bytes floor a narrow scan must spread")
      // round-robin repartition: content identical, only placement moves
      assert(out.as[(Long, String)].collect().toSet ==
        df.as[(Long, String)].collect().toSet)
    } finally spark.conf.unset("graft.fanout.minBytesPerPart")
  }

  test("already-parallel input is untouched even past the bytes floor") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 10000, 1, target * 2)
      .select(col("id"), col("id").cast("string").as("text"))
    spark.conf.set("graft.fanout.minBytesPerPart", "1")
    try {
      val out = FanOut(df)
      assert(out.rdd.getNumPartitions == target * 2,
        "a scan with more partitions than cores must not be re-shuffled")
    } finally spark.conf.unset("graft.fanout.minBytesPerPart")
  }
}
