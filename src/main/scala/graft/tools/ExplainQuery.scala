package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of named SparkEntry queries —
  * the post-change audit loop: broadcasts where expected, filters
  * pushed to the scan, whole-stage codegen spans wide, no surprise
  * shuffles. Usage: runMain graft.tools.ExplainQuery q1,q2 [sfDir]. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQuery name[,name...] [sfDir]")
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"=== $n ===")
      graft.queries.GraftQueries.all(n).impl(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
