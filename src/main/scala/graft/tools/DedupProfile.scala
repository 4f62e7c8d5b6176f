package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Timing breakdown of the dedup pipelines on the documents table. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    // warm JIT + parquet footer
    docs.count()
    time("simhash x1")(Dedup.simhashDedup(docs, "doc_id", "text", 3).count())
    time("simhash x2")(Dedup.simhashDedup(docs, "doc_id", "text", 3).count())
    time("minhash x1")(Dedup.minhashDedup(docs, "doc_id", "text", 0.4).count())
    time("minhash x2")(Dedup.minhashDedup(docs, "doc_id", "text", 0.4).count())
    spark.stop()
  }
}
