// scratch timing main (not committed)
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DedupTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(s"$d/documents.parquet").count()
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $n%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val pairs = t("minhash"){ val p = graft.ops.Dedup.minhashDedup(docs, "doc_id", "text", 0.4); p.count(); p }
    val pairsCached = pairs.cache(); pairsCached.count()
    t("components(cached pairs)"){ graft.ops.Dedup.components(pairsCached).count() }
    t("components(cached pairs) 2"){ graft.ops.Dedup.components(pairsCached).count() }
    val lit = Seq((1L,2L),(2L,3L),(10L,11L)).toDF("da","db")
    t("components(literal pairs)"){ graft.ops.Dedup.components(lit).count() }
    t("components(uncached)"){ graft.ops.Dedup.components(graft.ops.Dedup.minhashDedup(docs, "doc_id", "text", 0.4)).count() }
    spark.stop()
  }
}
