package graft.tools

import org.apache.spark.sql.SparkSession
import graft.index.{IvfIndex, IvfConfig}

/** Diagnostic: cluster balance + recall-vs-probes curve for an IVF build
  * on an embeddings table. Usage: runMain graft.tools.RecallProbe <sfDir>. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-rp").toString
    val idx = IvfIndex.build(emb, "vec_id", "embedding", dir,
      IvfConfig(lists = 16, bits = 8, residual = true))
    val sizes = idx.dataDf.groupBy("cluster_id").count()
      .orderBy("cluster_id").as[(Int, Long)].collect()
    println(s"cluster sizes: ${sizes.map(_._2).mkString(",")}")
    val qs = emb.orderBy("vec_id").limit(8).select("embedding")
      .as[Seq[Float]].collect().map(_.toArray)
    qs.zipWithIndex.foreach { case (q, i) =>
      val curve = Seq(4, 6, 8, 10, 12).map(p =>
        s"$p:${idx.evaluateRecall(q, 10, probes = p, refine = 16)}")
      println(s"q$i recall-vs-probes: ${curve.mkString(" ")}")
    }
    spark.stop()
  }
}
