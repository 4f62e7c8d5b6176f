package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationShardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 200L)
    .map(i => (i, s"word $i text", if (i % 2 == 0) "en" else "de", s"src${i % 3}"))
    .toDF("doc_id", "text", "lang", "source")

  test("corpusStats: per-slice volume and distinct counts") {
    val tiny = Seq(
      (0L, "a b", "en", "s"), (1L, "a b", "en", "s"), (2L, "c", "en", "s"),
      (3L, "d e f", "de", "s")
    ).toDF("doc_id", "text", "lang", "source")
    val got = Curation.corpusStats(tiny, "text", Seq("lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap
    assert(got("en") == ((3L, 5L, 7L, 5.0 / 3, 2L))) // "a b" dupes -> 2 distinct
    assert(got("de") == ((1L, 3L, 5L, 3.0, 1L)))
  }

  test("shuffleShards: complete, uniform-ish, contiguous positions") {
    val a = Curation.shuffleShards(docs, "doc_id", 8)
    val rows = a.select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 200 && rows.map(_._1).distinct.length == 200)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
    // per-shard positions are exactly 0..n-1
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq)
    }
    // every shard got something at n=200, k=8 (md5-uniform)
    assert(rows.map(_._2).distinct.length == 8)
  }

  test("shuffleShards is stable under input partitioning and seed-sensitive") {
    val base = Curation.shuffleShards(docs, "doc_id", 8)
      .select("doc_id", "shard", "pos").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val reparted = Curation.shuffleShards(docs.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(base == reparted)
    val reseeded = Curation.shuffleShards(docs, "doc_id", 8, seed = "other")
      .select("doc_id", "shard", "pos").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(base != reseeded)
  }

  test("writeShards: round-trips with shard dirs and in-shard order") {
    val dir = Files.createTempDirectory("graft-shards").toString
    Curation.writeShards(docs, "doc_id", 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 200)
    assert(back.select("shard").distinct().count() == 4)
    // pos is a dense 0..n-1 sequence within each shard after the round-trip
    val bad = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), countDistinct(col("pos")).as("d"))
      .filter(col("mx") =!= col("n") - 1 || col("d") =!= col("n"))
    assert(bad.isEmpty, "pos not dense within a shard")
  }

  test("invalid shard count rejected") {
    intercept[IllegalArgumentException] {
      Curation.shuffleShards(docs, "doc_id", 0)
    }
  }
}
