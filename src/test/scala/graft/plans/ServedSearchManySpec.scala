package graft.plans

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import graft.index.{IvfConfig, IvfIndex}
import graft.ops.MaxSim
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * [[AnnCatalog.servedSearchMany]] / [[AnnCatalog.servedMaxsimMany]] —
 * the top-k and multivector siblings of the served range route: a
 * queries TABLE over a REGISTERED corpus resolves through the catalog
 * cover and answers via the batched faces. Exactness at full budgets vs
 * brute force, the codes-only rerank-from-corpus path, and loud
 * refusals on unregistered corpora.
 */
class ServedSearchManySpec extends SparkSpec {

  private val dim = 8

  private lazy val topkFixture: (String, Array[(Long, Array[Float])]) = {
    import spark.implicits._
    val rng = new scala.util.Random(131)
    val rows = (0L until 300L).map(i => (i, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
    val part = Files.createTempDirectory("graft-ssm-part").toString
    rows.toDF("id", "vec").withColumn("pt", (col("id") % 2).cast("int"))
      .write.partitionBy("pt").mode("overwrite").parquet(part)
    (0 to 1).foreach { p =>
      val idir = Files.createTempDirectory(s"graft-ssm-idx$p").toString
      IvfIndex.build(spark.read.parquet(s"$part/pt=$p"), "id", "vec", idir,
        IvfConfig(lists = 4))
      AnnCatalog.register(s"$part/pt=$p", idir, "id", "vec")
    }
    (part, rows.map { case (i, v) => (i, v.toArray) }.toArray)
  }

  /** Two-root multivector corpus (doc, tokens) with registered
    * per-child token indexes. */
  private lazy val msFixture: (String, Seq[(Long, Int, Seq[Float])]) = {
    import spark.implicits._
    val rng = new scala.util.Random(137)
    val toks = for { d <- 0L until 10L; p <- 0 until 5 }
      yield (d, p, Seq.fill(dim)(rng.nextFloat() * 2 - 1))
    val part = Files.createTempDirectory("graft-msm-part").toString
    toks.toDF("doc", "pos", "v")
      .groupBy("doc").agg(collect_list(col("v")).as("tokens"))
      .withColumn("pt", (col("doc") % 2).cast("int"))
      .write.partitionBy("pt").mode("overwrite").parquet(part)
    (0 to 1).foreach { p =>
      val idir = Files.createTempDirectory(s"graft-msm-idx$p").toString
      MaxSim.buildTokenIndex(
        toks.filter(_._1 % 2 == p).toDF("doc", "pos", "v"), "doc", "pos", "v",
        idir, IvfConfig(metric = "negdot", lists = 4))
      AnnCatalog.registerMaxSim(s"$part/pt=$p", idir, "doc", "tokens")
    }
    (part, toks)
  }

  private def withConfs[T](kv: (String, String)*)(f: => T): T =
    graft.core.Confs.withConfs(spark, kv: _*)(f)

  test("servedSearchMany: registered partitioned corpus == brute top-k") {
    import spark.implicits._
    val (part, rows) = topkFixture
    val qs = Seq(0L -> rows(3)._2, 1L -> rows(70)._2)
    val qdf = qs.map { case (qid, c) => (qid, c.toSeq) }.toDF("qid", "center")
    val got = withConfs("graft.ann.probes" -> "4", "graft.ann.refine" -> "40") {
      AnnCatalog.servedSearchMany(spark, part, qdf, "qid", "center", k = 6)
        .as[(Long, Long, Double, Long)].collect()
    }.groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    qs.foreach { case (qid, q) =>
      val want = rows.map { case (id, v) => (K.l2(v, q), id) }
        .sorted.take(6).map(_._2).toSeq
      assert(got(qid) == want, s"qid=$qid got=${got(qid)} want=$want")
    }
  }

  test("servedSearchMany: codes-only single root reranks from its " +
       "registered source table") {
    import spark.implicits._
    val (_, rows) = topkFixture
    val flat = Files.createTempDirectory("graft-ssm-flat").toString
    rows.map { case (i, v) => (i, v.toSeq) }.toSeq.toDF("id", "vec")
      .write.mode("overwrite").parquet(flat)
    val full = Files.createTempDirectory("graft-ssm-fullidx").toString
    IvfIndex.build(spark.read.parquet(flat), "id", "vec", full, IvfConfig(lists = 4))
    val novec = Files.createTempDirectory("graft-ssm-novec").toString
    IvfIndex.load(spark, full).dropVectors(novec)
    AnnCatalog.register(flat, novec, "id", "vec")
    try {
      val qdf = Seq((0L, rows(11)._2.toSeq)).toDF("qid", "center")
      val got = withConfs("graft.ann.probes" -> "4", "graft.ann.refine" -> "40") {
        AnnCatalog.servedSearchMany(spark, flat, qdf, "qid", "center", k = 4)
          .as[(Long, Long, Double, Long)].collect().sortBy(_._4).map(_._2).toSeq
      }
      val want = rows.map { case (id, v) => (K.l2(v, rows(11)._2), id) }
        .sorted.take(4).map(_._2).toSeq
      assert(got == want, s"got=$got want=$want")
    } finally AnnCatalog.unregister(flat)
  }

  test("servedMaxsimMany: registered multivector corpus == brute sum-min " +
       "at full coverage") {
    import spark.implicits._
    val (part, toks) = msFixture
    val rng = new scala.util.Random(139)
    val qs = Array.tabulate(2)(i =>
      (i.toLong, Array.fill(3)(Array.fill(dim)(rng.nextFloat() * 2 - 1))))
    val qdf = qs.map { case (qid, t) => (qid, t.map(_.toSeq).toSeq) }
      .toSeq.toDF("qid", "tokens")
    val got = withConfs("graft.ann.probes" -> "4",
        "graft.ann.maxsim.kPerToken" -> "256", "graft.ann.refine" -> "16") {
      AnnCatalog.servedMaxsimMany(spark, part, qdf, "qid", "tokens", k = 5)
        .as[(Long, Long, Double)].collect()
    }.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val byDoc = toks.groupBy(_._1)
    qs.foreach { case (qid, q) =>
      val want = byDoc.view.mapValues { rows =>
        q.map(qt => rows.map(r => K.negdot(r._3.toArray, qt)).min).sum
      }.toSeq.map { case (d, s) => (s, d) }.sorted.take(5)
        .map { case (s, d) => (d, s) }
      assert(got(qid).map(_._1) == want.map(_._1),
        s"qid=$qid got=${got(qid)} want=$want")
      got(qid).map(_._2).zip(want.map(_._2)).foreach { case (s, w) =>
        assert(math.abs(s - w) < 1e-9, s"qid=$qid $s vs $w")
      }
    }
  }

  test("servedSearchMany: GRAPH-registered corpus routes through driver " +
       "beams; quantized graphs rerank from the corpus table") {
    import spark.implicits._
    val (_, rows) = topkFixture
    val part = Files.createTempDirectory("graft-ssm-gpart").toString
    rows.map { case (i, v) => (i, v.toSeq) }.toSeq.toDF("id", "vec")
      .withColumn("pt", (col("id") % 2).cast("int"))
      .write.partitionBy("pt").mode("overwrite").parquet(part)
    (0 to 1).foreach { p =>
      val gdir = Files.createTempDirectory(s"graft-ssm-g$p").toString
      graft.index.VamanaGraph
        .build(spark.read.parquet(s"$part/pt=$p"), "id", "vec",
          graft.index.VamanaConfig(bits = 8)) // quantized: forces rerank
        .save(spark, gdir)
      AnnCatalog.registerGraph(s"$part/pt=$p", gdir, "id", "vec")
    }
    try {
      val qs = Seq(0L -> rows(5)._2, 1L -> rows(42)._2)
      val qdf = qs.map { case (qid, c) => (qid, c.toSeq) }.toDF("qid", "center")
      val got = withConfs("graft.ann.efSearch" -> "512") {
        AnnCatalog.servedSearchMany(spark, part, qdf, "qid", "center", k = 6)
          .as[(Long, Long, Double, Long)].collect()
      }.groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
      qs.foreach { case (qid, q) =>
        val want = rows.map { case (id, v) => (K.l2(v, q), id) }
          .sorted.take(6).map(_._2).toSeq
        assert(got(qid) == want, s"qid=$qid got=${got(qid)} want=$want")
      }
    } finally (0 to 1).foreach(p => AnnCatalog.unregisterGraph(s"$part/pt=$p"))
  }

  test("servedSearchMany: SHARDED-graph-registered corpus routes through " +
       "the resident shard search") {
    import spark.implicits._
    val (_, rows) = topkFixture
    val flat = Files.createTempDirectory("graft-ssm-sflat").toString
    rows.map { case (i, v) => (i, v.toSeq) }.toSeq.toDF("id", "vec")
      .write.mode("overwrite").parquet(flat)
    val sdir = Files.createTempDirectory("graft-ssm-sg").toString
    graft.index.ShardedVamana.build(spark.read.parquet(flat), "id", "vec",
      sdir, graft.index.VamanaConfig(), shards = 3)
    AnnCatalog.registerShardedGraph(flat, sdir, "id", "vec")
    try {
      val qs = Seq(0L -> rows(9)._2, 1L -> rows(77)._2)
      val qdf = qs.map { case (qid, c) => (qid, c.toSeq) }.toDF("qid", "center")
      val got = withConfs("graft.ann.efSearch" -> "512") {
        AnnCatalog.servedSearchMany(spark, flat, qdf, "qid", "center", k = 5)
          .select(col("qid"), col("id"), col("dist"), col("rn").cast("long"))
          .as[(Long, Long, Double, Long)].collect()
      }.groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
      qs.foreach { case (qid, q) =>
        val want = rows.map { case (id, v) => (K.l2(v, q), id) }
          .sorted.take(5).map(_._2).toSeq
        assert(got(qid) == want, s"qid=$qid got=${got(qid)} want=$want")
      }
      // duplicate qids refuse loudly (the batch faces' shared contract —
      // two queries merging into one top-k window is silent corruption)
      val dup = Seq((0L, rows(1)._2.toSeq), (0L, rows(2)._2.toSeq))
        .toDF("qid", "center")
      val e = intercept[IllegalArgumentException](
        AnnCatalog.servedSearchMany(spark, flat, dup, "qid", "center", 3))
      assert(e.getMessage.contains("duplicate qids"), e.getMessage)
    } finally AnnCatalog.unregisterShardedGraph(flat)
  }

  test("unregistered corpora refuse loudly naming the register call") {
    import spark.implicits._
    val (_, rows) = topkFixture
    val bare = Files.createTempDirectory("graft-ssm-bare").toString
    rows.take(10).map { case (i, v) => (i, v.toSeq) }.toSeq.toDF("id", "vec")
      .write.mode("overwrite").parquet(bare)
    val qdf = Seq((0L, rows(0)._2.toSeq)).toDF("qid", "center")
    val e = intercept[IllegalArgumentException](
      AnnCatalog.servedSearchMany(spark, bare, qdf, "qid", "center", 3))
    assert(e.getMessage.contains("register"), e.getMessage)
    val qdf2 = Seq((0L, Seq(rows(0)._2.toSeq))).toDF("qid", "tokens")
    val e2 = intercept[IllegalArgumentException](
      AnnCatalog.servedMaxsimMany(spark, bare, qdf2, "qid", "tokens", 3))
    assert(e2.getMessage.contains("registerMaxSim"), e2.getMessage)
  }
}
