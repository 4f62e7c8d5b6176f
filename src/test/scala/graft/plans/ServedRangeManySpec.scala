package graft.plans

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import graft.index.{IvfConfig, IvfIndex}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * [[AnnCatalog.servedRangeMany]] — the "SQL in, batch out" route: a
 * queries TABLE of spheres over a REGISTERED corpus resolves through the
 * catalog's cover and answers via the batched range face. Exactness vs
 * brute force, null-row handling, and the loud refusals (unregistered
 * corpus, oversized queries table).
 */
class ServedRangeManySpec extends SparkSpec {

  private val dim = 8

  /** Two-root partitioned corpus with registered per-child indexes,
    * plus an UNREGISTERED flat copy of the same rows. */
  private lazy val fixture: (String, String, Array[(Long, Array[Float])]) = {
    import spark.implicits._
    val rng = new scala.util.Random(93)
    val rows = (0L until 400L).map(i => (i, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
    val part = Files.createTempDirectory("graft-srm-part").toString
    rows.toDF("id", "vec").withColumn("pt", (col("id") % 2).cast("int"))
      .write.partitionBy("pt").mode("overwrite").parquet(part)
    (0 to 1).foreach { p =>
      val idir = Files.createTempDirectory(s"graft-srm-idx$p").toString
      IvfIndex.build(spark.read.parquet(s"$part/pt=$p"), "id", "vec", idir,
        IvfConfig(lists = 4))
      AnnCatalog.register(s"$part/pt=$p", idir, "id", "vec")
    }
    val flat = Files.createTempDirectory("graft-srm-flat").toString
    rows.toDF("id", "vec").write.mode("overwrite").parquet(flat)
    (part, flat, rows.map { case (i, v) => (i, v.toArray) }.toArray)
  }

  test("registered partitioned corpus: served rows == brute per-sphere cutoff") {
    import spark.implicits._
    val (part, _, rows) = fixture
    val qs = Seq((0L, rows(3)._2, 1.2), (1L, rows(7)._2, 1.5), (2L, rows(11)._2, 0.9))
    val qdf = qs.map { case (qid, c, r) => (qid, c.toSeq, r) }
      .toDF("qid", "center", "radius")
    val got = AnnCatalog.servedRangeMany(spark, part, qdf, "qid", "center", "radius")
      .as[(Long, Long, Double)].collect().toSeq
      .map(t => (t._1, t._2, math.round(t._3 * 1e9) / 1e9)).sorted
    val want = qs.flatMap { case (qid, c, r) =>
      rows.map { case (id, v) => (qid, id, K.l2(v, c)) }.filter(_._3 < r)
    }.map(t => (t._1, t._2, math.round(t._3 * 1e9) / 1e9)).sorted
    assert(got == want, s"got=${got.take(5)}... want=${want.take(5)}...")
  }

  test("null qid/center/radius rows match nothing; all-null batch is empty") {
    import spark.implicits._
    val (part, _, rows) = fixture
    val qdf = Seq(
        (Some(0L), Some(rows(3)._2.toSeq), Some(1.2)),
        (Some(1L), None, Some(1.0)),
        (Some(2L), Some(rows(5)._2.toSeq), None))
      .toDF("qid", "center", "radius")
    val got = AnnCatalog.servedRangeMany(spark, part, qdf, "qid", "center", "radius")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty && got.forall(_._1 == 0L),
      s"only the non-null sphere may match: ${got.take(5).toSeq}")
    val empty = AnnCatalog.servedRangeMany(spark, part,
      Seq((Option.empty[Long], Option.empty[Seq[Float]], Option.empty[Double]))
        .toDF("qid", "center", "radius"), "qid", "center", "radius")
    assert(empty.collect().isEmpty)
  }

  test("unregistered corpus and oversized queries table refuse loudly") {
    import spark.implicits._
    val (part, flat, rows) = fixture
    val qdf = Seq((0L, rows(0)._2.toSeq, 1.0)).toDF("qid", "center", "radius")
    val e = intercept[IllegalArgumentException](
      AnnCatalog.servedRangeMany(spark, flat, qdf, "qid", "center", "radius"))
    assert(e.getMessage.contains("register"), e.getMessage)
    graft.core.Confs.withConfs(spark, "graft.ann.range.served.maxQueries" -> "2") {
      val big = (0L until 3L).map(i => (i, rows(i.toInt)._2.toSeq, 1.0))
        .toDF("qid", "center", "radius")
      val e2 = intercept[IllegalArgumentException](
        AnnCatalog.servedRangeMany(spark, part, big, "qid", "center", "radius"))
      assert(e2.getMessage.contains("maxQueries"), e2.getMessage)
    }
  }
}
