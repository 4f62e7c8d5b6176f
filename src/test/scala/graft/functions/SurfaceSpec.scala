package graft.functions

import graft.SparkSpec
import graft.core.{RaBitQ, VectorKernels => K}
import org.apache.spark.sql.functions._

/** sphere composite, halfvec column ops, quantized text format. */
class SurfaceSpec extends SparkSpec {

  test("sphere struct + sphereContains matches the raw predicate") {
    import spark.implicits._
    val rng = new scala.util.Random(21)
    val data = (0L until 200L).map(i => i -> Seq.fill(6)(rng.nextFloat() * 2 - 1))
    val df = data.toDF("id", "v")
    val center = data.head._2.toArray
    val sph = GraftFunctions.sphere(typedlit(center.toSeq), lit(1.0))
    val got = df.filter(GraftFunctions.sphereContains($"v", sph, "l2"))
      .select("id").as[Long].collect().toSet
    val want = data.filter { case (_, v) => K.l2(v.toArray, center) < 1.0 }.map(_._1).toSet
    assert(got == want && got.nonEmpty)
  }

  test("halfvec column ops: store as shorts, distances via widening") {
    import spark.implicits._
    val df = Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(2f, 3f, 4f))).toDF("id", "v")
      .withColumn("h", GraftFunctions.vecToHalf($"v"))
    assert(df.schema("h").dataType.simpleString == "array<smallint>")
    val pair = df.agg(collect_list($"h")).as[Seq[Seq[Short]]].head()
    val d = Seq((pair(0), pair(1))).toDF("a", "b")
      .select(round(GraftFunctions.halfL2($"a", $"b"), 3),
        round(GraftFunctions.halfNegdot($"a", $"b"), 3),
        round(GraftFunctions.halfCosdist($"a", $"b"), 3))
      .as[(Double, Double, Double)].head()
    assert(d == ((1.732, -20.0, 0.007))) // distance.slt halfvec goldens
  }

  test("rabitq text format round-trips for 8 and 4 bit") {
    val rng = new scala.util.Random(33)
    (0 until 50).foreach { _ =>
      val x = Array.fill(1 + rng.nextInt(40))(rng.nextFloat() * 10 - 5)
      Seq(8, 4).foreach { bits =>
        val c = RaBitQ.quantize(x, bits)
        val q0 = GraftFunctions.QCode(c.meta.toSeq, c.codes, c.bits, c.dim)
        val q1 = GraftFunctions.qcodeFromText(GraftFunctions.qcodeToText(q0), bits)
        assert(q0.meta == q1.meta && java.util.Arrays.equals(q0.codes, q1.codes)
          && q0.dim == q1.dim, s"bits=$bits dim=${x.length}")
      }
    }
  }

  test("malformed quantized literals rejected") {
    assertThrows[IllegalArgumentException](GraftFunctions.qcodeFromText("nope", 8))
    assertThrows[IllegalArgumentException](GraftFunctions.qcodeFromText("(1,2)[3]", 8))
  }

  test("quantized-column distance operators: SQL surface and DSL agree") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val rng = new scala.util.Random(44)
    val rows = (0L until 40L).map(i => (i, Seq.fill(24)(rng.nextFloat() * 4 - 2)))
    rows.toDF("id", "v").createOrReplaceTempView("qv")
    val got = spark.sql(
      """SELECT id,
        |  rabitq_l2(quantize_rabitq8(v), quantize_rabitq8(w)) AS l2q,
        |  rabitq_negdot(quantize_rabitq8(v), quantize_rabitq8(w)) AS ndq,
        |  rabitq_cosdist(quantize_rabitq8(v), quantize_rabitq8(w)) AS cosq
        |FROM (SELECT id, v, transform(v, x -> -x * float(0.5)) AS w FROM qv)
        |ORDER BY id""".stripMargin)
      .as[(Long, Double, Double, Double)].collect()
    rows.zip(got).foreach { case ((_, v), (_, l2q, ndq, cosq)) =>
      val x = v.toArray
      val y = x.map(f => -f * 0.5f)
      val (a, b) = (RaBitQ.quantize(x, 8), RaBitQ.quantize(y, 8))
      assert(l2q == RaBitQ.l2QQ(a, b))
      assert(ndq == RaBitQ.negdotQQ(a, b))
      assert(cosq == RaBitQ.cosdistQQ(a, b))
    }
    // rabitq sphere predicate composes the same coded distance
    val df = rows.toDF("id", "v")
      .withColumn("q", expr("quantize_rabitq8(v)"))
      .withColumn("c", expr("quantize_rabitq8(transform(v, x -> x + float(0.1)))"))
      .withColumn("sph", struct(col("c").as("center"), lit(5.0).as("radius")))
    val inSphere = df.filter(GraftFunctions.rabitqSphereContains(col("q"), col("sph"), "l2"))
      .count()
    assert(inSphere > 0)
  }

  test("text/curation SQL functions: registered forms equal the DSL forms") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    Seq((1L, "a b a b c", Seq(0.9f, 0.1f)), (2L, "x y", Seq(0.1f, 0.8f)))
      .toDF("id", "t", "v").createOrReplaceTempView("surf_txt")
    val sql = spark.sql(
      """SELECT id,
        |  token_shingles(split(t, ' '), 2) AS sh,
        |  token_stats(split(t, ' ')) AS st,
        |  normalize_text('CAFÉ ' || t, 'nfc', true, true) AS nm,
        |  vec_nearest(v, CAST(array(array(1.0, 0.0), array(0.0, 1.0)) AS ARRAY<ARRAY<FLOAT>>)) AS c
        |FROM surf_txt ORDER BY id""".stripMargin)
      .collect()
    val cents = Array(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    val dsl = spark.table("surf_txt")
      .select(col("id"),
        graft.ops.Curation.tokenShingles(split(col("t"), " "), 2).as("sh"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          TokenStatsExpr(org.apache.spark.sql.graft.ColumnBridge
            .expression(split(col("t"), " ")))).as("st"),
        graft.ops.TextOps.normalizeText(concat(lit("CAFÉ "), col("t")),
          "nfc", lower = true, stripAccents = true).as("nm"),
        GraftFunctions.vecNearest(col("v"), cents).as("c"))
      .orderBy("id").collect()
    assert(sql.toSeq.map(_.toSeq) == dsl.toSeq.map(_.toSeq))
    assert(sql(0).getAs[Int]("c") == 0 && sql(1).getAs[Int]("c") == 1)
  }

  test("token_tf / token_tf_all SQL forms match the kernel semantics") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    Seq((1L, "a b a c"), (2L, "b b")).toDF("id", "t")
      .createOrReplaceTempView("surf_tf")
    val rows = spark.sql(
      """SELECT id,
        |  token_tf(split(t, ' '), array('a', 'b', 'z')) AS tf,
        |  token_tf_all(split(t, ' ')) AS tfa
        |FROM surf_tf ORDER BY id""".stripMargin).collect()
    assert(rows(0).getSeq[Long](1).toSeq == Seq(2L, 1L, 0L))
    assert(rows(1).getSeq[Long](1).toSeq == Seq(0L, 2L, 0L))
    val tfa0 = rows(0).getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(tfa0 == Seq(("a", 2), ("b", 1), ("c", 1))) // first-occurrence order
    intercept[Exception] { // non-literal term list rejected loudly
      spark.sql("SELECT token_tf(split(t, ' '), split(t, ' ')) FROM surf_tf")
        .collect()
    }
  }
}
