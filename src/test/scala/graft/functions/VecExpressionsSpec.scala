package graft.functions

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import org.apache.spark.sql.functions._

class VecExpressionsSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    (0L until 100L).map(i => (i, Seq.fill(16)(rng.nextFloat() * 4 - 2),
      Seq.fill(16)(rng.nextFloat() * 4 - 2))).toDF("id", "a", "b")
  }

  test("native expressions match kernel results bit-for-bit") {
    import spark.implicits._
    val got = df.select($"id",
      GraftFunctions.vecL2($"a", $"b"), GraftFunctions.vecNegdot($"a", $"b"),
      GraftFunctions.vecCosdist($"a", $"b"), GraftFunctions.vecNorm($"a"))
      .as[(Long, Double, Double, Double, Double)].collect()
    val src = df.as[(Long, Seq[Float], Seq[Float])].collect()
      .map { case (id, a, b) => id -> (a.toArray, b.toArray) }.toMap
    got.foreach { case (id, l2, nd, cd, nm) =>
      val (a, b) = src(id)
      assert(l2 == K.l2(a, b) && nd == K.negdot(a, b) &&
        cd == K.cosdist(a, b) && nm == K.norm(a), s"row $id")
    }
  }

  test("expressions stay inside WholeStageCodegen (no ScalaUDF node)") {
    // parquet-backed scan: a local relation would be constant-folded away
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(
        GraftFunctions.vecL2(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // `*(n)` prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.contains("*(1) Project [vec_l2"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("SQL registration resolves and computes") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    df.createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT vec_l2(a, b) AS d, vec_negdot(a, b) AS nd, vec_cosdist(a, b) AS cd, vec_norm(a) AS nm FROM vecs WHERE id = 0")
      .as[(Double, Double, Double, Double)].head()
    val (a, b) = {
      val row = df.as[(Long, Seq[Float], Seq[Float])].collect().find(_._1 == 0L).get
      (row._2.toArray, row._3.toArray)
    }
    assert(r == ((K.l2(a, b), K.negdot(a, b), K.cosdist(a, b), K.norm(a))))
  }

  test("SQL double/int literals implicitly cast to array<float>") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    // bare SQL literals are double/int typed — the analyzer must coerce
    val d = spark.sql(
      "SELECT vec_l2(array(1.0, 2.0, 3.0), array(2, 3, 4)) AS d").as[Double].head()
    assert(math.abs(d - math.sqrt(3.0)) < 1e-12)
    val ms = spark.sql(
      "SELECT vec_maxsim(array(array(1.0, 0.0)), array(array(0.5, 0.5))) AS m")
      .as[Double].head()
    assert(ms == -0.5)
  }

  test("null inputs yield null; dim mismatch throws") {
    import spark.implicits._
    val withNull = Seq((Some(Seq(1f, 2f)), None: Option[Seq[Float]])).toDF("a", "b")
    val out = withNull.select(GraftFunctions.vecL2($"a", $"b")).collect()
    assert(out.head.isNullAt(0))
    val bad = Seq((Seq(1f, 2f), Seq(1f))).toDF("a", "b")
    val e = intercept[Exception](bad.select(GraftFunctions.vecL2($"a", $"b")).collect())
    assert(e.getMessage != null)
  }

  test("golden values via expressions (distance.slt parity)") {
    import spark.implicits._
    val g = Seq((Seq(1f, 2f, 3f), Seq(2f, 3f, 4f))).toDF("a", "b")
      .select(round(GraftFunctions.vecL2($"a", $"b"), 3),
        round(GraftFunctions.vecNegdot($"a", $"b"), 3),
        round(GraftFunctions.vecCosdist($"a", $"b"), 3))
      .as[(Double, Double, Double)].head()
    assert(g == ((1.732, -20.0, 0.007)))
  }

  test("halfvec expressions are bit-identical to decode-then-kernel") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val rows = (0 until 50).map { i =>
      val v = Array.fill(37)(rng.nextFloat() * 4 - 2)
      val q = Array.fill(37)(rng.nextFloat() * 4 - 2)
      (i, graft.core.Half.encodeBytes(v), q.toSeq)
    }
    val df = rows.toDF("id", "hv", "q")
    val got = df.select($"id",
        GraftFunctions.vecL2Half($"hv", $"q"),
        GraftFunctions.vecNegdotHalf($"hv", $"q"),
        GraftFunctions.vecCosdistHalf($"hv", $"q"))
      .as[(Int, Double, Double, Double)].collect().sortBy(_._1)
    rows.foreach { case (i, hv, q) =>
      val v = graft.core.Half.decodeBytes(hv)
      val (_, l2, nd, cd) = got(i)
      assert(l2 == K.l2(v, q.toArray), s"l2 row $i")
      assert(nd == K.negdot(v, q.toArray), s"negdot row $i")
      assert(cd == K.cosdist(v, q.toArray), s"cosdist row $i")
    }
  }

  test("halfvec expressions registered for SQL; null-safe; length mismatch throws") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val hv = graft.core.Half.encodeBytes(Array(1f, 2f, 3f))
    Seq((hv, Seq(2f, 3f, 4f))).toDF("hv", "q").createOrReplaceTempView("halfrows")
    val d = spark.sql("SELECT round(vec_l2_half(hv, q), 3) AS d FROM halfrows")
      .as[Double].head()
    assert(d == 1.732)
    val withNull = Seq((None: Option[Array[Byte]], Some(Seq(1f, 2f)))).toDF("hv", "q")
    assert(withNull.select(GraftFunctions.vecL2Half($"hv", $"q")).collect().head.isNullAt(0))
    val bad = Seq((hv, Seq(1f))).toDF("hv", "q")
    val e = intercept[Exception](
      bad.select(GraftFunctions.vecL2Half($"hv", $"q")).collect())
    assert(e.getMessage != null)
  }

  test("vecNearest equals the k-cosdist argmin; ties to lowest; zero norms; dim throw") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, array_min, array_position, col, typedlit}
    val rng = new scala.util.Random(41)
    val k = 7
    val cents = Array.fill(k)(Array.fill(8)(rng.nextFloat() * 2 - 1))
    val rows = (0L until 300L).map(i => (i, Seq.fill(8)(rng.nextFloat() * 2 - 1))) :+
      (999L, Seq.fill(8)(0.0f)) // zero vector: every cosdist = 1.0 -> index 0
    val df = rows.toDF("id", "v")
    val viaTree = df.select($"id",
        (array_position(
          array(cents.toSeq.map(c => GraftFunctions.vecCosdist($"v", typedlit(c.toSeq))): _*),
          array_min(array(cents.toSeq.map(c =>
            GraftFunctions.vecCosdist($"v", typedlit(c.toSeq))): _*))) - 1)
          .cast("int").as("c"))
      .as[(Long, Int)].collect().toMap
    val viaExpr = df.select($"id", GraftFunctions.vecNearest($"v", cents).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(viaExpr == viaTree)
    assert(viaExpr(999L) == 0, "all-ties must pick the lowest index")
    val dup = Array(cents(3), cents(3)) // identical centroids: tie -> 0
    val t = df.limit(5).select(GraftFunctions.vecNearest($"v", dup).as("c"))
      .as[Int].collect()
    assert(t.forall(_ == 0))
    val e = intercept[Exception] {
      df.select(GraftFunctions.vecNearest($"v",
        Array(Array.fill(5)(0.1f)))).collect()
    }
    assert(e.getMessage != null)
  }
}
