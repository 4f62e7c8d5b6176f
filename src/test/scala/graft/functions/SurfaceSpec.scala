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
}
