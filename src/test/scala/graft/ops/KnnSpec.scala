package graft.ops

import graft.SparkSpec
import graft.core.{VectorKernels => K}

class KnnSpec extends SparkSpec {

  private lazy val data: Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(7)
    (0L until 300L).map(i => i -> Seq.fill(8)(rng.nextFloat() * 2 - 1))
  }

  test("topK matches naive brute force with (dist, id) ties") {
    import spark.implicits._
    val df = data.toDF("id", "vec")
    val q = Array.fill(8)(0.1f)
    val got = Knn.topK(df, "id", "vec", q, 10).as[(Long, Double)].collect()
    val want = data.map { case (id, v) => (K.l2(v.toArray, q), id) }
      .sorted.take(10).map { case (d, id) => (id, d) }
    assert(got.toSeq == want)
  }

  test("knnJoin returns exact per-query top-k") {
    import spark.implicits._
    val df = data.toDF("id", "vec").repartition(5)
    val queries = Array(0L, 1L, 2L).map(i => i -> data(i.toInt)._2.toArray)
    val got = Knn.knnJoin(df, "id", "vec", queries, 5, excludeSelf = true)
      .select("qid", "id", "dist").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    queries.foreach { case (qid, qv) =>
      val want = data.filter(_._1 != qid)
        .map { case (id, v) => (K.l2(v.toArray, qv), id) }
        .sorted.take(5).map { case (d, id) => (id, d) }
      assert(got(qid) == want, s"query $qid")
    }
  }
}
