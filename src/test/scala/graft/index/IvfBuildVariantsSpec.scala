package graft.index

import graft.SparkSpec
import graft.core.{VectorKernels => K}
import graft.kmeans.KMeans
import java.nio.file.Files

/**
 * Build-path variants: hierarchical k-means (reference B3), dim-reduced
 * clustering (B4), rotated storage (B6), rerank-in-table (Q6 /
 * rerank_in_table.slt).
 */
class IvfBuildVariantsSpec extends SparkSpec {

  private def freshDir(): String = Files.createTempDirectory("graft-ivf-var").toString

  private lazy val rows: Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(23)
    (0L until 800L).map(i => i -> Seq.fill(12)(rng.nextFloat() * 2 - 1))
  }

  private def brute(q: Array[Float], k: Int): Seq[Long] =
    rows.map { case (id, v) => (K.l2(v.toArray, q), id) }.sorted.take(k).map(_._2)

  test("hierarchical k-means: k clusters, deterministic, sane assignment") {
    val sample = rows.map(_._2.toArray).toArray
    val c1 = KMeans.hierarchical(sample, 16)
    val c2 = KMeans.hierarchical(sample, 16)
    assert(c1.length == 16)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    // clustering quality: mean distance to nearest centroid beats a
    // single-centroid baseline
    val single = KMeans.lloyd(sample, 1)
    def cost(cents: Array[Array[Float]]): Double =
      sample.map(p => K.l2s(p, cents(KMeans.nearest(p, cents)))).sum / sample.length
    assert(cost(c1) < cost(single) * 0.8)
  }

  test("hierarchical build: exact search still exact, ANN recall holds") {
    import spark.implicits._
    val idx = IvfIndex.build(rows.toDF("id", "vec"), "id", "vec", freshDir(),
      IvfConfig(lists = 16, kmeansAlgo = "hierarchical"))
    val q = Array.fill(12)(0.25f)
    assert(idx.searchExact(q, 10).select("id").as[Long].collect().toSeq == brute(q, 10))
    assert(idx.evaluateRecall(q, 10, probes = 16, refine = 16) == 1.0)
  }

  test("bits=1 (classic RaBitQ binary code, the reference index's fast-scan " +
       "tier): refine recovers exact top-k; range stays exact; 8x smaller codes") {
    import spark.implicits._
    val idx = IvfIndex.build(rows.toDF("id", "vec"), "id", "vec", freshDir(),
      IvfConfig(lists = 8, bits = 1))
    val q = Array.fill(12)(0.2f)
    // 1-bit estimates are the coarsest tier — a generous refine pool
    // (like the reference's rerank) must still recover the exact top-k
    // with every cell probed
    assert(idx.search(q, 10, probes = 8, refine = 40)
      .select("id").as[Long].collect().toSeq == brute(q, 10), "bits=1 knn")
    // sphere range: the epsilon-scaled lower bound must stay a true
    // lower bound at 1 bit — no qualifying row lost before the exact cut
    val ds = rows.map { case (_, v) => K.l2(v.toArray, q) }.sorted
    val r = (ds(79) + ds(80)) / 2.0
    val got = idx.rangeSearch(q, r).select("id").as[Long].collect().toSeq
    val want = rows.map { case (id, v) => (K.l2(v.toArray, q), id) }
      .filter(_._1 < r).sorted.map(_._2)
    assert(got == want, s"bits=1 range: got ${got.length} want ${want.length}")
    // codes shrink 8x: 12d packs to 2 bytes at 1 bit vs 12 at 8 bits
    val codeLen = spark.read.parquet(s"${idx.dir}/gen-0")
      .select(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("codes")))
      .as[Int].head()
    assert(codeLen == 2, s"bits=1 code bytes $codeLen")
    // 2-bit codes are rejected as an INDEX tier (graph-vertex only)
    val e = intercept[IllegalArgumentException](IvfConfig(bits = 2).validate())
    assert(e.getMessage.contains("graph-vertex"))
  }

  test("dim-reduced clustering build keeps full-dim exactness") {
    import spark.implicits._
    val idx = IvfIndex.build(rows.toDF("id", "vec"), "id", "vec", freshDir(),
      IvfConfig(lists = 8, kmeansDim = 4))
    val q = Array.fill(12)(-0.15f)
    assert(idx.meta.dim == 12, "centroids must be recomputed full-dim")
    assert(idx.searchExact(q, 10).select("id").as[Long].collect().toSeq == brute(q, 10))
  }

  test("rotated storage: distances preserved (orthonormal), search matches brute") {
    import spark.implicits._
    val idx = IvfIndex.build(rows.toDF("id", "vec"), "id", "vec", freshDir(),
      IvfConfig(lists = 8, rotate = true))
    assert(idx.meta.dim == 16 && idx.meta.origDim == 12) // padded to pow2
    val q = Array.fill(12)(0.4f)
    val got = idx.searchExact(q, 10).select("id", "dist")
      .as[(Long, Double)].collect()
    val want = rows.map { case (id, v) => (K.l2(v.toArray, q), id) }.sorted.take(10)
    assert(got.map(_._1).toSeq == want.map(_._2))
    got.map(_._2).zip(want.map(_._1)).foreach { case (d, w) =>
      assert(math.abs(d - w) < 1e-4, s"$d vs $w") // fp32 rotation noise only
    }
  }

  test("assignByTree: descent assignment serves exactly; lifecycle intact") {
    import spark.implicits._
    val dir = freshDir()
    val idx = IvfIndex.build(rows.toDF("id", "vec"), "id", "vec", dir,
      IvfConfig(lists = 32, lists1 = 4, assignByTree = true))
    val q = Array.fill(12)(0.25f)
    // exactness is probe-budget-independent of how rows were ASSIGNED:
    // full-probe search must equal brute force
    assert(idx.searchExact(q, 10).select("id").as[Long].collect().toSeq == brute(q, 10))
    assert(idx.evaluateRecall(q, 10, probes = 32, refine = 16) == 1.0)
    // every row's cell is the tree-descent result: its cluster must be
    // one of the cells the descent through its own vector reaches
    val assigned = spark.read.parquet(s"$dir/gen-0")
      .selectExpr("cast(cluster_id as int)", "cast(id as long)")
      .as[(Int, Long)].collect().toMap.map(_.swap)
    // spot-check: assigned cell's l1 parent contains the cell (tree-consistent)
    val byChild = idx.meta.l1Children.zipWithIndex
      .flatMap { case (kids, p) => kids.map(_ -> p) }.toMap
    assert(assigned.values.forall(cid => byChild.contains(cid)))
    // delta insert uses the same descent; compact folds it in
    idx.appendDelta(Seq((9001L, Seq.fill(12)(0.25f))).toDF("id", "vec"), "id", "vec")
    idx.compact()
    assert(idx.searchExact(q, 1).select("id").as[Long].head() == 9001L)
    // reload round-trips the flag
    assert(IvfIndex.load(spark, dir).meta.cfg.assignByTree)
  }

  test("two-level tree (B5): l1 groups partition the leaves; search still works") {
    import spark.implicits._
    val dir = freshDir()
    val idx = IvfIndex.build(rows.toDF("id", "vec"), "id", "vec", dir,
      IvfConfig(lists = 32, lists1 = 4))
    assert(idx.meta.l1Centroids.length == 4)
    assert(idx.meta.l1Children.flatten.sorted.toSeq == (0 until 32), "children partition leaves")
    val q = Array.fill(12)(0.2f)
    // descending through l1 prunes leaf scoring but recall stays high
    val rng = new scala.util.Random(4)
    val recalls = (0 until 5).map { _ =>
      val qq = Array.fill(12)(rng.nextFloat() * 2 - 1)
      idx.evaluateRecall(qq, 10, probes = 16, refine = 16)
    }
    assert(recalls.sum / recalls.size >= 0.8, s"recalls $recalls")
    // load round-trips the l1 level
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.meta.l1Centroids.length == 4)
    assert(loaded.probe(q, 8).toSeq == idx.probe(q, 8).toSeq)
  }

  test("cosdist + rotate: one consistent normalize-then-rotate space, recall holds") {
    import spark.implicits._
    val idx = IvfIndex.build(rows.toDF("id", "vec"), "id", "vec", freshDir(),
      IvfConfig(lists = 8, metric = "cosdist", rotate = true))
    val q = Array.fill(12)(0.3f)
    // exact path through rotated storage matches raw cosdist brute force
    val got = idx.searchExact(q, 10).select("id").as[Long].collect().toSeq
    val want = rows.map { case (id, v) => (K.cosdist(v.toArray, q), id) }
      .sorted.take(10).map(_._2)
    assert(got.toSet.intersect(want.toSet).size >= 9, s"got $got want $want")
    // ANN path: probing must agree with the space centroids were fit in
    val rng = new scala.util.Random(6)
    val recalls = (0 until 5).map { _ =>
      idx.evaluateRecall(Array.fill(12)(rng.nextFloat() * 2 - 1), 10, probes = 8, refine = 16)
    }
    assert(recalls.sum / recalls.size >= 0.95, s"recalls $recalls")
  }

  test("two-level tree: probes=lists reaches every leaf (auto probes1)") {
    import spark.implicits._
    val idx = IvfIndex.build(rows.toDF("id", "vec"), "id", "vec", freshDir(),
      IvfConfig(lists = 32, lists1 = 16))
    val q = Array.fill(12)(-0.4f)
    // full-probe request must reach all 32 leaves despite 16 l1 groups
    assert(idx.probe(q, 32).length == 32)
    assert(idx.evaluateRecall(q, 10, probes = 32, refine = 16) == 1.0)
  }

  test("rerank-in-table returns exact distances from the source table") {
    import spark.implicits._
    val df = rows.toDF("id", "vec")
    val idx = IvfIndex.build(df, "id", "vec", freshDir(), IvfConfig(lists = 8))
    val q = Array.fill(12)(0.1f)
    val viaTable = idx.search(q, 10, probes = 8, refine = 80,
        rerankTable = Some((df, "id", "vec")))
      .as[(Long, Double)].collect().toSeq
    val want = rows.map { case (id, v) => (K.l2(v.toArray, q), id) }
      .sorted.take(10).map { case (d, id) => (id, d) }
    assert(viaTable == want) // bit-exact: distances recomputed on raw table vectors
  }

  test("f16 storage: half the vec bytes, search matches f16-roundtrip brute force") {
    import spark.implicits._
    val df = rows.toDF("id", "vec")
    val dir16 = freshDir(); val dir32 = freshDir()
    val idx16 = IvfIndex.build(df, "id", "vec", dir16,
      IvfConfig(lists = 8, storage = "f16"))
    IvfIndex.build(df, "id", "vec", dir32, IvfConfig(lists = 8))
    val q = Array.fill(12)(0.2f)
    // ground truth lives in the f16 store: brute force over roundtripped vectors
    val want = rows.map { case (id, v) =>
        (K.l2(graft.core.Half.roundtrip(v.toArray), q), id)
      }.sorted.take(10).map { case (d, id) => (id, d) }
    val got = idx16.search(q, 10, probes = 8, refine = 80)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
    // reload path preserves the storage mode
    val reloaded = IvfIndex.load(spark, dir16)
    assert(reloaded.meta.cfg.storage == "f16")
    assert(reloaded.searchExact(q, 5).as[(Long, Double)].collect().toSeq == want.take(5))
    // the f16 generation is materially smaller than the f32 one
    def bytes(d: String): Long = {
      val p = java.nio.file.Paths.get(d, "gen-0")
      java.nio.file.Files.walk(p).filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
    }
    assert(bytes(dir16) < bytes(dir32) * 0.8,
      s"f16 gen ${bytes(dir16)}B vs f32 gen ${bytes(dir32)}B")
  }

  test("B5: 3-level tree (upperLists) — descent probes, exactness, recall, reload") {
    import spark.implicits._
    val df = rows.toDF("id", "vec")
    val dir = freshDir()
    val idx = IvfIndex.build(df, "id", "vec", dir,
      IvfConfig(lists = 32, upperLists = Seq(2, 8)))
    // tree shape: 2 roots -> 8 mid groups -> 32 leaves; children partition
    // each tier exactly
    assert(idx.meta.upperCentroids.map(_.length) == Seq(2, 8))
    assert(idx.meta.upperChildren(0).flatten.sorted.toSeq == (0 until 8))
    assert(idx.meta.upperChildren(1).flatten.sorted.toSeq == (0 until 32))
    val q = Array.fill(12)(0.3f)
    assert(idx.searchExact(q, 10).select("id").as[Long].collect().toSeq == brute(q, 10))
    // full-budget recall through the descent stays perfect, and a
    // restricted finest-level budget still probes sanely
    assert(idx.evaluateRecall(q, 10, probes = 32, refine = 16) == 1.0)
    val probedNarrow = idx.probe(q, 8, probes1 = 3)
    assert(probedNarrow.length == 8)
    // reload round-trips all levels
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.meta.upperCentroids.map(_.length) == Seq(2, 8))
    assert(loaded.meta.upperChildren(1).zip(idx.meta.upperChildren(1))
      .forall { case (a, b) => a.sameElements(b) })
    assert(loaded.probe(q, 8).toSeq == idx.probe(q, 8).toSeq)
    // max height enforced like the reference (1-8 levels total)
    assertThrows[IllegalArgumentException] {
      IvfConfig(lists = 256, upperLists = Seq(1, 2, 3, 4, 5, 6, 7, 8)).validate()
    }
    assertThrows[IllegalArgumentException] {
      IvfConfig(lists = 8, lists1 = 4, upperLists = Seq(2, 4)).validate()
    }
    assertThrows[IllegalArgumentException] {
      IvfConfig(lists = 8, upperLists = Seq(6, 2)).validate()
    }
  }

  test("B1: build sampling is randomized — clustered data in sorted order still covers every mode") {
    import spark.implicits._
    // 4 well-separated blobs, rows ORDERED by blob, sample cap (lists x
    // samplingFactor = 8 x 32 = 256) below one blob's 500 rows: a prefix
    // sample would learn all 8 centroids from blob 0 alone (reference
    // does a randomized table-sample scan, src/index/sample.rs:14-262)
    val rng = new scala.util.Random(7)
    def center(b: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == b * 2) 10f * (b + 1) else 0f)
    val blobRows: Seq[(Long, Seq[Float])] = (0 until 4).flatMap { b =>
      (0 until 500).map { i =>
        (b * 500 + i).toLong -> center(b).map(_ + rng.nextFloat() * 0.2f).toSeq
      }
    }
    val dir = freshDir()
    val idx = IvfIndex.build(blobRows.toDF("id", "vec"), "id", "vec", dir,
      IvfConfig(lists = 8, samplingFactor = 32))
    // every blob center must have a learned centroid nearby — with a
    // prefix sample the nearest centroid to blob 3's center sits >= 10
    // away (it was learned from blob 0)
    (0 until 4).foreach { b =>
      val d = math.sqrt(idx.meta.centroids.map(c => K.l2s(center(b), c)).min)
      assert(d < 2.0, s"blob $b has no nearby centroid (nearest at $d)")
    }
    // and ANN at the standard budget stays perfect at each mode
    (0 until 4).foreach { b =>
      assert(idx.evaluateRecall(center(b), 10, probes = 4, refine = 16) == 1.0,
        s"recall at blob $b")
    }
    // seeded hash ordering => bit-identical centroids on rebuild
    val idx2 = IvfIndex.build(blobRows.toDF("id", "vec"), "id", "vec", freshDir(),
      IvfConfig(lists = 8, samplingFactor = 32))
    assert(idx.meta.centroids.zip(idx2.meta.centroids)
      .forall { case (a, c) => a.sameElements(c) })
  }
}
