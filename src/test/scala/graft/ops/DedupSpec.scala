package graft.ops

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  /** Synthetic corpus with planted near-dups: doc i and i+100 share most
    * of their tokens for i < 20. */
  private lazy val docs: Seq[(Long, String)] = {
    val rng = new scala.util.Random(11)
    val vocab = Vector("spark", "scan", "join", "sort", "hash", "merge", "row",
      "batch", "query", "filter", "group", "window", "stream", "key", "value")
    def mk(n: Int): String = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 100L).map(i => i -> mk(30))
    val nearDups = (0L until 20L).map { i =>
      val words = base(i.toInt)._2.split(' ')
      words(words.length - 1) = "changed" // 1-token mutation
      (100L + i) -> words.mkString(" ")
    }
    base ++ nearDups
  }

  test("minhash LSH candidates cover all high-jaccard pairs (no misses >= 0.6)") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val sh = Dedup.shingles(df, "doc_id", "text", 3).cache()
    val exact = Dedup.jaccardPairs(sh, 0.6)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain planted near-dups")
    val cand = Dedup.minhashCandidates(sh)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(cand),
      s"missed pairs: ${exact.diff(cand).take(5)}")
  }

  test("minhashDedup output equals exact jaccard for detected pairs") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.minhashDedup(df, "doc_id", "text", 0.6)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairs(Dedup.shingles(df, "doc_id", "text", 3), 0.6)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(got == exact) // no false positives; fixture pairs all found
  }

  test("simhash finds planted 1-token mutations") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val pairs = Dedup.simhashDedup(df, "doc_id", "text", 3)
      .select("da", "db").as[(Long, Long)].collect().toSet
    // a 1-of-30-token mutation flips few simhash bits; expect most planted
    // pairs recovered
    val planted = (0L until 20L).map(i => (i, i + 100L)).toSet
    assert(pairs.intersect(planted).size >= 10, s"found ${pairs.intersect(planted).size}")
  }

  test("exact dup groups") {
    import spark.implicits._
    val df = (docs ++ Seq(500L -> docs.head._2)).toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(df, "doc_id", org.apache.spark.sql.functions.md5(
      org.apache.spark.sql.functions.col("text").cast("binary")))
    val g = groups.select("keep_id", "n").as[(Long, Long)].collect()
    assert(g.toSeq == Seq((0L, 2L)))
  }

  test("embedding LSH near-dup finds identical vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val vecs = (0L until 50L).map(i => i -> Seq.fill(16)(rng.nextFloat() * 2 - 1))
    val withDup = vecs ++ Seq(100L -> vecs.head._2)
    val df = withDup.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(df, "vec_id", "embedding", 0.01)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(exact == Set((0L, 100L)))
    val lsh = Dedup.embeddingNearDup(df, "vec_id", "embedding", 0.01, lshBits = 8, lshTables = 4)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(lsh == Set((0L, 100L)))
  }
}
