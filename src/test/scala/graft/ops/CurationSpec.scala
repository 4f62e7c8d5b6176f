package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Training-data curation operators (ops/Curation.scala): benchmark
 * decontamination, deterministic mix sampling, token-window chunking,
 * repetition signals. Hand-computed goldens on tiny fixtures; the
 * corpus-scale behavior is oracle-checked end-to-end by the
 * `decontaminate` / `sample_mix` / `chunk_docs` / `text_repetition`
 * driver queries.
 */
class CurationSpec extends SparkSpec {

  import Curation._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: n-gram construction and short-doc edge") {
    import spark.implicits._
    val out = docs(1L -> "a b c d", 2L -> "a b")
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty, "docs shorter than n have no shingles")
  }

  test("decontaminate: overlap counting, minOverlap, and keep complement") {
    import spark.implicits._
    val train = docs(
      1L -> "the quick brown fox jumps over the lazy dog",   // shares 2 trigrams
      2L -> "completely unrelated text about spark engines", // shares 0
      3L -> "quick brown fox is here and brown fox jumps too") // shares 2
    val eval_ = docs(10L -> "a quick brown fox jumps high")
    val flagged = decontaminate(train, "doc_id", "text", eval_, "text",
      n = 3, minOverlap = 2)
      .as[(Long, Long)].collect().toMap
    // eval trigrams: {a quick brown, quick brown fox, brown fox jumps, fox jumps high}
    assert(flagged == Map(1L -> 2L, 3L -> 2L), s"got $flagged")
    val kept = decontaminateKeep(train, "doc_id", "text", eval_, "text",
      n = 3, minOverlap = 2).select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
    // minOverlap = 3 clears everything in this fixture
    assert(decontaminate(train, "doc_id", "text", eval_, "text", 3, 3).count() == 0)
  }

  test("decontaminate counts DISTINCT shingle types, not occurrences") {
    import spark.implicits._
    // "x y z" appears twice in the train doc but is ONE shared type
    val train = docs(1L -> "x y z q x y z")
    val eval_ = docs(9L -> "x y z")
    val got = decontaminate(train, "doc_id", "text", eval_, "text", 3, 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L), s"got $got")
  }

  test("sampleMix: deterministic, rate-monotone, 0 drops, 1 keeps") {
    import spark.implicits._
    val n = 2000
    val df = (0 until n).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    def kept(rates: Map[String, Double], default: Double = 1.0): Seq[Long] =
      sampleMix(df, "id", "src", rates, default).select("id").as[Long]
        .collect().toSeq.sorted
    val half = kept(Map("a" -> 0.5, "b" -> 0.0))
    assert(half == kept(Map("a" -> 0.5, "b" -> 0.0)), "must be deterministic")
    assert(half.forall(_ % 2 == 0), "rate 0.0 must drop source b entirely")
    // binomial(1000, 0.5): expect ~500, allow 6 sigma (~95)
    assert(math.abs(half.length - 500) < 100, s"rate 0.5 kept ${half.length}/1000")
    val quarter = kept(Map("a" -> 0.25, "b" -> 0.0))
    assert(quarter.toSet.subsetOf(half.toSet),
      "lower rate must select a SUBSET of the higher rate (threshold nesting)")
    assert(kept(Map.empty, default = 1.0).length == n, "rate 1.0 keeps all")
    // a different seed draws an (almost surely) different sample
    val reseeded = sampleMix(df, "id", "src", Map("a" -> 0.5, "b" -> 0.0),
      seed = "other").select("id").as[Long].collect().toSeq.sorted
    assert(reseeded != half, "seed must change the draw")
  }

  test("chunkTokens: coverage, overlap, short docs, tail") {
    import spark.implicits._
    val text10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = chunkTokens(docs(1L -> text10, 2L -> "a b"), "doc_id", "text",
      window = 4, stride = 3)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val d1 = out.filter(_._1 == 1L)
    // n=10, w=4, s=3: nc = ceil(6/3)+1 = 3 -> starts 0,3,6 ... wait last
    // start 6 covers w7..w10; chunk count = 3
    assert(d1.map(_._3) == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"), s"got ${d1.map(_._3)}")
    assert(d1.map(_._4) == Seq(4L, 4L, 4L))
    assert(d1.map(_._2) == Seq(0L, 1L, 2L), "chunk_no 0-based sequential")
    val d2 = out.filter(_._1 == 2L)
    assert(d2 == Seq((2L, 0L, "a b", 2L)), "short doc is one short chunk")
    // every token appears in at least one chunk
    val covered = d1.flatMap(_._3.split(' ')).toSet
    assert(covered == (1 to 10).map(i => s"w$i").toSet)
    // tail shorter than window is kept
    val tail = chunkTokens(docs(3L -> text10), "doc_id", "text", 4, 4)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2).toSeq
    assert(tail.map(_._4) == Seq(4L, 4L, 2L), s"got ${tail.map(_._4)}")
    intercept[IllegalArgumentException](
      chunkTokens(docs(1L -> "a"), "doc_id", "text", 4, 5))
  }

  test("repetitionSignals: hand-computed goldens") {
    import spark.implicits._
    val (topF, distR, dupG) = repetitionSignals(col("text"))
    val out = docs(
      1L -> "buy buy buy now",       // top=3/4, distinct=2/4, 2grams: [buy buy, buy buy, buy now] dup = 1 - 2/3
      2L -> "all words are different", // top=1/4, distinct=1, dup=0
      3L -> "x")                     // single token: top=1, distinct=1, grams empty -> 0
      .select(col("doc_id"), topF.as("t"), distR.as("d"), dupG.as("g"))
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._1 == 0.75 && out(1L)._2 == 0.5)
    assert(math.abs(out(1L)._3 - (1.0 - 2.0 / 3.0)) < 1e-12)
    assert(out(2L) == ((0.25, 1.0, 0.0)))
    assert(out(3L) == ((1.0, 1.0, 0.0)))
  }

  test("hashUnit lies in [0,1) and is stable across partitionings") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    val a = df.repartition(7).select(hashUnit(col("id"), "s").as("u"))
      .as[Double].collect().sorted.toSeq
    val b = df.repartition(2).select(hashUnit(col("id"), "s").as("u"))
      .as[Double].collect().sorted.toSeq
    assert(a == b, "hash keys must not depend on partitioning")
    assert(a.forall(u => u >= 0.0 && u < 1.0))
    // roughly uniform: mean within [0.4, 0.6]
    val mean = a.sum / a.length
    assert(mean > 0.4 && mean < 0.6, s"suspicious mean $mean")
  }

  test("redactPii: typed placeholders, staged counts, clean text untouched") {
    import spark.implicits._
    val (red, n) = redactPii(col("text"))
    val out = docs(
      1L -> "mail bob.smith+x@corp.example.org now",
      2L -> "server at 192.168.0.17 port 80",
      3L -> "call 555-867-5309 or 555.867.5309",
      4L -> "no pii here at all",
      5L -> "a@b.io and 10.0.0.1 and 555-123-4567")
      .select(col("doc_id"), red.as("r"), n.as("n"))
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("mail <EMAIL> now", 1L)))
    assert(out(2L) == (("server at <IP> port 80", 1L)))
    assert(out(3L) == (("call <PHONE> or <PHONE>", 2L)))
    assert(out(4L) == (("no pii here at all", 0L)))
    assert(out(5L) == (("<EMAIL> and <IP> and <PHONE>", 3L)))
  }

  test("cleanLines: word floor, terminal punctuation, banned substrings") {
    import spark.implicits._
    val text = Seq(
      "this line is long enough.",   // kept
      "too short.",                  // < 3 words
      "no terminal punctuation here",// no [.!?"'] ending
      "Lorem Ipsum filler text.",    // banned (case-insensitive)
      "ends with a question?"        // kept
    ).mkString("\n")
    val (cleaned, kept, total) = cleanLines(col("text"), minWords = 3)
    val r = docs(1L -> text)
      .select(cleaned.as("c"), kept.as("k"), total.as("t"))
      .as[(String, Long, Long)].head()
    assert(r._1 == "this line is long enough.\nends with a question?")
    assert(r._2 == 2L && r._3 == 5L)
    // a document that loses every line cleans to the empty string
    val e = docs(1L -> "tiny.")
      .select(cleaned.as("c"), kept.as("k"), total.as("t"))
      .as[(String, Long, Long)].head()
    assert(e == (("", 0L, 1L)))
  }

  test("substringDedup: cross-doc spans removed, within-doc repeats removed, unique text kept") {
    import spark.implicits._
    val shared = "one two three four five" // the duplicated 5-token span
    val d = docs(
      1L -> s"alpha $shared beta",
      2L -> s"gamma delta $shared",
      3L -> "all unique words in this document only",
      4L -> "r s t u v r s t u v", // 5-gram "r s t u v" occurs twice IN-doc
      5L -> "shorter than k")
    val out = substringDedup(d, "doc_id", "text", k = 5, minCount = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("alpha beta", 5L)))
    assert(out(2L) == (("gamma delta", 5L)))
    assert(out(3L) == (("all unique words in this document only", 0L)))
    assert(out(4L) == (("", 10L)), "within-doc repeated span is removed too")
    assert(out(5L) == (("shorter than k", 0L)), "docs under k tokens never touched")
  }

  test("substringDedup: overlapping duplicated windows merge their cover") {
    import spark.implicits._
    // "a b c d e f" in both docs: k=5 windows "a b c d e" and "b c d e f"
    // both duplicate; cover = positions 1..6, not double-removed
    val d = docs(1L -> "a b c d e f x", 2L -> "y a b c d e f")
    val out = substringDedup(d, "doc_id", "text", k = 5, minCount = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("x", 6L)))
    assert(out(2L) == (("y", 6L)))
  }

  test("substringDedup: AQE broadcasts the dup-key semi-join when the key set is small") {
    import spark.implicits._
    // r17 optimization guard: the dup-key side carries a REBALANCE stage
    // boundary so AQE sees its POST-filter size and converts the
    // occurrence-side LeftSemi from sort-merge to a broadcast probe —
    // without the boundary the build side is priced at the pre-filter
    // count-agg stage size and the whole occurrence side is exchanged
    // AND sorted (measured 83 s of task time on the 200k-doc fixture).
    val shared = "one two three four five"
    val d = docs((1L to 40L).map(i =>
      i -> (if (i % 2 == 0) s"alpha $i $shared" else s"beta $i uniq$i only here")): _*)
    val out = substringDedup(d, "doc_id", "text", k = 5, minCount = 2)
    out.collect() // execute so the adaptive plan is final
    val plan = out.queryExecution.executedPlan.toString
    // the hot-key branch is an explicit broadcast, so BHJ presence alone
    // proves nothing — the guard is that NO semi-join stayed sort-merge
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi-joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"dup-key semi-join must convert to broadcast at small dup-key counts:\n$plan")
  }

  test("capPerKey: n smallest per key survive; equals the window formulation") {
    import spark.implicits._
    val rows = (0L until 100L).map(i => (s"k${i % 3}", i))
    val df = rows.toDF("key", "id").repartition(7) // spread keys over partitions
    val got = capPerKey(df, "key", "id", 4)
      .as[(String, Long)].collect().sorted.toSeq
    val want = rows.groupBy(_._1).toSeq
      .flatMap { case (_, g) => g.sortBy(_._2).take(4) }.sorted
    assert(got == want)
    // cap above group size keeps everything
    assert(capPerKey(df, "key", "id", 50).count() == 100)
  }

  test("dedupLinesCorpus: duplicate lines keep first (doc,pos); uniques untouched") {
    import spark.implicits._
    val d = docs(
      1L -> "dup\nunique one\ndup",         // in-doc repeat: pos 2 removed
      2L -> "other\ndup\nlast",             // cross-doc: removed (doc1 pos0 keeps)
      3L -> "only original lines here")
    val out = dedupLinesCorpus(d, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("dup\nunique one", 1L)), "second in-doc occurrence removed")
    assert(out(2L) == (("other\nlast", 1L)), "cross-doc occurrence removed")
    assert(out(3L) == (("only original lines here", 0L)))
  }

  test("packSequences: greedy budget fill, bucket isolation, determinism") {
    import spark.implicits._
    val d = (0L until 60L).map(i => (i, 10L + (i % 5) * 7)).toDF("doc_id", "n")
    val out = packSequences(d, "doc_id", "n", budget = 50, buckets = 4)
      .as[(Long, Int, Long, Long)].collect()
    assert(out.length == 60, "every doc is packed")
    // replay the greedy scan per bucket: pack contents must match, and no
    // pack of >1 doc may exceed the budget
    val byBucket = out.groupBy(_._2)
    byBucket.foreach { case (_, docs) =>
      val packs = docs.groupBy(_._3).values
      packs.foreach { p =>
        val tot = p.map(_._4).sum
        assert(p.length == 1 || tot <= 50, s"overfull pack: $p")
      }
      // pack numbers are contiguous from 0
      val ns = docs.map(_._3).distinct.sorted
      assert(ns.toList == (0L until ns.length).toList)
    }
    // deterministic under repartitioning
    val out2 = packSequences(d.repartition(7), "doc_id", "n", budget = 50, buckets = 4)
      .as[(Long, Int, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
    // an over-budget doc still gets a pack of its own
    val big = Seq((1L, 500L), (2L, 10L)).toDF("doc_id", "n")
    val outBig = packSequences(big, "doc_id", "n", budget = 50, buckets = 1)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
    assert(outBig.map(_._3).distinct.length == 2, "oversize doc isolated in its own pack")
  }

  test("scoreWithModel: mean-weight sigmoid, OOV tokens contribute zero") {
    import spark.implicits._
    val w = Seq(("good", 2.0), ("bad", -2.0)).toDF("term", "weight")
    val d = docs(1L -> "good good bad zzz", 2L -> "zzz yyy")
    val out = scoreWithModel(d, "doc_id", "text", w)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    assert(out(1L)._1 == 4L)
    assert(math.abs(out(1L)._2 - sig((2.0 + 2.0 - 2.0 + 0.0) / 4)) < 1e-12)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 - sig(0.0)) < 1e-12, "all-OOV doc scores sigmoid(bias)")
  }

  test("importanceWeights: target-like docs outweigh off-target docs; counts exact") {
    import spark.implicits._
    // target distribution = 'alpha beta' world; off-target = 'delta echo'
    val target = (100L until 110L).map(i => i -> "alpha beta alpha beta alpha beta")
      .toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "alpha beta alpha beta alpha beta"), // looks like target
      (1L, "delta echo delta echo delta echo"), // does not
      (2L, "alpha beta delta echo alpha beta"), // mixed
      (3L, "x")                                 // < n tokens: no shingles
    ).toDF("doc_id", "text")
    val w = Curation.importanceWeights(corpus, "doc_id", "text", target, "text",
        n = 2, buckets = 64, alpha = 0.01)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!w.contains(3L), "sub-shingle docs are absent by contract")
    assert(w(0L)._1 == 5L, "bigram count with multiplicity")
    assert(w(0L)._2 > w(2L)._2 && w(2L)._2 > w(1L)._2,
      s"weight ordering target-like > mixed > off-target: $w")
    assert(w(1L)._2 < 0.0, "off-target doc has negative log-ratio")
  }

  test("decontaminateSpans removes only the leaked spans, keeps clean docs intact") {
    import spark.implicits._
    val evalDf = Seq((9L, "secret bench answer here")).toDF("doc_id", "text")
    val train = docs(
      1L -> "intro words secret bench answer here outro words", // leaked 4-gram span
      2L -> "totally clean document with no leaks at all",
      3L -> "secret bench answer here") // entire doc is the leak
    val out = Curation.decontaminateSpans(train, "doc_id", "text",
        evalDf, "text", k = 4)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("intro words outro words", 4L)))
    assert(out(2L) == (("totally clean document with no leaks at all", 0L)))
    assert(out(3L) == (("", 4L)), "fully-leaked doc empties out")
  }

  test("tokenCoverFilter kernel: fuzz vs brute set-based removal") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(53)
    for (_ <- 0 until 200) {
      val n = rng.nextInt(30)
      val k = 1 + rng.nextInt(5)
      val toks = Array.tabulate(n)(i => s"t$i")
      val m = rng.nextInt(8)
      val starts = Array.fill(m)(rng.nextInt(math.max(1, n)))
      val covered = starts.flatMap(s => s until math.min(n, s + k)).toSet
      val want = toks.zipWithIndex.collect { case (t, i) if !covered.contains(i) => t }
      val got = graft.functions.TextExprKernels.tokenCoverFilter(
        new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any)),
        new GenericArrayData(starts.map(i => Integer.valueOf(i): Any)), k)
      val gotArr = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      assert(gotArr == want.toSeq, s"n=$n k=$k starts=${starts.toSeq}")
    }
  }

  test("gopherRules: hand-computed signals and the keep decision") {
    import spark.implicits._
    val good = Seq.fill(60)("the quick brown foxes of it is in").mkString(" ")
    val rows = Seq(
      (1L, good),                              // passes every rule
      (2L, "too short but the a of it"),       // < 50 words
      (3L, Seq.fill(60)("### ##").mkString(" ")), // symbol storm + no alpha
      (4L, "- one\n- two\n- three\n" + good),  // bullets but under 0.9 frac
      (5L, ("x...\ny...\nz...\n" * 4) + good)  // ellipsis lines > 0.3
    ).toDF("doc_id", "text")
    val g = Curation.gopherRules(col("text"))
    val out = rows.select(col("doc_id"), g.nWords.as("n"), g.symbolRatio.as("sym"),
        g.bulletFrac.as("bf"), g.ellipsisFrac.as("ef"), g.alphaFrac.as("af"),
        g.stopHits.as("sh"), g.keep.as("k"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(7), "clean doc must pass")
    assert(!out(2L).getBoolean(7) && out(2L).getLong(1) < 50)
    assert(!out(3L).getBoolean(7) && out(3L).getDouble(5) == 0.0, "no alpha")
    assert(out(3L).getDouble(2) > 0.1, "symbol ratio breaches")
    assert(out(4L).getBoolean(7), "3 bullet lines of 4 total = 0.75 <= 0.9")
    assert(out(4L).getDouble(3) == 0.75)
    assert(!out(5L).getBoolean(7) && out(5L).getDouble(4) > 0.3, "ellipsis lines")
  }

  test("assignSplit: proportions, determinism, and no-migration when a split grows") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("id")
    def splits(ws: Seq[(String, Double)]): Map[Long, String] =
      Curation.assignSplit(df, "id", ws).select("id", "split")
        .as[(Long, String)].collect().toMap
    val a = splits(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(a == splits(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 3200) < 200, s"got $counts")
    assert(math.abs(counts("val") - 400) < 120 && math.abs(counts("test") - 400) < 120)
    // growing train's share must only CONVERT val/test rows into train,
    // never shuffle train rows out (monotone cumulative ranges)
    val b = splits(Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val aTrain = a.collect { case (id, "train") => id }.toSet
    val bTrain = b.collect { case (id, "train") => id }.toSet
    assert(aTrain.subsetOf(bTrain))
    intercept[IllegalArgumentException](
      Curation.assignSplit(df, "id", Seq("x" -> 0.0)))
  }

  test("trainQualityModel: separates planted classes, deterministic, serves via scoreWithModel") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    val posW = Vector("good", "great", "fine", "nice", "clear", "solid")
    val negW = Vector("bad", "awful", "poor", "sad", "noisy", "junk")
    def mk(v: Vector[String]) = Seq.fill(12)(v(rng.nextInt(v.size))).mkString(" ")
    val train = ((0 until 60).map(i => (1.0, mk(posW))) ++
      (0 until 60).map(i => (0.0, mk(negW)))).toDF("label", "text")
    val (w, bias) = Curation.trainQualityModel(train, "text", "label",
      buckets = 1024, iters = 200, lr = 2.0)
    // determinism across repartitionings
    val (w2, bias2) = Curation.trainQualityModel(train.repartition(7), "text", "label",
      buckets = 1024, iters = 200, lr = 2.0)
    assert(bias == bias2)
    assert(w.orderBy("term").collect().toSeq == w2.orderBy("term").collect().toSeq)
    // held-out docs (same vocab, fresh combinations) separate cleanly
    val held = ((100L until 110L).map(i => (i, mk(posW))) ++
      (200L until 210L).map(i => (i, mk(negW)))).toDF("doc_id", "text")
    val scores = Curation.scoreWithModel(held, "doc_id", "text", w, bias = bias)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val posS = scores.filter(_._1 < 200).values
    val negS = scores.filter(_._1 >= 200).values
    assert(posS.min > 0.8 && negS.max < 0.2,
      s"separation failed: pos=[${posS.min}..] neg=[..${negS.max}]")
    val e = intercept[IllegalArgumentException] {
      Curation.trainQualityModel(train, "text", "label", sampleCap = 10)
    }
    assert(e.getMessage.contains("sampleCap"))
  }

  test("normalizeText: NFC composition, NFKC compat, accent strip, lower") {
    import spark.implicits._
    val df = Seq(
      (1L, "Cafe\u0301"),  // decomposed e + combining acute
      (2L, "Caf\u00e9"),   // precomposed e-acute
      (3L, "ﬁn Ａ"),  // ﬁ ligature + fullwidth A
      (4L, "MiXeD ASCII")
    ).toDF("id", "t")
    def run(form: String, lower: Boolean, strip: Boolean): Map[Long, String] =
      df.select($"id", TextOps.normalizeText($"t", form, lower, strip).as("n"))
        .as[(Long, String)].collect().toMap
    val nfc = run("nfc", lower = false, strip = false)
    assert(nfc(1L) == nfc(2L) && nfc(2L) == "Café",
      "NFC must compose the decomposed form")
    val stripped = run("nfc", lower = true, strip = true)
    assert(stripped(1L) == "cafe" && stripped(2L) == "cafe")
    assert(stripped(4L) == "mixed ascii")
    val nfkc = run("nfkc", lower = true, strip = false)
    assert(nfkc(3L) == "fin a", "NFKC folds ligature + fullwidth; NFC must not")
    assert(run("nfc", lower = true, strip = false)(3L) == "ﬁn ａ")
    intercept[IllegalArgumentException] {
      TextOps.normalizeText($"t", "nfd")
    }
  }

  test("ngramCrossEntropy: in-domain docs score lower; exact value on a hand case") {
    import spark.implicits._
    val lm = Seq((0L, "a b a b a b a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b a b"),   // pure in-domain bigrams
      (2L, "x y x y"),   // fully out-of-domain
      (3L, "a")          // no bigrams: absent
    ).toDF("doc_id", "text")
    val got = Curation.ngramCrossEntropy(docs, "doc_id", "text", lm, "text",
        buckets = 64, alpha = 0.1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!got.contains(3L))
    assert(got(1L)._1 == 3L && got(2L)._1 == 3L)
    assert(got(1L)._2 < got(2L)._2, "in-domain must be lower cross-entropy")
    // independent reimplementation of the hashed add-alpha model
    def bucket(s: String, b: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % b).toInt
    }
    val cb = new Array[Long](64); val cu = new Array[Long](64)
    val lmToks = "a b a b a b a b".split(' ')
    lmToks.sliding(2).foreach(w => cb(bucket(w.mkString(" "), 64)) += 1)
    lmToks.dropRight(1).foreach(w => cu(bucket(w, 64)) += 1)
    def xent(text: String): Double = {
      val t = text.split(' ')
      val lps = t.sliding(2).map { w =>
        math.log((cb(bucket(w.mkString(" "), 64)) + 0.1) /
                 (cu(bucket(w(0), 64)) + 0.1 * 64))
      }.toSeq
      -lps.sum / lps.length
    }
    assert(math.abs(got(1L)._2 - xent("a b a b")) < 1e-12)
    assert(math.abs(got(2L)._2 - xent("x y x y")) < 1e-12)
  }

  test("dsirResample: near-zero temperature = hard top-k; deterministic under repartition") {
    import spark.implicits._
    val target = Seq((9L, "alpha beta alpha beta")).toDF("doc_id", "text")
    // 20 target-like docs, 20 off-target; tiny temperature makes the
    // Gumbel noise negligible against the weight gap
    val corpus = ((0L until 20L).map(i => i -> "alpha beta alpha beta alpha beta") ++
      (20L until 40L).map(i => i -> "delta echo foxtrot golf hotel india"))
      .toDF("doc_id", "text")
    def run(parts: Int): Set[Long] =
      Curation.dsirResample(corpus.repartition(parts), "doc_id", "text",
          target, "text", nKeep = 20, n = 2, buckets = 64,
          temperature = 1e-6)
        .select("doc_id").as[Long].collect().toSet
    val got = run(3)
    assert(got == (0L until 20L).toSet, s"top-20 must be the target-like docs: $got")
    assert(got == run(7), "selection is repartition-invariant")
    val e = intercept[IllegalArgumentException] {
      Curation.importanceWeights(corpus, "doc_id", "text",
        target.filter($"doc_id" < 0), "text", n = 2, buckets = 64)
    }
    assert(e.getMessage.contains("no 2-gram shingles"))
  }
}
