package graft.ops

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "cat dog cat"),
    (1L, "dog dog dog dog"),
    (2L, "cat fish"),
    (3L, "bird bird bird"),
    (4L, "cat dog fish bird cat")
  ).toDF("doc_id", "text")

  test("bm25Stats: N, avgdl, per-term df") {
    val st = Search.bm25Stats(docs, "text", Seq("cat", "dog", "whale"))
    assert(st.nDocs == 5)
    assert(math.abs(st.avgDl - 3.4) < 1e-12) // (3+4+2+3+5)/5
    assert(st.df == Map("cat" -> 3L, "dog" -> 3L)) // absent term -> no row
  }

  test("bm25Score matches a hand-computed BM25") {
    val terms = Seq("cat", "dog")
    val st = Search.bm25Stats(docs, "text", terms)
    def idf(df: Long): Double = math.log((5 - df + 0.5) / (df + 0.5) + 1.0)
    def part(tf: Double, dl: Double, df: Long): Double =
      if (tf == 0) 0.0
      else idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / 3.4)))
    val got = Search.bm25Score(docs, "doc_id", "text", terms, stats = Some(st))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 has neither term -> filtered out entirely
    assert(got.keySet == Set(0L, 1L, 2L, 4L))
    val want = Map(
      0L -> (part(2, 3, 3) + part(1, 3, 3)),
      1L -> part(4, 4, 3),
      2L -> part(1, 2, 3),
      4L -> (part(2, 5, 3) + part(1, 5, 3)))
    want.foreach { case (id, w) => assert(math.abs(got(id) - w) < 1e-12, s"doc $id") }
  }

  test("bm25TopK order: score desc with id tie-break") {
    val ids = Search.bm25TopK(docs, "doc_id", "text", Seq("cat"), 3)
      .select("doc_id").as[Long].collect().toSeq
    // tf=2 docs first (shorter doc wins), then tf=1 shorter-first
    assert(ids.head == 0L) // tf=2, dl=3 beats tf=2, dl=5
    assert(ids(1) == 4L)
    assert(ids(2) == 2L) // tf=1, dl=2
  }

  test("bm25Score plan is shuffle-free (stats precomputed)") {
    val st = Search.bm25Stats(docs, "text", Seq("cat"))
    val plan = Search.bm25Score(docs, "doc_id", "text", Seq("cat"), stats = Some(st))
      .queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty, plan.toString)
  }

  test("rrfFuse: fused score and ordering") {
    val a = Seq((10L, 1.0), (20L, 2.0), (30L, 3.0)).toDF("id", "dist")
    val b = Seq((20L, 9.0), (40L, 5.0)).toDF("id", "score")
    val got = Search.rrfFuse(Seq(
        a -> col("dist").asc, b -> col("score").desc), "id", kRrf = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-15) // rank 2 + rank 1
    assert(math.abs(got(10L) - 1.0 / 61) < 1e-15)
    assert(math.abs(got(40L) - 1.0 / 62) < 1e-15)
    assert(math.abs(got(30L) - 1.0 / 63) < 1e-15)
    // 20 fused first (two runs beat any single-run contribution here)
    val order = Search.rrfFuse(Seq(
        a -> col("dist").asc, b -> col("score").desc), "id", topK = 2)
      .select("id").as[Long].collect().toSeq
    assert(order == Seq(20L, 10L))
  }

  test("postings index: bit-identical to the scan path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-postings").toString
    val idx = Search.buildPostings(docs, "doc_id", "text", dir, nBuckets = 4)
    val terms = Seq("cat", "dog")
    val scan = Search.bm25Score(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val served = idx.score(spark, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(served == scan) // exact double equality, same operand order
    // top-k form agrees too
    val topScan = Search.bm25TopK(docs, "doc_id", "text", terms, 3)
      .select("doc_id").as[Long].collect().toSeq
    val topIdx = idx.search(spark, terms, 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(topIdx == topScan)
  }

  test("postings index: load round-trip and bucket pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-postings2").toString
    val built = Search.buildPostings(docs, "doc_id", "text", dir, nBuckets = 8)
    val loaded = Search.loadPostings(dir)
    assert(loaded == built)
    // the scan reads only the query terms' buckets: partition filters
    // appear in the FileSourceScan and prune to <= |terms| buckets
    // executedPlan is AQE-wrapped before execution; sparkPlan has the
    // file scans resolved and is what this assertion is about
    val plan = loaded.score(spark, Seq("cat")).queryExecution.sparkPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val postingsScan = scans.find(_.relation.location.rootPaths
      .exists(_.toString.contains("postings"))).get
    assert(postingsScan.partitionFilters.nonEmpty, postingsScan.toString)
    assert(postingsScan.relation.location.inputFiles
      .count(_.contains("bucket=")) >= 1)
    val prunedParts = postingsScan.selectedPartitions.partitionCount
    assert(prunedParts <= 1, s"expected 1 pruned bucket, scanned $prunedParts")
  }

  test("postings score: single pass — df folded in, postings scanned once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-p1pass").toString
    val idx = Search.buildPostings(docs, "doc_id", "text", dir, nBuckets = 4)
    val df = idx.score(spark, Seq("cat", "dog"))
    df.collect() // materialize so AQE resolves the final plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // descend through AQE wrappers/stages; ReusedExchange is a LEAF
    // referencing an exchange counted elsewhere, so don't re-count it
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val plan = df.queryExecution.executedPlan
    val postingsScans = scans(plan).filter(_.relation.location.rootPaths
      .exists(_.toString.contains("postings")))
    // the df aggregate and the scoring projection share the pivoted
    // exchange (ReusedExchange / AQE stage reuse): the pruned term
    // buckets are read ONCE per query
    val distinctScans = postingsScans.map(s => System.identityHashCode(s)).distinct
    assert(distinctScans.size == 1,
      s"expected one postings scan, got ${postingsScans.size} (plan:\n$plan)")
    // the standalone stats() API (standing-corpus usage) must agree
    // with the df values the single-pass score folds in — pinned here
    // so the two derivations cannot silently diverge
    val st = idx.stats(spark, Seq("cat", "dog", "whale"))
    assert(st.df == Map("cat" -> 3L, "dog" -> 3L)) // absent term -> no row
    assert(st.nDocs == 5 && math.abs(st.avgDl - 3.4) < 1e-12)
  }

  test("postings append: incremental insert equals a fresh build") {
    val more = Seq(
      (10L, "dog whale"),
      (11L, "cat cat whale fish")
    ).toDF("doc_id", "text")
    val dirInc = java.nio.file.Files.createTempDirectory("graft-pinc").toString
    val dirAll = java.nio.file.Files.createTempDirectory("graft-pall").toString
    val inc = Search.buildPostings(docs, "doc_id", "text", dirInc, nBuckets = 4)
      .append(more, "doc_id", "text")
    val fresh = Search.buildPostings(docs.unionByName(more), "doc_id", "text",
      dirAll, nBuckets = 4)
    assert(inc.nDocs == fresh.nDocs && inc.nTokens == fresh.nTokens)
    assert(inc.avgDl == fresh.avgDl) // exact integer sums -> same double
    val terms = Seq("cat", "dog", "whale")
    val a = inc.score(spark, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = fresh.score(spark, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b && a.contains(10L) && a.contains(11L))
    // and both equal the corpus scan over the union
    val scan = Search.bm25Score(docs.unionByName(more), "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == scan)
    // create-then-insert: append into an EMPTY index serves too
    val dirE = java.nio.file.Files.createTempDirectory("graft-pempty").toString
    val e = Search.buildPostings(docs.limit(0), "doc_id", "text", dirE, 4)
      .append(docs, "doc_id", "text")
    val eScores = e.score(spark, Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fScores = Search.bm25Score(docs, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(eScores == fScores)
  }

  test("requireAll: AND semantics agree between scan and index paths") {
    val terms = Seq("cat", "dog")
    val scan = Search.bm25Score(docs, "doc_id", "text", terms, requireAll = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // only docs 0 and 4 contain BOTH cat and dog
    assert(scan.keySet == Set(0L, 4L))
    // same scores as OR mode on the surviving docs (the gate filters,
    // never rescales)
    val orMode = Search.bm25Score(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scan == orMode.filter(kv => scan.keySet(kv._1)))
    val dir = java.nio.file.Files.createTempDirectory("graft-pand").toString
    val idx = Search.buildPostings(docs, "doc_id", "text", dir, nBuckets = 4)
    val served = idx.score(spark, terms, requireAll = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(served == scan)
    assert(idx.search(spark, terms, 5, requireAll = true)
      .select("doc_id").as[Long].collect().toSet == Set(0L, 4L))
  }

  test("null-text rows: scan and index stats stay identical") {
    val withNull = Seq(
      (0L, "cat dog"), (1L, null.asInstanceOf[String]), (2L, "cat")
    ).toDF("doc_id", "text")
    val st = Search.bm25Stats(withNull, "text", Seq("cat"))
    assert(st.nDocs == 3) // the null row is a zero-length doc, not skipped
    assert(st.avgDl == 1.0) // (2 + 0 + 1) / 3
    val dir = java.nio.file.Files.createTempDirectory("graft-pnull").toString
    val idx = Search.buildPostings(withNull, "doc_id", "text", dir, 4)
    assert(idx.nDocs == st.nDocs && idx.avgDl == st.avgDl)
    val scan = Search.bm25Score(withNull, "doc_id", "text", Seq("cat"),
        stats = Some(st))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val served = idx.score(spark, Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(served == scan)
  }

  test("postings remove: bulk delete equals a fresh build over survivors") {
    val dirR = java.nio.file.Files.createTempDirectory("graft-prem").toString
    val dirS = java.nio.file.Files.createTempDirectory("graft-psurv").toString
    val idx = Search.buildPostings(docs, "doc_id", "text", dirR, nBuckets = 4)
    val dropIds = Seq(1L, 3L).toDF("doc_id")
    val after = idx.remove(dropIds, "doc_id")
    val fresh = Search.buildPostings(
      docs.filter(!col("doc_id").isin(1L, 3L)), "doc_id", "text", dirS, 4)
    assert(after.nDocs == fresh.nDocs && after.nTokens == fresh.nTokens)
    val terms = Seq("cat", "dog")
    val a = after.score(spark, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = fresh.score(spark, terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b && !a.contains(1L))
    // removing an id that is not in the index changes nothing
    val same = after.remove(Seq(999L).toDF("doc_id"), "doc_id")
    assert(same.nDocs == after.nDocs && same.nTokens == after.nTokens)
  }

  test("postings compact: many appends collapse to one file per bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pcomp").toString
    var idx = Search.buildPostings(docs.limit(2), "doc_id", "text", dir, 2)
    docs.collect().drop(2).foreach { r =>
      idx = idx.append(Seq((r.getLong(0), r.getString(1)))
        .toDF("doc_id", "text"), "doc_id", "text")
    }
    def nFiles: Int = {
      val p = java.nio.file.Paths.get(s"$dir/postings")
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet"))
        .count().toInt
    }
    val before = nFiles
    val scoresBefore = idx.score(spark, Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val compacted = idx.compact(spark)
    assert(nFiles < before, s"compaction must shrink file count ($before -> $nFiles)")
    assert(nFiles <= 2) // one file per non-empty bucket
    val scoresAfter = compacted.score(spark, Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scoresAfter == scoresBefore)
    assert(compacted.nDocs == idx.nDocs && compacted.nTokens == idx.nTokens)
  }

  test("mmr: relevance-first pick, then diversity penalizes near-dups") {
    // candidates: two near-identical high-rel vectors + one orthogonal
    // mid-rel vector. Pure relevance ranks (1, 2, 3); MMR at λ=0.5 must
    // pick the orthogonal doc second because doc 2 duplicates doc 1.
    val cand = Seq(
      (1L, Seq(1.0f, 0.0f), 0.95),
      (2L, Seq(0.999f, 0.001f), 0.94), // near-dup of 1
      (3L, Seq(0.0f, 1.0f), 0.60) // orthogonal, less relevant
    ).toDF("id", "vec", "rel")
    val got = Search.mmr(cand, "id", "vec", "rel", k = 3, lambda = 0.5)
      .select("id", "rank").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (3L, 2L), (2L, 3L)))
    // λ=1 degenerates to pure relevance order
    val pureRel = Search.mmr(cand, "id", "vec", "rel", k = 3, lambda = 1.0)
      .select("id").as[Long].collect().toSeq
    assert(pureRel == Seq(1L, 2L, 3L))
    // scores: rank1 = rel; rank2 = 0.5*rel - 0.5*sim(3,1) = 0.5*0.6 - 0
    val scores = Search.mmr(cand, "id", "vec", "rel", k = 2, lambda = 0.5)
      .select("id", "mmr").as[(Long, Double)].collect().toMap
    assert(scores(1L) == 0.95)
    assert(math.abs(scores(3L) - 0.3) < 1e-9)
  }

  test("mmr: k > candidates, ties, and the loud candidate cap") {
    val cand = Seq(
      (5L, Seq(1.0f, 0.0f), 0.5),
      (4L, Seq(0.0f, 1.0f), 0.5) // tie -> lower id first
    ).toDF("id", "vec", "rel")
    val got = Search.mmr(cand, "id", "vec", "rel", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(4L, 5L)) // both returned, id tie-break
    intercept[IllegalArgumentException] {
      Search.mmr(cand, "id", "vec", "rel", k = 1, maxCandidates = 1)
    }
  }

  test("empty term list and missing column are rejected") {
    intercept[IllegalArgumentException] {
      Search.bm25Score(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Search.bm25Score(docs, "doc_id", "nope", Seq("cat"))
    }
  }
}
