package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  // ---- Capture sentinel gates (pure, spec-covered) -------------------
  // LOUD mid-capture contention gate (README discount rule): the pre
  // reading alone cannot flag load arriving mid-run, and the drift key
  // folds external arrival into in-JVM aging. Threshold calibrated
  // empirically (round 14): two provably-quiet captures
  // (_external_cpu_frac 0.0) measured mid readings of 1.58-1.73x the
  // reference — in-JVM aging lands mostly in the first half — while
  // real contention events push the sentinel 3-10x. A mid ratio past
  // 2.0 is therefore external load, not aging.
  final val MidContendedAt = 2.0
  // LATE-SECTION contention gates (round 15 — README clause 3 made
  // mechanical): a second-half burst can leave the pre AND mid readings
  // green (the round-14 driver capture read pre 0.62 / mid 1.29 yet
  // post 2.49 / drift 4.04 — five late-position queries 4-7x their
  // committed same-code numbers) and was only caught by adjudication
  // archaeology. In-JVM aging is PROGRESSIVE — the qend/post readings
  // track the mid reading on quiet runs (measured across six quiet
  // captures, _external_cpu_frac <= 0.024: late/mid 0.97-1.40, with
  // absolute late ratios up to 2.24 as the suite grew to 118 queries)
  // — while an external second-half burst makes them DISPROPORTIONATE
  // (the r14 contended capture: post/mid 1.93). So a late reading is
  // contended when it is high absolutely (> 2.2) AND either
  // disproportionate to mid (> 1.5x) or past the hard ceiling no
  // quiet capture approaches (> 3.0).
  final val LateContendedAt = 2.2
  final val LateHardCap = 3.0
  // The pre reading is LUCK-VARIABLE on this box (0.29-0.75 s against
  // the 0.50 reference across same-day quiet runs — ratios to 1.5), so
  // the pre gate sits at 2.0, a level no quiet capture approaches.
  final val PreContendedAt = 2.0
  // README rule: external busy CPU past ~5% of box capacity during the
  // timed section means another process was computing — discard the
  // capture regardless of the sentinel readings (they sample instants;
  // this measures the whole window).
  final val ExternalCpuContendedAt = 0.05

  /** Every CONTENDED banner the given readings fire, in run order.
    * Empty = the capture passed all sentinel gates. Negative readings
    * mean "probe unavailable" and never fire a gate by themselves
    * (except that an unknown mid leaves the late gates without their
    * proportionality escape, as before). Pure so a spec can pin the
    * verdicts — and writeCapture routes on EXACTLY this verdict, which
    * is what makes a gate-failing BENCH_FULL.json mechanically
    * impossible (round-16 verdict, What's wrong #1). */
  def captureGateBanners(preRatio: Double, midRatio: Double,
      qendRatio: Double, postRatio: Double,
      externalCpuFrac: Double): Seq[String] = {
    def lateContended(r: Double): Boolean =
      r > LateContendedAt && (r > LateHardCap || midRatio <= 0 ||
        r > 1.5 * midRatio)
    val b = Seq.newBuilder[String]
    if (preRatio > PreContendedAt)
      b += f"*** CONTENDED CAPTURE: _sentinel_ratio $preRatio%.2f > " +
        f"$PreContendedAt%.1f — the box was loaded at capture start; " +
        "re-capture on a quiet box before adjudicating ***"
    if (midRatio > MidContendedAt)
      b += f"*** CONTENDED CAPTURE: _sentinel_mid_ratio $midRatio%.2f > " +
        f"$MidContendedAt%.1f — external load landed mid-run; " +
        "re-capture on a quiet box before adjudicating ***"
    if (lateContended(qendRatio))
      b += f"*** CONTENDED CAPTURE: _sentinel_qend_ratio $qendRatio%.2f " +
        f"is past $LateContendedAt%.1f and disproportionate to mid " +
        f"($midRatio%.2f) — external load landed late in the query " +
        "section; re-capture ***"
    if (lateContended(postRatio))
      b += f"*** CONTENDED CAPTURE: _sentinel_post_ratio $postRatio%.2f " +
        f"is past $LateContendedAt%.1f and disproportionate to mid " +
        f"($midRatio%.2f) — external load landed in the scale section; " +
        "re-capture ***"
    if (externalCpuFrac > ExternalCpuContendedAt)
      b += f"*** CONTENDED CAPTURE: _external_cpu_frac " +
        f"$externalCpuFrac%.3f > $ExternalCpuContendedAt%.2f — another " +
        "process was computing during the timed section; re-capture ***"
    b.result()
  }

  /** Per-query minimum of two same-key passes (pure, spec-covered):
    * external contention only ever INFLATES a query's wall time, so the
    * min of a contended and a quiet pass is the best quiet estimate
    * available inside one capture. Keys must match pairwise — the two
    * passes run the same ordered query list by construction. */
  def minMerge(a: Seq[(String, Double)],
               b: Seq[(String, Double)]): Seq[(String, Double)] = {
    require(a.map(_._1) == b.map(_._1),
      "minMerge: passes ran different query lists")
    a.zip(b).map { case ((k, va), (_, vb)) => k -> math.min(va, vb) }
  }

  /** Write a capture to `dir`. A gates-green capture replaces
    * BENCH_FULL.json (and clears any stale BENCH_CONTENDED.json); a
    * gate-FAILING capture goes to BENCH_CONTENDED.json and NEVER
    * touches BENCH_FULL.json — the round-15/16 trap (a contended
    * re-run overwriting the committed green capture in the working
    * tree, then riding the driver's round-close commit) is thereby
    * structurally impossible rather than a restore chore. Returns the
    * path written. */
  def writeCapture(dir: java.nio.file.Path, json: String,
      contended: Boolean): java.nio.file.Path = {
    val fullPath = dir.resolve("BENCH_FULL.json")
    val rejPath = dir.resolve("BENCH_CONTENDED.json")
    val target = if (contended) rejPath else fullPath
    java.nio.file.Files.write(target, (json + "\n").getBytes("UTF-8"))
    if (contended)
      System.err.println("*** capture failed a sentinel gate — written " +
        "to BENCH_CONTENDED.json; BENCH_FULL.json left untouched ***")
    else
      java.nio.file.Files.deleteIfExists(rejPath)
    target
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb JVM/codegen/parquet-footer startup outside the timings
    // NonFatal only throughout: an OOM/VM error must kill the run loudly,
    // not be swallowed into a clean-looking JSON with inflated timings
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case NonFatal(_) => }
    // warm the index build/search pipeline too (Dataset-map codegen,
    // shuffle writer, parquet committer) so per-query timings reflect
    // steady state rather than first-use JIT
    try {
      import spark.implicits._
      val tiny = (0L until 64L).map(i => (i, Seq.fill(8)(i.toFloat % 7 - 3)))
        .toDF("id", "vec")
      val wdir = s"${sys.props("java.io.tmpdir")}/graft-bench-warmup"
      val widx = graft.index.IvfIndex.build(tiny, "id", "vec", wdir,
        graft.index.IvfConfig(lists = 2))
      widx.search(Array.fill(8)(0.1f), 3, probes = 2).count()
      val widx16 = graft.index.IvfIndex.build(tiny, "id", "vec", s"$wdir-f16",
        graft.index.IvfConfig(lists = 2, storage = "f16"))
      widx16.search(Array.fill(8)(0.1f), 3, probes = 2).count()
      // warm the brute-force side too — both halves of the ANN-vs-brute
      // comparisons must start from steady-state JIT
      graft.ops.Knn.topK(tiny, "id", "vec", Array.fill(8)(0.1f), 3).count()
      graft.ops.Knn.knnJoin(tiny, "id", "vec",
        Array(0L -> Array.fill(8)(0.1f)), 3).count()
      // warm the dedup/text pipeline (signature UDFs, groupByKey codegen,
      // label-propagation join shape) — the dedup queries run first
      // alphabetically and would otherwise absorb all first-use JIT
      val docs = (0L until 64L)
        .map(i => (i, s"doc ${i % 8} word alpha beta gamma delta ${i % 8}"))
        .toDF("doc_id", "text")
      // each warmup in its own try: one failing require must not silently
      // disable the rest (a maxHamming=6 here once killed the embedding
      // warmup for a whole round)
      try {
        val p = graft.ops.Dedup.minhashDedup(docs, "doc_id", "text", 0.4)
        graft.ops.Dedup.components(p).count()
      } catch { case NonFatal(e) => System.err.println(s"warmup minhash failed: $e") }
      try graft.ops.Dedup.simhashDedup(docs, "doc_id", "text", 3).count()
      catch { case NonFatal(e) => System.err.println(s"warmup simhash failed: $e") }
      try {
        val embs = (0L until 64L)
          .map(i => (i, Seq.fill(8)((i % 4).toFloat / 4 + 0.1f)))
          .toDF("id", "emb")
        graft.ops.Dedup.embeddingNearDup(embs, "id", "emb", 0.2,
          lshBits = 4, lshTables = 2).count()
      } catch { case NonFatal(e) => System.err.println(s"warmup embedding failed: $e") }
    } catch { case NonFatal(e) => System.err.println(s"warmup failed: $e") }
    // one-time index/graph construction, reported separately: queries
    // amortize builds across their lifetime, so per-query timings measure
    // query execution (build THROUGHPUT is covered by the scale probe)
    val tB = System.nanoTime()
    try graft.queries.GraftQueries.warmCaches(spark, sfDir)
    catch { case NonFatal(e) => System.err.println(s"warmCaches failed: $e") }
    val buildSec = (System.nanoTime() - tB) / 1e9
    // one full UNTIMED pass before the timed loop, reported as _warm_pass:
    // a query's first execution pays whole-stage-codegen compilation, JIT
    // warmup, and (on lazily-backed VMs) kernel page-fault storms for
    // every fresh heap page — measured 5-30x the steady-state time for
    // IDENTICAL work, with minutes-long pure-sys-time stalls on some
    // hosts. The timed pass below measures the ENGINE at steady state;
    // the one-shot regime is still available via
    // SPARK_GRAFT_BENCH_WARMPASS=0 (warm-pass cost stays visible either
    // way, it is not hidden inside per-query numbers).
    val warmPassSec =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMPASS", "1") == "0") 0.0
      else {
        val t0 = System.nanoTime()
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try { fn(spark, sfDir).count(); () }
          catch { case NonFatal(e) => System.err.println(s"warm pass $name failed: $e") }
        }
        (System.nanoTime() - t0) / 1e9
      }
    // CONTENTION SENTINEL: fixed CPU+shuffle work (independent of sf and
    // of the query set) timed immediately before and after the timed
    // section. Its ratio to the committed quiet-box reference
    // (sentinelRef, overridable via SPARK_GRAFT_SENTINEL_REF) stamps how
    // contended THIS capture was: ~1.0 = clean box; well above that, the
    // per-query numbers carry box noise and regressions/improvements
    // should be discounted by the ratio before adjudication (round 10's
    // _scale_corpstats200k moved 3.3x on byte-identical code — exactly
    // the variance this key exists to expose). One untimed run first
    // absorbs the probe's own codegen/JIT.
    def sentinel(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      // h is bounded (mod) before summing: a raw sum of 16M xxhash64
      // longs overflows under ANSI arithmetic and kills the probe
      spark.range(16000000L)
        .select((xxhash64(col("id")) % 1000000007L).as("h"))
        .groupBy(pmod(col("h"), lit(1024)).as("b"))
        .agg(count(lit(1)).as("n"), sum(col("h")).as("s"))
        .agg(sum(col("n")), sum(col("s"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // committed quiet-box reference: measured 0.44-0.60 s across repeats
    // on this box with nothing else running (2026-08-15 calibration);
    // malformed overrides fall back rather than killing the whole bench
    val sentinelRef =
      scala.util.Try(sys.env("SPARK_GRAFT_SENTINEL_REF").toDouble)
        .toOption.filter(_ > 0).getOrElse(0.50)
    // EXTERNAL-CPU meter: the sentinel measures CPU+shuffle THROUGHPUT at
    // three instants, so contention that lands between readings — or pure
    // I/O pressure — can inflate queries while every sentinel reads clean
    // (observed: an 83 s capture at load-average 14 with ratio 0.73).
    // This measures the thing itself: busy ticks the WHOLE BOX spent
    // minus this JVM's own, across the timed section, as a fraction of
    // total capacity. > ~0.05 means another process was computing during
    // the capture. Linux /proc; -1 where unavailable.
    def cpuTicks(): Option[(Long, Long)] =
      try {
        val stat = {
          val src = scala.io.Source.fromFile("/proc/stat")
          try src.getLines().next() finally src.close()
        }
        val f = stat.trim.split("\\s+").drop(1).map(_.toLong)
        // user+nice+system+irq+softirq+steal; idle and iowait excluded
        val busy = f(0) + f(1) + f(2) + f.lift(5).getOrElse(0L) +
          f.lift(6).getOrElse(0L) + f.lift(7).getOrElse(0L)
        val self = {
          val src = scala.io.Source.fromFile("/proc/self/stat")
          try src.mkString.trim finally src.close()
        }
        // parse from AFTER the last ')': the comm field (field 2) is the
        // parenthesized process name and may itself contain spaces — a
        // whole-line whitespace split would then read the wrong fields
        // for utime/stime silently. Past the ')', fields are fixed:
        // state=0, ..., utime=11, stime=12 (0-based in the remainder).
        val rest = self.substring(self.lastIndexOf(')') + 1).trim.split("\\s+")
        Some((busy, rest(11).toLong + rest(12).toLong))
      } catch { case NonFatal(_) => None }
    // FIXED-HASH run order, not alphabetical: in-JVM drag grows over the
    // ~1500-job run, so whatever runs late carries it — alphabetical
    // order made the same families (semdedup_*, sql_*, v_*) absorb it
    // every capture, skewing cross-round per-query comparisons for
    // exactly those keys. A deterministic hash scatters families across
    // the run while keeping the order identical between rounds. A
    // sentinel reading at the HALFWAY point catches contention arriving
    // mid-capture (the pre reading alone cannot) and anchors the
    // per-query drift interpolation below.
    val ordered = SparkEntry.queries.toSeq
      .sortBy { case (n, _) => (scala.util.hashing.MurmurHash3.stringHash(n), n) }
    val halfAt = ordered.length / 2
    // One timed pass over the query list, bracketed by its own sentinel
    // readings (pre / mid / qend) and its own /proc tick segment — the
    // round-18 retry logic needs each pass to carry its OWN contention
    // verdict rather than a whole-window blur.
    case class QueryPass(results: Seq[(String, Double)], pre: Double,
                         mid: Double, qend: Double, frac: Double,
                         wall: Double)
    def segFrac(t0: Option[(Long, Long)], w0: Long): Double =
      (t0, cpuTicks()) match {
        case (Some((busy0, own0)), Some((busy1, own1))) =>
          val capacity = Runtime.getRuntime.availableProcessors() *
            ((System.nanoTime() - w0) / 1e9) * 100.0 // USER_HZ
          if (capacity <= 0) -1.0
          else math.max(0.0, ((busy1 - busy0) - (own1 - own0)) / capacity)
        case _ => -1.0
      }
    def runQueryPass(): QueryPass = {
      val t0 = cpuTicks()
      val w0 = System.nanoTime()
      val pre = try sentinel() catch { case NonFatal(_) => -1.0 }
      var mid = -1.0
      val rs = ordered.zipWithIndex.map { case ((name, fn), i) =>
        if (i == halfAt)
          mid = try sentinel() catch { case NonFatal(_) => -1.0 }
        // drop dead heap between queries (untimed): a GC backlog one query
        // leaves behind otherwise lands in a later query's timing and
        // compounds into the late-run drag the drift keys measure
        if (i % 24 == 23) System.gc()
        val t = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case NonFatal(e) => System.err.println(s"query $name failed: $e"); -1L }
        name -> (System.nanoTime() - t) / 1e9
      }
      // sentinel at the END OF THE QUERY LOOP, before the scale probe: the
      // scale keys run in the most-drifted region of the capture, and
      // without a reading bracketing them they had no drift factor at all
      // (round 13: _scale_kwbuild200k read 3.0x on untouched code with no
      // way to adjudicate mechanically). GC first so the reading measures
      // steady-state work, not the timed section's backlog.
      System.gc()
      val qend = try sentinel() catch { case NonFatal(_) => -1.0 }
      QueryPass(rs, pre, mid, qend, segFrac(t0, w0),
        (System.nanoTime() - w0) / 1e9)
    }
    def ratio(v: Double): Double = if (v <= 0) -1.0 else v / sentinelRef
    try sentinel() catch { case NonFatal(_) => } // untimed JIT absorb
    // ROUND-18 CONTENDED-SECTION RETRY (r17 verdict, Next round #2): two
    // driver captures in a row failed a sentinel gate and yielded no
    // per-query numbers at all. A contended QUERY SECTION is now re-run
    // ONCE: per-query results become the min of the two passes (external
    // load only inflates wall time, so the min is the best quiet
    // estimate one capture can produce), and the gates re-evaluate on
    // the re-run's own sentinel readings and tick segment. A quiet first
    // pass keeps the exact pre-r18 behavior (no retry, identical
    // methodology; the first pass's readings are still reported as
    // `_sentinel_*_p1` when a retry ran).
    val pass1 = runQueryPass()
    val pass1Banners = captureGateBanners(ratio(pass1.pre), ratio(pass1.mid),
      ratio(pass1.qend), -1.0, pass1.frac)
    val retriedQueries = pass1Banners.nonEmpty
    val passA =
      if (retriedQueries) {
        pass1Banners.foreach(b => System.err.println("first query pass: " + b))
        System.err.println("*** query section contended — re-running it " +
          "once; per-query results are the min of both passes, gates " +
          "re-evaluate on the re-run ***")
        runQueryPass()
      } else pass1
    val results =
      if (retriedQueries) minMerge(pass1.results, passA.results)
      else pass1.results
    val sentinelPre = passA.pre
    val sentinelMid = passA.mid
    val sentinelQEnd = passA.qend
    val queriesAccepted = captureGateBanners(ratio(passA.pre),
      ratio(passA.mid), ratio(passA.qend), -1.0, passA.frac).isEmpty
    // scale probe: synthetic 100k x 64-dim IVF build + ANN search vs brute
    // force — demonstrates the index path's advantage growing with N
    // (partition pruning + code-only estimate scan). Same retry contract
    // as the query section (the post sentinel gates it), but only when
    // the query section was accepted — a doomed capture should not pay
    // for a second scale pass.
    def runScalePass(): (Seq[(String, Double)], Double, Double, Double) = {
      val t0 = cpuTicks()
      val w0 = System.nanoTime()
      val s = graft.tools.ScaleProbe.run(spark)
      // drop dead heap before the post reading so it measures steady-state
      // work, not a GC backlog the timed section left behind
      System.gc()
      val post = try sentinel() catch { case NonFatal(_) => -1.0 }
      (s, post, segFrac(t0, w0), (System.nanoTime() - w0) / 1e9)
    }
    val (scale1, post1, sfrac1, swall1) = runScalePass()
    val retriedScale = queriesAccepted && captureGateBanners(-1.0,
      ratio(passA.mid), -1.0, ratio(post1), sfrac1).nonEmpty
    val (scale, sentinelPost, scaleFrac, scaleWall) =
      if (retriedScale) {
        System.err.println("*** scale section contended — re-running it " +
          "once; per-key results are the min of both passes ***")
        val (s2, p2, f2, w2) = runScalePass()
        (minMerge(scale1, s2), p2, f2, w2)
      } else (scale1, post1, sfrac1, swall1)
    // RATIO IS THE PRE READING vs the quiet-box reference — the box's
    // state when the capture STARTED. The post reading is reported as
    // _sentinel_drift = post/pre instead: measured in round 12, a fresh
    // JVM launched seconds after a full run whose post read 0.62-0.64
    // measures pre ~0.35-0.41 again on the same idle box — so the post
    // inflation is IN-JVM drag accumulated over the ~1500-job run
    // (scheduler/JIT/heap state), not external contention, and folding
    // it into the ratio blamed the box for the JVM's own aging (r11's
    // committed 1.28 was exactly this). Drift is still worth reporting:
    // it inflates LATE-alphabet queries relative to early ones within a
    // capture, bounded by the drift factor.
    val sentinelRatio =
      if (sentinelPre <= 0) -1.0 else sentinelPre / sentinelRef
    // post (and mid) vs the quiet-box reference gate the capture END and
    // MIDDLE the way ratio gates the start: contention arriving after
    // the capture began shows up here, where the pre reading alone would
    // report a clean box (the drift key folds external late arrival and
    // in-JVM aging together; these separate them against the absolute
    // reference)
    val sentinelMidRatio =
      if (sentinelMid <= 0) -1.0 else sentinelMid / sentinelRef
    val sentinelQEndRatio =
      if (sentinelQEnd <= 0) -1.0 else sentinelQEnd / sentinelRef
    val sentinelPostRatio =
      if (sentinelPost <= 0) -1.0 else sentinelPost / sentinelRef
    val sentinelDrift =
      if (sentinelPre <= 0 || sentinelPost <= 0) -1.0
      else sentinelPost / sentinelPre
    // external-CPU fraction over the ACCEPTED sections only (r18): the
    // wall-weighted combination of the accepted query pass's segment and
    // the accepted scale pass's segment. A rejected first pass's
    // contention must not taint the gates of the pass that replaced it.
    val externalCpuFrac =
      if (passA.frac < 0 || scaleFrac < 0) math.max(passA.frac, scaleFrac)
      else if (passA.wall + scaleWall <= 0) -1.0
      else (passA.frac * passA.wall + scaleFrac * scaleWall) /
        (passA.wall + scaleWall)
    // Gate verdicts are computed by the pure captureGateBanners below
    // (testable without a capture) and printed loudly; the SAME verdict
    // routes the capture file at write time — a gate-failing run can no
    // longer overwrite BENCH_FULL.json (see writeCapture).
    val gateBanners = captureGateBanners(sentinelRatio, sentinelMidRatio,
      sentinelQEndRatio, sentinelPostRatio, externalCpuFrac)
    gateBanners.foreach(System.err.println)
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val aggs = Seq("_index_builds" -> buildSec, "_warm_pass" -> warmPassSec,
      "_sentinel_pre" -> sentinelPre, "_sentinel_mid" -> sentinelMid,
      "_sentinel_qend" -> sentinelQEnd,
      "_sentinel_post" -> sentinelPost,
      "_sentinel_ratio" -> sentinelRatio,
      "_sentinel_mid_ratio" -> sentinelMidRatio,
      "_sentinel_qend_ratio" -> sentinelQEndRatio,
      "_sentinel_post_ratio" -> sentinelPostRatio,
      "_sentinel_drift" -> sentinelDrift,
      "_external_cpu_frac" -> externalCpuFrac,
      // r18 retry bookkeeping: how many sections were re-run (0 = the
      // pre-r18 single-pass capture, methodology unchanged), plus the
      // REJECTED first query pass's readings when a retry happened so
      // the discarded contention stays on the record
      "_retried_queries" -> (if (retriedQueries) 1.0 else 0.0),
      "_retried_scale" -> (if (retriedScale) 1.0 else 0.0)) ++
      (if (retriedQueries)
        Seq("_sentinel_pre_p1" -> pass1.pre, "_sentinel_mid_p1" -> pass1.mid,
          "_sentinel_qend_p1" -> pass1.qend,
          "_external_cpu_frac_p1" -> pass1.frac)
      else Nil) ++ Seq(
      // VERSION of the per-key drift model below (round 16): bump this
      // whenever the anchor shape / interpolation producing the _drift_*
      // factors changes. Cross-capture comparisons may divide by the
      // factors only when both captures carry the SAME model version —
      // the round-15 aging-model change silently shifted mean factors
      // 1.68 -> 1.34 on identical hardware and broke naive normalized
      // reads; across versions compare RAW seconds on quiet captures.
      // Version 2 = the progressive pre/mid/qend/post piecewise model
      // (ac80e68); the unversioned round-14-and-earlier captures are
      // model 1.
      "_drift_model" -> 2.0)
    // per-key drift factors (BENCH_FULL only): piecewise-linear
    // interpolation of the sentinel's in-run inflation at each key's RUN
    // POSITION — pre before query 0, mid at the halfway mark, qend after
    // the last query, post after the scale section — so EVERY reported
    // key (queries AND _scale_*) is normalizable: divide a key's seconds
    // by its factor to take late-run drag out of cross-capture
    // comparisons. The scale keys interpolate qend -> post across their
    // own (run-ordered) section.
    val driftFactors: Seq[(String, Double)] =
      if (sentinelPre <= 0 || sentinelMid <= 0 || sentinelQEnd <= 0 ||
          sentinelPost <= 0) Nil
      else {
        val n = results.length
        val anchors = Seq(-0.5 -> 1.0, (halfAt - 0.5) -> sentinelMid / sentinelPre,
          (n - 0.5) -> sentinelQEnd / sentinelPre)
        def factorAt(pos: Double): Double = {
          val segs = anchors.sliding(2).collectFirst {
            case Seq((x0, y0), (x1, y1)) if pos <= x1 =>
              y0 + (y1 - y0) * ((pos - x0) / (x1 - x0))
          }
          segs.getOrElse(anchors.last._2)
        }
        val qFactors = results.zipWithIndex.map { case ((name, _), i) =>
          s"_drift_$name" -> factorAt(i.toDouble)
        }
        val qendF = sentinelQEnd / sentinelPre
        val postF = sentinelPost / sentinelPre
        val m = scale.length
        // the m = 1 case belongs to the general midpoint formula (a
        // single key ran at the section's CENTER, not its end); m = 0
        // yields an empty map regardless
        val sFactors = scale.zipWithIndex.map { case ((name, _), i) =>
          s"_drift_$name" -> (qendF + (postF - qendF) * ((i + 0.5) / m))
        }
        qFactors ++ sFactors
      }
    def jline(entries: Seq[(String, Double)], fmt: Double => String): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val sfJson = "sf([0-9.]+)$".r.findFirstMatchIn(sfDir)
        .map(_.group(1)).getOrElse("\"" + sfDir + "\"")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":$sfJson}"""
    }
    // Full precision, every key (per-query + _scale_* + build/warm aggregates)
    // goes to a FILE: the harness capturing this process keeps only the last
    // ~2000 chars of output, which the full line outgrew at ~80 queries —
    // rounds 6-7 recorded a truncated, unparseable tail. The stdout line is
    // the COMPACT form (real queries rounded to 2dp + the two aggregates),
    // sized to survive that window with sbt's trailing [success] line.
    val full = jline(results ++ scale ++ aggs ++ driftFactors, v => v.toString)
    try writeCapture(java.nio.file.Paths.get("."), full,
      contended = gateBanners.nonEmpty)
    catch { case NonFatal(e) => System.err.println(s"capture write failed: $e") }
    // Rounded values with trailing zeros trimmed ("0.10" -> 0.1, "0.00"
    // -> 0 — still valid JSON numbers); precision then query-set degrade
    // until the line fits the window.
    def fmt(dp: Int)(v: Double): String = {
      val s0 = s"%.${dp}f".formatLocal(java.util.Locale.ROOT, v)
      val s = if (s0.contains('.'))
        s0.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else s0
      if (s.isEmpty) "0" else s
    }
    // adaptive: hundredths below 1s (where the per-query resolution
    // matters), tenths above — the sub-second majority keeps 2 digits
    def adaptive(v: Double): String = fmt(if (v < 0.995) 2 else 1)(v)
    // last resorts drop the v_* scalar microbenchmarks (constant ~0.1s
    // each, still in BENCH_FULL.json) rather than losing precision on
    // the queries that actually move
    val noMicro = results.filterNot(_._1.startsWith("v_"))
    // absolute last resort: the 60 slowest queries only (alphabetical),
    // 1dp — bounds the line length no matter how much coverage grows;
    // the dropped fast tail is constant-time noise and lives in
    // BENCH_FULL.json with full precision
    val top60 = noMicro.sortBy(-_._2).take(60).sortBy(_._1)
    val candidates = Seq(
      jline(results ++ aggs, fmt(3)),
      jline(results ++ aggs, fmt(2)),
      jline(results, fmt(2)),
      jline(results, adaptive),
      jline(noMicro ++ aggs, adaptive),
      jline(noMicro, adaptive),
      jline(noMicro, fmt(1)),
      jline(top60, fmt(1)))
    println(candidates.find(_.length <= 1880).getOrElse(candidates.last))
    spark.stop()
  }

}
