package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Document deduplication for large-scale training-data pipelines:
 *
 *  - exact duplicate grouping (hash group-by; one shuffle on the hash)
 *  - exact n-gram (shingle) Jaccard similarity pairs
 *  - MinHash + LSH banding near-duplicate candidates (the scale path:
 *    candidate generation touches only docs sharing a band bucket, never
 *    the n^2 pair space)
 *  - SimHash 64-bit fingerprints with pigeonhole band blocking
 *  - embedding-cosine near-duplicates (brute pair join at small n;
 *    random-hyperplane LSH bucketing as the scale path)
 *
 * All hash functions are engine-local deterministic (FNV-1a based), no
 * dependence on Spark's partitioning or on java hashCode.
 */
object Dedup {

  /** FNV-1a 64-bit over a string's UTF-8 bytes; deterministic everywhere. */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Mix a base hash with a seed — cheap independent-ish hash family. */
  @inline def mix(h: Long, seed: Int): Long = {
    var x = h ^ (seed.toLong * 0x9E3779B97F4A7C15L)
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  /**
   * Distinct word n-gram shingles per doc: (id, shingle: Long). Each
   * shingle is a rolling combination of per-token FNV hashes, so a doc is
   * processed in O(tokens) with no string materialization, and
   * deduplication happens inside the row (shingle duplicates can only
   * occur within one doc) — no global distinct shuffle. Whitespace
   * tokenization; docs shorter than n produce no shingles.
   */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(' ')
        val th = toks.map(hash64)
        val seen = new scala.collection.mutable.HashSet[Long]
        var i = 0
        while (i + n <= th.length) {
          var h = 0xcbf29ce484222325L
          var j = i
          while (j < i + n) { h = h * 0x100000001b3L ^ th(j); j += 1 }
          seen += h
          i += 1
        }
        seen.iterator.map(h => (id, h))
      }
      .toDF("id", "shingle")
  }

  /**
   * Exact Jaccard similarity over shingle sets for every pair sharing at
   * least one shingle, filtered to >= threshold.
   * Output: (da, db, jac) with da < db.
   */
  def jaccardPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n"))
    // intersection sizes via per-shingle buckets (one groupBy + in-bucket
    // pair emission) — a self-join would evaluate and shuffle the shingle
    // set twice; shingles are already distinct within a doc, so each
    // shared shingle contributes exactly one (da, db) emission
    val inter = sh.select(col("shingle"), col("id").cast("long")).as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups((_, it) => bucketPairs(it.map(_._2)))
      .toDF("da", "db")
      .groupBy("da", "db").agg(count(lit(1)).as("i"))
    inter
      .join(counts.select(col("id").as("da"), col("n").as("na")), Seq("da"))
      .join(counts.select(col("id").as("db"), col("n").as("nb")), Seq("db"))
      .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jac") >= threshold)
      .select("da", "db", "jac")
  }

  /** Exact-duplicate groups by full-text hash (or any key expression). */
  def exactDupGroups(df: DataFrame, idCol: String, keyExpr: org.apache.spark.sql.Column): DataFrame =
    df.groupBy(keyExpr.as("grp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /**
   * MinHash signatures: (id, sig Array[Long]) — one pass over each doc's
   * shingles, H minima. Then LSH banding: docs sharing any (band, value)
   * bucket become candidates; exact Jaccard verifies. No false positives
   * (exact verify); false-negative rate = prod over bands of
   * (1 - j^rowsPerBand).
   */
  def minhashCandidates(sh: DataFrame, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val sigs = sh.select(col("id").cast("long"), col("shingle")).as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val sig = Array.fill(numHashes)(Long.MaxValue)
        it.foreach { case (_, h) =>
          var j = 0
          while (j < numHashes) { val v = mix(h, j); if (v < sig(j)) sig(j) = v; j += 1 }
        }
        (id, sig)
      }
    bandPairs(sigs.toDF("id", "sig"), numHashes, bands)
  }

  /**
   * MinHash signatures straight from text — one narrow map per doc, NO
   * shuffle (the signature is a streaming min, so per-doc shingle
   * deduplication is unnecessary: min over a multiset = min over its set).
   * Docs shorter than n shingle words produce no signature.
   */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val th = text.split(' ').map(hash64)
        if (th.length < n) Iterator.empty
        else {
          val sig = Array.fill(numHashes)(Long.MaxValue)
          var i = 0
          while (i + n <= th.length) {
            var h = 0xcbf29ce484222325L
            var j = i
            while (j < i + n) { h = h * 0x100000001b3L ^ th(j); j += 1 }
            var k = 0
            while (k < numHashes) { val v = mix(h, k); if (v < sig(k)) sig(k) = v; k += 1 }
            i += 1
          }
          Iterator.single((id, sig))
        }
      }
      .toDF("id", "sig")
  }

  /** LSH banding over (id, sig) signatures: emit candidate pairs sharing
    * any (band, bandKey) bucket. One groupBy on the bucket key with
    * in-bucket pair generation — a self-join would evaluate the signature
    * scan twice and shuffle both sides. */
  private def bandPairs(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val spark = sigs.sparkSession
    import spark.implicits._
    sigs.as[(Long, Array[Long])].flatMap { case (id, sig) =>
      (0 until bands).map { b =>
        var key = 0xcbf29ce484222325L
        var j = b * r
        while (j < (b + 1) * r) { key = mix(key ^ sig(j), j); j += 1 }
        // fold the band ordinal into the key: one 64-bit bucket id
        (mix(key, 0x5bd1e995 + b), id)
      }
    }
      .groupByKey(_._1)
      .flatMapGroups((_, it) => bucketPairs(it.map(_._2)))
      .toDF("da", "db")
      .distinct()
  }

  /** Ordered (da < db) pairs among the ids sharing one bucket. */
  private def bucketPairs(it: Iterator[Long]): Iterator[(Long, Long)] = {
    val ids = it.toArray
    if (ids.length < 2) Iterator.empty
    else {
      java.util.Arrays.sort(ids)
      for {
        i <- ids.indices.iterator
        j <- ((i + 1) until ids.length).iterator
      } yield (ids(i), ids(j))
    }
  }

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification.
    * Signatures come straight from text (no shingle-table shuffle); the
    * exact shingle pass runs only over docs that appear in some LSH
    * candidate pair — at scale the n^2 pair space never materializes. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String, threshold: Double,
                   n: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val cand = bandPairs(minhashSignatures(df, idCol, textCol, n, numHashes),
      numHashes, bands).cache()
    // no distinct: the left-semi join below dedups implicitly (one fewer
    // shuffle)
    val candDocs = cand.select(col("da").as("cid"))
      .union(cand.select(col("db").as("cid")))
    val candRows = df.join(candDocs, col(idCol).cast("long") === col("cid"), "left_semi")
    jaccardPairs(shingles(candRows, idCol, textCol, n), threshold)
      .join(cand, Seq("da", "db")) // exact-verified, LSH-pruned
  }

  /** 64-bit token hash = last 8 MD5 digest bytes, little-endian — the
    * exact value DuckDB's `md5_number_lower(w)` produces, which makes
    * SimHash cross-engine reproducible (the dedup_simhash oracle recomputes
    * the whole fingerprint in SQL). */
  def md5Hash64(s: String): Long =
    md5Hash64(java.security.MessageDigest.getInstance("MD5"), s)

  private def md5Hash64(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes("UTF-8")) // digest() resets the instance
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  /** 64-bit SimHash of a doc's whitespace tokens (md5-based token hash —
    * see [[md5Hash64]]; one digest instance per document, not per token). */
  def simhash64(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](64)
    text.split(' ').foreach { w =>
      if (w.nonEmpty) {
        val h = md5Hash64(md, w)
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /**
   * SimHash near-dup pairs with hamming distance <= maxHamming (<= 3 for
   * the 4-band pigeonhole blocking to be lossless).
   */
  def simhashDedup(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band blocking is only lossless for hamming <= 3")
    val spark = df.sparkSession
    import spark.implicits._
    val sim = udf((t: String) => simhash64(t))
    val sigs = df.select(col(idCol).cast("long").as("id"), sim(col(textCol)).as("sig"))
    val banded = sigs.as[(Long, Long)].flatMap { case (id, sig) =>
      (0 until 4).map(b => (id, sig, b, (sig >>> (b * 16)) & 0xffffL))
    }.toDF("id", "sig", "band", "key")
    val ham = udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))
    banded.as("x").join(banded.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("da"), col("y.id").as("db"),
        ham(col("x.sig"), col("y.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Embedding cosine near-duplicate pairs: cosdist(a, b) < tau, da < db.
   * `lshBits > 0` switches to random-hyperplane bucketing (only pairs
   * agreeing on all bits in at least one of `lshTables` tables are
   * compared) — the 100TB path; 0 = exact pair join.
   */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String, tau: Double,
                       lshBits: Int = 0, lshTables: Int = 8): DataFrame = {
    import graft.core.{VectorKernels => K}
    val cd = udf((a: Seq[Float], b: Seq[Float]) => K.cosdist(a.toArray, b.toArray))
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    if (lshBits == 0) {
      // broadcast-block pair scan: one side broadcast as primitive arrays,
      // the other streamed per-partition — no per-pair row machinery. At
      // sizes past broadcast limits, use the lshBits path instead.
      val spark = df.sparkSession
      import spark.implicits._
      val rows = base.as[(Long, Seq[Float])]
      val side = spark.sparkContext.broadcast(
        rows.collect().map { case (id, v) => (id, v.toArray, K.norm(v.toArray)) })
      rows.mapPartitions { it =>
        val all = side.value
        it.flatMap { case (ida, va0) =>
          val va = va0.toArray
          val na = K.norm(va)
          all.iterator.collect {
            case (idb, vb, nb) if ida < idb =>
              val c = if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - K.dot(va, vb) / (na * nb)
              (ida, idb, c)
          }.filter(_._3 < tau)
        }
      }.toDF("da", "db", "cosdist")
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val bits = lshBits; val tables = lshTables
      val sketch = udf { (v: Seq[Float]) =>
        val va = v.toArray
        (0 until tables).map { t =>
          var key = 0L
          var b = 0
          while (b < bits) {
            // deterministic pseudo-random hyperplane: component j weight
            // derived from mix(t*bits+b, j)
            var dot = 0.0
            var j = 0
            while (j < va.length) {
              val w = (mix(0x9E3779B97F4A7C15L + j, t * bits + b) >>> 11).toDouble / (1L << 53).toDouble - 0.5
              dot += va(j) * w
              j += 1
            }
            if (dot > 0) key |= (1L << b)
            b += 1
          }
          key
        }
      }
      val keyed = base.withColumn("keys", sketch(col("v")))
        .select(col("id"), col("v"), posexplode(col("keys")).as(Seq("t", "key")))
      val cand = keyed.as("x").join(keyed.as("y"), Seq("t", "key"))
        .filter(col("x.id") < col("y.id"))
        .select(col("x.id").as("da"), col("x.v").as("va"),
          col("y.id").as("db"), col("y.v").as("vb"))
        .distinct()
      cand.withColumn("cosdist", cd(col("va"), col("vb")))
        .filter(col("cosdist") < tau)
        .select("da", "db", "cosdist")
    }
  }
}
