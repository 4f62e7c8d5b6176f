package graft.ops

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "ab" x3, "abc" x2 — merge sequence hand-derived:
  //   pairs (a,b):5 (b,</w>):3 (b,c):2 (c,</w>):2      -> merge (a,b)
  //   pairs (ab,</w>):3 (ab,c):2 (c,</w>):2            -> merge (ab,</w>)
  //   pairs (ab,c):2 (c,</w>):2, tie -> lexicographic  -> merge (ab,c)
  //   pairs (abc,</w>):2                               -> merge (abc,</w>)
  private val expectedMerges = IndexedSeq(
    ("a", "b"), ("ab", "</w>"), ("ab", "c"), ("abc", "</w>"))

  private lazy val docs = Seq(
    (0L, "ab ab abc"),
    (1L, "ab abc")
  ).toDF("doc_id", "text")

  test("train: hand-derived merge sequence (driver path)") {
    val m = Bpe.train(docs, "text", nMerges = 10)
    assert(m.merges == expectedMerges) // exhausts after 4 merges
  }

  test("distributed path produces the identical merge sequence") {
    val m = Bpe.train(docs, "text", nMerges = 10, collectLimit = 0L)
    assert(m.merges == expectedMerges)
  }

  test("encodeWord: GPT-2 min-rank merging") {
    val m = Bpe.BpeModel(expectedMerges)
    assert(m.encodeWord("ab") == Seq("ab</w>"))
    assert(m.encodeWord("abc") == Seq("abc</w>"))
    // unseen continuation: (a,b) merges, nothing else applies
    assert(m.encodeWord("abd") == Seq("ab", "d", "</w>"))
    assert(m.encodeWord("xyz") == Seq("x", "y", "z", "</w>"))
    assert(m.encodeWord("") == Seq.empty)
  }

  test("encode splits on whitespace and concatenates") {
    val m = Bpe.BpeModel(expectedMerges)
    assert(m.encode("ab  abd") == Seq("ab</w>", "ab", "d", "</w>"))
  }

  test("pairCounts matches the first-round statistics") {
    val got = Bpe.pairCounts(Bpe.wordFreq(docs, "text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", "b") -> 5L, ("b", "</w>") -> 3L, ("b", "c") -> 2L, ("c", "</w>") -> 2L))
  }

  test("tokenCounts: per-doc BPE token counts, no shuffle") {
    val m = Bpe.train(docs, "text", nMerges = 10)
    val tc = Bpe.tokenCounts(docs, "doc_id", "text", m)
    val got = tc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 2L)) // every word -> one token
    import org.apache.spark.sql.execution.exchange.Exchange
    assert(tc.queryExecution.executedPlan.collect { case e: Exchange => e }.isEmpty)
  }

  test("zero merges: character-level encoding") {
    val m = Bpe.BpeModel(IndexedSeq.empty)
    assert(m.encodeWord("abc") == Seq("a", "b", "c", "</w>"))
  }

  test("save/load round-trips the merge table in order") {
    val m = Bpe.train(docs, "text", nMerges = 10)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.save(spark, m, dir)
    val back = Bpe.load(spark, dir)
    assert(back.merges == m.merges)
    assert(back.encodeWord("abc") == m.encodeWord("abc"))
    // empty model round-trips too
    val dirE = java.nio.file.Files.createTempDirectory("graft-bpe-e").toString
    Bpe.save(spark, Bpe.BpeModel(IndexedSeq.empty), dirE)
    assert(Bpe.load(spark, dirE).merges.isEmpty)
  }

  test("non-BMP text: symbols are code points, model round-trips intact") {
    val emoji = new String(Character.toChars(0x1F600)) // outside the BMP
    val corpus = Seq((0L, s"$emoji$emoji a$emoji a$emoji"))
      .toDF("doc_id", "text")
    val m = Bpe.train(corpus, "text", nMerges = 5)
    // every merge symbol survives a UTF-8 round-trip (a lone surrogate
    // half from UTF-16 splitting would mangle to '?')
    m.merges.foreach { case (a, b) =>
      Seq(a, b).foreach { sym =>
        assert(new String(sym.getBytes("UTF-8"), "UTF-8") == sym,
          s"symbol not UTF-8 round-trippable: $sym")
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-sg").toString
    Bpe.save(spark, m, dir)
    val back = Bpe.load(spark, dir)
    assert(back.merges == m.merges) // would be '?'-mangled with UTF-16 split
    assert(back.encodeWord(s"a$emoji") == m.encodeWord(s"a$emoji"))
    assert(m.encodeWord(emoji).mkString.stripSuffix(Bpe.EndOfWord) == emoji)
  }

  test("null text rows are tolerated as zero-token docs") {
    val withNull = Seq((0L, "ab ab"), (1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = Bpe.train(withNull, "text", nMerges = 5)
    val got = Bpe.tokenCounts(withNull, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L && got(0L) > 0L)
  }

  test("property: encoding is lossless for any corpus and any word") {
    val rng = new scala.util.Random(1234)
    def word(): String =
      (0 until 1 + rng.nextInt(8)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    (0 until 5).foreach { trial =>
      val corpus = (0L until 40L)
        .map(i => (i, (0 until 1 + rng.nextInt(6)).map(_ => word()).mkString(" ")))
        .toDF("doc_id", "text")
      val m = Bpe.train(corpus, "text", nMerges = 10 + rng.nextInt(30))
      (0 until 40).foreach { _ =>
        val w = word()
        val toks = m.encodeWord(w)
        // reconstruction: concatenating the symbols and stripping the
        // end-of-word marker restores the word exactly
        assert(toks.mkString.stripSuffix(Bpe.EndOfWord)
          .replace(Bpe.EndOfWord, "") == w, s"trial $trial word $w -> $toks")
        // the marker appears exactly once, at the end of the stream
        assert(toks.mkString.indexOf(Bpe.EndOfWord) ==
          toks.mkString.length - Bpe.EndOfWord.length)
      }
    }
  }

  test("property: distributed merges equal local merges on a random corpus") {
    val rng = new scala.util.Random(77)
    val corpus = (0L until 30L)
      .map(i => (i, (0 until 3).map(_ =>
        (0 until 1 + rng.nextInt(5)).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
        .mkString(" ")))
      .toDF("doc_id", "text")
    val local = Bpe.train(corpus, "text", nMerges = 8)
    val dist = Bpe.train(corpus, "text", nMerges = 8, collectLimit = 0L)
    assert(local.merges == dist.merges)
  }
}
