package graft.eval

import org.scalatest.funsuite.AnyFunSuite
import graft.Bench
import java.nio.file.Files

/** Pins the bench sentinel-gate verdicts and — the round-16 verdict's
  * "make the trap mechanically impossible" item — proves a gate-failing
  * capture CANNOT overwrite BENCH_FULL.json: it routes to
  * BENCH_CONTENDED.json and leaves the green capture byte-identical.
  * Readings below are the real round-16 captures (committed green 60.2 s
  * vs working-tree contended 91.2 s) so the gates are pinned against the
  * exact events that motivated them. */
class BenchCaptureGateSpec extends AnyFunSuite {

  test("round-16 committed green capture passes every gate") {
    // pre 0.65 / mid 1.47 / qend 1.54 / post 1.56, external 0.002
    assert(Bench.captureGateBanners(0.65, 1.47, 1.54, 1.56, 0.002).isEmpty)
  }

  test("round-16 contended working-tree capture fires exactly the qend gate") {
    // pre 1.02 / mid 1.86 / qend 3.46 / post 2.56, external 0.02:
    // qend 3.46 > hard cap 3.0 fires; post 2.56 is under the cap AND
    // proportional to mid (<= 1.5 * 1.86 = 2.79) so it does NOT.
    val banners = Bench.captureGateBanners(1.02, 1.86, 3.46, 2.56, 0.02)
    assert(banners.size == 1, banners.mkString("\n"))
    assert(banners.head.contains("_sentinel_qend_ratio"))
  }

  test("each gate fires on its own axis") {
    assert(Bench.captureGateBanners(2.5, 1.0, 1.0, 1.0, 0.0)
      .exists(_.contains("_sentinel_ratio")))
    assert(Bench.captureGateBanners(0.7, 2.3, 1.0, 1.0, 0.0)
      .exists(_.contains("_sentinel_mid_ratio")))
    // late absolute > 2.2 with an UNKNOWN mid (probe failed, -1): the
    // proportionality escape is unavailable, so it fires
    assert(Bench.captureGateBanners(0.7, -1.0, 2.4, 1.0, 0.0)
      .exists(_.contains("_sentinel_qend_ratio")))
    assert(Bench.captureGateBanners(0.7, 1.2, 1.0, 3.2, 0.0)
      .exists(_.contains("_sentinel_post_ratio")))
    assert(Bench.captureGateBanners(0.7, 1.2, 1.0, 1.0, 0.08)
      .exists(_.contains("_external_cpu_frac")))
  }

  test("progressive aging does not fire the late gates") {
    // quiet-box profile from the calibration notes: high-ish mid with
    // late readings proportional to it (late/mid <= 1.5, under the hard
    // cap) is in-JVM aging, not contention
    assert(Bench.captureGateBanners(0.8, 1.9, 2.4, 2.5, 0.01).isEmpty)
    // failed probes (-1) never fire gates by themselves
    assert(Bench.captureGateBanners(-1.0, -1.0, -1.0, -1.0, -1.0).isEmpty)
  }

  test("minMerge takes the per-key minimum of two same-order passes") {
    // r18 contended-section retry: min of a contended and a quiet pass
    val a = Seq("q1" -> 1.5, "q2" -> 0.4, "q3" -> 2.0)
    val b = Seq("q1" -> 0.6, "q2" -> 0.9, "q3" -> 2.0)
    assert(Bench.minMerge(a, b) == Seq("q1" -> 0.6, "q2" -> 0.4, "q3" -> 2.0))
    // key-order mismatch is a harness bug, not a mergeable state
    intercept[IllegalArgumentException] {
      Bench.minMerge(a, b.reverse)
    }
  }

  test("a contended capture never touches BENCH_FULL.json") {
    val dir = Files.createTempDirectory("graft-capture-gate")
    val full = dir.resolve("BENCH_FULL.json")
    val rej = dir.resolve("BENCH_CONTENDED.json")
    Files.write(full, "{\"value\":60.2}\n".getBytes("UTF-8"))
    val green = Files.readAllBytes(full)

    val t1 = Bench.writeCapture(dir, "{\"value\":91.2}", contended = true)
    assert(t1 == rej)
    assert(Files.readAllBytes(full).sameElements(green),
      "contended capture overwrote BENCH_FULL.json")
    assert(new String(Files.readAllBytes(rej), "UTF-8").contains("91.2"))

    // a later gates-green capture replaces BENCH_FULL.json and clears
    // the stale contended file so it can't be mistaken for current
    val t2 = Bench.writeCapture(dir, "{\"value\":58.0}", contended = false)
    assert(t2 == full)
    assert(new String(Files.readAllBytes(full), "UTF-8").contains("58.0"))
    assert(!Files.exists(rej))
  }
}
