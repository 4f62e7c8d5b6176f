package graft.ops

import graft.SparkSpec
import java.nio.file.{Files, Path, Paths}

/**
 * Drives EVERY branch of the FfmpegDecoder subprocess plumbing without a
 * real ffmpeg: each test writes an executable stub shell script and
 * points the decoder's `bin` at it (Java resolves bare subprocess names
 * against the JVM's STARTUP PATH, so an explicit path is the only
 * per-test redirection that works). The stub answers the `-version`
 * availability probe, then scripts the decode invocation — replaying a
 * canned MJPEG stream, exiting nonzero, or hanging past the watchdog
 * deadline — so argument construction, the image2pipe parse, the
 * zero-frame garbage filter, and the watchdog kill all execute here.
 * The MP4 container golden (real H.264) stays gated on a real ffmpeg.
 */
class FfmpegStubSpec extends SparkSpec {

  private def stubDir(): Path =
    Files.createTempDirectory("graft-ffmpeg-stub")

  /** Write an executable stub whose decode branch runs `decodeBody`
    * (sh syntax; the `-version` probe always exits 0 first). Each stub
    * gets a unique path so the per-(JVM, bin) availability memo never
    * collides across tests. */
  private def writeStub(dir: Path, decodeBody: String): String = {
    val p = dir.resolve("ffmpeg")
    val script =
      s"""#!/bin/sh
         |[ "$$1" = "-version" ] && exit 0
         |$decodeBody
         |""".stripMargin
    Files.write(p, script.getBytes("UTF-8"))
    p.toFile.setExecutable(true)
    p.toAbsolutePath.toString
  }

  test("happy path: stub ffmpeg replays a canned MJPEG stream — frames " +
       "decode with real pixel stats and the argv is the documented one") {
    val dir = stubDir()
    val canned = dir.resolve("canned.mjpeg")
    Files.write(canned, Multimodal.syntheticMjpeg(5L, frames = 4))
    val argsFile = dir.resolve("args.txt")
    val bin = writeStub(dir,
      s"""printf '%s\\n' "$$@" > ${argsFile.toAbsolutePath}
         |cat ${canned.toAbsolutePath}""".stripMargin)
    val dec = Multimodal.FfmpegDecoder(maxDecodedFrames = 16, fps = 7.5,
      bin = bin)
    val frames = dec.frames(Multimodal.syntheticMjpeg(5L, frames = 4)).toArray
    assert(frames.length == 4, "all 4 canned frames parsed from the pipe")
    assert(frames.map(_._1).toSeq == Seq(0, 1, 2, 3))
    frames.foreach { case (fno, blob) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      assert(img != null, s"frame $fno is a complete decodable JPEG")
      assert(img.getWidth == 32 && img.getHeight == 16)
      val planted = 16.0 * ((5 + fno) % 16)
      val p = img.getRGB(16, 8)
      val mean = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3.0
      assert(math.abs(mean - planted) <= 4.0,
        s"frame $fno gray $mean vs planted $planted")
    }
    // argv contract: input tempfile, locale-proof fps filter, frame cap,
    // image2pipe mjpeg output to stdout — the exact surface a real
    // ffmpeg parses, pinned so a refactor cannot silently reorder it
    val argv = new String(Files.readAllBytes(argsFile), "UTF-8")
      .split("\n").toSeq
    assert(argv.take(2) == Seq("-v", "error"), argv.toString)
    assert(argv(2) == "-i" && Files.notExists(Paths.get(argv(3))),
      s"blob tempfile ${argv(3)} must be handed via -i and deleted after")
    assert(argv.containsSlice(Seq("-vf", "fps=7.5000")),
      s"fps filter must format under Locale.ROOT: $argv")
    assert(argv.containsSlice(Seq("-frames:v", "16")), argv.toString)
    assert(argv.containsSlice(
      Seq("-f", "image2pipe", "-vcodec", "mjpeg", "-q:v", "2", "pipe:1")),
      argv.toString)
  }

  test("fps=0 omits the filtergraph entirely") {
    val dir = stubDir()
    val argsFile = dir.resolve("args.txt")
    val bin = writeStub(dir,
      s"""printf '%s\\n' "$$@" > ${argsFile.toAbsolutePath}
         |exit 0""".stripMargin)
    val n = Multimodal.FfmpegDecoder(bin = bin).frames(Array[Byte](1, 2, 3)).size
    assert(n == 0, "empty stdout -> zero frames")
    val argv = new String(Files.readAllBytes(argsFile), "UTF-8")
    assert(!argv.contains("-vf"), s"no fps filter expected: $argv")
  }

  test("garbage blob: nonzero exit with empty output is the documented " +
       "zero-frames FILTER, not an exception") {
    val bin = writeStub(stubDir(), "exit 2")
    val out = Multimodal.FfmpegDecoder(bin = bin)
      .frames("not a video".getBytes("UTF-8")).toArray
    assert(out.isEmpty)
  }

  test("hang: the watchdog kills the child at timeoutSec and the row " +
       "fails LOUDLY — and the subprocess is actually dead") {
    val dir = stubDir()
    val pidFile = dir.resolve("pid.txt")
    // exec replaces the shell so the recorded pid IS the hanging process
    val bin = writeStub(dir,
      s"""echo $$$$ > ${pidFile.toAbsolutePath}
         |exec sleep 30""".stripMargin)
    val dec = Multimodal.FfmpegDecoder(timeoutSec = 1.0, bin = bin)
    val t0 = System.nanoTime()
    val e = intercept[RuntimeException](dec.frames(Array[Byte](9)).toArray)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(e.getMessage.contains("watchdog"), e.getMessage)
    assert(sec < 15.0, s"watchdog must fire near the 1s deadline, took $sec")
    val pid = new String(Files.readAllBytes(pidFile), "UTF-8").trim
    // destroyForcibly is async — poll briefly for the process to vanish
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    var alive = Files.exists(Paths.get(s"/proc/$pid"))
    while (alive && System.nanoTime() < deadline) {
      Thread.sleep(50)
      alive = Files.exists(Paths.get(s"/proc/$pid"))
    }
    assert(!alive, s"stub pid $pid still running after the watchdog kill")
  }

  test("absent binary: LOUD IllegalStateException naming the configured " +
       "path, not a silent filter") {
    val ghost = stubDir().resolve("no-such-ffmpeg").toString
    val e = intercept[IllegalStateException](
      Multimodal.FfmpegDecoder(bin = ghost).frames(Array[Byte](1)).toArray)
    assert(e.getMessage.contains(ghost), e.getMessage)
  }

  test("end-to-end through Spark: sampleFrames ships the stub-backed " +
       "decoder in the task closure and samples its frames") {
    import spark.implicits._
    val dir = stubDir()
    val canned = dir.resolve("canned.mjpeg")
    Files.write(canned, Multimodal.syntheticMjpeg(2L, frames = 8))
    val bin = writeStub(dir, s"cat ${canned.toAbsolutePath}")
    val rows = Seq(
      2L -> Multimodal.syntheticMjpeg(2L, frames = 8),
      7L -> "garbage".getBytes("UTF-8"))
      .toDF("doc_id", "blob")
    // the garbage row makes the stub exit 0 with the SAME canned stream
    // (stubs don't parse input) — so both rows emit; what this test pins
    // is the closure shipping + per-row subprocess lifecycle under Spark
    val frames = Multimodal.sampleFrames(rows, "doc_id", "blob",
      everyN = 3, maxFrames = 2,
      decoder = Multimodal.FfmpegDecoder(bin = bin))
      .as[(Long, Int, Array[Byte])].collect()
    assert(frames.map(_._1).toSet == Set(2L, 7L))
    assert(frames.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(0, 3),
      "every 3rd decoded frame, decoder frame numbering")
    frames.foreach { case (_, fno, blob) =>
      assert(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(blob)) != null,
        s"sampled frame $fno decodes")
    }
  }
}
