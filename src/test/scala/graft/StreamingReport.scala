package graft

import scala.jdk.CollectionConverters._

/** Machine-readable streaming-conformance artifact (STREAMING.json).
  *
  * The 24 streaming rows of SURVEY §2.8 are verified by the scalatest
  * suite, which the driver cannot read — it only sees CORRECTNESS/BENCH
  * artifacts. This main runs the FULL StreamingSpec programmatically and
  * writes one JSON object: per-test result + duration, plus every
  * wave==batch row-set digest pair the suite's assertSameRows recorded
  * while running (see [[StreamingDigests]]) — so the artifact carries
  * the actual equivalence evidence, regenerated each round like
  * TWINS.json.
  *
  * Run: `sbt -batch "Test/runMain graft.StreamingReport"` (needs the
  * test classpath). Exits nonzero if any test fails, so a stale-green
  * artifact cannot survive a regression.
  */
object StreamingReport {
  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  final case class TestRow(suite: String, test: String, result: String,
                           durationMs: Long)

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("STREAMING.json")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[TestRow]()
    val reporter = new org.scalatest.Reporter {
      import org.scalatest.events._
      def apply(e: Event): Unit = e match {
        case t: TestSucceeded =>
          rows.add(TestRow(t.suiteName, t.testName, "pass", t.duration.getOrElse(0L)))
        case t: TestFailed =>
          rows.add(TestRow(t.suiteName, t.testName, "fail", t.duration.getOrElse(0L)))
        case t: TestCanceled =>
          rows.add(TestRow(t.suiteName, t.testName, "canceled", 0L))
        case _ => ()
      }
    }
    val t0 = System.nanoTime()
    new StreamingSpec().run(None, org.scalatest.Args(reporter))
    val wallSec = (System.nanoTime() - t0) / 1e9

    val tests = rows.asScala.toVector.sortBy(r => (r.suite, r.test))
    val digests = StreamingDigests.entries.asScala.toVector
    val byTest = digests.groupBy(d => (d.suite, d.test))
    val nPass = tests.count(_.result == "pass")
    val nFail = tests.count(_.result == "fail")

    val testJson = tests.map { r =>
      val ds = byTest.getOrElse((r.suite, r.test), Vector.empty).map { d =>
        s"""{"wave":"${d.left}","batch":"${d.right}","equal":${d.equal}}"""
      }.mkString(",")
      s"""  {"suite":"${esc(r.suite)}","test":"${esc(r.test)}",""" +
        s""""result":"${r.result}","duration_ms":${r.durationMs},""" +
        s""""digests":[$ds]}"""
    }.mkString(",\n")

    val json =
      s"""{
         |"generator": "graft.StreamingReport",
         |"suite": "StreamingSpec",
         |"wall_sec": ${"%.1f".format(wallSec)},
         |"n_tests": ${tests.size},
         |"n_pass": $nPass,
         |"n_fail": $nFail,
         |"n_digest_pairs": ${digests.size},
         |"n_digest_equal": ${digests.count(_.equal)},
         |"tests": [
         |$testJson
         |]
         |}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $outPath: ${tests.size} tests, $nPass pass, $nFail fail, " +
      s"${digests.size} digest pairs")
    if (nFail > 0 || tests.isEmpty) sys.exit(1)
  }
}
