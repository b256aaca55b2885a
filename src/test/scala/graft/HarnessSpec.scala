package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Harness plumbing guards: the bench delta tracker must read BOTH the
  * raw one-line bench format and the driver's round files (which embed
  * the bench line escaped inside a "tail" log capture). */
class HarnessSpec extends AnyFunSuite {

  private def tempDir(prefix: String): java.io.File = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d
  }

  test("previousBench parses raw bench lines and picks the highest round") {
    val dir = tempDir("graft-bench")
    def write(name: String, text: String): Unit = {
      val f = new java.io.File(dir, name)
      f.deleteOnExit()
      Files.write(f.toPath, text.getBytes(StandardCharsets.UTF_8))
    }
    write("BENCH_r01.json",
      """{"metric":"total","value":3.0,"queries":{"q1":1.0,"q2":2.0},"errors":{}}""")
    write("BENCH_r02.json",
      """{"metric":"total","value":2.5,"queries":{"q1":0.5,"q2":2.0},"errors":{},"protocol":{"queries_mode":"in-suite-min-of-2","cpus":"32","heap":"8g"}}""")
    val Some((name, m, proto)) = Bench.previousBench(dir.getPath)
    assert(name == "BENCH_r02.json")
    assert(m == Map("q1" -> 0.5, "q2" -> 2.0))
    assert(proto == Map("queries_mode" -> "in-suite-min-of-2",
      "cpus" -> "32", "heap" -> "8g"))
  }

  test("protocolMatches gates deltas on queries_mode/cpus/heap") {
    val cur = Map("queries_mode" -> "in-suite-min-of-2", "cpus" -> "32",
      "heap" -> "8g", "run_id" -> "x")
    assert(Bench.protocolMatches(
      Map("queries_mode" -> "in-suite-min-of-2", "cpus" -> "32",
        "heap" -> "8g", "run_id" -> "y"), cur))
    // a pre-protocol baseline (empty block) never matches — the r15
    // cross-protocol regression noise is exactly what this suppresses
    assert(!Bench.protocolMatches(Map.empty, cur))
    assert(!Bench.protocolMatches(
      Map("queries_mode" -> "in-suite-min-of-1", "cpus" -> "32",
        "heap" -> "8g"), cur))
    assert(!Bench.protocolMatches(
      Map("queries_mode" -> "in-suite-min-of-2", "cpus" -> "32",
        "heap" -> "89g"), cur))
  }

  test("previousBench parses the driver's escaped-tail wrapping") {
    val dir = tempDir("graft-bench")
    val tail = """[info] {\"metric\":\"total\",\"value\":1.2,\"queries\":{\"q1\":1.2},\"errors\":{}}"""
    val f = new java.io.File(dir, "BENCH_r07.json")
    f.deleteOnExit()
    Files.write(f.toPath,
      s"""{"n": 2, "rc": 0, "tail": "$tail", "parsed": null}"""
        .getBytes(StandardCharsets.UTF_8))
    val Some((name, m, _)) = Bench.previousBench(dir.getPath)
    assert(name == "BENCH_r07.json")
    assert(m == Map("q1" -> 1.2))
  }

  test("SURVEY §2 documents every oracle-gated query key (no doc drift)") {
    // the r4 audit found four green keys missing from SURVEY's
    // inventory — the coverage contract had silently drifted behind the
    // code. Pin it (tightened r6): every SparkEntry key must LEAD its
    // own §2 table row (`| \`key\` |...`), not merely be mentioned in
    // another row's notes — the r5 judge found wc_chunked passing the
    // old mention check without a row of its own.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val sec2 = survey.split("## §3")(0)
    val rowLeading = "(?m)^\\|\\s*`(\\w+)`".r.findAllMatchIn(sec2).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet -- rowLeading
    assert(missing.isEmpty, s"SURVEY §2 lacks a table row for gated keys: ${missing.toSeq.sorted}")
    // and every queries key ships an oracle (or is a documented
    // rows-only exception — currently none)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"gated keys without oracle SQL: ${noOracle.toSeq.sorted}")
  }

  test("previousBench returns None when no bench files exist") {
    assert(Bench.previousBench(tempDir("graft-bench-empty").getPath).isEmpty)
  }
}
