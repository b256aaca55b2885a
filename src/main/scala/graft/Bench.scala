package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry at the sf dir
  * from SPARK_GRAFT_SF_DIR and emits ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},
  *   "errors":{...},"deltas":{...},"sf":"..."}`.
  *
  * Honesty rules: a failing query is recorded in `errors` (name →
  * exception) and contributes a FIXED PENALTY of [[Bench.ErrorPenaltySec]]
  * to the timing map and total — strictly worse than any plausible
  * success, so a crash can never read as a speedup (the previous
  * contribute-0 rule made an erroring query LOWER the total). The session
  * is warmed (JVM/codegen/parquet reader) before the first timed query so
  * query #1 in map order does not absorb ~4 s of startup. The JSON line
  * is printed to stdout AND written to BENCH_LOCAL.json so it stays
  * machine-readable under sbt log noise.
  *
  * Regression tracking: if a previous round's BENCH_r*.json exists in the
  * working dir, the highest-numbered one is parsed and a `deltas` section
  * (name → prev/now/ratio) is emitted, so an in-suite regression is
  * caught by the builder in the same run that introduces it.
  */
object Bench {

  /** Per-failed-query penalty (sec). Far above any real query at bench
    * scale, so errors always worsen the total. */
  val ErrorPenaltySec = 999.0


  /** (fileName, name→sec) of the highest-numbered BENCH_r*.json in `dir`,
    * if any. Minimal one-line-JSON field scrape — the bench files are
    * machine-written, flat, and dependency-free parsing keeps the build
    * hermetic. */
  private[graft] def previousBench(dir: String): Option[(String, Map[String, Double])] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
    if (files.isEmpty) return None
    val latest = files.maxBy(f => f.getName.replaceAll("\\D", "").toInt)
    // the driver's round files embed the bench line ESCAPED inside a
    // "tail" log-capture string — unescape so the field scrape sees the
    // same `"queries":{...}` shape as a raw bench line
    val text = new String(Files.readAllBytes(latest.toPath), StandardCharsets.UTF_8)
      .replace("\\\"", "\"")
    val qblock = "\"queries\"\\s*:\\s*\\{([^}]*)\\}".r
      .findFirstMatchIn(text).map(_.group(1)).getOrElse("")
    val pair = "\"([^\"]+)\"\\s*:\\s*([0-9.eE+-]+)".r
    val m = pair.findAllMatchIn(qblock)
      .map(mm => mm.group(1) -> mm.group(2).toDouble).toMap
    if (m.nonEmpty) Some(latest.getName -> m)
    else {
      // the driver may FRONT-truncate the captured line, cutting the
      // queries block; the deltas section sits at the end and survives —
      // its "now" values ARE that round's timings, so scrape those
      val deltaPair = "\"([^\"]+)\"\\s*:\\s*\\{\"prev\":[0-9.eE+-]+,\"now\":([0-9.eE+-]+)".r
      val md = deltaPair.findAllMatchIn(text)
        .map(mm => mm.group(1) -> mm.group(2).toDouble).toMap
      if (md.isEmpty) None else Some(latest.getName -> md)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Dials.init(spark, sfDir) // corpus-derived dial defaults

    // warmup: flagship query (small sf) + one scan of the bench dir —
    // pays JIT/codegen/session costs outside the timed region
    try {
      SparkEntry.entry(spark).count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // optional subset (comma-separated keys) for standalone/scale-stress
    // runs; the driver never sets it, so round benches are unaffected
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // min of 2 runs per query: one-shot timings at this scale carry
    // multi-second GC/compilation noise; min-of-N is the standard
    // steady-state estimate and stays honest (errors still recorded)
    val results = selected.map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        // full state reset: clearCache alone leaves localCheckpoint
        // blocks resident (dedup_combined measured 34.8 s in-suite vs
        // 6.7 s standalone before this)
        Cleanup.releaseAll(spark)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
            None
        }
      }
      name -> (if (errors.contains(name)) ErrorPenaltySec else times.min)
    }
    def jstr(s: String) = "\"" + s + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val prev = previousBench(".")
    // the fallback scrape (front-truncated round files → deltas block)
    // recovers only queries present in BOTH rounds; surface a shrunken
    // baseline instead of letting it silently narrow regression tracking
    prev.foreach { case (pn, pm) =>
      val expected = SparkEntry.queries.size
      if (pm.size < expected)
        System.err.println(
          s"[bench] WARNING: baseline $pn recovered ${pm.size}/$expected query timings — deltas are partial")
    }
    val ds = prev match {
      case None => "{}"
      case Some((_, pm)) =>
        results.flatMap { case (k, now) =>
          pm.get(k).map { p =>
            // Double.toString is locale-independent (an f"%.3f" is not —
            // a comma-decimal locale would emit invalid JSON)
            val ratio = if (p > 0) math.round(now / p * 1000.0) / 1000.0 else -1.0
            s"${jstr(k)}:{${jstr("prev")}:$p,${jstr("now")}:$now,${jstr("ratio")}:$ratio}"
          }
        }.mkString("{", ",", "}")
    }
    val prevName = prev.map(p => jstr(p._1)).getOrElse("null")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"prev_bench":$prevName,"deltas":$ds,"sf":"$sfDir"}"""
    println(line)
    Files.write(Paths.get("BENCH_LOCAL.json"), line.getBytes(StandardCharsets.UTF_8))
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} queries FAILED (penalty ${ErrorPenaltySec}s each): ${errors.keys.mkString(", ")}")
    prev.foreach { case (pn, pm) =>
      val regressed = results.filter { case (k, now) =>
        pm.get(k).exists(p => p > 0.3 && now > p * 2) && !errors.contains(k)
      }
      if (regressed.nonEmpty)
        System.err.println(s"[bench] regressions vs $pn: " + regressed.map { case (k, now) =>
          f"$k ${pm(k)}%.2f->${now}%.2f"
        }.mkString(", "))
    }
    spark.stop()
  }
}
