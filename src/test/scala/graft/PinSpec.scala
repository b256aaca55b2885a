package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Pins the [[Pin]] fault-tolerance switch: local (default) vs reliable
  * checkpointing produce identical results, and the reliable path
  * actually writes lineage-free checkpoint files into the configured
  * directory (what survives an executor loss). */
class PinSpec extends SparkSpec {

  private def edges = {
    val s = spark
    import s.implicits._
    Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 23L)).toDF("doc_a", "doc_b")
  }

  private def nodes = {
    val s = spark
    import s.implicits._
    (1L to 3L).union(Seq(10L, 11L)).union(20L to 23L)
      .toDF("doc_id")
  }

  test("pin: local and reliable checkpointing agree on an iterative operator") {
    val local = Dedup.connectedComponents(nodes, edges).collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    System.setProperty("spark.graft.checkpointDir", dir)
    try {
      val reliable = Dedup.connectedComponents(nodes, edges).collect().toSet
      assert(reliable == local)
      // the switch really engaged: checkpoint part-files exist on disk
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      val wrote =
        try walk.filter(p => p.getFileName.toString.startsWith("part-")).count()
        finally walk.close()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally System.clearProperty("spark.graft.checkpointDir")
  }

  test("pin: default path truncates lineage (plan is a scan, not the producing query)") {
    val pinnedDf = Pin.eager(edges.groupBy("doc_a").agg(count(lit(1)).as("n")))
    val plan = pinnedDf.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate"), s"lineage not truncated:\n$plan")
  }
}
