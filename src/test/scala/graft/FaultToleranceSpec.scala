package graft

import org.apache.spark.{SparkException, TaskContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Executor-side failure bookkeeping for the planted-failure tasks.
  * Local mode runs tasks in the driver JVM, so a static map is visible
  * to both the test and the task closures; each tag's counter records
  * how many attempts actually threw (proof the failure was exercised,
  * not optimized away). */
object FaultToleranceSpec {
  val failures = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()

  /** Throw on the FIRST attempt of partition 1, for this tag. Retried
    * attempts (attemptNumber > 0) pass — the deterministic single
    * worker-failure model. */
  def failFirstAttempt(tag: String): Unit = {
    if (TaskContext.get().attemptNumber() == 0 && TaskContext.getPartitionId() == 1) {
      failures.computeIfAbsent(tag,
        _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
      throw new RuntimeException(s"planted failure: $tag")
    }
  }
}

/** TASK RE-EXECUTION fault tolerance — the Spark-side twin of the
  * reference's recovery contract: a failed map/reduce worker's share is
  * re-executed and results must be idempotent w.r.t. the re-sent work
  * (`/root/reference/core/map_reduce.go:150-215` buffers intermediate
  * inputs and dedups duplicate shares; `core/master.go` reassigns dead
  * workers' chunks). Spark subsumes that machinery: the scheduler
  * re-runs failed task ATTEMPTS from lineage, shuffle files from
  * completed stages are re-fetched rather than recomputed, and the
  * file-commit protocol discards failed attempts' output. These tests
  * plant deterministic first-attempt failures and assert bit-identical
  * results — correctness under re-execution, the property every 100 TB
  * run relies on (at 1000 executors, task failures are routine, not
  * exceptional).
  *
  * Runs in its OWN forked JVM (build.sbt `Test / testGrouping`):
  * local-mode task retries are fixed at SparkContext creation
  * (`local[4, 3]` = 4 threads, 3 attempts) and every other suite
  * shares SparkSpec's no-retry `local[4]` session. */
class FaultToleranceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4, 3]") // the fault-tolerance knob: 3 task attempts
      .appName("graft-ft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-ft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("map-stage task failure: the attempt re-executes and the result is exact") {
    val s = spark
    import s.implicits._
    val r = s.range(0, 10000, 1, 4).as[Long].mapPartitions { it =>
      FaultToleranceSpec.failFirstAttempt("map")
      it.map(_ * 2)
    }.agg(sum("value")).head().getLong(0)
    assert(r == 2L * 9999 * 10000 / 2, s"sum wrong after retry: $r")
    assert(FaultToleranceSpec.failures.get("map").get() == 1,
      "the planted failure never fired — the test proved nothing")
  }

  test("post-shuffle task failure: retry re-fetches the map stage's shuffle output") {
    val s = spark
    import s.implicits._
    val base = s.range(0, 10000, 1, 4)
      .select(col("id"), (col("id") % 97).as("k"))
    // the failing stage sits AFTER an exchange: its retry consumes the
    // already-written shuffle blocks (Spark's stage-output durability —
    // the reference's "buffered intermediate inputs" in executor form)
    val failed = base.repartition(4, col("k"))
      .as[(Long, Long)].mapPartitions { it =>
        FaultToleranceSpec.failFirstAttempt("reduce")
        it
      }.toDF("id", "k")
      .groupBy("k").agg(sum("id").as("total"), count(lit(1)).as("n"))
    val clean = base.groupBy("k").agg(sum("id").as("total"), count(lit(1)).as("n"))
    // ONE action on the failing plan (each action replants the failure
    // on its fresh attempt 0), then an in-memory compare
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows(failed) == rows(clean), "post-shuffle retry changed the aggregate")
    assert(FaultToleranceSpec.failures.get("reduce").get() == 1)
  }

  test("output commit under retry: the failed attempt's files never reach the result") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ft-commit").toString
    s.range(0, 5000, 1, 4).as[Long].mapPartitions { it =>
      FaultToleranceSpec.failFirstAttempt("commit")
      it
    }.toDF("id").write.mode("overwrite").parquet(s"$dir/out")
    val back = s.read.parquet(s"$dir/out")
    // a leaked failed-attempt file would duplicate partition 1's rows;
    // a dropped commit would lose them — count AND sum pin both
    assert(back.count() == 5000)
    assert(back.agg(sum("id")).head().getLong(0) == 4999L * 5000 / 2)
    assert(FaultToleranceSpec.failures.get("commit").get() == 1)
  }

  test("attempts are bounded: a task failing every attempt fails the job loudly") {
    val s = spark
    import s.implicits._
    val e = intercept[SparkException] {
      s.range(0, 100, 1, 4).as[Long].mapPartitions { it =>
        if (TaskContext.getPartitionId() == 1)
          throw new RuntimeException("planted permanent failure")
        it
      }.count()
    }
    assert(e.getMessage.contains("planted permanent failure"))
  }
}
