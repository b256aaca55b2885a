package graft

import java.io.File
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.{SparkEnv, TaskContext}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-JVM coordination for the executor-loss tests. local-cluster
  * executors are SEPARATE PROCESSES (unlike FaultToleranceSpec's
  * in-driver local mode), so a static map is invisible to them — all
  * signalling goes through marker FILES in a shared temp dir: task
  * executions self-record as empty files whose NAME carries the facts
  * (kind, partition, stage attempt, task attempt, executor id), and
  * the one-shot kill is claimed by an atomic file create. */
object ExecutorLossSpec {

  def execId: String = SparkEnv.get.executorId

  /** Record one task execution; the filename is the whole record. */
  def mark(dir: String, kind: String, part: Int): Unit = {
    val tc = TaskContext.get()
    val name = s"$kind-p$part-sa${tc.stageAttemptNumber()}-a${tc.attemptNumber()}" +
      s"-e$execId-${java.util.UUID.randomUUID().toString.take(8)}"
    Files.createFile(Paths.get(dir, name))
  }

  /** Atomically claim `name`: true for exactly ONE claimant cluster-wide
    * (createFile is atomic on the shared local filesystem). */
  def claim(dir: String, name: String): Boolean =
    try { Files.createFile(Paths.get(dir, name)); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  /** Kill THIS executor JVM, at most once per `tag`: halt(), not exit(),
    * so no shutdown hook runs — the process dies the way a crashed or
    * partitioned worker does (the reference's dead-worker model: the
    * ping just stops answering, nothing deregisters cleanly). */
  def killOnce(cond: Boolean, dir: String, tag: String): Unit =
    if (cond && claim(dir, tag)) Runtime.getRuntime.halt(42)

  /** Publish/read which executor ran map partition 0 on its FIRST
    * attempt — the victim selector for the shuffle-loss test (killing
    * the owner of known map output makes the loss deterministic). */
  def publishOwner(dir: String): Unit = {
    val tc = TaskContext.get()
    if (tc.stageAttemptNumber() == 0 && tc.attemptNumber() == 0)
      claim(dir, s"owner-$execId")
  }
  def readOwner(dir: String): Option[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).find(_.startsWith("owner-"))
      .map(_.stripPrefix("owner-"))

  /** Parse the marker files of one `kind` back into
    * (partition, stageAttempt, taskAttempt, executorId) records. */
  def marks(dir: String, kind: String): Seq[(Int, Int, Int, String)] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(kind + "-p")).toSeq
      .map { n =>
        val parts = n.split("-")
        (parts(1).drop(1).toInt, parts(2).drop(2).toInt,
          parts(3).drop(1).toInt, parts(4).drop(1))
      }
}

/** EXECUTOR-LOSS fault tolerance — the missing half of the reference's
  * recovery contract that FaultToleranceSpec (task-ATTEMPT retry in
  * local mode) cannot reach, because a local-mode "executor" is the
  * driver and can never be lost. Here Spark runs `local-cluster[2,1,
  * 1024]`: a real standalone master + worker with TWO executor JVMs as
  * separate processes, and a planted task halt()s one of them
  * mid-stage. What must then happen is exactly
  * `/root/reference/master/recovery.go`:
  *
  *  - dead-worker detection (`worker/worker_routines.go` ping →
  *    Spark: the worker observes the process exit and the master/driver
  *    remove the executor),
  *  - chunk reassignment + map re-execution after a mapper dies
  *    (`recovery.go:130-209 AssignChunksIDsRecovery` + `:69-128
  *    MapPhaseRecovery` → Spark: the dead executor's SHUFFLE OUTPUT is
  *    gone with its process, so the DAGScheduler must resubmit the
  *    parent stage and recompute those partitions FROM LINEAGE),
  *  - worker replacement (`recovery.go:18-67` → Spark standalone: the
  *    master relaunches a fresh executor on the surviving worker slot
  *    and it picks up work).
  *
  * Each test asserts three things: the job's result is EXACT (computed
  * independently in the driver), the kill actually fired (claimed
  * marker), and the recovery PATH is the one claimed — re-executed map
  * partitions / a replacement executor id, read back from the marker
  * files the tasks wrote.
  *
  * Runs in its OWN forked JVM (build.sbt `Test / testGrouping`): the
  * cluster master string is fixed at SparkContext creation and every
  * other suite shares SparkSpec's local[4] session. Executor JVMs get
  * the driver's full test classpath via `spark.executor.extraClassPath`
  * (task closures reference this spec class, which references
  * scalatest). */
class ExecutorLossSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-executor-loss-test")
      .config("spark.executor.memory", "1024m")
      // ship graft + scalatest classes to the executor JVMs; the spark
      // jars re-listed here are the same files the worker adds anyway
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-el-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Block until both executors are registered (cluster warm-up) —
    * otherwise the first stage can land entirely on executor 0 and the
    * victim-selection below loses its bite. */
  private def awaitExecutors(n: Int): Unit = {
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    // getExecutorMemoryStatus includes the driver → n executors = n+1
    while (spark.sparkContext.getExecutorMemoryStatus.size < n + 1) {
      if (System.nanoTime() > deadline) fail("executors never registered")
      Thread.sleep(200)
    }
  }

  test("map-only stage: losing an executor re-runs its tasks on a replacement, result exact") {
    val s = spark
    awaitExecutors(2)
    val dir = Files.createTempDirectory("graft-el-map").toString
    val total = s.sparkContext.parallelize(0L until 40000L, 8)
      .mapPartitionsWithIndex { (pid, it) =>
        ExecutorLossSpec.mark(dir, "map1", pid)
        // partition 3's first runner takes its whole executor down
        ExecutorLossSpec.killOnce(pid == 3, dir, "kill1")
        Thread.sleep(100) // keep the stage alive long enough to spread
        it.map(_ * 3 + 1)
      }.sum()
    assert(total == 3.0 * (39999L * 40000 / 2) + 40000,
      s"sum wrong after executor loss: $total")
    assert(Files.exists(Paths.get(dir, "kill1")),
      "the planted executor kill never fired — the test proved nothing")
    val m = ExecutorLossSpec.marks(dir, "map1")
    val p3 = m.filter(_._1 == 3)
    assert(p3.size >= 2, s"partition 3 was not re-executed: $p3")
    // the re-run landed on a DIFFERENT executor than the one it killed
    // (either the survivor or the master's relaunched replacement —
    // recovery.go:18-67's worker replacement in standalone form)
    val killedExec = p3.filter { case (_, sa, a, _) => sa == 0 && a == 0 }.map(_._4).toSet
    val rerunExec = p3.filter { case (_, sa, a, _) => sa > 0 || a > 0 }.map(_._4).toSet
    assert(killedExec.nonEmpty && rerunExec.nonEmpty &&
      rerunExec.exists(!killedExec.contains(_)),
      s"re-run did not move off the dead executor: first=$killedExec rerun=$rerunExec")
  }

  test("shuffle loss: killing a mapper's executor mid-reduce recomputes its map output from lineage") {
    val s = spark
    awaitExecutors(2)
    val dir = Files.createTempDirectory("graft-el-shuf").toString
    val pairs = s.sparkContext.parallelize(0L until 40000L, 4)
      .mapPartitionsWithIndex { (pid, it) =>
        ExecutorLossSpec.mark(dir, "map2", pid)
        if (pid == 0) ExecutorLossSpec.publishOwner(dir)
        Thread.sleep(200) // spread map tasks over both 1-core executors
        it.map(x => (x % 7, x))
      }
    val reduced = pairs.reduceByKey(_ + _, 4)
      .mapPartitionsWithIndex { (pid, it) =>
        ExecutorLossSpec.mark(dir, "red2", pid)
        // the reduce task scheduled onto the executor that OWNS map
        // partition 0's shuffle output kills it — that output is now
        // gone (no external shuffle service), so the remaining reduce
        // tasks MUST fetch-fail and force a map-stage resubmission
        val owner = ExecutorLossSpec.readOwner(dir)
        ExecutorLossSpec.killOnce(owner.contains(ExecutorLossSpec.execId), dir, "kill2")
        it
      }
    val got = reduced.collect().sortBy(_._1).toSeq
    val want = (0L until 40000L).map(x => (x % 7, x))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    assert(got == want, "aggregate wrong after shuffle loss")
    assert(Files.exists(Paths.get(dir, "kill2")),
      "the planted executor kill never fired — the test proved nothing")
    val maps = ExecutorLossSpec.marks(dir, "map2")
    val owner = ExecutorLossSpec.readOwner(dir).get
    // map RE-EXECUTION from lineage: a fresh stage attempt of the map
    // stage ran after the loss (recovery.go:69-128's MapPhaseRecovery
    // in DAGScheduler form) — and it re-ran work the dead executor had
    // already completed
    val rerun = maps.filter(_._2 > 0)
    assert(rerun.nonEmpty,
      s"map stage was never resubmitted — shuffle loss was not exercised: $maps")
    val ownerParts = maps.filter(m => m._2 == 0 && m._4 == owner).map(_._1).toSet
    assert(rerun.map(_._1).toSet.intersect(ownerParts).nonEmpty,
      s"recomputed partitions ${rerun.map(_._1).toSet} are not the dead executor's $ownerParts")
    assert(rerun.forall(_._4 != owner), "a re-run landed on the dead executor id")
  }
}
