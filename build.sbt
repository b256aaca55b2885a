ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduce_faultolerrant_localityawarespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// FaultToleranceSpec needs a SparkContext with task retries enabled —
// local-mode maxFailures is fixed at context creation (`local[4, 3]`)
// and every other suite shares SparkSpec's no-retry local[4] session,
// so that one suite runs in its own forked JVM. ExecutorLossSpec
// likewise: it runs `local-cluster[2,1,1024]` (real executor JVMs it
// kills mid-stage), which cannot share a JVM whose session is local[*].
// Its standalone worker writes executor sandboxes under SPARK_WORKER_DIR,
// pointed into target/ so nothing lands outside the repo.
Test / testGrouping := {
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars(Map(
      "SPARK_WORKER_DIR" -> (target.value / "spark-worker").getAbsolutePath,
      // the worker's executor-command builder needs this outside
      // bin/load-spark-env.sh (else: "Cannot find any build directories")
      "SPARK_SCALA_VERSION" -> "2.13"))
  val soloSuites = Set("graft.FaultToleranceSpec", "graft.ExecutorLossSpec")
  val (solo, rest) = (Test / definedTests).value
    .partition(t => soloSuites.contains(t.name))
  (Tests.Group("main", rest, Tests.SubProcess(forkOpts)) +:
    solo.map(t => Tests.Group(t.name, Seq(t), Tests.SubProcess(forkOpts)))
  ).filter(_.tests.nonEmpty)
}
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 32 executor threads keep JNI critical sections (LZ4 shuffle write,
  // parquet read-ahead) holding the GCLocker almost continuously under
  // load; JDK 17's default GCLockerRetryAllocationCount=2 then throws
  // spurious "Java heap space" OOMs on WORD-sized allocations with a
  // near-empty heap (JDK-8192647 family — observed killing the ×100
  // graph build: "Retried waiting for GCLocker too often allocating 4
  // words"). Raising the retry budget is the standard Spark-on-JDK17
  // mitigation; a genuinely full heap still OOMs.
  "-XX:+UnlockDiagnosticVMOptions", "-XX:GCLockerRetryAllocationCount=64",
)
