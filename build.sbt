ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatatrendanalysisspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
// Round-6 attempt (VERDICT r5 #3): an embedded-Kafka wire-protocol test
// needs spark-sql-kafka-0-10 + kafka + io.github.embeddedkafka; all three
// fail `sbt update` here with coursier "Not found" against the offline
// cache (no Kafka artifact exists anywhere on the image — /opt/spark/jars
// ships no kafka connector either). Closed as ENVIRONMENTAL; the source's
// semantics stay covered by MemoryStream + StreamMain e2e
// (StreamingSpec), which exercise identical parse/transform/sink plans.
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// forked run output goes straight to stdout, NOT through the sbt logger:
// the "[info] " prefix made the Bench JSON line unparseable by the round
// driver (BENCH_r01/r02 carried "parsed": null)
run / outputStrategy := Some(StdoutOutput)
// ...and suppress the trailing "[success] Total time: ..." logger line so the
// Bench JSON is the LAST stdout line (BENCH_r03 still had "parsed": null —
// the driver parses the final line of captured output)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 8g GC-thrashes the bench (~90 queries × SPARK_GRAFT_BENCH_PASSES=3
  // passes at local[32]); the container has 128 GiB — size the single-JVM
  // driver+executors like the cluster executors it stands in for. Raised
  // 24g → 40g in round 5: non-first bench passes still swung 90-150 s on
  // a 50 s workload with 24g (old-gen churn from 91 cached plans + CMS
  // buffers); more headroom lets G1 absorb the churn between passes.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "40g")}",
)
