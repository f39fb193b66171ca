ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fletcherspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// LayoutMatrixSpec mutates the JVM-global graft.queries.tableLayout hook
// around each query; suites in the forked test JVM must therefore run
// sequentially. Pin it explicitly rather than relying on sbt's default.
Test / parallelExecution := false
run / fork := true
// The driver tail-parses the LAST stdout line of `sbt runMain graft.Bench`
// as compact JSON. Two things used to break that: sbt prefixes forked
// output with "[info] " and appends a "[success] Total time" banner after
// the process exits (BENCH_r10..r12 all ended with parsed:null). Emit the
// forked process' stdout raw and drop the success banner so the compact
// line is genuinely the final line.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command engine, not another setting —
// silence the false-positive unused-key lint (it prints a [warn] block
// that would itself pollute the parsed stdout).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
