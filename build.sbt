ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mindbspark"
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
// Driver bench-output contract (VERDICT r18 #1): the driver keeps a
// 2000-char stdout TAIL and json-parses its last line. sbt's default
// LoggedOutput prefixes every forked-run line with "[info] " (invalid
// JSON) and appends a "[success] Total time ..." epilogue after the run —
// both corrupt that tail. Inherit the raw stdout/stderr for forked runs
// and drop the success banner so the bench's own last line IS the last
// stdout line, byte-for-byte.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by the command engine, not a task
// SIMD encode kernel (graft.index.SimdArgmin) uses jdk.incubator.vector:
// compile the Java source against the module, and run/test forks load it.
// The module is RUNTIME-OPTIONAL — FlatCentroids feature-detects per JVM
// and falls back to the scalar kernel where a cluster omits the flag.
// JavaThenScala so scalac resolves SimdArgmin from its classfile (public
// signature is primitives-only) instead of parsing the Java source.
compileOrder := CompileOrder.JavaThenScala
// the -J option forces zinc to FORK javac — the in-process compiler loads
// incubator classes into the unnamed module and fails the superclass check
Compile / javacOptions ++= Seq("--add-modules", "jdk.incubator.vector", "-J-Xmx512m")
javaOptions += "--add-modules=jdk.incubator.vector"
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
  // 16g default: the full 66-query bench session's live set (fixtures,
  // shared frames, streaming state, broadcasts) GC-thrashes an 8g heap —
  // measured 123.8s total at 8g vs 50.5s at 16g on identical code/data.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
