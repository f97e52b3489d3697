ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bytesmeetlbatchpipelinespark"
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
// Forked run output goes straight to this process's stdout/stderr with
// NO "[info] " prefix — the bench harness parses the stdout tail for a
// bare JSON line, and sbt's default logger prefix breaks that parse.
run / outputStrategy := Some(StdoutOutput)
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
  // r18: a full-registry bench child compiles thousands of generated
  // (whole-stage-codegen) classes; at the JDK default 240 MB the code
  // cache fills late in a 69-arm group and the JIT starts flushing/
  // declining compiles — the one arm that runs interpreted HOFs over
  // 200k rows (x01) measured 5.6x its pin at position 34/69 while its
  // codegen neighbors held 0.9-1.3x. 512 MB keeps compiled code
  // resident for the whole group (bench children inherit every
  // non-heap JVM arg).
  "-XX:ReservedCodeCacheSize=512m",
)
