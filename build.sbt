ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cinegraphspark"
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
// The bench/verify drivers parse the LAST stdout line as JSON:
//  - StdoutOutput sends the forked JVM's stdout straight through instead
//    of wrapping every line in an [info] logger prefix;
//  - showSuccess kills the "[success] Total time: ..." epilogue that
//    would otherwise land AFTER the JSON line.
run / outputStrategy := Some(StdoutOutput)
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
  // java.sql.Timestamp construction (TablesSpec NTZ fixtures) reads the
  // JVM default zone, not spark.sql.session.timeZone — pin it so tests
  // pass on non-UTC hosts too.
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Tests get their OWN tmpdir: several artifacts live at fixed names
// under java.io.tmpdir (graft_graph_export, graft_e1_scored_export —
// fixed because their oracle SQL embeds the path), and PlanSpec's sweep
// calls every query fn, which eagerly rewrites those exports with
// sf0.001 test data. A test run concurrent with (or after) a Verify
// would silently clobber the export its oracle_sql.json points at —
// caught as a phantom q_e1_features rows-mismatch in r11. Appended
// after the shared options, so this -D wins (last occurrence rules).
Test / javaOptions += {
  val d = target.value / "test-tmp"
  java.nio.file.Files.createDirectories(d.toPath)
  s"-Djava.io.tmpdir=${d.getAbsolutePath}"
}
