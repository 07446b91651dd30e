ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hdbresalepricedatapipelinespark"
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
// Fast-by-default test pass (r11 verdict item 7): the randomized fuzz
// suites are the bulk of the suite's 461 s wall-time; the default pass
// excludes them (every *FuzzSpec / *PropertySpec carries a class-level
// @org.scalatest.tags.Slow, and so do five heavy non-fuzz unit suites:
// BradleyTerrySpec, RankCentralitySpec, KCoreSpec, PlanSweepSpec,
// LengthBucketPackingSpec) so the per-change loop stays minutes-scale.
// GRAFT_FULL_TESTS=1 sbt test runs EVERYTHING — the close-out (and
// judge) configuration. Both documented in README.
Test / testOptions ++= (
  if (sys.env.contains("GRAFT_FULL_TESTS")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest,
    "-l", "org.scalatest.tags.Slow")))
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
  // a 264-plan bench session JITs ~50k nmethods (~155 MB measured via
  // -XX:+PrintCodeCache); near the default 240 MB reserve the sweeper
  // flushes hot code and CPU-bound per-row gates intermittently read
  // many-x slower (A/B in BASELINE round-11). Headroom is cheap.
  "-XX:ReservedCodeCacheSize=512m",
)
