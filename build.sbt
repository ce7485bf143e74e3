ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datapipelinecapstoneprojectspark"
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
// Pin the heap at startup (fault + zero every page BEFORE anything is
// timed): a 48g bench JVM launched right after another big JVM exits
// otherwise pays lazy first-touch faults and the kernel's reclaim of
// its predecessor's pages INSIDE the measured windows — the r18 pair
// probe read a near-uniform +7% (114/155 entries up) on the
// back-to-back leg with foreign load clean in both runs. The JVM
// analog of Bench's corpus pre-touch; costs seconds at startup.
// AlwaysPreTouch only touches the COMMITTED heap, so -Xms must match
// -Xmx or every later expansion toward the max faults + zeroes pages
// inside measured windows anyway — the exact cost the flag exists to
// pre-pay. Scoped to run/ (the bench JVM): a forked TEST JVM that
// commits and zeroes the whole heap up front would slow every suite
// and pressure smaller boxes for no benefit — tests aren't timed.
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
// Collector selection for scale soaks (tools/run_bench.sh sets it):
// SPARK_GRAFT_GC=zgc runs the forked JVM under ZGC — the sf10 protocol,
// where G1's stop-the-world waves on the 48g heap bill to whichever
// entry runs next (BENCH_scale.md r17 G1/ZGC A/B). Unset/anything else
// keeps the JVM default (G1), the sf0.1 protocol-pair collector. The
// bench artifact records which collector actually ran (`gc` field).
javaOptions ++= (if (sys.env.get("SPARK_GRAFT_GC").contains("zgc"))
  Seq("-XX:+UseZGC") else Seq.empty)
