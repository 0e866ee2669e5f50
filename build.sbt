ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoop300beta1gaiaspark"
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
  // Heap-geometry guard (BASELINE.md round-18 adjudication): at large
  // Xmx, G1's ADAPTIVE YOUNG GEN scales with Xmx (60% target), so the
  // committed heap oscillated 320 MB <-> 51.7 GB inside one bench run
  // at Xmx=89g with ~2 GB live — and this host delivers freshly
  // faulted pages at only ~80 MB/s once tens of GB are resident
  // (hypervisor memory overcommit, measured), so every re-expansion
  // was minutes of mutator page-fault stalls (4.3 s time-to-safepoint,
  // 63% sys, 10-20% steal) landing on whatever kernel was running:
  // the round-17 bench_phrase/bench_hybrid 3-4x driver-run breaches.
  // Fix: cap young at 2 GB (the 8g profile's adaptive young never
  // exceeded ~1 GB, so the known-good profile is unchanged) and never
  // uncommit (pages fault at most once; committed ratchets to true
  // live peak — dev probes with real 1e7-scale live data still get
  // their full SPARK_DRIVER_MEM). Xms/AlwaysPreTouch pinning is WRONG
  // here: pre-faulting 89 GB at 80 MB/s is a ~18-minute startup.
  "-XX:MaxNewSize=2g",
  "-XX:MaxHeapFreeRatio=100",
) ++
  // ad-hoc diagnostic flags for the forked JVM (e.g. -Xlog:gc* during
  // the round-18 heap-geometry bench adjudication) — space-separated
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
