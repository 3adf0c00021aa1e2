ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "popgisspark"
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
// The driver greps run output for bare JSON lines; sbt's default forked
// OutputStrategy (LoggedOutput) prefixes every stdout line with "[info] ",
// which breaks that parse (BENCH_r01 had rc=0 yet parsed:null for exactly
// this reason). StdoutOutput passes the forked process's stdout through
// verbatim.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// This sandbox's virtio disk writes at ~40 MB/s with pathological
// sys-time; /dev/shm is RAM-speed — the analog of a real executor's local
// NVMe. Transient files (shuffle, spill, test fixtures) go there.
val fastTmp: Seq[String] = {
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.canWrite) {
    val d = new java.io.File(shm, "graft-tmp"); d.mkdirs()
    Seq(s"-Djava.io.tmpdir=${d.getAbsolutePath}",
        s"-Dspark.local.dir=${d.getAbsolutePath}")
  } else Seq.empty
}
javaOptions ++= jdk17AddOpens ++ fastTmp ++ Seq(
  "-Dspark.ui.enabled=false",
  "-XX:+UseParallelGC",
  // 8 GC threads on a 32-core box measurably stalls 32 allocating task
  // threads (observed 2.5 s young pauses under allocation bursts)
  "-XX:ParallelGCThreads=16",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
