package graft

import org.apache.spark.sql.SparkSession

/** Executor-style scaling evidence: the same job at two "cluster sizes" —
  * 1 worker process vs 4 worker processes, each its OWN JVM (own heap, own
  * GC, `local[coresPerWorker]`), splitting the replication range disjointly.
  * This models N vs 4N executors more faithfully than threads inside one
  * shared-heap JVM, where a single collector serializes against 32 task
  * threads. Cluster throughput = total features / max(worker timed sec).
  *
  * [[BenchClusterWorker]] is the per-executor main; [[BenchCluster]] forks
  * it via ProcessBuilder (classpath + add-opens inherited from this JVM).
  */
object BenchClusterWorker {
  def main(args: Array[String]): Unit = {
    val Array(cores, repFrom, repTo, repTotal) = args.take(4).map(_.toInt)
    val sfDir = if (args.length > 4) args(4) else "/root/testdata/sf0.1"
    val syncDir = if (args.length > 5) Some(args(5)) else None
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-worker-$repFrom")
      .config("spark.local.dir", Scratch.dir)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val containing = graft.ops.GeoExpressions.containingCol(
      spark, graft.sources.Layers.polygons(spark, sfDir), Pipeline.CellLevel)
    val knn = graft.ops.GeoExpressions.knnCol(
      spark, graft.sources.Layers.pois(spark, sfDir), Pipeline.K, Pipeline.CellLevel)
    // Phase A (untimed): materialize this worker's entity slice — the
    // north-rule metric is SPATIAL-JOIN + TILE throughput over an existing
    // table, not synthetic-input generation + regex. Also aligns worker
    // phases so no untimed pass overlaps a sibling's timed run.
    val entDir = s"${Scratch.dir}/graft_bench_ents_$repFrom"
    Pipeline.entitiesAmplifiedRange(spark, sfDir, repFrom, repTo, repTotal)
      .select("url", "ent_idx", "lon", "lat")
      .write.mode("overwrite").parquet(entDir)
    val ents = spark.read.parquet(entDir)
    val feats = ents.count()
    def job() = Pipeline.enrichPrebuilt(ents, containing, knn)
    force(job()) // warmup (JIT + codegen)
    // start barrier: signal ready, wait for coordinator's "go", so every
    // worker's TIMED section starts together (otherwise a late-booting
    // worker times itself against siblings in heavier phases)
    syncDir.foreach { d =>
      java.nio.file.Files.createFile(java.nio.file.Paths.get(d, s"ready_$repFrom"))
      val go = java.nio.file.Paths.get(d, "go")
      while (!java.nio.file.Files.exists(go)) Thread.sleep(20)
    }
    val t0 = System.nanoTime()
    force(job())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"WORKER from=$repFrom to=$repTo feats=$feats sec=$sec%.3f")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    try rm(new java.io.File(entDir)) catch { case _: Throwable => () }
    spark.stop()
  }
}

object BenchCluster {

  final case class ClusterRun(workers: Int, feats: Long, maxSec: Double) {
    def fps: Double = feats / maxSec
  }

  /** Launch `workers` JVMs, each `cores`-wide, over disjoint slices of
    * `repTotal`; returns total features and the max per-worker timed sec. */
  def run(workers: Int, cores: Int, repTotal: Int, sfDir: String): ClusterRun = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val slice = repTotal / workers
    val syncDir = java.nio.file.Files.createTempDirectory("graft-bench-sync").toString
    val procs = (0 until workers).map { w =>
      val from = w * slice
      val to = if (w == workers - 1) repTotal else (w + 1) * slice
      val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx10g", "-XX:+UseParallelGC", "-XX:ParallelGCThreads=4",
        "-Dspark.ui.enabled=false", s"-Djava.io.tmpdir=${Scratch.dir}",
        "-cp", cp, "graft.BenchClusterWorker",
        cores.toString, from.toString, to.toString, repTotal.toString, sfDir, syncDir)
      (from, new ProcessBuilder(cmd: _*).redirectErrorStream(true).start())
    }
    // release the start barrier once every worker is warmed up and ready
    val readyPaths = procs.map { case (from, _) =>
      java.nio.file.Paths.get(syncDir, s"ready_$from") }
    while (!readyPaths.forall(java.nio.file.Files.exists(_))) Thread.sleep(50)
    java.nio.file.Files.createFile(java.nio.file.Paths.get(syncDir, "go"))
    val outputs = procs.map { case (_, p) =>
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor()
      out
    }
    val stats = outputs.map { out =>
      val line = out.linesIterator.find(_.startsWith("WORKER")).getOrElse(
        throw new IllegalStateException(s"worker failed:\n${out.takeRight(2000)}"))
      val kv = line.split(" ").collect { case s if s.contains("=") =>
        val Array(k, v) = s.split("="); k -> v }.toMap
      (kv("feats").toLong, kv("sec").toDouble)
    }
    System.err.println(s"[cluster] worker secs: ${stats.map(s => f"${s._2}%.2f").mkString(", ")}")
    ClusterRun(workers, stats.map(_._1).sum, stats.map(_._2).max)
  }
}
