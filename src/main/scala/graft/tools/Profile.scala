package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: per-rep wall times for named queries (the bench
  * publishes only the min, which hides warm-up vs steady-state and any
  * per-rep fixed cost). Usage:
  *
  *   runMain graft.tools.Profile <sfDir> <reps> <name>[,<name>...]
  *
  * Prints one line per (query, rep). Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String, r: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $label rep=$r rows=$n sec=$sec%.3f")
    }
    for (name <- names; r <- 1 to reps) name match {
      case "q72phases" =>
        import org.apache.spark.sql.functions.col
        val pts = graft.Pipeline.entities(spark, sfDir)
        time("q72.pts", r)(pts.count())
        time("q72.build", r)(
          graft.index.CellPyramid.build(pts, "lon", "lat", 10, 3).count())
        val polys = graft.sources.Layers.polygons(spark, sfDir)
        time("q72.classify", r)(
          polys.select(col("poly_id"), col("geom"))
            .as[(Long, Array[Byte])](org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.BINARY))
            .flatMap { case (id, wkb) =>
              graft.index.CellPyramid.pairRowsFor(id, wkb, 10, 3)
            }(org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaBoolean,
              org.apache.spark.sql.Encoders.BINARY))
            .count())
      case _ =>
        time(name, r)(graft.SparkEntry.queries(name)(spark, sfDir).count())
    }
    spark.stop()
  }
}
