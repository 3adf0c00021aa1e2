package graft

/** Quick CLI for the process-based scaling measurement:
  * args = workers cores rep [sfDir]. */
object BenchClusterMain {
  def main(args: Array[String]): Unit = {
    val workers = args(0).toInt; val cores = args(1).toInt; val rep = args(2).toInt
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val r = BenchCluster.run(workers, cores, rep, sfDir)
    println(f"CLUSTER workers=$workers cores=$cores feats=${r.feats} maxSec=${r.maxSec}%.3f fps=${r.fps}%.0f")
  }
}
