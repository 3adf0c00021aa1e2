package graft

/** Fast local scratch for shuffle/spill/temp files.
  *
  * This sandbox's virtio disk writes at ~40 MB/s with pathological
  * sys-time (measured: `dd` 2 GB buffered = 49 s of system CPU), which
  * serializes every shuffle write across all 32 task threads. /dev/shm is
  * RAM-speed (1.1 GB/s measured) — the analog of the local NVMe a real
  * executor ships with, which is what a 1000-executor cluster would give
  * each task. Shuffle and spill are transient by definition, so tmpfs
  * placement changes no durability story (table sinks still go to the
  * caller's path). Override with SPARK_GRAFT_LOCAL_DIR.
  */
object Scratch {
  lazy val dir: String = sys.env.get("SPARK_GRAFT_LOCAL_DIR").getOrElse {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-spark-local")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }
}
