package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.table.TableLog
import java.nio.file.Files

class TableLogSpec extends AnyFunSuite with SparkTest {

  private def freshTable() = Files.createTempDirectory("graft-table").toString + "/t"

  test("save mode fail: first write ok, second throws TableExists (K5)") {
    import spark.implicits._
    val t = freshTable()
    TableLog.write(Seq(1, 2, 3).toDF("v"), t, "fail")
    assert(TableLog.read(spark, t).count() === 3)
    assertThrows[GraftError.TableExists](TableLog.write(Seq(4).toDF("v"), t, "fail"))
  }

  test("save mode overwrite replaces data (K6); append adds a snapshot") {
    import spark.implicits._
    val t = freshTable()
    TableLog.write(Seq(1, 2, 3).toDF("v"), t, "overwrite")
    TableLog.write(Seq(9).toDF("v"), t, "overwrite")
    assert(TableLog.read(spark, t).collect().map(_.getInt(0)).toSeq === Seq(9))
    TableLog.write(Seq(10).toDF("v"), t, "append")
    assert(TableLog.read(spark, t).collect().map(_.getInt(0)).sorted.toSeq === Seq(9, 10))
    assertThrows[GraftError.InvalidMode](TableLog.write(Seq(1).toDF("v"), t, "bogus"))
  }

  test("snapshots are immutable, versioned, carry lineage metrics") {
    import spark.implicits._
    val t = freshTable()
    TableLog.write(Seq(1, 2).toDF("v"), t, "overwrite")
    TableLog.write(Seq(3).toDF("v"), t, "append")
    val snaps = TableLog.snapshots(t)
    assert(snaps.map(_.snapshot) === Seq(1L, 2L))
    assert(snaps.last.parent === Some(1L))
    val meta = snaps.last.buckets.values
    assert(meta.forall(_.rows > 0))
    assert(snaps.last.schemaDdl.contains("v INT"))
  }

  test("checkpointed run resumes: committed buckets skipped, results complete") {
    import spark.implicits._
    val t = freshTable()
    def bucketDf(b: String) = Seq((b, b.length)).toDF("bucket", "n")
    // "crash" after two buckets
    val (_, skipped1, written1) =
      TableLog.runCheckpointed(spark, t, Seq("b1", "b2"), bucketDf)
    assert(skipped1.isEmpty && written1 === Seq("b1", "b2"))
    // resume with the full bucket list
    val (snap, skipped2, written2) =
      TableLog.runCheckpointed(spark, t, Seq("b1", "b2", "b3"), bucketDf)
    assert(skipped2 === Seq("b1", "b2") && written2 === Seq("b3"))
    assert(snap.buckets.keySet === Set("b1", "b2", "b3"))
    assert(TableLog.read(spark, t).count() === 3)
    // idempotent re-run: everything skipped
    val (_, skipped3, written3) =
      TableLog.runCheckpointed(spark, t, Seq("b1", "b2", "b3"), bucketDf)
    assert(skipped3.length === 3 && written3.isEmpty)
  }

  test("commit is atomic: _current always points at a complete manifest") {
    import spark.implicits._
    val t = freshTable()
    TableLog.write(Seq(1).toDF("v"), t, "overwrite")
    val cur = TableLog.current(t).get
    assert(cur.buckets.nonEmpty)
    // a reader sees either the old or the new snapshot, never a partial file
    TableLog.write(Seq(2).toDF("v"), t, "append")
    assert(TableLog.current(t).get.snapshot === cur.snapshot + 1)
  }
}
