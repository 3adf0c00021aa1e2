package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScalarsSpec extends AnyFunSuite with SparkTest {

  test("Scalars.join: correct values, BroadcastHashJoin plan, crossJoin control is BNLJ") {
    import spark.implicits._
    val big = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    val scalar = big.agg(count(lit(1)).as("n"), sum("id").as("tot"))

    val joined = graft.ops.Scalars.join(big, scalar)
    val rows = joined.select("id", "n", "tot").as[(Long, Long, Long)].collect()
    assert(rows.length === 100)
    assert(rows.forall { case (_, n, tot) => n == 100L && tot == 5050L })

    // formatted explain descends into the AQE wrapper, unlike collect()
    val explained = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!explained.contains("BroadcastNestedLoopJoin"),
      s"scalar attach must not be a nested-loop join\n$explained")
    assert(explained.contains("BroadcastHashJoin"),
      s"scalar attach must plan a broadcast hash join\n$explained")

    // control: the naive spelling really does degenerate (this is the
    // failure mode the non-foldable key exists for)
    val naive = big.withColumn("_one", lit(1))
      .join(broadcast(scalar.withColumn("_one", lit(1))), "_one")
    assert(naive.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .contains("BroadcastNestedLoopJoin"),
      "expected the literal-key spelling to constant-propagate into a BNLJ " +
        "(if this starts passing, Catalyst changed and Scalars.join can simplify)")
  }
}
