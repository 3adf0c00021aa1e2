package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key skew profiling for web-scale joins/groupBys — the "hot domains"
  * half of the north rule's skew story (dense urban cells are handled the
  * same way by [[PipJoin.shuffleJoin]]'s hot-cell sketch). A handful of
  * domains own a huge share of crawled pages, so any per-domain shuffle
  * key needs an explicit salt factor proportional to observed frequency.
  *
  * [[domainProfile]] is the one-pass frequency sketch: groupBy(domain)
  * count (map-side combinable — the profile pass shuffles one row per
  * distinct domain per task, never pages) and an integer salt factor
  * `ceil(n / cap)` — the number of ways a downstream
  * `repartition(col("domain"), pmod(hash(url), salt))` should spread that
  * domain so no task sees more than ~cap rows of it.
  */
object SkewProfile {

  /** Registrable-free domain extraction with exact DuckDB parity:
    * the substring between "//" and the next "/" (scheme-relative host).
    * Deliberately split-based, not parse_url, so the oracle runs the
    * same op sequence. */
  def domainOf(url: Column): Column =
    element_at(split(element_at(split(url, "//"), 2), "/"), 1)

  val domainSql: String =
    "string_split(string_split(url, '//')[2], '/')[1]"

  /** (domain, n, salt) with salt = ceil(n / cap) >= 1, integer-exact. */
  def domainProfile(pages: DataFrame, cap: Long): DataFrame =
    pages.select(domainOf(col("url")).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n"))
      .withColumn("salt", expr(s"(n + ${cap - 1}) div $cap"))

  def domainProfileSql(urlSqlExpr: String, cap: Long): String =
    s"""WITH d AS (SELECT $domainSql AS domain FROM
       |  (SELECT $urlSqlExpr AS url FROM documents) u)
       | SELECT domain, count(*) AS n,
       |   CAST((count(*) + ${cap - 1}) // $cap AS BIGINT) AS salt
       | FROM d GROUP BY domain""".stripMargin.replace("\n", " ")
}
