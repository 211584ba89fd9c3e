package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Queries

/** Smoke + shape regression for every SparkEntry query at sf0.001; value
  * correctness for the SQL-expressible ones is the driver's DuckDB compare
  * (and the local verify harness in scripts/compare_oracle.py).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  // every oracleSql key must have a matching query
  test("oracleSql keys are a subset of queries") {
    val missing = Queries.oracleSql.keySet -- Queries.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query impl: $missing")
  }

  Queries.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs and returns rows at sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
