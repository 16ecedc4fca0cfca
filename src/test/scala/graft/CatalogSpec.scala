package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run at sf0.001 and return rows (the
  * thresholds in the catalog are chosen to stay non-degenerate at every
  * scale factor). Value-level correctness is covered by the DuckDB oracle
  * harness (tools/check.py + graft.Verify). */
class CatalogSpec extends AnyFunSuite {
  import TestSpark._

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is non-empty at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
