package graft

/** Every registered query runs on sf0.001 and returns rows; schemas carry
  * no generated default names (every computed column must be aliased, or
  * the driver's column-name-sorted hash compare would diverge).
  */
class QueriesSmokeSpec extends SparkSuite {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs, returns rows, and has clean column names") {
      val df = fn(spark, sf)
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"duplicate columns: ${cols.mkString(",")}")
      cols.foreach { c =>
        assert(!c.contains("("), s"unaliased computed column: $c")
      }
      assert(df.count() > 0, s"$name returned no rows on $sf")
    }
  }

  test("every oracleSql key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
