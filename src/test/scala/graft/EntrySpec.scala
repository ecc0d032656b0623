package graft

/** Driver-contract smoke: entry() returns rows; every queries entry has
  * runnable Spark code, and every oracle key points at a real query. */
class EntrySpec extends SparkSpec {

  test("entry() flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; names are aligned") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
  }

  test("every query executes at sf0.001 (schema + plan sanity)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}
