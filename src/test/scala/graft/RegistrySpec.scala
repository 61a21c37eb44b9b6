package graft

/** Invariants of the driver contract itself — cheap structural guards
  * so regressions in the registry (the judged surface) fail loudly in
  * CI rather than silently downgrading a correctness row.
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique") {
    // over the DEF list, not the map keys: queries.keys is a Map's key
    // set and is unique BY CONSTRUCTION, so the old form of this guard
    // was vacuous — and the exact failure it existed for slipped
    // through it (round 12: two QueryDefs named t_theil_sen; toMap
    // kept the later, silently shadowing the count-series def out of
    // every sweep and bench for rounds). orderedNames walks the raw
    // Seq, so a collision fails here before it can hide a query.
    val names = SparkEntry.orderedNames
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(names.size == names.distinct.size,
      s"duplicate query names shadow earlier defs: ${dups.mkString(", ")}")
  }

  test("every registered query carries a DuckDB oracle (zero rows-only checks)") {
    // Round 5 retired the last rows-only rows (sketches gated on their
    // own bounds, IVF on a pinned model, media on generator
    // arithmetic). A future entry without an oracle should be a
    // deliberate, reviewed decision — loosen this spec in the same
    // commit that justifies the grey row.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("bench and entry queries resolve") {
    assert(SparkEntry.benchQueries.nonEmpty)
    SparkEntry.benchQueries.foreach(n => assert(SparkEntry.queries.contains(n), n))
    // the driver smoke-checks entry() rows > 0
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  test("every oracle is a non-empty SELECT/WITH statement") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val head = sql.trim.takeWhile(!_.isWhitespace).toUpperCase
      assert(head == "SELECT" || head == "WITH", s"$name starts with '$head'")
    }
  }
}
