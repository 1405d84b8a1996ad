package graft

import graft.query.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg returns one row per (returnflag, linestatus) with positive sums") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0)     // sum_qty
      assert(r.getLong(7) > 0)       // count_order
    }
  }

  test("q3_optimal_time: scores within band, sorted ascending") {
    val rows = Relational.q3OptimalTime(spark, sf).collect()
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted))
    scores.foreach(s => assert(s >= 45.0 && s <= 52.0))
    rows.foreach(r => assert(r.getInt(0) >= 0 && r.getInt(0) <= 23))
  }

  test("entry smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has distinct, DuckDB-safe output column names") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val sch = fn(spark, sf).schema
      assert(sch.fieldNames.distinct.length == sch.fieldNames.length, name)
    }
  }

  test("every oracleSql key is a declared query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
