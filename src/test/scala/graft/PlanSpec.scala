package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.query.{Relational, Similarity}

/** Physical-plan audits — the 100 TB design rules as assertions, so a
  * regression that un-pushes a filter, drops a broadcast, or de-codegens a
  * hot path fails CI, not the cluster.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("t6: BETWEEN filter pushes to the parquet scan; schema pruned to 3 cols") {
    val p = plan(Relational.t6BetweenFilter(spark, sf))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_quantity,10.0)"), p)
    assert(p.contains("LessThanOrEqual(l_quantity,20.0)"), p)
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("s1: projection prunes the parquet read schema") {
    val p = plan(Relational.s1ScanProject(spark, sf))
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_returnflag"),
      readSchema)
  }

  test("join_broadcast_dim: dimension side broadcasts (no fact shuffle for the join)") {
    val p = plan(Relational.joinBroadcastDim(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("o2 top-k: TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.o2TopkAsc(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalSort"), p)
  }

  test("q1_agg: partial (map-side) aggregation before the exchange; codegen spans") {
    val df = Relational.q1Agg(spark, sf)
    val p = plan(df)
    assert(p.contains("partial_sum"), p)
    // AQE finalizes the plan at execution; `*(n)` prefixes mark
    // whole-stage-codegen spans in simpleString format
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("WholeStageCodegen") || executed.contains("*("), executed)
  }

  test("ann brute force: float_dot runs inside whole-stage codegen") {
    val df = Similarity.bruteForceTopK(spark, sf)
    val p = plan(df)
    assert(p.contains("float_dot"), p)
    // TakeOrdered for the top-k, not a full sort of all scores
    assert(p.contains("TakeOrderedAndProject"), p)
    val executed = df.queryExecution.executedPlan.toString
    // `*(1) Project [... float_dot(...)]`: the dot product sits inside the
    // whole-stage-codegen span over the columnar scan
    assert(executed.contains("*("), executed)
    assert(executed.contains("float_dot"), executed)
  }

  test("s9 batch assign: no single-partition exchange over the data (only the histogram)") {
    val df = Relational.s9BatchAssign(spark, sf)
    val p = plan(df)
    // exactly one SinglePartition exchange — the one above the per-bucket
    // histogram aggregate (n/bucketWidth rows), never above the raw scan
    val single = "SinglePartition".r.findAllIn(p).size
    assert(single == 1, s"expected 1 SinglePartition exchange, got $single:\n$p")
    // the offsets side reaches the data through a broadcast, not a shuffle
    assert(p.contains("BroadcastExchange"), p)
    // the SinglePartition exchange consumes an aggregate, not the scan:
    // formatted plan lists operators bottom-up per subtree; assert the
    // histogram aggregate exists at all (count per bucket)
    assert(p.contains("partial_count") || p.contains("count"), p)
  }

  test("pack_sequences: no single-partition exchange over the data (only the histogram)") {
    val p = plan(graft.query.Pipeline.packSequences(spark, sf))
    val single = "SinglePartition".r.findAllIn(p).size
    assert(single == 1, s"expected 1 SinglePartition exchange, got $single")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("window_funnel: user_id repartition is reused across stages (no redundant shuffle)") {
    // assert on the STATIC physical plan of an isolated session clone with
    // AQE off: under AQE the reuse is a runtime stage-cache decision whose
    // printed form depends on stage-materialization timing (flaky to
    // string-match), while the static ReuseExchangeAndSubquery rule is
    // deterministic. The clone also isolates this plan from concurrent
    // suites' session-conf overrides (streaming drains resize
    // spark.sql.shuffle.partitions mid-flight).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val executed = graft.query.Relational3.windowFunnel(s2, sf)
      .queryExecution.executedPlan.toString
    // the same stage sub-pipelines feed both the next stage and the final
    // left joins — the up-front repartition makes those subtrees identical
    // so the physical plan dedupes them instead of re-shuffling
    assert(executed.contains("ReusedExchange"), executed.take(4000))
  }

  test("a1 mean impute: 1-row aggregate broadcast, fact side unshuffled") {
    val p = plan(Relational.a1MeanImpute(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }
}
