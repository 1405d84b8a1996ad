package graft

import org.apache.spark.sql.functions._
import graft.query.Analytics5

/** Registry-integrity pins (driver round 12): the `sample_weighted`
  * shadowing incident — a duplicate map key silently replacing a whole
  * query — was found by a manual audit; these specs make recurrence
  * impossible. Plus the degree-cap contract for the walk adjacency
  * index (a 50k-degree synthetic hub stays bounded at the cap).
  */
class RegistrySpec extends SparkSpec {

  test("reg(...) rejects duplicate keys loudly") {
    val e = intercept[IllegalArgumentException] {
      SparkEntry.reg("a" -> 1, "b" -> 2, "a" -> 3)
    }
    assert(e.getMessage.contains("a"))
    // and a clean literal passes through unchanged
    assert(SparkEntry.reg("a" -> 1, "b" -> 2) == Map("a" -> 1, "b" -> 2))
  }

  test("registries build without duplicates and agree on keys: every query " +
      "has an oracle except the documented no-oracle allowlist; every " +
      "oracle has a query") {
    // building them at all proves no within-map duplicate key exists
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) == SparkEntry.noOracleByDesign,
      s"oracle-less queries beyond the documented allowlist: ${(q -- o -- SparkEntry.noOracleByDesign).toSeq.sorted}")
    assert((o -- q).isEmpty,
      s"orphaned oracles (no query): ${(o -- q).toSeq.sorted}")
    assert(SparkEntry.noOracleByDesign.subsetOf(q),
      "allowlist names a key that is not a declared query")
  }

  test("every oracle is non-empty SQL and every query key is non-empty") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(k.nonEmpty && sql.trim.nonEmpty, s"empty oracle for $k")
      assert(sql.toUpperCase.contains("SELECT"), s"oracle for $k has no SELECT")
    }
  }

  test("cappedAdjacency bounds a 50k-degree hub at the cap, keeps small " +
      "vertices whole, and the kept set is partitioning-invariant") {
    import spark.implicits._
    val hub = (1L to 50000L).map(v => (0L, v))         // hub vertex 0
    val small = Seq((1L, 5L), (1L, 9L), (1L, 2L))      // degree-3 vertex 1
    val edges = (hub ++ small).toDF("u", "v")
    val d = 64
    val adj = Analytics5.cappedAdjacency(edges, d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(adj(0L).length == d, s"hub kept ${adj(0L).length}, want $d")
    assert(adj(1L) == Seq(2L, 5L, 9L), "small vertex must keep all, sorted")
    assert(adj(0L) == adj(0L).sorted, "hub list must be sorted")
    // deterministic under a different physical layout
    val adj2 = Analytics5.cappedAdjacency(edges.repartition(7, col("v")), d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(adj2 == adj, "capped adjacency must not depend on partitioning")
  }

  test("graph_random_walks rides the capped index: every hop lands on a " +
      "kept neighbor, paths have steps+1 vertices") {
    val adj = Analytics5.cappedAdjacency(
      graft.query.Analytics.copurchaseEdgesSym(spark, sf), 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val rows = Analytics5.graphRandomWalks(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val path = r.getString(1).split("->").map(_.toLong)
      assert(path.length == 4, s"walk ${r.getLong(0)}: ${r.getString(1)}")
      path.sliding(2).foreach { case Array(a, b) =>
        assert(adj(a).contains(b), s"hop $a->$b not in capped adjacency")
      }
      assert(path.last == r.getLong(2))
    }
  }
}
