package graft

import org.apache.spark.sql.types._
import graft.schema.Schemas

/** CANARY: the testdata type contract the engine's non-adaptive paths
  * rely on.
  *
  * The round-10 incident (see BASELINE.md) was a silent physical-type
  * drift in driver-regenerated testdata: `events.ts` switched
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and six streaming queries went
  * red with zero source changes. `Schemas.events` + the streaming
  * footer probe now absorb every observed shape of THAT column; this
  * spec pins the remaining assumptions so the NEXT drift fails here
  * first, with a message naming the dependency, instead of as dozens of
  * cryptic oracle mismatches (or executor ClassCastExceptions from
  * `getSeq[Float]` driver fetches).
  *
  * If a failure here is a deliberate generator change, the named code
  * paths are what must adapt — the same treatment events.ts received.
  */
class SchemaContractSpec extends SparkSpec {

  private def typeOf(tab: String, colName: String): DataType =
    Schemas.table(spark, sf, tab).schema(colName).dataType

  test("events.ts arrives in a shape the normalizers handle") {
    val t = typeOf("events", "ts")
    assert(t == LongType || t == TimestampType || t == TimestampNTZType,
      s"events.ts is $t — extend Schemas.events and StreamQueries' " +
        "schema probe (the round-10 drift class)")
    // and the normalizer's OUTPUT is the single type all consumers see
    assert(Schemas.events(spark, sf).schema("ts").dataType == TimestampType)
  }

  test("embeddings.embedding is array<float> — the custom-expression contract") {
    assert(typeOf("embeddings", "embedding") ==
      ArrayType(FloatType, containsNull = true) ||
      typeOf("embeddings", "embedding") ==
        ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding is ${typeOf("embeddings", "embedding")} — " +
        "JlProject/SignLshSigs type checks and every getSeq[Float] " +
        "driver fetch (Similarity.queryVector, PQ codebooks, semantic-" +
        "dedup anchors) assume float32 elements; FloatVecDot alone " +
        "adapts to double")
  }

  test("key/label/measure columns keep their declared types") {
    // integer join/group keys — salting, bucketing, and the md5-derived
    // hash conventions (hash60(CAST(id AS VARCHAR))) all format these as
    // integral strings; a float key would change every derived hash
    assert(typeOf("documents", "doc_id") == LongType)
    assert(typeOf("embeddings", "vec_id") == LongType)
    assert(typeOf("events", "event_id") == LongType)
    assert(typeOf("events", "user_id") == LongType)
    assert(typeOf("orders", "o_orderkey") == LongType)
    assert(typeOf("lineitem", "l_orderkey") == LongType)
    // text columns drive tokenization + fingerprints
    assert(typeOf("documents", "text") == StringType)
    assert(typeOf("documents", "lang") == StringType)
    assert(typeOf("events", "event_type") == StringType)
    // double measures: the scaled-BIGINT money convention
    // (round(x*100)) assumes 2-decimal DOUBLES, not DECIMAL
    assert(typeOf("lineitem", "l_extendedprice") == DoubleType)
    assert(typeOf("lineitem", "l_quantity") == DoubleType)
    assert(typeOf("orders", "o_totalprice") == DoubleType)
    assert(typeOf("events", "value") == DoubleType)
  }

  test("date-like columns arrive as timestamp or date, not strings") {
    val ship = typeOf("lineitem", "l_shipdate")
    val ord = typeOf("orders", "o_orderdate")
    Seq("l_shipdate" -> ship, "o_orderdate" -> ord).foreach { case (n, t) =>
      assert(t == DateType || t == TimestampType || t == TimestampNTZType,
        s"$n is $t — date arithmetic and partition-pruning predicates " +
          "assume a temporal type")
    }
  }
}
