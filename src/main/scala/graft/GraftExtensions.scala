package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.functions.{FloatVecDot, IntersectCountSorted, JaccardSorted, JlProject, MinHashSig, ShingleHashes, SignLshSigs, SimHash60}

/** Session extensions: registers the engine's custom Catalyst expressions
  * (`simhash60`, `float_dot`, `minhash_sig`, `shingle_hashes`,
  * `jaccard_sorted`, `sign_lsh_sigs`) so SQL and `expr(...)` users
  * get them in any session built with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * No custom resolution rules or planner strategies are injected: SURVEY
  * §7.6's audit found none required for parity — every reference operator
  * maps to built-in plans; the custom surface is scalar expressions only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(SimHash60.descriptor)
    e.injectFunction(FloatVecDot.descriptor)
    e.injectFunction(MinHashSig.descriptor)
    e.injectFunction(ShingleHashes.descriptor)
    e.injectFunction(JaccardSorted.descriptor)
    e.injectFunction(SignLshSigs.descriptor)
    e.injectFunction(JlProject.descriptor)
    e.injectFunction(IntersectCountSorted.descriptor)
  }
}

object GraftExtensions {
  /** Imperative registration for an already-built session (what the query
    * layer calls — idempotent). */
  def register(spark: SparkSession): Unit = {
    SimHash60.register(spark)
    FloatVecDot.register(spark)
    MinHashSig.register(spark)
    ShingleHashes.register(spark)
    JaccardSorted.register(spark)
    SignLshSigs.register(spark)
    JlProject.register(spark)
    IntersectCountSorted.register(spark)
  }
}
