package graft

class FunctionsSpec extends SparkSpec {

  test("GraftExtensions.register exposes simhash64 and float_dot to SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('a', 'b', 'c')) AS h,
        |  float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d
        |""".stripMargin).head()
    assert(r.getLong(0) != 0L)
    assert(r.getDouble(1) == 4.0)
  }

  test("float_dot null/length semantics: null input -> null; short arrays -> min-length fold") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT float_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS n,
        |  float_dot(array(CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(9.0 AS FLOAT))) AS d
        |""".stripMargin).head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 6.0)
  }
}
