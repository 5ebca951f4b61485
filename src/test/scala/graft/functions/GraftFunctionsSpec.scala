package graft.functions

import graft.SparkSpec

/** SQL parity for graft's native expressions: registered functions are
  * callable from spark.sql and agree with the Column API. */
class GraftFunctionsSpec extends SparkSpec {

  test("rolling_hash is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val sqlVal = spark.sql("SELECT rolling_hash('hello world') AS h")
      .collect()(0).getLong(0)
    assert(sqlVal == RollingHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
  }

  test("GraftExtensions injects the same function set") {
    // the extensions class is instantiable and wires without error; actual
    // new-session injection is a deploy-time path (spark.sql.extensions)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
