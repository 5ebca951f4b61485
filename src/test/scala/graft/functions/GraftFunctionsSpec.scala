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

  test("cosine_sim matches the composed higher-order-function form exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1.0, 2.0, -3.0), Array(0.5, -1.5, 2.0)))
      .toDF("a", "b")
    val native = df.select(GraftFunctions.cosine_sim(col("a"), col("b"))).collect()(0).getDouble(0)
    val composed = df.select(
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x) /
        (sqrt(aggregate(transform(col("a"), x => x * x), lit(0.0), (s, x) => s + x)) *
          sqrt(aggregate(transform(col("b"), x => x * x), lit(0.0), (s, x) => s + x))))
    ).collect()(0).getDouble(0)
    assert(native == composed) // bit-identical, same accumulation order
    GraftFunctions.register(spark)
    val sqlVal = spark.sql(
      "SELECT cosine_sim(array(1.0D,2.0D,-3.0D), array(0.5D,-1.5D,2.0D))")
      .collect()(0).getDouble(0)
    assert(sqlVal == native)
  }

  test("GraftExtensions injects the same function set") {
    // the extensions class is instantiable and wires without error; actual
    // new-session injection is a deploy-time path (spark.sql.extensions)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
