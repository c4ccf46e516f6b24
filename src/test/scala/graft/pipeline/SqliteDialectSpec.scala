package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SqliteDialectSpec extends SparkSpec {
  import spark.implicits._

  test("globToLike wildcard and escape translation") {
    assert(SqliteDialect.globToLike("*green*") == "%green%")
    assert(SqliteDialect.globToLike("a?c") == "a_c")
    assert(SqliteDialect.globToLike("50%_off*") == "50\\%\\_off%")
    intercept[IllegalArgumentException] {
      SqliteDialect.globToLike("[abc]*")
    }
    // end-to-end: the translated pattern filters like GLOB would
    val df = Seq("forest green", "Forest Green", "green").toDF("s")
    val hits = df.filter(col("s").like(SqliteDialect.globToLike("*green*")))
      .as[String].collect().toSet
    assert(hits == Set("forest green", "green")) // case-sensitive
  }

  test("strftime directives map to Spark date_format patterns") {
    assert(SqliteDialect.strftimeToSpark("%Y-%m-%d") == "yyyy-MM-dd")
    assert(SqliteDialect.strftimeToSpark("%H:%M:%S") == "HH:mm:ss")
    intercept[IllegalArgumentException] {
      SqliteDialect.strftimeToSpark("%s") // epoch-seconds directive
    }
    val out = Seq(java.sql.Timestamp.valueOf("2024-03-05 07:08:09"))
      .toDF("ts")
      .select(date_format(col("ts"),
        SqliteDialect.strftimeToSpark("%Y/%m/%d %H:%M")).as("f"))
      .as[String].head()
    assert(out == "2024/03/05 07:08")
  }
}
