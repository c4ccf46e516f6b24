package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The reference's committed query 1 runs verbatim-shaped under the
  * SQLite bare-column compat rule (SURVEY.md §2.F Q5) and still fails
  * cleanly under plain ANSI resolution.
  */
class SqliteCompatSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private var saved: Option[SparkSession] = None

  private lazy val spark: SparkSession = {
    // getOrCreate returns any existing default session WITHOUT applying
    // extensions — clear it so a genuinely new SparkSession (sharing the
    // same SparkContext) is built with our resolution rule injected
    saved = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-sqlite-compat")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = {
    saved.foreach { orig =>
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
    super.afterAll()
  }

  private def registerComplaints(): Unit = {
    import spark.implicits._
    Seq(
      ("Bank of America", "Mortgage"),
      ("Bank of America", "Mortgage"),
      ("Bank of America", "Credit reporting"),
      ("Wells Fargo & Company", "Credit card"))
      .toDF("company", "product")
      .createOrReplaceTempView("complaints")
  }

  test("bare column resolves as any_value under the compat flag") {
    registerComplaints()
    spark.conf.set(SqliteBareColumnRule.ConfKey, "true")
    try {
      // the reference's query-1 shape (run_main_example.py:14-18):
      // `company` is selected but only `product` is grouped
      val out = spark.sql(
        """SELECT company, product, COUNT(product) AS number_of_complaints
           FROM complaints WHERE company = 'Bank of America'
           GROUP BY product ORDER BY product""").collect()
      assert(out.length == 2)
      assert(out.map(_.getString(1)).toSeq ==
        Seq("Credit reporting", "Mortgage"))
      assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
      // the bare column: arbitrary row of the group — here the filter
      // pins it to one value, as in the reference's own example
      assert(out.forall(_.getString(0) == "Bank of America"))
    } finally spark.conf.set(SqliteBareColumnRule.ConfKey, "false")
  }

  test("without the flag, ANSI resolution still rejects the bare column") {
    registerComplaints()
    val e = intercept[Exception] {
      spark.sql(
        """SELECT company, COUNT(product) FROM complaints
           GROUP BY product""").collect()
    }
    assert(e.getMessage.contains("MISSING_AGGREGATION")
      || e.getMessage.toLowerCase.contains("group"))
  }
}
