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

  test("rewrite: integrated GLOB / strftime / quoted-identifier translation") {
    val in = """SELECT "order id", strftime('%Y-%m', order_ts) AS ym
      FROM t WHERE name GLOB 'A*' AND note GLOB '?_x'"""
    val out = SqliteDialect.rewrite(in)
    assert(out.contains("`order id`"))
    assert(out.contains("date_format(order_ts, 'yyyy-MM') AS ym"))
    assert(out.contains("LIKE 'A%'"))
    assert(out.contains("LIKE '_\\\\_x'")) // _ wildcard + escaped literal _
    assert(!out.toLowerCase.contains("glob") && !out.toLowerCase.contains("strftime"))
  }

  test("rewrite: literals untouched, nested strftime, runnable end-to-end") {
    // 'GLOB' and 'strftime(' inside string literals must survive verbatim
    val lit = "SELECT 'uses GLOB and strftime(x) inside' AS s FROM t"
    assert(SqliteDialect.rewrite(lit) == lit)
    // nested call in the expression argument
    val nested = SqliteDialect.rewrite(
      "SELECT strftime('%Y', strftime('%Y-%m-%d', ts)) AS y FROM t")
    assert(nested ==
      "SELECT date_format(date_format(ts, 'yyyy-MM-dd'), 'yyyy') AS y FROM t")
    // end-to-end through spark.sql
    Seq(("Alpha", java.sql.Timestamp.valueOf("2024-03-05 07:08:09")))
      .toDF("name", "order_ts").createOrReplaceTempView("sqlite_dialect_t")
    val row = spark.sql(SqliteDialect.rewrite(
      """SELECT "name", strftime('%Y-%m', order_ts) AS ym
         FROM sqlite_dialect_t WHERE name GLOB 'Al*'"""))
      .collect()
    assert(row.length == 1 && row(0).getString(1) == "2024-03")
  }

  test("preflight: friendly errors for GROUPS frames and dialect edges") {
    val e = intercept[UnsupportedSqlFeatureException] {
      SqliteDialect.preflight(
        "SELECT sum(x) OVER (ORDER BY x GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t")
    }
    assert(e.getMessage.startsWith("unsupported: GROUPS window frames"))
    // GROUPS as an identifier must NOT trip the check
    SqliteDialect.preflight("SELECT groups FROM t WHERE groups > 3")
    // and not inside string literals
    SqliteDialect.preflight("SELECT 'GROUPS BETWEEN here' FROM t")
    // backslash-escaped quotes (Spark default parser) must not invert
    // the mask state: frame text inside a literal containing \' stays
    // masked (no false reject)…
    SqliteDialect.preflight(
      """SELECT 'it\'s fine: GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW' FROM t""")
    SqliteDialect.preflight(
      """SELECT "say \"GROUPS UNBOUNDED PRECEDING\"" FROM t""")
    // …and a REAL frame after such a literal is still detected (without
    // escape handling the inverted state would mask it)
    intercept[UnsupportedSqlFeatureException] {
      SqliteDialect.preflight(
        """SELECT 'a\'b' AS s, sum(x) OVER (ORDER BY x GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t""")
    }
    // round 7: GLOB classes and common strftime modifiers now TRANSLATE
    // (formerly friendly errors); only the genuinely unmappable
    // modifiers still error
    val m = intercept[UnsupportedSqlFeatureException] {
      SqliteDialect.rewrite("SELECT strftime('%Y', ts, 'localtime') FROM t")
    }
    assert(m.getMessage.startsWith("unsupported: strftime modifier 'localtime'"))
    // round 9: 'weekday N' and 'unixepoch' now TRANSLATE (no throw)
    SqliteDialect.rewrite("SELECT strftime('%Y', ts, 'weekday 1') FROM t")
    SqliteDialect.rewrite("SELECT strftime('%Y', v, 'unixepoch') FROM t")
    intercept[UnsupportedSqlFeatureException] {
      SqliteDialect.rewrite("SELECT strftime('%Y', ts, 'julianday') FROM t")
    }
    intercept[UnsupportedSqlFeatureException] {
      SqliteDialect.rewrite("SELECT strftime('%Y', ts, x) FROM t") // non-literal
    }
  }

  test("globToRegex: classes, negation, anchoring, metachar escaping") {
    assert(SqliteDialect.globToRegex("[12]-*") == "^[12]\\-.*$" ||
      SqliteDialect.globToRegex("[12]-*") == "^[12]-.*$")
    assert(SqliteDialect.globToRegex("a[^xy]?b.c") == "^a[^xy].b\\.c$")
    assert(SqliteDialect.globToRegex("[]x]z") == "^[\\]x]z$")
    assert(SqliteDialect.globToRegex("[a-f]*") == "^[a-f].*$")
    intercept[UnsupportedSqlFeatureException] {
      SqliteDialect.globToRegex("ab[cd")
    }
    // integrated: class pattern becomes RLIKE, plain pattern stays LIKE
    assert(SqliteDialect.rewrite("SELECT * FROM t WHERE s GLOB '[ab]*'")
      .contains("RLIKE '^[ab].*$'"))
    assert(SqliteDialect.rewrite("SELECT * FROM t WHERE s GLOB 'ab*'")
      .contains("LIKE 'ab%'"))
  }

  test("strftime modifiers: interval arithmetic, start-of, utc, left-to-right") {
    val out = SqliteDialect.rewrite(
      "SELECT strftime('%Y-%m', ts, '+1 month', 'start of month') FROM t")
    assert(out.contains(
      "date_format(date_trunc('MONTH', (ts + INTERVAL 1 MONTH)), 'yyyy-MM')"),
      out)
    val back = SqliteDialect.rewrite(
      "SELECT strftime('%Y', ts, '-3 days', 'utc') FROM t")
    assert(back.contains("date_format((ts - INTERVAL 3 DAY), 'yyyy')"), back)
    // modifier order matters (SQLite applies left to right): start of
    // month THEN +1 day lands on the 2nd; reversed lands on the 1st
    val ordered = SqliteDialect.rewrite(
      "SELECT strftime('%d', ts, 'start of month', '+1 day') FROM t")
    assert(ordered.contains(
      "date_format((date_trunc('MONTH', ts) + INTERVAL 1 DAY), 'dd')"),
      ordered)
  }

  test("strftime 'weekday N' / 'unixepoch' modifiers run with SQLite " +
      "semantics (round-9 residuals, formerly documented limits)") {
    // 2024-01-03 is a Wednesday: weekday 0 -> next Sunday 2024-01-07;
    // a date already on the target weekday stays put
    val rows = spark.sql(SqliteDialect.rewrite(
      "SELECT strftime('%Y-%m-%d', d, 'weekday 0') AS wd" +
        " FROM VALUES (TIMESTAMP '2024-01-03 10:30:00')," +
        " (TIMESTAMP '2024-01-07 00:00:00') AS t(d) ORDER BY d"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("2024-01-07", "2024-01-07"))
    // time of day is preserved across the jump (SQLite keeps it)
    val tod = spark.sql(SqliteDialect.rewrite(
      "SELECT strftime('%H', d, 'weekday 0') AS h" +
        " FROM VALUES (TIMESTAMP '2024-01-03 10:30:00') AS t(d)"))
      .collect().head.getString(0)
    assert(tod == "10")
    // unixepoch reinterprets a numeric value as epoch seconds (UTC
    // session): 1092941466 = 2004-08-19 (sqlite.org's own example)
    val ue = spark.sql(SqliteDialect.rewrite(
      "SELECT strftime('%Y-%m-%d', v, 'unixepoch') AS e" +
        " FROM VALUES (1092941466) AS t(v)"))
      .collect().head.getString(0)
    assert(ue == "2004-08-19")
  }

  test("rewriteExclude: SUM/COUNT semantics match the SQLite spec on a " +
      "crafted ties dataset, empty exclusion gives NULL/0") {
    val from = " FROM VALUES (1,10,'a'),(2,20,'a'),(3,30,'b') AS t(i,v,k) "
    val rows = spark.sql(SqliteDialect.rewrite(
      "SELECT i," +
        " sum(v) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS s1," +
        " sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP) AS s2," +
        " sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS s3," +
        " count(*) OVER (ORDER BY k EXCLUDE GROUP) AS c1," +
        " sum(v) OVER (ORDER BY k ROWS 1 PRECEDING EXCLUDE NO OTHERS) AS s4" +
        from + "ORDER BY i"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // hand-checked against DuckDB's native EXCLUDE on the same data
    assert(rows == Seq((1, 20L, 30L, 40L, 0L, 10L),
      (2, 40L, 30L, 50L, 0L, 30L), (3, 20L, 30L, 60L, 2L, 50L)))
    // exclusion that empties the frame: SUM -> NULL, COUNT -> 0
    val edge = spark.sql(SqliteDialect.rewrite(
      "SELECT i," +
        " sum(v) OVER (ORDER BY k RANGE BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE GROUP) AS es," +
        " count(v) OVER (ORDER BY k RANGE BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE GROUP) AS ec" +
        from + "WHERE i <= 2 ORDER BY i")).collect()
    assert(edge.forall(r => r.isNullAt(1) && r.getLong(2) == 0L))
  }

  test("rewriteExclude: MEDIAN splits the ROWS frame and interpolates exactly") {
    val from = " FROM VALUES (1,10),(2,20),(3,30),(4,40),(5,CAST(NULL AS INT)) AS t(i,v) "
    val rows = spark.sql(SqliteDialect.rewrite(
      "SELECT i," +
        " median(v) OVER (ORDER BY i ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS md," +
        " median(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS mr" +
        from + "ORDER BY i")).collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    // hand-checked against DuckDB's native EXCLUDE median on the same
    // data: NULL value skipped, even counts interpolate, empty -> NULL
    assert(rows == Seq((1, 25.0, null), (2, 30.0, 10.0),
      (3, 20.0, 15.0), (4, 25.0, 20.0), (5, 35.0, 25.0)))

    def err(sql: String): String =
      intercept[UnsupportedSqlFeatureException] {
        SqliteDialect.rewriteExclude(sql)
      }.getMessage
    // the split needs a statically known exclusion position and a
    // positionally splittable frame
    assert(err("SELECT median(v) OVER (ORDER BY k EXCLUDE GROUP) FROM t")
      .contains("MEDIAN"))
    assert(err("SELECT median(v) OVER (ORDER BY i RANGE BETWEEN 5 PRECEDING " +
      "AND CURRENT ROW EXCLUDE CURRENT ROW) FROM t")
      .contains("RANGE"))
    assert(err("SELECT median(v) OVER (ORDER BY i EXCLUDE CURRENT ROW) FROM t")
      .contains("default frame"))
    // other order statistics still refuse with the precise shape list
    assert(err("SELECT mode(v) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING " +
      "AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM t")
      .contains("self-join"))
  }

  test("rewriteExclude: friendly errors for the undecomposable shapes") {
    def err(sql: String): String =
      intercept[UnsupportedSqlFeatureException] {
        SqliteDialect.rewriteExclude(sql)
      }.getMessage
    assert(err("SELECT min(v) OVER (ORDER BY k EXCLUDE GROUP) FROM t")
      .contains("MIN"))
    assert(err("SELECT sum(DISTINCT v) OVER (ORDER BY k EXCLUDE TIES) FROM t")
      .contains("DISTINCT"))
    assert(err("SELECT sum(v) OVER (PARTITION BY p EXCLUDE GROUP) FROM t")
      .contains("ORDER BY"))
    assert(err("SELECT sum(v) OVER w FROM t WINDOW w AS (ORDER BY k EXCLUDE GROUP)")
      .contains("WINDOW"))
    // EXCLUDE on a GROUPS frame is left for rewriteGroups' own error
    val g = "SELECT sum(v) OVER (ORDER BY k GROUPS UNBOUNDED PRECEDING EXCLUDE GROUP) FROM t"
    assert(SqliteDialect.rewriteExclude(g) == g)
    assert(intercept[UnsupportedSqlFeatureException] {
      SqliteDialect.rewrite(g)
    }.getMessage.contains("GROUPS"))
  }

  test("rewriteExclude: containment guards reject frames that do not " +
      "provably contain the exclusion") {
    def err(sql: String): String =
      intercept[UnsupportedSqlFeatureException] {
        SqliteDialect.rewriteExclude(sql)
      }.getMessage
    // a frame whose bounds never span the current row: subtracting the
    // current row's value (or re-adding it, for TIES) would corrupt it
    assert(err("SELECT sum(v) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING " +
      "AND 1 PRECEDING EXCLUDE CURRENT ROW) FROM t")
      .contains("never contains"))
    assert(err("SELECT sum(v) OVER (ORDER BY i ROWS BETWEEN 1 FOLLOWING " +
      "AND 3 FOLLOWING EXCLUDE GROUP) FROM t")
      .contains("never contains"))
    assert(err("SELECT sum(v) OVER (ORDER BY i RANGE BETWEEN 5 PRECEDING " +
      "AND 2 PRECEDING EXCLUDE CURRENT ROW) FROM t")
      .contains("never contains"))
    // bounded ROWS frames with GROUP/TIES: tied peers can lie outside
    // the frame and ties are not statically detectable
    assert(err("SELECT sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED " +
      "PRECEDING AND CURRENT ROW EXCLUDE GROUP) FROM t")
      .contains("bounded ROWS"))
    assert(err("SELECT sum(v) OVER (ORDER BY k ROWS BETWEEN 2 PRECEDING " +
      "AND 2 FOLLOWING EXCLUDE TIES) FROM t")
      .contains("bounded ROWS"))
    // non-literal bounds cannot be verified statically
    assert(err("SELECT sum(v) OVER (ORDER BY i ROWS BETWEEN n PRECEDING " +
      "AND CURRENT ROW EXCLUDE CURRENT ROW) FROM t")
      .contains("non-literal"))
    // nested EXCLUDE windows would produce overlapping rewrite spans
    assert(err("SELECT sum(v + sum(v) OVER (ORDER BY k EXCLUDE GROUP)) " +
      "OVER (ORDER BY k EXCLUDE GROUP) FROM t")
      .contains("nested"))
    // still-allowed shapes: spanning ROWS with CURRENT ROW, whole-
    // partition ROWS with GROUP/TIES, zero-width literals, RANGE frames
    SqliteDialect.rewriteExclude("SELECT sum(v) OVER (ORDER BY i ROWS " +
      "BETWEEN 2 PRECEDING AND 0 FOLLOWING EXCLUDE CURRENT ROW) FROM t")
    SqliteDialect.rewriteExclude("SELECT sum(v) OVER (ORDER BY k ROWS " +
      "BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) FROM t")
    SqliteDialect.rewriteExclude("SELECT sum(v) OVER (ORDER BY k RANGE " +
      "BETWEEN 5 PRECEDING AND CURRENT ROW EXCLUDE GROUP) FROM t")
  }

  test("rewriteExclude: MIN/MAX split the ROWS frame around the current row") {
    val from = " FROM VALUES (1,30),(2,10),(3,20),(4,5) AS t(i,v) "
    val rows = spark.sql(SqliteDialect.rewrite(
      "SELECT i," +
        " min(v) OVER (ORDER BY i ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS mn," +
        " max(v) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) AS mxr," +
        " min(v) OVER (ORDER BY i ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS mnf," +
        " min(v) OVER (ORDER BY i ROWS BETWEEN CURRENT ROW AND CURRENT ROW EXCLUDE CURRENT ROW) AS mz" +
        from + "ORDER BY i")).collect()
    def cell(r: Int, c: Int): Option[Int] =
      if (rows(r).isNullAt(c)) None else Some(rows(r).getInt(c))
    // hand-checked against DuckDB's native EXCLUDE on the same data:
    // both-sides split, left-only (running max, NULL at the head),
    // right-only, and the emptied single-row frame
    assert((0 until 4).map(r => (cell(r, 1), cell(r, 2), cell(r, 3), cell(r, 4))) ==
      Seq((Some(10), None, Some(10), None),
        (Some(20), Some(30), Some(5), None),
        (Some(5), Some(30), Some(5), None),
        (Some(20), Some(30), None, None)))
  }

  test("rewriteExclude: MIN/MAX split-path rejections stay friendly") {
    def err(sql: String): String =
      intercept[UnsupportedSqlFeatureException] {
        SqliteDialect.rewriteExclude(sql)
      }.getMessage
    // RANGE bounds are value distances — no positional split
    assert(err("SELECT min(v) OVER (ORDER BY i RANGE BETWEEN 5 PRECEDING " +
      "AND CURRENT ROW EXCLUDE CURRENT ROW) FROM t")
      .contains("RANGE"))
    // the default frame is RANGE too
    assert(err("SELECT max(v) OVER (ORDER BY i EXCLUDE CURRENT ROW) FROM t")
      .contains("default frame"))
    // peer positions are runtime data: GROUP/TIES never split
    assert(err("SELECT max(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED " +
      "PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) FROM t")
      .contains("MAX"))
    // order statistics neither subtract nor merge
    // round 11: this shape graduated from refusal to the value-merge
    // split (see the MEDIAN test above) — it must rewrite cleanly now
    val md = SqliteDialect.rewriteExclude(
      "SELECT median(v) OVER (ORDER BY i ROWS BETWEEN 2 PRECEDING " +
        "AND 2 FOLLOWING EXCLUDE CURRENT ROW) FROM t")
    assert(md.contains("collect_list") && !md.toUpperCase.contains("EXCLUDE"))
  }

  test("rewriteGroups: whole-peer-group bounds become RANGE verbatim") {
    val out = SqliteDialect.rewriteGroups(
      "SELECT sum(x) OVER (ORDER BY k GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM t")
    assert(out ==
      "SELECT sum(x) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM t")
    // shorthand spelling, same rule; no subquery hoist for these shapes
    val sh = SqliteDialect.rewriteGroups(
      "SELECT sum(x) OVER (ORDER BY k GROUPS UNBOUNDED PRECEDING) FROM t")
    assert(sh.contains("RANGE UNBOUNDED PRECEDING") && !sh.contains("__graft"))
  }

  test("rewriteGroups: numeric bounds hoist a dense_rank subquery") {
    val out = SqliteDialect.rewriteGroups(
      """SELECT k, sum(x) OVER (PARTITION BY p ORDER BY k DESC GROUPS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS s
         FROM t WHERE x > 0 ORDER BY k""")
    assert(out.contains(
      "OVER (PARTITION BY p ORDER BY __graft_grank0 RANGE BETWEEN 1 PRECEDING AND 2 FOLLOWING)"))
    // the hoisted subquery inherits the plain relation's name so
    // table-qualified outer references keep resolving
    assert(out.contains(
      "FROM (SELECT *, DENSE_RANK() OVER (PARTITION BY p ORDER BY k DESC) AS __graft_grank0 FROM t WHERE x > 0) t "))
    assert(out.trim.endsWith("ORDER BY k"))
    // two windows over the same partition/order share one rank column
    val shared = SqliteDialect.rewriteGroups(
      """SELECT sum(x) OVER (ORDER BY k GROUPS 1 PRECEDING) AS a,
                min(x) OVER (ORDER BY k GROUPS 2 PRECEDING) AS b FROM t""")
    assert(shared.split("__graft_grank0", -1).length - 1 == 3
      && !shared.contains("__graft_grank1"))
  }

  test("rewriteGroups: numeric GROUPS emulation matches hand-ranked query") {
    // ties in the ORDER BY key make GROUPS differ from ROWS: frame
    // counts PEER GROUPS (g=10 and g=20 are adjacent groups)
    Seq((1, 10, 1.0), (2, 10, 2.0), (3, 20, 4.0), (4, 20, 8.0), (5, 30, 16.0))
      .toDF("id", "g", "x").createOrReplaceTempView("groups_t")
    val emulated = spark.sql(SqliteDialect.rewrite(
      """SELECT id, sum(x) OVER (ORDER BY g GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
         FROM groups_t ORDER BY id"""))
      .select("id", "s").as[(Int, Double)].collect().toSeq
    // expected: group 10 -> 1+2; group 20 -> 1+2+4+8; group 30 -> 4+8+16
    assert(emulated == Seq((1, 3.0), (2, 3.0), (3, 15.0), (4, 15.0), (5, 28.0)))
  }

  test("rewriteGroups: friendly errors for the untranslatable shapes") {
    def bad(sql: String): String =
      intercept[UnsupportedSqlFeatureException] {
        SqliteDialect.rewriteGroups(sql)
      }.getMessage
    assert(bad("SELECT sum(x) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE TIES) FROM t")
      .contains("EXCLUDE"))
    assert(bad("SELECT sum(x) OVER (ORDER BY k GROUPS BETWEEN n PRECEDING AND 1 FOLLOWING) FROM t")
      .contains("non-literal"))
    assert(bad("SELECT * FROM (SELECT sum(x) OVER (ORDER BY k GROUPS 1 PRECEDING) AS s FROM t) q")
      .contains("subquery"))
    assert(bad("SELECT sum(x) OVER (ORDER BY g GROUPS 1 PRECEDING) FROM t GROUP BY g")
      .contains("GROUP BY"))
    assert(bad("SELECT DISTINCT sum(x) OVER (ORDER BY k GROUPS 1 PRECEDING) FROM t")
      .contains("DISTINCT"))
    // a named base window would silently lose its inherited
    // partitioning in the numeric rebuild — rejected for every bound
    // shape (Spark's grammar cannot extend a named window anyway)
    assert(bad("SELECT sum(x) OVER (w ORDER BY k GROUPS 1 PRECEDING) FROM t WINDOW w AS (PARTITION BY p)")
      .contains("named base window"))
    assert(bad("SELECT sum(x) OVER (w ORDER BY k GROUPS UNBOUNDED PRECEDING) FROM t WINDOW w AS (PARTITION BY p)")
      .contains("named base window"))
    // a GROUPS frame declared inside the WINDOW clause itself is never
    // visited by the OVER scan — friendly error, not a Catalyst one
    assert(bad("SELECT sum(x) OVER w FROM t WINDOW w AS (ORDER BY k GROUPS 1 PRECEDING)")
      .contains("WINDOW clause"))
    // qualified outer references over a non-simple FROM cannot survive
    // the hoist
    assert(bad("SELECT a.x, sum(a.x) OVER (ORDER BY a.k GROUPS 1 PRECEDING) FROM t a JOIN u b ON a.id = b.id")
      .contains("table-qualified"))
  }

  test("rewriteGroups: qualified references survive the hoist for plain relations") {
    Seq((1, 10, 1.0), (2, 10, 2.0), (3, 20, 4.0), (4, 20, 8.0), (5, 30, 16.0))
      .toDF("id", "g", "x").createOrReplaceTempView("groups_q_t")
    val got = spark.sql(SqliteDialect.rewrite(
      """SELECT t.id, sum(t.x) OVER (ORDER BY t.g GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s
         FROM groups_q_t t ORDER BY t.id"""))
      .select("id", "s").as[(Int, Double)].collect().toSeq
    assert(got == Seq((1, 3.0), (2, 3.0), (3, 15.0), (4, 15.0), (5, 28.0)))
  }

  test("rewrite: SQLite literal lexing — trailing backslash and '' quotes") {
    // 'C:\' is a complete SQLite literal (backslash is ordinary there);
    // it must not corrupt later scans, and it must reach Spark as '\\'
    val out = SqliteDialect.rewrite(
      """SELECT x FROM t WHERE p = 'C:\' AND s GLOB 'a*'""")
    assert(out == """SELECT x FROM t WHERE p = 'C:\\' AND s LIKE 'a%'""")
    // '' is the SQLite quote escape; Spark would read adjacent literals
    // as concatenation ("its"), so it must transcode to \'
    assert(SqliteDialect.rewrite("SELECT 'it''s' AS s FROM t") ==
      """SELECT 'it\'s' AS s FROM t""")
    // end-to-end: the transcoded literal means what the SQLite one did
    val v = spark.sql(SqliteDialect.rewrite("SELECT 'it''s' AS s")).head.getString(0)
    assert(v == "it's")
  }

  test("review regressions: literal letter runs, groups column, glob identifier") {
    // consecutive literal letters quote as ONE run ('' between letters
    // would render a spurious apostrophe in Java datetime patterns)
    assert(SqliteDialect.strftimeToSpark("%Y ab") == "yyyy 'ab'")
    val out = Seq(java.sql.Timestamp.valueOf("2024-03-05 07:08:09")).toDF("ts")
      .select(date_format(col("ts"),
        SqliteDialect.strftimeToSpark("%d days")).as("f"))
      .as[String].head()
    assert(out == "05 days")
    // a column named groups in a plain BETWEEN predicate is NOT a frame
    SqliteDialect.preflight("SELECT * FROM t WHERE groups BETWEEN 1 AND 5")
    // …but every real frame spelling still is
    Seq("GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW",
      "GROUPS UNBOUNDED PRECEDING", "GROUPS CURRENT ROW").foreach { fr =>
      intercept[UnsupportedSqlFeatureException] {
        SqliteDialect.preflight(s"SELECT sum(x) OVER (ORDER BY x $fr) FROM t")
      }
    }
    // identifiers named/containing glob survive the rewrite untouched
    assert(SqliteDialect.rewrite("SELECT glob FROM t WHERE glob = 3") ==
      "SELECT glob FROM t WHERE glob = 3")
    assert(SqliteDialect.rewrite("""SELECT "my GLOB col" FROM t""") ==
      "SELECT `my GLOB col` FROM t")
    // and a real GLOB after a glob-ish identifier still rewrites
    assert(SqliteDialect.rewrite("SELECT glob FROM t WHERE s GLOB 'a*'") ==
      "SELECT glob FROM t WHERE s LIKE 'a%'")
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
