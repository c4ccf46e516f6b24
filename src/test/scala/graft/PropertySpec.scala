package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.operators.Combinators
import graft.sources.excel.XlsxWriter

/** Property-based invariants (SURVEY.md §5.2 tier 4): generated inputs,
  * structural laws that must hold for any data.
  */
class PropertySpec extends SparkSpec {

  // scalatestplus bridge is not on the offline classpath — drive
  // ScalaCheck generators directly, a few samples per property (each
  // sample round-trips through real Spark jobs)
  private def forAllSampled[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  private def forAllSampled2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 5)(
      body: (A, B) => Unit): Unit =
    forAllSampled(ga, n)(a => forAllSampled(gb, 1)(b => body(a, b)))

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.choose(-999999L, 999999L).map(_.toString),
    Gen.choose(-1e6, 1e6).map(d => f"$d%.3f"),
    Gen.const(""))

  private val tableGen: Gen[List[(String, String, String)]] =
    Gen.nonEmptyListOf(for {
      a <- cellGen; b <- cellGen; c <- cellGen
    } yield (a, b, c)).map(_.take(30))

  test("topKPerGroup: ≤ k rows per group, always including the group maximum") {
    import graft.functions.TextFunctions
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(for {
      g <- Gen.choose(0, 4)
      v <- Gen.choose(-100, 100)
    } yield (g, v)).map(_.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) })
    forAllSampled2(rowsGen, Gen.choose(1, 4)) { (rows, k) =>
      val df = rows.toDF("grp", "score", "id")
      val kept = TextFunctions.topKPerGroup(df, col("grp"), col("score"), col("id"), k)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      val perGroup = kept.groupBy(_._1)
      perGroup.foreach { case (g, got) =>
        val all = rows.filter(_._1 == g)
        assert(got.length == math.min(k, all.size), s"group $g kept ${got.length}")
        // the kept set is exactly the top-k by (score desc, id asc)
        val expected = all.sortBy(t => (-t._2, t._3)).take(k).toSet
        assert(got.toSet == expected, s"group $g kept wrong rows")
      }
      assert(perGroup.keySet == rows.map(_._1).toSet)
    }
  }

  test("chunkDocuments: full coverage, bounded chunks, exact reconstruction") {
    import graft.functions.TextFunctions
    import spark.implicits._
    val docGen = Gen.nonEmptyListOf(
      Gen.choose(1, 60).map(n => (1 to n).map(i => s"t$i").mkString(" ")))
      .map(_.zipWithIndex.map { case (txt, i) => (i.toLong, txt) })
    val cfgGen = for {
      w <- Gen.choose(1, 12)
      s <- Gen.choose(1, w)
    } yield (w, s)
    forAllSampled2(docGen, cfgGen) { case (docs, (w, s)) =>
      val out = TextFunctions.chunkDocuments(
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"), w, s)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      docs.foreach { case (id, txt) =>
        val toks = txt.split(" ").toSeq
        val chunks = out.filter(_._1 == id).sortBy(_._2)
        // dense 0-based ids, every chunk within [1, w] tokens
        assert(chunks.map(_._2).toSeq == chunks.indices.toSeq)
        assert(chunks.forall(c => c._4 >= 1 && c._4 <= w))
        // n_tokens is truthful and stride reconstruction is exact:
        // chunk i starts at token i*s and matches the source slice
        chunks.foreach { case (_, i, text, n) =>
          val expected = toks.slice(i * s, i * s + w)
          assert(text == expected.mkString(" "))
          assert(n == expected.length)
        }
        // coverage: the union of chunk spans is every token index
        val covered = chunks.flatMap { case (_, i, _, n) =>
          (i * s) until (i * s + n) }.toSet
        assert(covered == toks.indices.toSet,
          s"doc $id: uncovered tokens with w=$w s=$s n=${toks.size}")
      }
    }
  }

  test("sampleByStratum: kept set is exactly the hash-threshold predicate") {
    import graft.functions.{TextFunctions => TF}
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(for {
      s <- Gen.oneOf("a", "b", "c")
      id <- Gen.choose(0L, 100000L)
    } yield (s, id)).map(_.distinct)
    forAllSampled2(rowsGen, Gen.choose(0, 10)) { (rows, tenths) =>
      val rate = tenths / 10.0
      val df = rows.toDF("stratum", "id")
      val kept = TF.sampleByStratum(df, col("stratum"), col("id"),
          Seq("a" -> rate), defaultRate = 1.0 - rate)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // recompute the predicate independently via the same portable hash
      val hashes = df.select(col("stratum"), col("id"),
          pmod(TF.portableHash64(col("id").cast(StringType)), lit(10000L)).as("h"))
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
      val expected = rows.filter { case (s, id) =>
        val threshold = if (s == "a") (rate * 10000).round else ((1.0 - rate) * 10000).round
        hashes((s, id)) < threshold
      }.toSet
      assert(kept == expected)
    }
  }

  test("pivotStack: |stack| = Σ|parts| and provenance partitions the rows") {
    import spark.implicits._
    forAllSampled2(tableGen, tableGen) { (rowsA, rowsB) =>
      val a = rowsA.toDF("x", "y", "z")
      val b = rowsB.toDF("x", "y", "z")
      val stacked = Combinators.pivotStack(Seq("sa" -> a, "sb" -> b))
      assert(stacked.count() == rowsA.length + rowsB.length)
      assert(stacked.filter(col("index") === "sa").count() == rowsA.length)
      assert(stacked.columns.head == "index")
    }
  }

  test("positionalConcat: width = Σ widths + row_id; length = max length") {
    import spark.implicits._
    forAllSampled2(tableGen, tableGen) { (rowsA, rowsB) =>
      val a = rowsA.map(t => (t._1, t._2)).toDF("x", "y")
      val b = rowsB.map(_._1).toDF("v")
      val out = Combinators.positionalConcat(Seq(
        ("l", a, Seq(col("x"), col("y"))), ("r", b, Seq(col("v")))))
      assert(out.columns.length == 2 + 1 + 1)
      assert(out.count() == math.max(rowsA.length, rowsB.length))
    }
  }

  test("prefixColumns is a bijection on column names") {
    import spark.implicits._
    forAllSampled(Gen.nonEmptyListOf(Gen.alphaStr.map(_.take(6)).suchThat(_.nonEmpty))
        .map(_.distinct.take(5))) { names =>
      if (names.nonEmpty) {
        val df = spark.range(1).toDF(names.head)
          .select(names.map(n => lit(1).as(n)): _*)
        val out = Combinators.prefixColumns(df, "p.x")
        assert(out.columns.toSeq == names.map(n => s"p.x_$n"))
      }
    }
  }

  test("xlsx write→read round-trip is identity on string tables") {
    import spark.implicits._
    forAllSampled(tableGen) { rows =>
      // strings only: numeric-looking cells would legitimately re-infer
      val data = rows.map(t => (s"s${t._1}", s"s${t._2}", s"s${t._3}"))
      val df = data.toDF("c1", "c2", "c3")
      val path = java.nio.file.Files
        .createTempDirectory("prop-xlsx").resolve("t.xlsx").toString
      XlsxWriter.write(path, Seq("Sheet1" -> df))
      val back = spark.read.format("excel").load(path)
      assert(back.schema.fields.forall(_.dataType == StringType))
      assert(back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet == data.toSet)
      assert(back.count() == data.length)
    }
  }

  test("multi-file excel scan: directory load = union of per-file loads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("glob-xlsx").toString
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b = Seq((3L, "c")).toDF("k", "v")
    XlsxWriter.write(s"$dir/part1.xlsx", Seq("Sheet1" -> a))
    XlsxWriter.write(s"$dir/part2.xlsx", Seq("Sheet1" -> b))
    val all = spark.read.format("excel").load(dir)
    assert(all.rdd.getNumPartitions == 2, "one partition per workbook")
    assert(all.orderBy("k").collect() ===
      Array(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    val glob = spark.read.format("excel").load(s"$dir/part*.xlsx")
    assert(glob.count() == 3)
  }

  test("globToLike preserves GLOB match semantics on random pattern/string pairs") {
    import graft.pipeline.SqliteDialect
    // reference GLOB matcher (SQLite semantics, no char classes):
    // case-sensitive, * = any run, ? = any single char
    def globMatch(p: String, s: String): Boolean = {
      def go(pi: Int, si: Int): Boolean =
        if (pi == p.length) si == s.length
        else p.charAt(pi) match {
          case '*' => (si to s.length).exists(j => go(pi + 1, j))
          case '?' => si < s.length && go(pi + 1, si + 1)
          case c => si < s.length && s.charAt(si) == c && go(pi + 1, si + 1)
        }
      go(0, 0)
    }
    val patChar = Gen.oneOf('a', 'b', '%', '_', '*', '?', '\\', '.')
    val patGen = Gen.listOfN(5, patChar).map(_.mkString)
    val strGen = Gen.listOfN(6, Gen.oneOf('a', 'b', '%', '_', '\\', '.', '*'))
      .map(_.mkString)
    val cases = Iterator.continually(
        for { p <- patGen; ss <- Gen.listOfN(8, strGen) } yield (p, ss))
      .flatMap(_.sample).take(40).toSeq
    // evaluate all pairs through real Spark LIKE in ONE job
    import spark.implicits._
    val rows = for { (p, ss) <- cases; s <- ss } yield (p, s)
    val df = rows.toDF("p", "s")
    val got = cases.zipWithIndex.flatMap { case ((p, ss), _) =>
      val like = SqliteDialect.globToLike(p)
      df.filter(col("p") === p)
        .select(col("s"), col("s").like(like).as("m")).collect()
        .map(r => (p, r.getString(0), r.getBoolean(1)))
    }
    got.foreach { case (p, s, m) =>
      assert(m == globMatch(p, s),
        s"GLOB '$p' vs '$s': Spark LIKE said $m, reference says ${globMatch(p, s)}")
    }
    // rewrite is idempotent once GLOB/strftime are gone
    val sql = "SELECT x FROM t WHERE s GLOB 'a*b' AND strftime('%Y', ts) = '2024'"
    val once = SqliteDialect.rewrite(sql)
    assert(SqliteDialect.rewrite(once) == once)
  }

  test("gopherRepetition matches a brute-force reference on adversarial text") {
    import graft.functions.TextFunctions
    import spark.implicits._
    // independent plain-Scala mirror of the documented metric spec
    def brute(text: String): Seq[Double] = {
      def cp(s: String) = s.codePointCount(0, s.length).toLong
      val nChars = cp(text)
      val lines = text.split(java.util.regex.Pattern.quote("\n"), -1)
      val lineCounts = lines.groupBy(identity).view.mapValues(_.length.toLong)
      val dupLineFrac =
        lineCounts.values.map(_ - 1).sum.toDouble / lines.length
      val lineChars = lines.map(cp).sum
      val dupLineCharFrac =
        if (lineChars > 0)
          lineCounts.collect { case (l, c) if c > 1 => (c - 1) * cp(l) }
            .sum.toDouble / lineChars
        else 0.0
      val words = text.replaceAll("^\\s+|\\s+$", "").split("\\s+", -1)
      def grams(n: Int): Map[String, Long] =
        if (words.length < n) Map.empty
        else words.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).view.mapValues(_.length.toLong).toMap
      def topFrac(n: Int): Double = {
        val g = grams(n)
        if (g.isEmpty || nChars == 0) 0.0
        else {
          // max count, ties to the UTF8-byte-smallest gram
          val best = g.toSeq.minBy { case (k, c) =>
            (-c, org.apache.spark.unsafe.types.UTF8String.fromString(k))
          }
          best._2 * cp(best._1).toDouble / nChars
        }
      }
      def dupFrac(n: Int): Double =
        if (nChars == 0) 0.0
        else grams(n).collect { case (k, c) if c > 1 => (c - 1) * cp(k) }
          .sum.toDouble / nChars
      Seq(dupLineFrac, dupLineCharFrac) ++
        Seq(2, 3, 4).map(topFrac) ++ (5 to 10).map(dupFrac)
    }
    val tok = Gen.oneOf("a", "bb", "ccc", "a", "…") // repeats + multibyte
    val sep = Gen.oneOf(" ", "  ", "\n", " \n ", "\t")
    val docGen = Gen.choose(0, 30).flatMap { n =>
      Gen.listOfN(n, Gen.zip(tok, sep)).map(
        _.map { case (t, s) => t + s }.mkString)
    }
    forAllSampled(docGen, n = 10) { text =>
      val row = TextFunctions.gopherRepetition(
          Seq((1L, text)).toDF("doc_id", "text"), col("doc_id"), col("text"))
        .collect().head
      val got = (1 to 11).map(row.getDouble)
      val want = brute(text)
      assert(got == want, s"text=${text.replace("\n", "\\n")}\n got=$got\nwant=$want")
    }
  }

  test("dedupLines matches a brute-force reference on random corpora") {
    import graft.functions.Dedup
    import spark.implicits._
    // keep-first per distinct line: min (doc, position) survives,
    // everything later — same doc or any other — is removed
    def brute(docs: Seq[(Long, String)]): Map[Long, String] = {
      val occ = for {
        (id, t) <- docs
        (line, i) <- t.split("\n", -1).zipWithIndex
      } yield (line, (id, i))
      val keeper = occ.groupBy(_._1).map { case (l, os) =>
        l -> os.map(_._2).min
      }
      docs.map { case (id, t) =>
        id -> t.split("\n", -1).zipWithIndex
          .collect { case (l, i) if keeper(l) == (id, i) => l }
          .mkString("\n")
      }.toMap
    }
    val lineGen = Gen.oneOf("header", "footer", "alpha beta", "x", "y z", "")
    val docGen = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, lineGen).map(_.mkString("\n")))
    val corpusGen = for {
      n <- Gen.choose(2, 6)
      texts <- Gen.listOfN(n, docGen)
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAllSampled(corpusGen, n = 6) { docs =>
      val got = Dedup.dedupLines(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = brute(docs)
      assert(got == want, s"docs=$docs\n got=$got\nwant=$want")
    }
  }

  test("removeRepeatedSpans matches a brute-force reference on random corpora") {
    import graft.functions.Dedup
    import spark.implicits._
    // plain-Scala mirror of the operator's spec: every duplicated
    // k-window keeps its min-(doc,pos) occurrence, later occurrences'
    // spans union into a covered set, tokens outside it survive
    def brute(docs: Seq[(Long, String)], k: Int): Map[Long, String] = {
      val words = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val occ = for {
        (id, w) <- words.toSeq
        p <- 1 to math.max(0, w.length - k + 1)
      } yield (w.slice(p - 1, p - 1 + k).mkString(" "), (id, p))
      val covered = occ.groupBy(_._1).values.filter(_.size > 1).flatMap { os =>
        os.map(_._2).sorted.drop(1)
          .flatMap { case (id, p) => (p until p + k).map(id -> _) }
      }.toSet
      docs.map { case (id, _) =>
        id -> words(id).zipWithIndex
          .collect { case (tok, i) if !covered((id, i + 1)) => tok }
          .mkString(" ")
      }.toMap
    }
    // tiny vocabulary forces heavy window collisions (within-doc and
    // cross-doc), exercising overlap unions and full-doc wipeouts
    val vocab = Vector("a", "b", "c", "d")
    val docGen = Gen.choose(0, 22).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = for {
      n <- Gen.choose(2, 6)
      texts <- Gen.listOfN(n, docGen)
      k <- Gen.choose(2, 4)
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, k)
    forAllSampled(corpusGen, n = 6) { case (docs, k) =>
      val got = Dedup.removeRepeatedSpans(
          docs.toDF("doc_id", "text"), col("doc_id"), col("text"), k)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = brute(docs, k)
      assert(got == want,
        s"k=$k docs=$docs\n got=$got\nwant=$want")
    }
  }

  test("canonicalizeUrl is idempotent on generated URLs") {
    import graft.functions.TextFunctions
    import spark.implicits._
    // a canonical form that isn't a fixed point would split dup groups
    // between first-pass and re-canonicalized pipelines
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "ftp")
      www <- Gen.oneOf("", "www.", "WWW.", "www.www.", "WWW.www.")
      host <- Gen.oneOf("Example.COM", "x.io", "a.b.ORG")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/P/q", "/a//B/", "/p/")
      query <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x&z=9",
        "?fbclid=1", "?gclid=2&utm_medium=m&k=v")
      frag <- Gen.oneOf("", "#frag", "#a/b?c")
    } yield s"$scheme://$www$host$port$path$query$frag"
    forAllSampled(Gen.listOfN(24, urlGen), n = 3) { urls =>
      val once = urls.toDF("u")
        .select(TextFunctions.canonicalizeUrl(col("u")).as("c"))
      val twice = once
        .select(TextFunctions.canonicalizeUrl(col("c")).as("c"))
      val (a, b) = (once.collect().map(_.getString(0)).toSeq,
        twice.collect().map(_.getString(0)).toSeq)
      assert(a == b, s"not a fixed point:\n${a.zip(b).filter(p => p._1 != p._2)}")
    }
  }
}
