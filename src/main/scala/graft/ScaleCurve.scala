package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity, TextFunctions}

/** Scaling-curve harness: times the banded/LSH operators at several corpus
  * sizes so SCALE.md's "near-linear" claims are measured, not argued.
  *
  * Two modes:
  *
  * `gen <srcDir> <outDir> <replicas>` — writes a `replicas`× copy of
  * `documents.parquet` / `embeddings.parquet`. Replicas are built to keep
  * the corpus a LARGER SAMPLE OF THE SAME DISTRIBUTION rather than a
  * duplicate explosion: every word in replica r>0 gets a replica tag
  * appended (shingle sets disjoint across replicas ⇒ the planted near-dup
  * structure repeats per replica, cross-replica similarity is zero, so
  * pair counts scale linearly with corpus size); embeddings are rotated
  * by a replica-dependent offset (rotation preserves all pairwise dot
  * products within a replica, cross-replica cosines are near zero). Ids
  * are `id*replicas + r`, which preserves d06's `% 50` plant rate and
  * e02's `< 10` query count exactly across scales.
  *
  * `time <out.json> <label=dir> [label=dir ...]` — runs each curve query
  * at each dir (noop-executed: full plan, no sink IO), `n` samples each,
  * and prints one JSON document with per-sample times, minima, and input
  * row counts. Exponent fitting happens outside (log t vs log rows).
  *
  * The curve set is the gate configs for d03/d04/d06/t04/e02, the
  * PRODUCTION 56-bit config for d07 (the 16-bit gate config is
  * deliberately recall-heavy — 4-bit chunks give 16 buckets/band, which
  * is quadratic by design and documented as gate-only), and guard-enabled
  * variants of d03/d04 so the round-4 hot-bucket/stop-shingle caps are
  * exercised at 10×.
  */
object ScaleCurve {

  private def docs(s: SparkSession, dir: String) = Tables.df(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = Tables.df(s, dir, "embeddings")

  /** Queries measured for the curve. Shapes mirror SparkEntry gates
    * (minus the oracle-only orderBy — sorting tiny outputs is noise).
    */
  val curve: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "d03_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(
        Dedup.shingleRows(docs(s, dir), col("doc_id"), col("text")), 0.8)),
    "d03_guarded" -> ((s, dir) =>
      Dedup.jaccardPairs(
        Dedup.shingleRows(docs(s, dir), col("doc_id"), col("text")), 0.8,
        maxShingleDocFreq = 50)),
    "d04_minhash_lsh" -> ((s, dir) => {
      val sh = Dedup.shingleRows(docs(s, dir), col("doc_id"), col("text"))
      Dedup.jaccardForPairs(sh,
        Dedup.lshCandidatePairs(Dedup.minhashSignatures(sh, 8), 4, 2), 0.8)
    }),
    "d04_guarded" -> ((s, dir) => {
      val sh = Dedup.shingleRows(docs(s, dir), col("doc_id"), col("text"))
      Dedup.jaccardForPairs(sh,
        Dedup.lshCandidatePairs(Dedup.minhashSignatures(sh, 8), 4, 2,
          maxBucketSize = 100), 0.8)
    }),
    "d06_embedding_neardup" -> ((s, dir) => {
      val e = emb(s, dir)
      val planted = e.filter(col("vec_id") % 50 === 0)
        .withColumn("vec_id", col("vec_id") + 100000)
      Similarity.cosineNearDupPairs(
        e.unionByName(planted), 0.95, planes = 8, dims = 64, tables = 4)
    }),
    "d07_simhash56" -> ((s, dir) =>
      Dedup.simhashPairs(
        Dedup.simhash(docs(s, dir), col("doc_id"), col("text"), 56),
        bits = 56, maxHamming = 3)),
    "t04_winnowing" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextFunctions.gramHashes(col("text"), 5).as("__g"))
        .select(col("doc_id"),
          explode(TextFunctions.winnowFromGrams(col("__g"), 4)).as("fp"))),
    "e02_knn_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnLsh(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        5, planes = 8, dims = 64)
    }))

  def generate(spark: SparkSession, srcDir: String, outDir: String,
      replicas: Int): Unit = {
    val d = docs(spark, srcDir)
    val e = emb(spark, srcDir)
    val dims = 64
    val docRep = (0 until replicas).map { r =>
      val text =
        if (r == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1x" + r)
      d.select(
        (col("doc_id") * replicas + lit(r)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
    val embRep = (0 until replicas).map { r =>
      val rot = (r * 17) % dims
      val vec =
        if (rot == 0) col("embedding")
        else concat(
          slice(col("embedding"), rot + 1, dims - rot),
          slice(col("embedding"), 1, rot))
      e.select(
        (col("vec_id") * replicas + lit(r)).as("vec_id"),
        vec.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
    docRep.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embRep.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[scalecurve] wrote ${replicas}x of $srcDir to $outDir")
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def time(spark: SparkSession, outFile: String,
      dirs: Seq[(String, String)], samples: Int): Unit = {
    val results = dirs.map { case (label, dir) =>
      val nDocs = docs(spark, dir).count()
      val nEmb = emb(spark, dir).count()
      val perQuery = curve.map { case (qname, fn) =>
        val times = (1 to samples).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scalecurve] $label $qname min=${times.min}%.2fs " +
          times.map(t => f"$t%.2f").mkString("[", ",", "]"))
        qname -> times
      }
      (label, dir, nDocs, nEmb, perQuery)
    }
    val json = results.map { case (label, dir, nDocs, nEmb, perQuery) =>
      val qs = perQuery.map { case (q, ts) =>
        s""""${esc(q)}":{"min":${ts.min},"samples":[${ts.mkString(",")}]}"""
      }.mkString(",")
      s""""${esc(label)}":{"dir":"${esc(dir)}","docs":$nDocs,"embeddings":$nEmb,"queries":{$qs}}"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(s"[scalecurve] wrote $outFile")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "gen" :: src :: out :: reps :: Nil =>
        generate(spark, src, out, reps.toInt)
      case "time" :: out :: rest if rest.nonEmpty =>
        val dirs = rest.map { a =>
          val Array(l, d) = a.split("=", 2); (l, d)
        }
        time(spark, out, dirs, samples = sys.env.getOrElse("SPARK_GRAFT_SAMPLES", "3").toInt)
      case _ =>
        System.err.println(
          "usage: ScaleCurve gen <srcDir> <outDir> <replicas> | " +
            "ScaleCurve time <out.json> <label=dir> [label=dir ...]")
        sys.exit(2)
    }
    spark.stop()
  }
}
