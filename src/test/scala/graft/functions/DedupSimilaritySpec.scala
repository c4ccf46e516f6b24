package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.df(spark, sf(), "documents").cache()
  private lazy val emb = Tables.df(spark, sf(), "embeddings").cache()

  test("exact dedup keeps one row per key, min id wins") {
    val df = Seq((1L, "same"), (3L, "same"), (2L, "other")).toDF("id", "txt")
    val out = Dedup.dedupExact(df, col("txt"), col("id"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("exact dedup is a partial-aggregatable min, never a window sort") {
    val df = Seq((1L, "same"), (3L, "same"), (2L, "other")).toDF("id", "txt")
    val out = Dedup.dedupExact(df, col("txt"), col("id"))
    val plan = out.queryExecution.executedPlan.toString
    // the skew argument: a hot key must map-side combine, not
    // concentrate its whole group into one task's window sort
    assert(!plan.contains("Window"), s"window sort in dedupExact plan:\n$plan")
    assert(plan.contains("partial_min"),
      s"expected map-side partial min in dedupExact plan:\n$plan")
    // schema passes through unchanged
    assert(out.columns.toSeq == Seq("id", "txt"))
  }

  test("duplicate groups surface planted copies") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "txt")
    val g = Dedup.duplicateGroups(df, col("txt"), col("id")).collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("keep_id") == 1L && g(0).getAs[Long]("n_copies") == 2L)
  }

  test("native distinct shingles equal array_distinct(wordShingles) exactly") {
    import graft.functions.expressions.DistinctWordShingles
    val base = docs.select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (900001L, "one two"), // below n=3 words: empty
        (900002L, "a b c a b c a b c"), // repeats: dedup matters
        (900003L, "x  y   z w"), // multi-space: split artifacts preserved
        (900004L, "héllo wörld 你好 one two")) // multi-byte
        .toDF("doc_id", "text"))
    for (n <- Seq(2, 3)) {
      val bad = base.select(
          array_distinct(TextFunctions.wordShingles(
            TextFunctions.words(col("text")), n)).as("hof"),
          DistinctWordShingles(TextFunctions.words(col("text")), n).as("nat"))
        .filter(not(col("hof") <=> col("nat"))).count()
      assert(bad == 0L, s"native/HOF shingle divergence at n=$n")
    }
  }

  test("minhash+LSH candidates achieve full recall on high-jaccard pairs") {
    val sh = Dedup.shingleRows(docs, col("doc_id"), col("text")).cache()
    val truth = Dedup.jaccardPairs(sh, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    val cands = Dedup.lshCandidatePairs(Dedup.minhashSignatures(sh, 8), 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // with jaccard >= 0.8 and 4 bands x 2 rows, P(miss) < 1e-4 per pair
    assert(truth.subsetOf(cands),
      s"LSH missed ${truth.diff(cands).size} of ${truth.size} true pairs")
    // and it must prune: candidates far fewer than all n^2/2 pairs
    val n = docs.count()
    assert(cands.size < n * (n - 1) / 8,
      s"LSH candidate set ${cands.size} is not selective for n=$n")
  }

  test("hot-bucket guards bound a boilerplate-heavy corpus, keep true dups") {
    // adversarial corpus: 120 docs all sharing a 12-word boilerplate
    // header (every header shingle has df=120), each with unique tail
    // content; docs 0 and 1 additionally share an identical unique tail
    // (the one TRUE near-dup pair)
    val boiler = (0 until 12).map(i => s"legal$i").mkString(" ")
    val corpus = (0 until 120).map { i =>
      val tail = if (i <= 1) "identical unique payload body text here"
        else s"unique$i payload${i}a payload${i}b payload${i}c payload${i}d payload${i}e"
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")
    val sh = Dedup.shingleRows(corpus, col("doc_id"), col("text")).cache()

    // unguarded: boilerplate makes every doc pair share shingles — the
    // inverted-index join goes quadratic (this is the failure mode)
    val unguardedJoined = Dedup.jaccardPairs(sh, 0.0).count()
    assert(unguardedJoined > 5000, s"corpus not adversarial enough: $unguardedJoined")

    // stop-shingle guard: df cap kills the boilerplate shingles, the
    // joined pair space collapses to the genuinely-overlapping pairs,
    // and the true dup still scores 1.0 on the pruned space
    val guarded = Dedup.jaccardPairs(sh, 0.0, maxShingleDocFreq = 10).cache()
    assert(guarded.count() < 50, "stop-shingle cap failed to bound the join")
    val dup = guarded.filter(col("id_a") === 0 && col("id_b") === 1)
      .select("jaccard").as[Double].collect()
    assert(dup.length == 1 && dup(0) == 1.0, "true near-dup lost by the guard")
    // accounting: exactly the boilerplate shingles are reported hot
    val hot = Dedup.hotShingles(sh, 10).collect()
    assert(hot.nonEmpty && hot.forall(_.getAs[Long]("doc_freq") == 120L))
    // containment shares the guard
    assert(Dedup.containmentPairs(sh, 0.0, maxShingleDocFreq = 10).count() < 50)

    // LSH bucket cap: boilerplate-dominated minhashes collapse docs into
    // hot buckets; the cap bounds candidates and the drop is accounted
    val sigs = Dedup.minhashSignatures(sh, 8).cache()
    val uncapped = Dedup.lshCandidatePairs(sigs, 4, 2).count()
    val capped = Dedup.lshCandidatePairs(sigs, 4, 2, maxBucketSize = 10).count()
    val dropped = Dedup.lshDroppedBuckets(sigs, 4, 2, maxBucketSize = 10)
      .collect()
    // every candidate now comes from a bucket of <= 10 members: hard
    // algebraic ceiling of 4 bands x (120/1) buckets x C(10,2)... use
    // the direct bound: capped <= bands * n/2 * (cap-1)
    assert(capped <= 4L * 120 / 2 * 9, s"bucket cap not enforced: $capped")
    assert(capped < uncapped, s"cap removed nothing ($capped vs $uncapped)")
    assert(dropped.nonEmpty && dropped.forall(_.getAs[Long]("bucket_size") > 10),
      "dropped-bucket accounting empty or wrong")
  }

  test("simhash: near-dup pairs sit at small hamming distance") {
    val sig = Dedup.simhash(docs, col("doc_id"), col("text"), 16).cache()
    val sh = Dedup.shingleRows(docs, col("doc_id"), col("text"))
    val nearDups = Dedup.jaccardPairs(sh, 0.8)
    val joined = nearDups
      .join(sig.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("simhash", "sig_a"), "id_a")
      .join(sig.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("simhash", "sig_b"), "id_b")
      .select(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .as[Int].collect()
    assert(joined.nonEmpty)
    // 0.98 jaccard docs share nearly all words -> near-identical signatures
    assert(joined.forall(_ <= 4),
      s"near-dup hamming distances too large: ${joined.mkString(",")}")
  }

  test("simhashPairs: banded candidates reproduce the all-pairs result, no cartesian") {
    val sig = Dedup.simhash(docs, col("doc_id"), col("text"), 16).cache()
    val a = sig.select(col("doc_id").as("id_a"), col("simhash").as("sa"))
    val b = sig.select(col("doc_id").as("id_b"), col("simhash").as("sb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = Dedup.simhashPairs(sig, 16, 3)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "banded simhash pair plan must not contain a cartesian product")
    val got = banded.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // pigeonhole banding is COMPLETE for hamming <= maxHamming: identical sets
    assert(got == brute, s"banded ${got.size} vs brute ${brute.size}")
  }

  test("autoSimhashBits widens chunks with the corpus, capped at 56 bits") {
    // occupancy-constant widths at maxHamming=3 (4 bands)
    assert(Dedup.autoSimhashBits(2048, 3) == 4 * 6)
    assert(Dedup.autoSimhashBits(2048 * 16, 3) == 4 * 10)
    // tiny corpora floor at width 4; huge corpora cap at 56/bands
    assert(Dedup.autoSimhashBits(1, 3) == 4 * 4)
    assert(Dedup.autoSimhashBits(Long.MaxValue / 2, 3) == 4 * 14)
    // banding with an autoSimhashBits signature still reproduces the
    // brute-force pair set (the completeness contract is width-free)
    val n = docs.count()
    val bits = Dedup.autoSimhashBits(n, 3, targetOccupancy = 8)
    val sig = Dedup.simhash(docs, col("doc_id"), col("text"), bits)
    val banded = Dedup.simhashPairs(sig, bits, 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
  }

  test("simhash: native zero-shuffle projection equals the relational form") {
    // the relational formulation the oracles mirror: explode words →
    // distinct → per-bit ±1 vote sums → sign fold
    def relational(df: org.apache.spark.sql.DataFrame, bits: Int) = {
      val wordRows = df.select(col("doc_id"),
          explode(TextFunctions.words(col("text"))).as("w"))
        .distinct()
        .withColumn("h", TextFunctions.portableHash64(col("w")))
      val bitVotes = (0 until bits).map { j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"b$j")
      }
      val sums = wordRows.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
      val sig = (0 until bits).map { j =>
        when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)
      }.reduce(_ + _)
      sums.select(col("doc_id"), sig.as("simhash"))
    }
    val base = docs.select(col("doc_id"), col("text"))
    for (bits <- Seq(16, 56)) {
      val nat = Dedup.simhash(base, col("doc_id"), col("text"), bits)
        .as[(Long, Long)].collect().toMap
      val rel = relational(base, bits).as[(Long, Long)].collect().toMap
      assert(nat == rel, s"native/relational simhash divergence at $bits bits")
    }
    // empty text tokenizes to [""] (split semantics) and gets the ""
    // word's signature in BOTH forms; null text yields no word array
    // and is dropped in both
    val edge = Seq((1L, "some words here"), (2L, ""),
        (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Dedup.simhash(edge, col("doc_id"), col("text"), 16)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
    // and the signature stage is a pure projection: zero Exchange
    val plan = Dedup.simhash(base, col("doc_id"), col("text"), 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"native simhash must not shuffle:\n$plan")
  }

  test("simhashPairs: 64-bit-wide band (maxHamming=0) buckets exactly, not all-to-one") {
    // width-64 band: (1L << 64) is a mod-64 shift in Scala, so a naive
    // mask computes 0 and collapses every signature into one bucket
    val sigs = Seq((1L, 5L), (2L, 5L), (3L, Long.MinValue), (4L, -1L))
      .toDF("doc_id", "simhash")
    val got = Dedup.simhashPairs(sigs, bits = 64, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // only the exact-duplicate signature pair
  }

  test("cosineNearDupPairs: full recall on planted duplicates, no cartesian") {
    // plant exact duplicates (p = 1 per plane -> same bucket in every table,
    // so LSH recall is deterministic for them)
    val base = emb.select("vec_id", "embedding")
    val planted = base.limit(5)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(planted)
    val out = Similarity.cosineNearDupPairs(corpus, 0.999, planes = 8, dims = 64, tables = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "LSH near-dup plan must not contain a cartesian product")
    val got = out.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = emb.limit(5).select("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(0) + 100000L)).toSet
    assert(expected.subsetOf(got),
      s"planted duplicate pairs missed: ${expected.diff(got)}")
    // precision is exact: nothing below the threshold survives verification
    val lowCos = out.filter(col("cos") < 0.999).count()
    assert(lowCos == 0)
  }

  test("containment catches subset duplication that Jaccard misses") {
    val inner = (1 to 10).map(i => s"w$i").mkString(" ")
    val outer = inner + " " + (11 to 60).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, inner), (2L, outer)).toDF("doc_id", "text")
    val sh = Dedup.shingleRows(df, col("doc_id"), col("text"))
    // doc 1 is embedded verbatim in doc 2: containment ~1, Jaccard ~0.14
    val cont = Dedup.containmentPairs(sh, 0.9).collect()
    assert(cont.length == 1 && cont(0).getDouble(2) >= 0.9)
    assert(Dedup.jaccardPairs(sh, 0.8).count() == 0)
  }

  test("connectedComponents: min-label clusters over a pair graph") {
    // chain 1-2-3 (transitively one cluster), pair 5-6, node 9 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    // long chain exercises multi-round propagation to the fixpoint
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 9 && labels.forall(_._2 == 1L))
  }

  test("connectedComponentsStar: 10k-node chain where min-label hits maxIters") {
    // a path graph is the adversarial case: component diameter = n, so
    // min-label propagation needs ~n rounds and must give up...
    val chain = (0L until 9999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 8)
    }
    // ...while the large-star/small-star alternation contracts it in
    // O(log n) rounds (well inside the default 50)
    val labels = Dedup.connectedComponentsStar(chain)
    assert(labels.count() == 10000)
    assert(labels.agg(max(col("cluster_id"))).head.getLong(0) == 0L)

    // random multi-component graph: identical labeling to min-label
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(300)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toSet
    val prop = Dedup.connectedComponents(pairs, maxIters = 500)
      .as[(Long, Long)].collect().toSet
    assert(star == prop,
      s"star/min-label divergence: ${star.diff(prop).take(3)} vs ${prop.diff(star).take(3)}")
  }

  test("winnowing: shared substrings fingerprint; guarantees + edge cases") {
    val common = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      (1L, s"AAAA $common BBBB"),
      (2L, s"XYZW $common QRST"),
      (3L, "completely unrelated content here"),
      (4L, "abc"), // shorter than k=5: no fingerprints
      (5L, "abcdef")) // 2 grams < w=4: single global-min fingerprint
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.gramHashes(col("text"), 5).as("g"))
      .select(col("doc_id"), TextFunctions.winnowFromGrams(col("g"), 4).as("fps"))
    val fps = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // winnowing guarantee: a shared run of length >= k+w-1 shares a print
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
    assert(fps(1L).intersect(fps(3L)).isEmpty)
    assert(fps(4L).isEmpty)
    assert(fps(5L).size == 1)
  }

  test("LSH ANN recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val corpus = emb.filter(col("vec_id") >= 20)
    val exact = Similarity.knnBrute(corpus, queries, 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = Similarity.knnLsh(corpus, queries, 3, planes = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.knnLsh(corpus, queries, 3, planes = 4, tables = 6)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(s: Set[(Long, Long)]) =
      exact.intersect(s).size.toDouble / exact.size
    // OR-amplification: multi-table recall must beat single-table and be
    // usefully high (measured single-table recall here is ~0.15)
    assert(recall(multi) > recall(single),
      s"multi ${recall(multi)} !> single ${recall(single)}")
    assert(recall(multi) >= 0.5, s"multi-table recall ${recall(multi)} too low")
    assert(multi.nonEmpty)
  }

  test("autoPlanes keeps bucket occupancy constant as the corpus grows") {
    // planes ≈ log2(n / occupancy), clamped: the SCALE.md-measured rule
    // that keeps the LSH self-join near-linear
    assert(Similarity.autoPlanes(2048, targetOccupancy = 32) == 6)
    assert(Similarity.autoPlanes(2048 * 16, targetOccupancy = 32) == 10)
    // expected occupancy n / 2^planes stays within [target/2, target]
    for (n <- Seq(10000L, 100000L, 10000000L, 1000000000L)) {
      val p = Similarity.autoPlanes(n)
      val occ = n.toDouble / (1L << p)
      assert(occ <= 32 && occ > 16, s"n=$n planes=$p occupancy=$occ")
    }
    // clamps: tiny corpora never go below 4; absurd sizes cap at 30
    assert(Similarity.autoPlanes(1) == 4)
    assert(Similarity.autoPlanes(Long.MaxValue / 2) == 30)
    // and the resulting config still finds the planted duplicates
    val planted = emb.filter(col("vec_id") % 50 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val n = emb.count() * 2
    val pairs = Similarity.cosineNearDupPairs(
      emb.unionByName(planted), 0.95,
      planes = Similarity.autoPlanes(n), dims = 64, tables = 4)
    assert(pairs.count() > 0)
  }

  test("auto-sized overloads apply the documented sizing rules") {
    // the x10 ScaleCurve corpus (~50k embeddings after planting):
    // autoPlanes = ceil(log2(50000/32)) = 11, and at maxHamming=3
    // autoSimhashBits = 4 bands * 11-bit chunks = 44
    assert(Similarity.autoPlanes(50000) == 11)
    assert(Dedup.autoSimhashBits(50000, 3) == 44)
    // the documented degenerate range is now rejected, not silently
    // sub-floor: 13 is the last budget where 56/bands >= the 4-bit floor
    assert(Dedup.autoSimhashBits(50000, 13) == 56)
    intercept[IllegalArgumentException](Dedup.autoSimhashBits(50000, 14))
    intercept[IllegalArgumentException](Dedup.autoSimhashBits(50000, 56))

    // auto near-dup path == the explicitly-sized call, both with the
    // corpus count passed and with the count computed internally
    val n = emb.count()
    val explicitPairs = Similarity.cosineNearDupPairs(
        emb, 0.9, planes = Similarity.autoPlanes(n), dims = 64, tables = 2)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val autoKnown = Similarity.cosineNearDupPairsAuto(emb, 0.9, corpusSize = n)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val autoCounted = Similarity.cosineNearDupPairsAuto(emb, 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(autoKnown == explicitPairs && autoCounted == explicitPairs)

    // auto ANN == explicitly-sized ANN over the same corpus
    val queries = emb.filter(col("vec_id") < 10)
    val corpus = emb.filter(col("vec_id") >= 10)
    val cn = corpus.count()
    val explicitKnn = Similarity.knnLsh(corpus, queries, 3,
        planes = Similarity.autoPlanes(cn), tables = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val autoKnn = Similarity.knnLshAuto(corpus, queries, 3,
        corpusSize = cn, tables = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(autoKnn == explicitKnn)

    // auto simhash path: signatures regenerated at the auto width, and
    // the planted duplicate docs still pair up
    val nd = docs.count()
    val autoSim = Dedup.simhashPairsAuto(docs, col("doc_id"), col("text"),
        maxHamming = 3, corpusSize = nd)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bits = Dedup.autoSimhashBits(nd, 3)
    val explicitSim = Dedup.simhashPairs(
        Dedup.simhash(docs, col("doc_id"), col("text"), bits), bits, 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(autoSim == explicitSim && autoSim.nonEmpty)
  }

  test("IVF ANN: deterministic training, good recall at moderate nprobe") {
    val queries = emb.filter(col("vec_id") < 20)
    val corpus = emb.filter(col("vec_id") >= 20)
    val cents = Similarity.ivfTrain(corpus, k = 8, iters = 2).cache()
    assert(cents.count() == 8)
    // determinism: retraining yields identical centroids
    val again = Similarity.ivfTrain(corpus, k = 8, iters = 2)
    assert(cents.orderBy("centroid_id").collect().toSeq ==
      again.orderBy("centroid_id").collect().toSeq)

    val assigned = Similarity.ivfAssign(corpus, cents).cache()
    assert(assigned.count() == corpus.count()) // every vector in one list
    val exact = Similarity.knnBrute(corpus, queries, 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnIvf(assigned, cents, queries, 3, nprobe = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low at nprobe=4 of 8 lists")
  }

  test("QuantizedDot: NULL on ragged arrays, same as the HOF pipeline") {
    import graft.functions.expressions.QuantizedDot
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, Array(1.0f, 2.0f), Array(3.0f))).toDF("id", "a", "b")
    val got = df.select(col("id"), QuantizedDot(col("a"), col("b")).as("dot"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 1000L * 3000L + 2000L * 4000L)
    assert(got(1).isNullAt(1), "ragged pair must yield NULL, not a partial dot")
    // parity with the composable built-in pipeline (zip_with null-pads)
    val hof = df.filter(col("id") === 2).select(
      aggregate(zip_with(Similarity.quantize(col("a")),
        Similarity.quantize(col("b")), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)).collect()
    assert(hof(0).isNullAt(0))
  }

  test("quantized cosine is within 1e-2 of float cosine") {
    val rows = emb.limit(2).select("embedding").as[Array[Float]].collect()
    val (a, b) = (rows(0), rows(1))
    def cosF(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (u, v) => u.toDouble * v }.sum
      dot / (math.sqrt(x.map(u => u.toDouble * u).sum) *
        math.sqrt(y.map(v => v.toDouble * v).sum))
    }
    val expected = cosF(a, b)
    val got = emb.filter(col("vec_id") === 0).as("q")
      .crossJoin(emb.filter(col("vec_id") === 1).as("c"))
      .select(Similarity.cosineQ(col("q.embedding"), col("c.embedding")))
      .as[Double].head()
    assert(math.abs(got - expected) < 1e-2,
      s"quantized $got vs float $expected")
  }

  test("regexScan: planted PII is detected, clean text is not") {
    val planted = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk for details"),
      (2L, "call 555-867-5309 or 555.867.5309 tomorrow"),
      (3L, "server at 192.168.0.1 and 10.0.0.255 responded"),
      (4L, "perfectly clean text with no identifiers at all"))
      .toDF("doc_id", "text")
    val out = TextFunctions.regexScan(planted, col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
    assert(out.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1, 0, 0), (0, 2, 0), (0, 0, 2), (0, 0, 0)))
    assert(out.map(_.getBoolean(4)).toSeq == Seq(true, true, true, false))
  }

  test("sampleByStratum: deterministic, rate-accurate, stable across reruns") {
    val out = TextFunctions.sampleByStratum(docs, col("lang"), col("doc_id"),
      Seq("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1)
    val again = TextFunctions.sampleByStratum(docs, col("lang"), col("doc_id"),
      Seq("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == again.select("doc_id").collect().map(_.getLong(0)).toSet)
    // achieved per-stratum rates near the targets (hash uniformity)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(l: String) = byLang.getOrElse(l, 0L).toDouble / totals(l)
    assert(math.abs(rate("en") - 0.5) < 0.15, s"en rate ${rate("en")}")
    assert(math.abs(rate("de") - 0.25) < 0.15, s"de rate ${rate("de")}")
    assert(rate("es") < 0.3 && rate("fr") < 0.3)
    // rate 0 drops everything; rate 1 keeps everything
    assert(TextFunctions.sampleByStratum(docs, col("lang"), col("doc_id"),
      Seq(), defaultRate = 0.0).count() == 0)
    assert(TextFunctions.sampleByStratum(docs, col("lang"), col("doc_id"),
      Seq(), defaultRate = 1.0).count() == docs.count())
  }

  test("sampleByWeight: keep-rate tracks the weight, caps at 1, " +
      "deterministic, zero shuffle") {
    import spark.implicits._
    // 4000 rows in two weight tiers: w=100 at scale 0.002 → p=0.2;
    // w=1000 → p=1 (always kept). Hash uniformity gives the 0.2 tier
    // a rate near its probability.
    val rows = (1L to 4000L).map(i =>
      (i, if (i % 2 == 0) 100L else 1000L)).toDF("id", "w")
    val kept = TextFunctions.sampleByWeight(rows, col("id"), col("w"), 0.002)
    val byW = kept.groupBy(col("w")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byW(1000L) == 2000L, "p=1 tier must keep every row")
    val lowRate = byW.getOrElse(100L, 0L).toDouble / 2000.0
    assert(math.abs(lowRate - 0.2) < 0.06, s"p=0.2 tier kept $lowRate")
    // deterministic across calls; non-positive weights never kept
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      TextFunctions.sampleByWeight(rows, col("id"), col("w"), 0.002)
        .select("id").collect().map(_.getLong(0)).toSet)
    assert(TextFunctions.sampleByWeight(
      rows.withColumn("w", lit(0L)), col("id"), col("w"), 0.002)
      .count() == 0)
    // a pure filter: no exchange anywhere in the plan
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"weighted sample must not shuffle:\n$plan")
  }

  test("ngramOverlapPairs: planted benchmark leak found, disjoint text not") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim leak of the benchmark item inside a longer doc
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu suffix words"),
      // entirely different vocabulary
      (2L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val hits = Dedup.ngramOverlapPairs(
        Dedup.shingleRows(corpus, col("doc_id"), col("text")),
        Dedup.shingleRows(bench, col("doc_id"), col("text")),
        minCommon = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq == Seq((1L, 100L, 10L))) // all 10 benchmark 3-grams shared
    // a corpus doc identical to a benchmark id on the OTHER side stays
    // distinct (sides are tagged, ids never collide across sides)
    val self = Dedup.ngramOverlapPairs(
      Dedup.shingleRows(bench, col("doc_id"), col("text")),
      Dedup.shingleRows(bench, col("doc_id"), col("text")), minCommon = 1)
    assert(self.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((100L, 100L)))
  }

  test("decontaminateWithIndex equals the live decontaminate path") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu suffix words"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-benchidx").toString + "/idx"
    try {
      Dedup.writeBenchIndex(bench, col("doc_id"), col("text"), path)
      // artifact layout: hashes parquet + bloom bytes, both present
      assert(new java.io.File(path + "/hashes").exists())
      assert(new java.io.File(path + "/bloom").length() > 0)
      val viaIndex = Dedup.decontaminateWithIndex(corpus, path,
          col("doc_id"), col("text"), minCommon = 5)
        .select("doc_id").as[Long].collect().toSeq.sorted
      val live = Dedup.decontaminate(corpus, bench,
          col("doc_id"), col("text"), minCommon = 5)
        .select("doc_id").as[Long].collect().toSeq.sorted
      assert(viaIndex == live && live == Seq(2L))
    } finally {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(path).getParentFile)
    }
  }

  test("semanticDedup drops planted duplicates by min id, keeps the rest") {
    val planted = emb.filter(col("vec_id") % 50 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = emb.unionByName(planted)
    val out = Similarity.semanticDedup(corpus, k = 8, threshold = 0.95).cache()
    val n = emb.count(); val p = planted.count()
    assert(p > 0, "fixture should yield at least one plant")
    assert(out.count() == n + p, "every corpus row must be returned")
    // each plant is identical to its smaller-id original → same cluster,
    // cos 1.0 → the PLANT (larger id) is dropped, the original kept
    val keptSet = out.filter(col("kept")).select("vec_id")
      .as[Long].collect().toSet
    val plantIds = planted.select("vec_id").as[Long].collect().toSet
    assert(plantIds.intersect(keptSet).isEmpty,
      "planted duplicates must be dropped")
    val origIds = plantIds.map(_ - 100000)
    assert(origIds.subsetOf(keptSet), "originals of plants must survive")
    // the corpus has no organic pairs at 0.95 (the d06 one-pair-per-plant
    // fixture semantics) — so kept = everything except the plants
    assert(out.filter(!col("kept")).count() == p)
    // plant and original agree on centroid_id (identical vectors)
    val cids = out.select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    origIds.foreach(o => assert(cids(o) == cids(o + 100000)))
  }

  test("autoClusters applies the SemDeDup k-proportional-to-n rule") {
    assert(Similarity.autoClusters(256000, 256) == 1000)
    assert(Similarity.autoClusters(1, 256) == 2) // floor of 2 clusters
    assert(Similarity.autoClusters(300, 256) == 2) // ceil(300/256)
    // the auto overload reproduces the explicit-k drop decision for
    // identical twins regardless of k (same cluster by construction)
    val planted = emb.filter(col("vec_id") % 50 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val auto = Similarity.semanticDedupAuto(
      emb.unionByName(planted), 0.95, targetClusterSize = 16)
    assert(auto.filter(!col("kept")).select("vec_id").as[Long].collect().toSet
      == planted.select("vec_id").as[Long].collect().toSet)
  }

  test("annJoin: no cartesian, no broadcast of either corpus; exact scores") {
    val left = emb.filter(col("vec_id") % 2 === 0)
    val right = emb.filter(col("vec_id") % 2 === 1)
    val out = Similarity.annJoin(left, right, k = 3, planes = 8, dims = 64,
      tables = 2)
    val plan = out.queryExecution.executedPlan.toString
    // the contract: BOTH sides large — the candidate stage must be a
    // shuffled join, never a broadcast (stats at test scale would
    // otherwise let Catalyst broadcast a side and mask the 100 TB shape).
    // The ONE permitted nested-loop join is the hot-bucket guard's
    // 1-row cap frame (condition carries __cap) — a map-side filter at
    // any scale, never a corpus-sized loop.
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in annJoin plan:\n$plan")
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach { l =>
        assert(l.contains("__cap") || l.contains("__nl"),
          s"corpus-sized nested-loop join in annJoin plan:\n$plan")
      }
    // the default hot-bucket guard drops capped cells via broadcast
    // ANTI joins (the hot set is tiny by definition) — those are fine;
    // what must never broadcast is a corpus side of the candidate join
    plan.linesIterator.filter(_.contains("BroadcastHashJoin")).foreach { l =>
      assert(l.contains("LeftAnti"),
        s"non-anti broadcast join in annJoin plan:\n$plan")
    }
    assert(plan.contains("ShuffledHashJoin"),
      s"expected shuffled hash candidate join:\n$plan")

    val rows = out.collect()
    assert(rows.nonEmpty)
    // rank is 1..k, dense per left_id, ordered by cos desc
    val byLeft = rows.groupBy(_.getLong(0))
    byLeft.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length).toSeq)
      assert(sorted.map(_.getDouble(3)).toSeq
        == sorted.map(_.getDouble(3)).sortBy(-_).toSeq)
    }
    // scores are the exact quantized cosine (spot-check against a
    // direct recomputation for one returned pair)
    val r0 = rows.head
    val recomputed = left.filter(col("vec_id") === r0.getLong(0)).as("l")
      .crossJoin(right.filter(col("vec_id") === r0.getLong(1)).as("r"))
      .select(Similarity.cosineQ(col("l.embedding"), col("r.embedding")))
      .head.getDouble(0)
    assert(math.abs(recomputed - r0.getDouble(3)) == 0.0)
  }

  test("annJoin finds planted cross-corpus twins; auto overload sizes planes") {
    // right = exact copies of 5 left vectors (new ids): identical
    // vectors share every bucket in every table, so recall for them is
    // deterministic — each must come back as its twin's rank-1 at cos 1
    val left = emb.filter(col("vec_id") < 100)
    val twins = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 200000L)
    val right = emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
      .unionByName(twins)
    val out = Similarity.annJoin(left, right, k = 1, planes = 6, dims = 64,
        tables = 2)
      .filter(col("left_id") < 5).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 200000L,
        s"left ${r.getLong(0)}: expected twin, got ${r.getLong(1)}")
      assert(r.getDouble(3) >= 0.9999)
    }
    // the Auto overload sizes planes by the larger side
    val auto = Similarity.annJoinAuto(left, right, k = 1,
      leftSize = 100L, rightSize = 105L, tables = 2)
    assert(auto.filter(col("left_id") < 5).count() == 5)
  }

  test("annJoin maxBucketSize drops degenerate cells with accounting") {
    // a pile of 60 copies of ONE vector on the right: identical vectors
    // share every bucket in every table at ANY plane count — the skew
    // mode autoPlanes cannot fix, only the cap can
    val left = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
    val pileSrc = emb.filter(col("vec_id") === 0).select("embedding")
    val pile = spark.range(60).toDF("i")
      .crossJoin(pileSrc)
      .select((col("i") + 300000L).as("vec_id"), col("embedding"))
    val right = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .select("vec_id", "embedding")
      .unionByName(pile)
    val uncapped = Similarity.annJoin(left, right, k = 60,
      planes = 6, dims = 64, tables = 2)
    val capped = Similarity.annJoin(left, right, k = 60,
      planes = 6, dims = 64, tables = 2, maxBucketSize = 50)
    // uncapped: vector 0's twin pile all collide with it at cos 1
    assert(uncapped.filter(col("left_id") === 0 &&
      col("right_id") >= 300000L).count() == 60)
    // capped: the pile's cells are gone from the join entirely
    assert(capped.filter(col("right_id") >= 300000L).count() == 0)
    // and the accounting names the dropped cells on the right side
    val dropped = Similarity.annDroppedBuckets(left, right,
      planes = 6, dims = 64, tables = 2, maxBucketSize = 50).collect()
    assert(dropped.nonEmpty)
    assert(dropped.forall(r => r.getAs[String]("side") == "right" &&
      r.getAs[Long]("bucket_size") > 50))
  }

  test("annJoin hot-bucket guard is finite BY DEFAULT and accounts drops") {
    // the cap is derived, not opted into: a pile of 200 near-identical
    // vectors (one cell of EVERY table, the skew autoPlanes cannot fix)
    // against a derived cap of autoMaxBucketSize(250, 8) = 64 — the
    // default call must complete with the pile capped and accounted
    val left = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
    val pile = spark.range(200).toDF("i")
      .crossJoin(emb.filter(col("vec_id") === 0).select("embedding"))
      .select((col("i") + 300000L).as("vec_id"), col("embedding"))
    val right = emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)
      .select("vec_id", "embedding")
      .unionByName(pile)
    val cap = Similarity.autoMaxBucketSize(250L, 8)
    assert(cap == 64, s"derived cap changed: $cap")
    // DEFAULT call — no maxBucketSize argument anywhere
    val out = Similarity.annJoin(left, right, k = 250, planes = 8,
      dims = 64, tables = 2)
    assert(out.filter(col("right_id") >= 300000L).count() == 0,
      "the degenerate pile survived the default guard")
    assert(out.filter(col("left_id") =!= 0).count() > 0,
      "guard wiped out natural neighbors too")
    // accounting at the derived cap names the pile's cells (right side,
    // one per table: identical vectors share one cell per table)
    val dropped = Similarity.annDroppedBuckets(left, right,
      planes = 8, dims = 64, tables = 2, maxBucketSize = cap).collect()
    assert(dropped.nonEmpty)
    assert(dropped.forall(r => r.getAs[String]("side") == "right" &&
      r.getAs[Long]("bucket_size") > cap))
    // "same arguments" holds literally: the AutoBucketCap sentinel
    // resolves in-plan to the SAME derived cap, so the default-arg
    // accounting call reports exactly the explicit-cap drop set —
    // never "every non-empty cell" (the naive literal-0 comparison)
    val autoDropped = Similarity.annDroppedBuckets(left, right,
      planes = 8, dims = 64, tables = 2).collect()
    assert(autoDropped.map(_.toString).toSet ==
      dropped.map(_.toString).toSet,
      "sentinel pass-through diverged from the explicit cap")
    // occupancy rule shape: floor of safetyFactor, linear growth above
    assert(Similarity.autoMaxBucketSize(1L, 8) == 64)
    assert(Similarity.autoMaxBucketSize(256L * 32, 8) == 32 * 64)
    assert(Similarity.autoMaxBucketSize(Long.MaxValue / 4, 8) == Int.MaxValue)
  }

  test("decontaminateByEmbedding drops planted bench copies, keeps the rest") {
    val corpus = emb.filter(col("vec_id") >= 10)
      .unionByName(emb.filter(col("vec_id") < 5)
        .withColumn("vec_id", col("vec_id") + 100000L))
    val bench = emb.filter(col("vec_id") < 10)
    val survivors = Similarity.decontaminateByEmbedding(
      corpus, bench, 0.999, planes = 8, dims = 64, tables = 2)
    assert(survivors.columns.toSeq == corpus.columns.toSeq)
    val ids = survivors.select("vec_id").as[Long].collect().toSet
    // every planted copy dropped
    (0L until 5L).foreach(i => assert(!ids.contains(100000L + i)))
    // non-broadcast drop path computes the identical survivor set
    val shuffled = Similarity.decontaminateByEmbedding(
        corpus, bench, 0.999, planes = 8, dims = 64, tables = 2,
        broadcastDrops = false)
      .select("vec_id").as[Long].collect().toSet
    assert(shuffled == ids)
  }

  test("langId picks markers deterministically; fingerprint normalizes") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze nicht hier"),
      (3L, "xyzzy qwerty")).toDF("id", "txt")
    val got = df.select(col("id"), TextFunctions.langId(col("txt")))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "und")

    val fp = Seq(("A  B! c", "a b c"), ("a b c", "a bc")).toDF("x", "y")
      .select(TextFunctions.fingerprint(col("x")).as("fx"),
        TextFunctions.fingerprint(col("y")).as("fy"))
      .collect()
    assert(fp(0).getString(0) == fp(0).getString(1)) // "A  B!c" ~ "a b c"
    assert(fp(1).getString(0) != fp(1).getString(1))
  }
}
