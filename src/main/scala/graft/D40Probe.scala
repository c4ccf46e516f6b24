package graft
import org.apache.spark.sql.functions._
// TEMPORARY measurement probe (not committed).
object D40Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = LocalSession.build("32")
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.prewarm(spark, dir)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"PHASE $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val emb0 = Tables.df(spark, dir, "embeddings")
    val base = emb0.filter(col("vec_id") % 50 === 0).select(col("vec_id"), col("embedding"))
    val negBase = emb0.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id"), transform(col("embedding"), x => -x).as("embedding"))
    val incAll = base.withColumn("vec_id", col("vec_id") + 100000)
      .unionByName(base.withColumn("vec_id", col("vec_id") + 200000))
      .unionByName(negBase.withColumn("vec_id", col("vec_id") + 300000))
      .unionByName(negBase.withColumn("vec_id", col("vec_id") + 400000))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val path = Fixtures.semDedupModelPath(spark, dir)
      val inc = incAll.filter(col("vec_id") % 2 === 0)
      // d36 shape: labels only
      time("semDedupIncrement+noop")(functions.Similarity.semDedupIncrement(spark, path, inc)
        .write.format("noop").mode("overwrite").save())
      // star-CC cost on a comparable pair set: reuse d34 fixture labels as pairs
      val lab = Fixtures.semDedupLabels(spark, dir)
      val pairs = lab.filter(col("vec_id") =!= col("rep_id"))
        .select(col("vec_id").as("id_a"), col("rep_id").as("id_b"))
      time("starCC alone")(functions.Dedup.connectedComponentsStar(pairs)
        .write.format("noop").mode("overwrite").save())
      // assignment alone (frozen centroids, zero-shuffle argmin)
      val cents = spark.read.parquet(s"$path/centroids")
      time("ivfAssign(inc)+noop")(functions.Similarity.ivfAssign(inc, cents)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
