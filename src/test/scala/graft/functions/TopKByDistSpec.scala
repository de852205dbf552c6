package graft.functions

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

/** The bounded top-k aggregate's contract, pinned directly (KnnBatchSpec
  * covers it end-to-end through the search loop): any partitioning of
  * the input into partial buffers, merged in any order, must equal the
  * reference "sort by (dist, url), take k" — including duplicate
  * distances, duplicate rows, fewer-than-k inputs, and a
  * serialize/deserialize hop on every partial (the exact shuffle path).
  */
class TopKByDistSpec extends SparkTestBase {

  private def reference(rows: Seq[(Double, String)], k: Int): Seq[(Double, String)] =
    rows.sortBy { case (d, u) => (d, u) }.take(k)

  private def runPartitioned(rows: Seq[(Double, String)], k: Int,
                             nParts: Int, seed: Long): Seq[(Double, String)] = {
    val rnd = new Random(seed)
    val agg = TopKByDist(null, null, k)
    // partition rows arbitrarily, update each partial in row order
    val partials = rows.groupBy(_ => rnd.nextInt(nParts)).values.map { part =>
      val buf = agg.createAggregationBuffer()
      part.foreach { case (d, u) => buf.insert(d, UTF8String.fromString(u)) }
      // shuffle hop: every partial crosses serialize/deserialize
      agg.deserialize(agg.serialize(buf))
    }.toSeq
    // merge in a shuffled order, starting from an empty buffer (the
    // final aggregation's zero value)
    val merged = rnd.shuffle(partials)
      .foldLeft(agg.createAggregationBuffer())((a, b) => agg.merge(a, b))
    (0 until merged.n).map(i => (merged.dists(i), merged.urls(i).toString))
  }

  test("partitioned update+merge equals sorted take-k under random splits") {
    val rnd = new Random(42)
    for (trial <- 0 until 200) {
      val n = rnd.nextInt(60)
      val k = 1 + rnd.nextInt(12)
      // small value domains force duplicate dists AND duplicate rows
      val rows = Seq.fill(n)((rnd.nextInt(8).toDouble, s"u${rnd.nextInt(10)}"))
      val got = runPartitioned(rows, k, 1 + rnd.nextInt(5), seed = trial)
      assert(got == reference(rows, k),
        s"trial $trial: k=$k rows=$rows got=$got expected=${reference(rows, k)}")
    }
  }

  test("buffer bound holds: at most k entries ever retained") {
    val agg = TopKByDist(null, null, 3)
    val buf = agg.createAggregationBuffer()
    (0 until 100).foreach(i => buf.insert(100.0 - i, UTF8String.fromString(s"u$i")))
    assert(buf.n == 3)
    assert((0 until 3).map(buf.dists) == Seq(1.0, 2.0, 3.0))
  }

  test("SQL surface equals the rank window on a DataFrame") {
    import spark.implicits._
    val rnd = new Random(7)
    val df = Seq.fill(5000)((s"q${rnd.nextInt(40)}", rnd.nextInt(50).toDouble,
      s"url${rnd.nextInt(200)}")).toDF("queryId", "dist", "url")
    val k = 5
    val viaAgg = df.groupBy("queryId")
      .agg(TopKByDist.topk_by_dist(col("dist"), col("url"), k).as("topk"))
      .select(col("queryId"), explode(col("topk")).as("p"))
      .select(col("queryId"), col("p.dist"), col("p.url"))
      .as[(String, Double, String)].collect().toSeq.sorted
    val w = Window.partitionBy("queryId").orderBy(col("dist"), col("url"))
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("queryId", "dist", "url")
      .as[(String, Double, String)].collect().toSeq.sorted
    assert(viaAgg == viaWindow)
  }
}
