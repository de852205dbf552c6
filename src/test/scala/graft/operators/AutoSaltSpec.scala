package graft.operators

import graft.SparkTestBase
import graft.sources.Fixtures

class AutoSaltSpec extends SparkTestBase {
  test("autoSalt scales with shuffle partitions; salted join stays row-identical") {
    val pages = Fixtures.pages(spark, sf0001)
    // at 8 local shuffle partitions the ~6% hot-cell share needs no salt
    val saltLocal = PipJoin.autoSalt(pages, joinLevel = 8, sampleFraction = 1.0)
    assert(saltLocal == 1)
    // at cluster-scale partition counts the same skew demands salting
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    val salt = try PipJoin.autoSalt(pages, joinLevel = 8, sampleFraction = 1.0)
    finally spark.conf.set("spark.sql.shuffle.partitions", before)
    assert(salt > 1, s"city skew at 200 partitions should force salting, got $salt")
    assert(salt <= 16)
    // salted partitioned join stays row-identical at the chosen salt
    import spark.implicits._
    val polys = Ingest.polygons(spark, Fixtures.nodesDf(spark), Fixtures.waysDf(spark),
      Fixtures.relationsDf(spark), Fixtures.blacklist)
    val covers = Ingest.cellCovers(polys)
    val a = PipJoin.matches(pages, covers, polys)
      .select("url", "layer", "relId").as[(String, String, Long)].collect().toSet
    val b = PipJoin.matchesPartitioned(pages, covers, polys, joinLevel = 8, salt = salt)
      .as[(String, String, Long)].collect().toSet
    assert(a == b)
  }
}
