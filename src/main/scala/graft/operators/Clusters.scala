package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate *clustering*: candidate pairs → connected components →
  * one canonical document per cluster. The tail of the dedup family
  * (exact / MinHash / SimHash / embedding find PAIRS; a real training
  * -data pipeline needs the transitive closure to drop all-but-one copy
  * per group).
  *
  * Connected components run as alternating large-star / small-star rounds
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14): each round is two key-co-partitioned shuffles (groupBy-min +
  * join on the same key), NO driver-side graph state, converging in
  * O(log n) rounds — the published scale-out algorithm, not label
  * propagation (whose round count is the graph diameter).
  */
object Clusters {

  /** Word n-gram exact-Jaccard pairs with **prefix filtering** (the
    * published SSJoin/PPJoin scheme): under a global total order on
    * shingles by (document frequency asc, shingle), a pair with
    * Jaccard ≥ t must share an element within the first
    * `|s| − ⌈t·|s|⌉ + 1` shingles of BOTH docs (pigeonhole on
    * |A∩B| ≥ ⌈t·|A|⌉, the smallest shared element is in both prefixes).
    * So only prefixes are joined — rare shingles first, which is exactly
    * what defuses hot boilerplate shingles — and the few candidates are
    * verified with exact Jaccard over the full shingle sets. LOSSLESS:
    * identical output to the all-pairs join (ClustersSpec brute-force
    * equality; DuckDB oracle `q_jaccard_pairs`).
    *
    * Output: (doc_a, doc_b, jac) with doc_a < doc_b, jac >= threshold.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double, shingleLen: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "").as("ts"))
    val shingled = toks.select(col("doc_id"),
      when(size(col("ts")) >= shingleLen,
        array_distinct(transform(sequence(lit(1), size(col("ts")) - (shingleLen - 1)),
          i => array_join(slice(col("ts"), i, lit(shingleLen)), " "))))
        .otherwise(array().cast("array<string>")).as("s"))

    val posts = shingled
      .select(col("doc_id"), size(col("s")).as("nsh"), explode(col("s")).as("sh"))
    val dfreq = posts.groupBy("sh").agg(count(lit(1)).as("df"))
    // per-doc rank under the global (df, sh) order; keep only the prefix
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    // required overlap ⌈t·|s|⌉ with an FP tolerance: double arithmetic can
    // round 0.29*100 up past the integer (29.000000000000004 → ceil 30),
    // which would SHORTEN the prefix and silently drop at-threshold pairs;
    // the tolerance lets the prefix only err longer, never shorter
    val prefix = posts.join(dfreq, "sh")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= col("nsh") - ceil(col("nsh") * threshold - 1e-9) + 1)
      .select("doc_id", "sh")

    val cand = prefix.select(col("doc_id").as("doc_a"), col("sh"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()

    // exact verification over the full shingle sets (candidates are few)
    cand
      .join(shingled.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
      .join(shingled.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jac"))
  }

  /** Large-star round: every node u connects its strictly-larger
    * neighbors to m(u) = min(N(u) ∪ {u}). Two shuffles on the same key
    * (groupBy + join), both partial-aggregable.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
    val m = sym.groupBy("a").agg(min("b").as("mn"))
      .select(col("a"), least(col("a"), col("mn")).as("m"))
    sym.join(m, "a")
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Small-star round: orient edges to (u > v); every node u connects its
    * smaller neighbors AND itself to m(u) = min of them.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(greatest(col("a"), col("b")).as("u"),
      least(col("a"), col("b")).as("v"))
    val m = oriented.groupBy("u").agg(min("v").as("m"))
    val nbr = oriented.join(m, "u")
      .select(col("v").as("a"), col("m").as("b"))
    val self = m.select(col("u").as("a"), col("m").as("b"))
    nbr.union(self)
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Connected components of an undirected edge list (cols `a`, `b`:
    * long). Returns (id, component) for every node appearing in an edge;
    * component = the smallest id reachable. Converges when an
    * order-insensitive edge-set checksum is stable (count + sum + xor of
    * per-edge hashes — one cheap aggregate per round, no except() join).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    // materialize the (possibly expensive) edge derivation once before
    // iterating — every round re-reads the previous round's checkpoint,
    // never the upstream pair generation
    var e = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var prev = (-1L, -1L, -1L)
    var it = 0
    var stable = false
    while (it < maxIter && !stable) {
      e = smallStar(largeStar(e)).localCheckpoint() // truncate lineage per round
      val row = e.agg(count(lit(1)), sum(col("a") + col("b")),
        sum(hash(col("a"), col("b")).cast("long"))).head()
      val sig = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1),
        if (row.isNullAt(2)) 0L else row.getLong(2))
      stable = sig == prev
      prev = sig
      it += 1
    }
    // a non-converged edge set is NOT a star forest — labels derived from
    // it would be silently wrong, so fail loudly (Kiveris et al. prove
    // O(log n) convergence; 30 rounds covers any realistic graph)
    if (!stable)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds")
    // fixpoint is a star forest: (a → b) with b the component min
    e.select(col("a").as("id"), col("b").as("component"))
      .union(e.select(col("b").as("id"), col("b").as("component")))
      .distinct()
  }

  /** (doc_id, cluster_id) for EVERY document given a (doc_a, doc_b) pair
    * table: component min for docs in a near-dup cluster, own id for
    * singletons.
    */
  def labelClusters(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(
      pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .withColumnRenamed("id", "doc_id")
    docs.select("doc_id").join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
  }

  def nearDupClusters(docs: DataFrame, threshold: Double, shingleLen: Int = 3): DataFrame =
    labelClusters(docs, jaccardPairs(docs, threshold, shingleLen))

  /** One keeper per cluster: longest text wins, ties by smallest doc_id —
    * the "keep best copy" step of a dedup pipeline.
    */
  def canonical(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val w = Window.partitionBy("cluster_id")
      .orderBy(F.length(col("text")).desc, col("doc_id").asc)
    docs.join(clusters, "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id"))
  }
}
