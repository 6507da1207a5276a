package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation — the
  * final step of near-duplicate deduplication: pair lists (from
  * MinHash/SimHash/embedding LSH) become clusters, and each cluster
  * keeps one canonical document (the min id).
  *
  * Algorithm: every node starts labeled with itself; each round every
  * node takes the min of its own and its neighbors' labels; stop at
  * fixpoint. Deterministic (min is order-free). Rounds = graph
  * diameter — near-dup clusters are dense (diameter 2-3), so this
  * converges in a handful of one-shuffle iterations; for general
  * graphs with long chains use the star-contraction variants.
  * The fixpoint test is O(1) driver-side: labels only ever decrease,
  * so the label SUM strictly decreases until convergence.
  *
  * Scale shape per round: one shuffle join (edges ⋈ labels on src) +
  * one partial-agg min groupBy. Edges and labels persist
  * MEMORY_AND_DISK across rounds (iterative algorithms must pin their
  * working set — same as GraphX/ALS).
  */
object ConnectedComponents {

  /** `edges`: two long columns (first two are used), undirected pairs.
    * Returns (id, cluster_id) for every node appearing in any edge. */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val cols = edges.columns
    val e = edges.select(col(cols(0)).cast("long").as("src"), col(cols(1)).cast("long").as("dst"))
    val both = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint each round: materializes the new labels AND
    // truncates lineage — without it the logical plan doubles per
    // iteration and planning itself OOMs on long chains (the classic
    // iterative-Spark failure; GraphX checkpoints for the same reason)
    var labels = both.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var prevSum = labels.agg(sum(col("lbl"))).head().getLong(0)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val prop = both.join(labels, both("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.unionByName(prop)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val s = next.agg(sum(col("lbl"))).head().getLong(0)
      labels = next
      converged = s == prevSum
      prevSum = s
      it += 1
    }
    both.unpersist()
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Full dedup assignment over a corpus: every document gets its
    * near-dup cluster id (its own id when it has no near-dups), the
    * cluster size, and whether it is the canonical survivor. */
  def dedupAssignment(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val cc = run(pairs)
    val assigned = docs.select(col(idCol).cast("long").as("doc"))
      .join(cc, col("doc") === cc("id"), "left")
      .select(col("doc").as("doc_id"), coalesce(col("cluster_id"), col("doc")).as("cluster_id"))
    val sizes = assigned.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }
}
