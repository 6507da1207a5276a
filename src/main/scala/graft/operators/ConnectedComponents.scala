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
    * Returns (id, cluster_id) for every node appearing in any
    * non-self-loop edge (degenerate x-x pairs carry no connectivity;
    * the dedupAssignment* callers coalesce absent ids to themselves).
    *
    * Hybrid execution: near-dup pair lists are usually orders of
    * magnitude smaller than the corpus that produced them, and the
    * distributed loop costs ~5 scheduler round-trips per iteration —
    * pure overhead on a small graph. When the (distinct, undirected)
    * edge count is at most `driverMaxEdges` the edges are collected
    * and solved with a driver-side union-find (exact same min-label
    * components, zero iterations) — the same regime call as a
    * broadcast join, with the same kind of size guard. Above the
    * threshold the iterative min-label-propagation + pointer-jumping
    * loop runs fully distributed. */
  def run(edges: DataFrame, maxIter: Int = 20, driverMaxEdges: Long = 1000000L): DataFrame = {
    val cols = edges.columns
    val e = edges.select(col(cols(0)).cast("long").as("src"), col(cols(1)).cast("long").as("dst"))
    val eDist = e.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Round-17 (guide §2.6 driver barriers): ONE action decides the
    // regime AND already carries the edges in the driver regime —
    // take(limit+1) replaces the former count() + collect() pair (two
    // sequential full jobs; every small-graph caller paid the second
    // one just to re-read the cache). Over the threshold the take is
    // bounded (limit rows ≈ 16 MB) and the distributed path needs no
    // edge count — only nNodes below.
    val limit = math.min(driverMaxEdges, Int.MaxValue - 2L).toInt
    val sample = eDist.take(limit + 1)
    if (sample.length <= limit) {
      val out = runOnDriver(edges.sparkSession, sample.map(r => (r.getLong(0), r.getLong(1))))
      eDist.unpersist(blocking = false)
      return out
    }
    val both = eDist.unionByName(eDist.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Lineage management: the plan doubles per iteration, so planning
    // itself OOMs on long chains without truncation (the classic
    // iterative-Spark failure; GraphX checkpoints for the same
    // reason). Hot path persists (AQE-planned, fast); every round
    // localCheckpoints to cut lineage, and the per-round checkpoint
    // BLOCKS are released eagerly via GraftRddShim (DataFrame
    // .unpersist never sees them — they'd stack one dead block set
    // per iteration otherwise).
    var labels = both.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    // checkpointed frames are RDD-backed with UNKNOWN size stats, so
    // the planner will never choose a broadcast join on its own and
    // every round would sort-merge the full edge table. When the node
    // count is provably broadcast-sized, hint it explicitly; beyond
    // that the shuffle join is the correct plan anyway.
    val nNodes = labels.count() // also materializes `both`
    eDist.unpersist(blocking = false)
    def maybeBcast(df: DataFrame): DataFrame = if (nNodes <= 5000000L) broadcast(df) else df
    var prevSum = labels.agg(sum(col("lbl"))).head().getLong(0)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val prop = both.join(maybeBcast(labels), both("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      // persisted: the self-join below reads it twice; lazy — blocks
      // fill during the one materializing action of this round
      val merged = labels.unionByName(prop)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // pointer jumping: follow the current label's OWN label
      // (labels are node ids, min-labels are monotone, so
      // lbl(lbl(id)) <= lbl(id)). Halves the remaining distance to
      // the component minimum each round -> O(log diameter) rounds
      // instead of O(diameter) — near-dup drift chains have linear
      // diameter, which this turns from ~20 rounds into ~5.
      val next = merged.as("x")
        .join(maybeBcast(merged.select(col("id").as("pid"), col("lbl").as("plbl"))),
          col("x.lbl") === col("pid"))
        .select(col("x.id").as("id"), col("plbl").as("lbl"))
        .localCheckpoint(false) // lineage cut; materialized by the sum below
      val s = next.agg(sum(col("lbl"))).head().getLong(0)
      // next is checkpointed, so its inputs can be released eagerly —
      // leaked cache entries otherwise accumulate across rounds and
      // every later plan pays CacheManager lookup over all of them.
      // The outgoing labels frame is checkpoint-backed: its blocks
      // live OUTSIDE CacheManager and need the shim to free.
      merged.unpersist()
      org.apache.spark.sql.GraftRddShim.releaseCheckpointBlocks(labels)
      labels = next
      converged = s == prevSum
      prevSum = s
      it += 1
    }
    both.unpersist()
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Exact min-label components on the driver: path-halving union-find
    * with the smaller id absorbing the larger, so every root IS the
    * component minimum — identical output to the distributed loop.
    * Near-linear in edges; only called under `driverMaxEdges`. */
  private def runOnDriver(spark: org.apache.spark.sql.SparkSession,
                          pairs: Array[(Long, Long)]): DataFrame = {
    val parent = new java.util.HashMap[Long, java.lang.Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.get(x).longValue()
      while (p != x) {
        val gp = parent.get(p).longValue()
        parent.put(x, gp) // path halving
        x = gp
        p = parent.get(x).longValue()
      }
      x
    }
    pairs.foreach { case (a, b) =>
      parent.putIfAbsent(a, a)
      parent.putIfAbsent(b, b)
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    val it = parent.keySet().iterator()
    while (it.hasNext) { val id = it.next().longValue(); rows.add(org.apache.spark.sql.Row(id, find(id))) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cluster_id", org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(rows, schema)
  }

  /** Full dedup assignment over a corpus: every document gets its
    * near-dup cluster id (its own id when it has no near-dups), the
    * cluster size, and whether it is the canonical survivor. */
  def dedupAssignment(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val cc = run(pairs)
    val assigned = docs.select(col(idCol).cast("long").as("doc"))
      .join(cc, col("doc") === cc("id"), "left")
      .select(col("doc").as("doc_id"), coalesce(col("cluster_id"), col("doc")).as("cluster_id"))
    withSizes(assigned)
  }

  /** Set-granular dedup assignment: components run over canonical-SET
    * pairs (NearDup.minHashSetPairs) — a k-document identical set is
    * ONE node instead of k(k-1)/2 expanded edges, so the iteration
    * cost scales with unique content, not duplicate mass. Every doc
    * inherits its set's component; set_id = min doc id of the set, so
    * the component label is the corpus-wide min doc id. */
  def dedupAssignmentBySets(sets: DataFrame, setPairs: DataFrame): DataFrame = {
    val cc = run(setPairs.select(col("set_a"), col("set_b")))
    val membership = sets.select(explode(col("ids")).as("doc_id"), col("set_id"))
    val assigned = membership.join(cc, membership("set_id") === cc("id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("set_id")).as("cluster_id"))
    withSizes(assigned)
  }

  private def withSizes(assigned: DataFrame): DataFrame = {
    val sizes = assigned.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
  }
}
