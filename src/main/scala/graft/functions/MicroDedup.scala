package graft.functions

import scala.collection.immutable.ArraySeq
import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.XXH64

/** Driver kernel for the BATCH-INTERNAL stage of streaming dedup —
  * the micro-batch regime of [[NearDup.minHashSetPairs]] +
  * [[graft.operators.ConnectedComponents.dedupAssignmentBySets]] (the
  * BpeTrain/ConnectedComponents regime pattern: a streaming trigger
  * BOUNDS the batch by construction, so the per-batch working set is
  * driver-sized even when the corpus is 100 TB; the distributed
  * formulation remains the over-gate fallback and the two are
  * output-identical — StatefulSpec pins it).
  *
  * Why it exists: the distributed batch-internal path costs ~6
  * Spark jobs (sets persist, band shuffle, pair distinct, CC count +
  * collect, membership joins) of mostly FIXED scheduler/shuffle
  * latency — measured ~3.5 s of a 9 s batch at 10k docs, for compute
  * that is microseconds at this size. The kernel does the identical
  * arithmetic in one pass over the collected token arrays.
  *
  * EXACT-replication contract (what makes the regimes agree):
  *  - the set collapse groups by token-array CONTENT (the distributed
  *    path groups by a 128-bit fingerprint of it; equal up to
  *    fingerprint collisions, which the fp width makes negligible);
  *  - minhash = [[MinHashSig.sig]]'s own arithmetic over the SAME
  *    seeds (sig(i) = min XXH64(tok, XXH64.hashInt(i, 42)));
  *  - band key = Spark `xxhash64(slice(sig, b*r+1, r))`: XXH64
  *    fold over the slice from seed 42, null elements skipped — an
  *    empty token set yields the all-null signature, so every band
  *    key is the bare seed 42 (empty docs collapse to one set and
  *    never pair: jaccard 0/0 is NaN in both regimes);
  *  - candidate buckets keep [2, maxBucketSize] members, pairs take
  *    the PPJoin size cut, and verification is the sorted-merge
  *    intersect count ([[IntersectCount]]'s merge) with exact
  *    jaccard >= threshold;
  *  - components label to the MIN doc id (union-find with min-id
  *    roots — the [[graft.operators.ConnectedComponents]] label
  *    contract), and the canonical survivor of a cluster is the doc
  *    whose id IS the label.
  */
object MicroDedup {

  /** A surviving (canonical) set: its min doc id, sorted-distinct
    * token hashes, and the 32 LSH band keys of its signature — enough
    * to probe and append a [[BandIndex]] without recomputing anything
    * distributed. */
  final case class Survivor(id: Long, toks: Array[Long], bandKeys: Array[Long])

  final case class Result(survivors: Array[Survivor])

  /** Driver fallback for callers without precomputed band keys:
    * replays the MinHashSig / xxhash64-slice chain per doc. */
  def bandKeysOf(toks: Array[Long], numHashes: Int, bands: Int): Array[Long] = {
    val rowsPerBand = numHashes / bands
    val seeds = MinHashSig.seeds(numHashes)
    val out = new Array[Long](bands)
    if (toks.isEmpty) {
      // all-null signature: every band key is the fold seed 42
      java.util.Arrays.fill(out, 42L)
    } else {
      val sig = new Array[Long](numHashes)
      java.util.Arrays.fill(sig, Long.MaxValue)
      var j = 0
      while (j < toks.length) {
        val tok = toks(j)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashLong(tok, seeds(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        j += 1
      }
      var b = 0
      while (b < bands) {
        var acc = 42L
        var i = b * rowsPerBand
        val end = i + rowsPerBand
        while (i < end) { acc = XXH64.hashLong(sig(i), acc); i += 1 }
        out(b) = acc
        b += 1
      }
    }
    out
  }

  /** `docs`: (doc id, sorted-distinct token hashes, LSH band keys).
    * Band keys come in precomputed — the signature pass is the only
    * compute-heavy term, so the caller runs it DISTRIBUTED inside the
    * same prep projection that hashes tokens (content-identical docs
    * produce identical signatures, so any member's keys serve its
    * set). */
  def run(docs: Array[(Long, Array[Long], Array[Long])],
          threshold: Double, maxBucketSize: Int): Result = {
    // 1. content collapse -> unique sets, set_id = min doc id
    val setIdByContent = mutable.HashMap.empty[ArraySeq[Long], Int]
    val setIds = mutable.ArrayBuffer.empty[Long]
    val setToks = mutable.ArrayBuffer.empty[Array[Long]]
    val bandKeys = mutable.ArrayBuffer.empty[Array[Long]]
    docs.foreach { case (id, toks, keys) =>
      val key = ArraySeq.unsafeWrapArray(toks)
      setIdByContent.get(key) match {
        case Some(i) => if (id < setIds(i)) setIds(i) = id
        case None =>
          setIdByContent(key) = setIds.length
          setIds += id
          setToks += toks
          bandKeys += keys
      }
    }
    val nSets = setIds.length
    val bands = if (nSets == 0) 0 else bandKeys(0).length

    // 3. LSH buckets -> candidate pairs (PPJoin size cut, bucket cap)
    val buckets = mutable.HashMap.empty[(Int, Long), mutable.ArrayBuffer[Int]]
    var s = 0
    while (s < nSets) {
      var b = 0
      while (b < bands) {
        buckets.getOrElseUpdate((b, bandKeys(s)(b)), mutable.ArrayBuffer.empty) += s
        b += 1
      }
      s += 1
    }
    val candidate = mutable.HashSet.empty[(Int, Int)]
    buckets.valuesIterator.foreach { members =>
      if (members.length >= 2 && members.length <= maxBucketSize) {
        var i = 0
        while (i < members.length) {
          var j = i + 1
          while (j < members.length) {
            val (a, b) = (members(i), members(j))
            val (szA, szB) = (setToks(a).length.toDouble, setToks(b).length.toDouble)
            if (szA >= szB * threshold && szB >= szA * threshold) {
              val p = if (setIds(a) < setIds(b)) (a, b) else (b, a)
              candidate += p
            }
            j += 1
          }
          i += 1
        }
      }
    }

    // 4. verify (sorted-merge intersect, exact jaccard) -> union-find
    //    with min-id roots
    val parent = Array.tabulate(nSets)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    def union(a: Int, b: Int): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // min-DOC-ID root — the ConnectedComponents label contract
        if (setIds(ra) <= setIds(rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    candidate.foreach { case (a, b) =>
      val (ta, tb) = (setToks(a), setToks(b))
      var (i, j, inter) = (0, 0, 0)
      while (i < ta.length && j < tb.length) {
        if (ta(i) == tb(j)) { inter += 1; i += 1; j += 1 }
        else if (ta(i) < tb(j)) i += 1
        else j += 1
      }
      val union_ = ta.length + tb.length - inter
      if (union_ > 0 && inter.toDouble / union_ >= threshold) union(a, b)
    }

    // 5. survivors: sets that ARE their component's min-id label
    val out = mutable.ArrayBuffer.empty[Survivor]
    s = 0
    while (s < nSets) {
      if (find(s) == s) out += Survivor(setIds(s), setToks(s), bandKeys(s))
      s += 1
    }
    Result(out.toArray)
  }
}
