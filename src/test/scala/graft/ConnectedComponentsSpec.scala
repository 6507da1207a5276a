package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("components: chains, cliques, singletons-by-absence") {
    // chain 1-2-3-4 (diameter 3), clique 10-11-12, isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedupAssignment: every doc labeled; singletons canonical; sizes sum to corpus") {
    val docs = (1L to 8L).toDF("doc_id")
    val pairs = Seq((2L, 5L), (5L, 7L)).toDF("id_a", "id_b")
    val a = ConnectedComponents.dedupAssignment(docs, "doc_id", pairs)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(a.count(_._4) == 6) // 5 singletons + 1 cluster survivor
    assert(a.filter(r => Set(2L, 5L, 7L)(r._1)).forall(r => r._2 == 2L && r._3 == 3L))
    assert(a.map(_._1).size == 8)
  }

  test("empty pair list: all docs become singleton canonicals (no NPE)") {
    val docs = (1L to 4L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val a = ConnectedComponents.dedupAssignment(docs, "doc_id", noPairs)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(a == (1L to 4L).map(d => (d, d, 1L, true)).toSet)
  }

  test("long chain converges (diameter-bound iterations)") {
    val n = 15
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect()
    assert(got.forall(_._2 == 1L) && got.length == n)
  }

  test("distributed path ≡ driver union-find on the same graph") {
    // mixed shapes: two chains, a clique, crossing edge, reversed dirs
    val edges = (Seq((1L, 2L), (3L, 2L), (3L, 4L), (9L, 8L), (8L, 7L),
      (30L, 31L), (31L, 32L), (30L, 32L), (4L, 7L)) ++
      (100L to 140L).map(i => (i, i + 1))).toDF("a", "b")
    val viaDriver = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
    val viaCluster = ConnectedComponents.run(edges, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaCluster)
    assert(viaDriver(7L) == 1L && viaDriver(30L) == 30L && viaDriver(141L) == 100L)
  }

  test("self-loop-only nodes are dropped by run, healed by dedupAssignment") {
    val edges = Seq((5L, 5L), (1L, 2L)).toDF("a", "b")
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L)) // 5 carries no connectivity
    val a = ConnectedComponents.dedupAssignment((1L to 5L).toDF("doc_id"), "doc_id", edges)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(a.exists(r => r._1 == 5L && r._2 == 5L && r._4)) // singleton again
  }
}
