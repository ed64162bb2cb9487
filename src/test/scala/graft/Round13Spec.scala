package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round 13: the until-convergence contracts for the iterative operators.
  * A fixed round count silently UNDER-computes on graphs deeper than the
  * round budget — wrong clusters / a too-big "core", not slow ones. These
  * tests pin the failure mode on explicit deep-chain fixtures: the capped
  * (old fixed-round) form provably mislabels, the adaptive form closes it
  * and stops exactly at the fixed point.
  */
class Round13Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- label propagation (d07/d08/d18) ----

  test("a 12-hop chain defeats 5 fixed rounds; until-convergence labels it fully") {
    // chain 0-1-2-...-12: one component, min label 0, diameter 12
    val n = 12
    val docs = (0L to n.toLong).toDF("id")
    val pairs = (0L until n.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")

    // the old fixed-5 behavior == adaptive with the cap AT 5: node 12 only
    // sees labels within 5 hops -> label 7, an under-merged cluster
    val (capped, cappedRounds) =
      Dedup.labelClustersUncached(docs, pairs, maxRounds = 5)
    val cappedMap = capped.as[(Long, Long)].collect().toMap
    assert(cappedRounds == 5)
    assert(cappedMap(n.toLong) == (n - 5).toLong,
      s"fixed-5 should under-merge the chain tail, got ${cappedMap(n.toLong)}")
    assert(cappedMap.values.toSet.size > 1, "fixed-5 splits one true component")

    // adaptive: converges to one component and stops at its true depth
    // (diameter rounds to propagate + 1 no-change round to observe it)
    val (adaptive, rounds) = Dedup.labelClustersUncached(docs, pairs,
      maxRounds = ExtensionQueries.ClusterMaxRounds)
    val adaptiveMap = adaptive.as[(Long, Long)].collect().toMap
    assert(adaptiveMap.values.toSet == Set(0L),
      s"adaptive must fully merge the chain, got ${adaptiveMap.values.toSet}")
    assert(rounds == n + 1,
      s"expected diameter+1 = ${n + 1} rounds, ran $rounds")
  }

  test("adaptive propagation stops early on a shallow graph") {
    // two 2-cliques: every label reaches its minimum in round 1; round 2
    // observes no change -> 2 rounds executed, far below the cap
    val docs = (0L to 3L).toDF("id")
    val pairs = Seq((0L, 1L), (2L, 3L)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.labelClustersUncached(docs, pairs,
      maxRounds = ExtensionQueries.ClusterMaxRounds)
    assert(labels.as[(Long, Long)].collect().toMap ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
    assert(rounds == 2, s"shallow graph should stop after 2 rounds, ran $rounds")
  }

  test("adaptive propagation on an empty pair set is one observing round") {
    val docs = (0L to 4L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.labelClustersUncached(docs, pairs,
      maxRounds = ExtensionQueries.ClusterMaxRounds)
    assert(labels.as[(Long, Long)].collect().toMap ==
      (0L to 4L).map(i => i -> i).toMap)
    assert(rounds == 1)
  }

  // ---- k-core peeling (g03) ----

  test("a long path defeats 5 fixed peels; until-convergence empties the 2-core") {
    // path of 20 edges: the 2-core is EMPTY (peeling strips one edge from
    // each end per round -> 10 rounds), but 5 rounds leave 10 edges
    val pairs = (0L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (capped, cappedRounds) =
      ExtensionQueries7.kcoreEdgesWithRounds(pairs, k = 2, maxRounds = 5)
    assert(cappedRounds == 5)
    assert(capped.count() == 20L, // 10 undirected edges, mirrored
      "fixed-5 must leave the path's middle as a phantom 'core'")

    val (adaptive, rounds) = ExtensionQueries7.kcoreEdgesWithRounds(
      pairs, k = 2, maxRounds = ExtensionQueries7.CoreMaxRounds)
    assert(adaptive.count() == 0L, "a path has no 2-core")
    // 10 peeling rounds + 1 observing round on the now-empty set
    assert(rounds == 11, s"expected 11 rounds, ran $rounds")
  }

  test("adaptive peeling keeps a true core and stops at its fixed point") {
    // a 4-clique with a pendant path: the 3-core is exactly the clique
    val clique = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)
    val pairs = (clique ++ Seq((3L, 4L), (4L, 5L))).toDF("doc_a", "doc_b")
    val (core, rounds) = ExtensionQueries7.kcoreEdgesWithRounds(
      pairs, k = 3, maxRounds = ExtensionQueries7.CoreMaxRounds)
    val nodes = core.select(col("src")).distinct().as[Long].collect().toSet
    assert(nodes == Set(0L, 1L, 2L, 3L))
    assert(core.count() == 12L) // 6 undirected clique edges, mirrored
    assert(rounds <= 3, s"pendant path peels in 2 rounds + 1 observe, ran $rounds")
  }

  // ---- memo integrity (the ADVICE items) ----

  test("labelClusters memo hit requires full plan equality, not just the hash") {
    val docs = (0L to 3L).toDF("id")
    val pairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val first = Dedup.labelClusters(docs, pairs, maxRounds = 8)
    val again = Dedup.labelClusters(docs, pairs, maxRounds = 8)
    // same canonical plans -> same persisted frame instance (memo hit)
    assert(again eq first)
    // a semantically different pair set must NOT hit the first entry
    val other = Dedup.labelClusters(docs,
      Seq((2L, 3L)).toDF("doc_a", "doc_b"), maxRounds = 8)
    assert(!(other eq first))
    assert(other.as[(Long, Long)].collect().toMap ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L))
  }
}
