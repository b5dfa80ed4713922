package graft.llm

import graft.SparkSpec

/** Transitive duplicate clustering (SURVEY LLM tier — pair list → keep/drop). */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(nodes: Seq[Long], edges: Seq[(Long, Long)],
                    maxIter: Int = 30): Map[Long, Long] =
    Components.connectedComponents(
        nodes.toDF("id"), edges.toDF("src", "dst"), maxIter = maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain + pair + isolated node: min-id representative per component") {
    // 1-2-3 chained transitively, 5-6 a pair, 9 isolated
    val out = comps(Seq(1L, 2L, 3L, 5L, 6L, 9L), Seq((2L, 1L), (2L, 3L), (5L, 6L)))
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L)
  }

  test("long chain converges in O(log diameter) rounds (pointer jumping)") {
    // a 64-node path has diameter 63; plain min-propagation needs 63
    // rounds — pointer jumping must close it well inside 10
    val nodes = (0L to 63L)
    val edges = (0L until 63L).map(i => (i, i + 1))
    val out = comps(nodes, edges, maxIter = 10)
    out.values.toSet shouldBe Set(0L)
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    val out = comps(Seq(1L, 2L, 3L),
      Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
  }

  test("result is invariant under input partitioning") {
    val nodes = (0L to 30L)
    val edges = (0L until 30L).filter(_ % 4 != 3).map(i => (i, i + 1))
    val base = comps(nodes, edges)
    val shuffled = Components.connectedComponents(
        nodes.toDF("id").repartition(7),
        edges.toDF("src", "dst").repartition(5))
      .as[(Long, Long)].collect().toMap
    shuffled shouldBe base
  }

  test("non-convergence fails fast instead of leaking a partial closure") {
    val nodes = (0L to 63L)
    val edges = (0L until 63L).map(i => (i, i + 1))
    an[IllegalStateException] should be thrownBy
      comps(nodes, edges, maxIter = 1)
  }

  test("only the final labels checkpoint stays persisted; rounds + edge view released") {
    // each round's lazy checkpoint and the symmetric edge view are
    // released explicitly the moment they are superseded — in a
    // long-lived session (Bench runs ~40 queries after a curation pass)
    // waiting for GC + ContextCleaner leaves dead MEMORY_AND_DISK blocks
    // competing with live queries
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = Components.connectedComponents(
      (0L to 15L).toDF("id"),
      (0L until 15L).map(i => (i, i + 1)).toDF("src", "dst"))
    val fresh = sc.getPersistentRDDs.keySet -- before
    fresh.size shouldBe 1 // exactly the final labels checkpoint the result reads
    out.count() shouldBe 16L // and it is still readable
  }

  test("a non-converged run releases every checkpoint before throwing") {
    // the failure path must not pin edge + label blocks in a long-lived
    // session: maxIter = 0 forces the non-convergence throw immediately
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    an[IllegalStateException] should be thrownBy
      Components.connectedComponents(
        (0L to 7L).toDF("id"),
        (0L until 7L).map(i => (i, i + 1)).toDF("src", "dst"),
        maxIter = 0)
    (sc.getPersistentRDDs.keySet -- before) shouldBe empty
  }

  test("orderable non-numeric ids cluster with lexicographic-min representatives") {
    // min-wins election needs only an ordered, joinable id type — string
    // doc ids work, with the representative being the lexicographic min
    val out = Components.connectedComponents(
        Seq("a", "b", "c", "z").toDF("id"),
        Seq(("b", "a"), ("b", "c")).toDF("src", "dst"))
      .as[(String, String)].collect().toMap
    out shouldBe Map("a" -> "a", "b" -> "a", "c" -> "a", "z" -> "z")
  }

  test("incremental over prior labels equals the full recompute (merge, grow, no-op, fresh)") {
    // prior graph: {1,2,3} (min 1), {5,6} (min 5), {9} singleton
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L)
    val oldEdges = Seq((2L, 1L), (2L, 3L), (5L, 6L))
    val prior = Components.connectedComponents(
      nodes.toDF("doc_id"), oldEdges.toDF("src", "dst"), idCol = "doc_id")
    // delta: MERGE two prior clusters (3-5), attach a FRESH node (10-9),
    // a within-cluster no-op edge (1-2), and a fresh pair (20-21)
    val delta = Seq((3L, 5L), (10L, 9L), (1L, 2L), (20L, 21L)).toDF("a", "b")
    val inc = Components.incremental(prior, delta, idCol = "doc_id")
      .as[(Long, Long)].collect().toMap
    val full = Components.connectedComponents(
        (nodes ++ Seq(10L, 20L, 21L)).toDF("doc_id"),
        (oldEdges ++ Seq((3L, 5L), (10L, 9L), (1L, 2L), (20L, 21L)))
          .toDF("src", "dst"), idCol = "doc_id")
      .as[(Long, Long)].collect().toMap
    inc shouldBe full
    inc shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L,
      9L -> 9L, 10L -> 9L, 20L -> 20L, 21L -> 20L)
    // an empty delta is the identity labeling
    Components.incremental(prior,
        Seq.empty[(Long, Long)].toDF("a", "b"), idCol = "doc_id")
      .as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L)
  }

  test("incremental is monotone: a retraction delta cannot un-merge (full re-close is the path)") {
    // {1,2,3} was merged by edges (1-2),(2-3); upstream later REVOKES
    // (2-3). Star contraction keeps no edge to delete: feeding the
    // surviving edges as a delta leaves the merge intact — pinned here
    // so the contract (scaladoc: additive-only) is behavior, not prose
    val prior = Components.connectedComponents(
      Seq(1L, 2L, 3L).toDF("doc_id"),
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), idCol = "doc_id")
    val survivors = Seq((1L, 2L)).toDF("a", "b") // (2-3) retracted
    Components.incremental(prior, survivors, idCol = "doc_id")
      .as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L) // STALE merge survives, by contract
    // the retraction path: re-close the surviving edge set from scratch
    Components.connectedComponents(
        Seq(1L, 2L, 3L).toDF("doc_id"), survivors.toDF("src", "dst"),
        idCol = "doc_id")
      .as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L) // the split the delta can't see
  }

  test("dupClusters flags the min-id doc of each cluster as representative") {
    val docs = Seq(10L, 11L, 12L, 20L).toDF("doc_id")
    val pairs = Seq((11L, 10L), (11L, 12L)).toDF("a", "b")
    val rows = Components.dupClusters(docs, pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    rows shouldBe Array(
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false), (20L, 20L, true))
  }
}
