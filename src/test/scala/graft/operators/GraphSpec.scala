package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // path + triangle + isolated pair: 1-2-3 triangle, 3-4-5 path, 6-7 edge
  private def edges = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    .toDF("id_a", "id_b")

  /** Local reference replaying the exact fixed-point recurrence. */
  private def localPr(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val dir = es ++ es.map { case (a, b) => (b, a) }
    val deg = dir.groupBy(_._1).map { case (v, g) => v -> g.size.toLong }
    val n = deg.size
    val scale = 1000000000000L
    var pr = deg.map { case (v, _) => v -> (scale.toDouble / n).toLong }
    for (_ <- 1 to iters) {
      val contrib = dir.groupBy(_._2).map { case (v, g) =>
        v -> g.map { case (u, _) => pr(u) / deg(u) }.sum }
      pr = deg.map { case (v, _) =>
        v -> (math.floor(0.15 * scale.toDouble / n).toLong +
          math.floor(0.85 * contrib.getOrElse(v, 0L).toDouble).toLong) }
    }
    pr
  }

  test("pageRankFixedPoint matches the local recurrence exactly") {
    try {
      val got = Graph.pageRankFixedPoint(edges, iters = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == localPr(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
        (4L, 5L), (6L, 7L)), 3))
    } finally graft.CacheScope.drain()
  }

  test("ranks are partition-count independent (exact integer sums)") {
    try {
      val a = Graph.pageRankFixedPoint(edges.repartition(1), iters = 3)
        .as[(Long, Long)].collect().toMap
      val b = Graph.pageRankFixedPoint(edges.repartition(13), iters = 3)
        .as[(Long, Long)].collect().toMap
      assert(a == b)
    } finally graft.CacheScope.drain()
  }

  test("rank mass stays within the fixed-point floor loss of 1e12") {
    try {
      val pr = Graph.pageRankFixedPoint(edges, iters = 3)
        .as[(Long, Long)].collect()
      val total = pr.map(_._2).sum
      val n = pr.length
      // each node loses < 2 units to the two floors per iteration, plus
      // each edge division truncates < 1 unit of its source's rank
      assert(total <= 1000000000000L)
      assert(total > 1000000000000L - 10L * (n + 12))
      // the triangle hub (node 3, degree 4) outranks every leaf
      val m = pr.toMap
      assert(m(3L) > m(5L) && m(3L) > m(6L))
    } finally graft.CacheScope.drain()
  }

  test("kCoreBounded peels round-for-round: tail falls off one hop per round") {
    // 1-2-3-1 triangle with a path 3-4-5-6: degrees 1:2 2:2 3:3 4:2 5:2 6:1
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    try {
      // k=2 synchronous peel: round 1 drops 6, round 2 drops 5, round 3
      // drops 4. Reported degrees are from the round-3 input graph
      // (edge 3-4 still present when they were computed), so 3 keeps
      // deg 3 — the documented "degree within the previous round's
      // subgraph" semantics.
      val got = Graph.kCoreBounded(es, k = 2, rounds = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
      // one more round reaches the fixpoint: the pure triangle
      val fix = Graph.kCoreBounded(es, k = 2, rounds = 4)
        .as[(Long, Long)].collect().toMap
      assert(fix == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    } finally graft.CacheScope.drain()
  }

  test("kCoreExact converges to the fixpoint with in-core degrees; long chain strips to empty") {
    // same graph: the exact 2-core is the triangle, with degrees WITHIN
    // the core (node 3 drops to 2 once the path edge is gone)
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    try {
      val core = Graph.kCoreExact(es, k = 2)
        .as[(Long, Long)].collect().toMap
      assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
      // a 40-node path has NO 2-core, but peeling takes ~20 synchronous
      // rounds (one hop per end per round) — exactly the shape a fixed
      // round count silently gets wrong and the convergence loop must not
      val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      assert(Graph.kCoreExact(chain, k = 2).count() == 0)
      // ...while the bounded form at 3 rounds still reports survivors
      assert(Graph.kCoreBounded(chain, k = 2, rounds = 3).count() > 0)
      // empty input: no rounds, empty output
      assert(Graph.kCoreExact(es.filter($"id_a" < 0), k = 2).count() == 0)
    } finally graft.CacheScope.drain()
  }

  /** Local replay of the synchronous LP recurrence: plurality over
    * labeled neighbors, ties to the SMALLEST label, seeds clamped.
    */
  private def localLp(es: Seq[(Long, Long)], seeds: Map[Long, Long],
      allIds: Seq[Long], iters: Int): Map[Long, Option[Long]] = {
    val nbr = (es ++ es.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (v, g) => v -> g.map(_._2) }
    var lab: Map[Long, Option[Long]] =
      allIds.map(v => v -> seeds.get(v)).toMap
    for (_ <- 1 to iters) {
      lab = allIds.map { v =>
        v -> seeds.get(v).orElse {
          val votes = nbr.getOrElse(v, Nil).flatMap(lab(_))
          if (votes.isEmpty) None
          else Some(votes.groupBy(identity).toSeq
            .map { case (l, g) => (g.size, l) }
            .sortBy { case (c, l) => (-c, l) }.head._2)
        }
      }.toMap
    }
    lab
  }

  test("labelPropagation matches the local recurrence; ties to smallest label; seeds clamp") {
    // two seed islands + a tie node: 10 and 20 seeded (labels 2, 1);
    // node 5 is adjacent to BOTH seeds from round 1 → 1-1 tie → label 1.
    // Node 10's neighbors all end up label 1, but 10 keeps its seed 2.
    val es = Seq((10L, 5L), (20L, 5L), (5L, 6L), (10L, 11L), (20L, 21L))
    val seeds = Map(10L -> 2L, 20L -> 1L)
    val ids = Seq(5L, 6L, 10L, 11L, 20L, 21L)
    val edf = es.toDF("id_a", "id_b")
    val ndf = ids.map(i => (i, seeds.get(i))).toDF("id", "seed_label")
    try {
      val got = Graph.labelPropagation(edf, ndf, iters = 3)
        .collect().map(r => (r.getLong(0),
          (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2))))
        .toMap
      val want = localLp(es, seeds, ids, 3)
      assert(got.view.mapValues(_._1).toMap == want)
      assert(got(5L)._1.contains(1L)) // plurality tie broken to SMALLEST
      assert(got(10L)._1.contains(2L) && got(10L)._2) // seed clamped
      assert(got(11L)._1.contains(2L) && !got(11L)._2)
    } finally graft.CacheScope.drain()
  }

  test("labelPropagation iters bounds depth; labelPropagationExact reaches the fixpoint") {
    // a 12-node chain seeded only at node 1: after k rounds exactly the
    // first k+1 nodes are labeled — the silent under-propagation a fixed
    // round count gets wrong and the exact form must not
    val n = 12L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (1L to n).map(i => (i, if (i == 1L) Some(7L) else None))
      .toDF("id", "seed_label")
    try {
      val bounded = Graph.labelPropagation(chain, nodes, iters = 3)
        .collect().map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
      assert((1L to n).count(bounded) == 4) // nodes 1..4 only
      val exact = Graph.labelPropagationExact(chain, nodes)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert((1L to n).forall(exact(_).contains(7L))) // whole chain
      // maxRounds runaway bound still returns a labeling
      val capped = Graph.labelPropagationExact(chain, nodes, maxRounds = 2)
        .collect().map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
      assert((1L to n).count(capped) == 3)
      // no edges: everyone keeps exactly the seed labeling
      val iso = Graph.labelPropagationExact(chain.limit(0), nodes)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(iso == (1L to n).map(i =>
        i -> (if (i == 1L) Some(7L) else None)).toMap)
    } finally graft.CacheScope.drain()
  }

  test("labelPropagationFrozen: once labeled never re-votes; converges where re-voting flips") {
    // A(seed 5)–X; B(seed 1)–y1,y2; y1–X, y2–X.
    // Round 1: X's only labeled neighbor is A → X=5; y1,y2 take 1.
    // Round 2 re-voting: X's labeled neighbors {A:5, y1:1, y2:1} → flips
    // to 1. Frozen: X keeps its first label 5 — the semantic fork.
    val es = Seq((1L, 10L), (2L, 20L), (2L, 21L), (20L, 10L), (21L, 10L))
    val seeds = Map(1L -> 5L, 2L -> 1L)
    val ids = Seq(1L, 2L, 10L, 20L, 21L)
    val edf = es.toDF("id_a", "id_b")
    val ndf = ids.map(i => (i, seeds.get(i))).toDF("id", "seed_label")
    try {
      val frozen = Graph.labelPropagationFrozen(edf, ndf)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(frozen(10L).contains(5L), "frozen keeps the first label")
      assert(frozen(20L).contains(1L) && frozen(21L).contains(1L))
      // the re-voting form on the same graph flips X by round 2
      val revote = Graph.labelPropagation(edf, ndf, iters = 2)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(revote(10L).contains(1L), "re-voting flips under new votes")
      // frozen reaches the whole chain (the under-propagation case) and
      // its fixpoint is the BFS layering from the seed
      val n = 12L
      val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val nodes = (1L to n).map(i => (i, if (i == 1L) Some(7L) else None))
        .toDF("id", "seed_label")
      val fc = Graph.labelPropagationFrozen(chain, nodes)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert((1L to n).forall(fc(_).contains(7L)))
      // maxRounds bound still returns the partial layering
      val capped = Graph.labelPropagationFrozen(chain, nodes, maxRounds = 2)
        .collect().map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
      assert((1L to n).count(capped) == 3)
    } finally graft.CacheScope.drain()
  }

  test("knnClassifyAgainstIndex: plurality of labeled top-k neighbors, smallest-label ties, abstain without labeled neighbors") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val base = java.nio.file.Files.createTempDirectory("knncls").toString
    val idx = s"$base/idx"; val lbl = s"$base/labels"
    try {
      graft.operators.Similarity.writeIvfIndexVersioned(emb, idx, 8)
      // label 60% of the corpus from the table's own label column
      emb.select($"vec_id".as("id"))
        .join(spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
          .select($"vec_id".as("id"), $"label"), Seq("id"))
        .select($"id", org.apache.spark.sql.functions.when($"id" % 5 < 3,
          $"label").cast("long").as("label"))
        .write.parquet(lbl)
      val queries = emb.limit(20)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
        .localCheckpoint()
      val got = Graph.knnClassifyAgainstIndex(queries, idx, lbl, 4, 10)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      // independent replay: raw top-k from the same index, local plurality
      val top = graft.operators.Similarity
        .ivfTopKAgainstIndex(queries, idx, 4, 10)
        .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      val labels = spark.read.parquet(lbl)
        .filter($"label".isNotNull)
        .as[(Long, Long)].collect().toMap
      val want = top.toSeq.groupBy(_._1).flatMap { case (q, ns) =>
        val votes = ns.flatMap(n => labels.get(n._2))
        if (votes.isEmpty) None
        else {
          val byLabel = votes.groupBy(identity).view
            .mapValues(_.size.toLong).toSeq
          Some(q -> byLabel.sortBy { case (l, c) => (-c, l) }.head.swap)
        }
      }
      assert(got.nonEmpty && got.view.mapValues(_.swap).toMap == want)
      // every returned vote count is >= 1 and <= k
      assert(got.values.forall { case (_, v) => v >= 1 && v <= 10 })
    } finally graft.CacheScope.drain()
  }
}
