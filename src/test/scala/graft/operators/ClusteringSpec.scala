package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Connected-components clustering: deterministic shapes + a property
  * test against an in-memory union-find reference.
  */
class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Clustering.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** In-memory union-find (path halving + union by min). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents: two components, transitive closure collapses chains") {
    // 1-2, 2-3, 3-4 is one component even though (1,4) was never a pair
    val cc = ccOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: orientation and self-loops don't matter") {
    val cc = ccOf(Seq((2L, 1L), (1L, 2L), (3L, 3L), (3L, 2L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponents: empty edge set") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Clustering.connectedComponents(empty).count() == 0)
  }

  test("connectedComponents: 64-node path converges within the round bound") {
    // worst case for naive min-label propagation (diameter = n); the
    // star-contraction rounds must close it in O(log² n)
    val cc = ccOf((1L until 64L).map(i => (i, i + 1)))
    assert(cc.size == 64 && cc.values.forall(_ == 1L))
  }

  test("1024-node path converges within 12 star-contraction rounds") {
    import spark.implicits._
    // diameter 1023 — naive min-propagation would need ~1023 rounds; the
    // O(log² n) contraction must close it in ≤ 12 (maxIter throws if not)
    val edges = (1L until 1024L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Clustering.connectedComponents(edges, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.length == 1024 && cc.forall(_._2 == 1L))
  }

  test("connectedComponents matches union-find on random graphs") {
    val edgeGen = for {
      n <- Gen.choose(1, 60)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 40L)
        b <- Gen.choose(0L, 40L)
      } yield (a, b))
    } yield edges
    var checked = 0
    var draw = 0
    while (checked < 10 && draw < 100) {
      draw += 1
      edgeGen.sample.foreach { edges =>
        val real = edges.filter { case (a, b) => a != b }
        if (real.nonEmpty) {
          assert(ccOf(real) == unionFind(real), s"edges=$real")
          checked += 1
        }
      }
    }
    assert(checked == 10)
  }

  test("updateComponents == full recompute on random edge splits") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 40)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 30L); b <- Gen.choose(0L, 30L)
      } yield (a, b))
      cut <- Gen.choose(0, n)
    } yield (edges.filter { case (a, b) => a != b }, cut)
    var checked = 0
    var draws = 0
    while (checked < 6 && draws < 60) {
      draws += 1
      gen.sample.foreach { case (edges, cut) =>
        val (oldE, newE) = edges.splitAt(math.min(cut, edges.length))
        if (oldE.nonEmpty && newE.nonEmpty) {
          val full = ccOf(edges)
          val oldAssign = Clustering.connectedComponents(oldE.toDF("doc_a", "doc_b"))
          val updated = Clustering.updateComponents(oldAssign, newE.toDF("doc_a", "doc_b"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(updated == full, s"old=$oldE new=$newE")
          checked += 1
        }
      }
    }
    assert(checked == 6)
  }

  test("updateComponents keeps assignComponents-style singletons (self-labeled)") {
    import spark.implicits._
    // assignment from assignComponents: nodes 3, 4, 6 are singletons
    val assignment = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L), (6L, 6L))
      .toDF("node", "component")
    // today's pairs merge 4 into {1,2}; 3 and 6 stay untouched
    val updated = Clustering.updateComponents(assignment, Seq((2L, 4L)).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(updated == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 3L -> 3L, 6L -> 6L))
  }

  test("convergence probe: except confirmation runs ONCE, at the fixpoint") {
    import spark.implicits._
    val exceptRuns = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        val hasExcept = qe.analyzed.collectFirst {
          case e: org.apache.spark.sql.catalyst.plans.logical.Except => e
        }.isDefined
        if (hasExcept) exceptRuns.incrementAndGet()
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // 32-node path: several contraction rounds before the fixpoint —
      // a per-round set-equality shape would run except every round
      val edges = (1L until 32L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val cc = Clustering.connectedComponents(edges)
      assert(cc.collect().length == 32)
      // the listener bus is async — wait for it to drain
      val deadline = System.nanoTime() + 10_000_000_000L
      while (exceptRuns.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500) // settle: catch any LATE extra except events
      assert(exceptRuns.get() == 1,
        s"expected exactly one except confirmation, saw ${exceptRuns.get()}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("assignComponents labels singletons with their own id") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 5L)).toDF("doc_a", "doc_b")
    val got = Clustering.assignComponents(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 3L -> 3L, 4L -> 4L, 6L -> 6L))
  }

  test("keepRepresentatives keeps the min id per cluster plus all singletons") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 5L), (4L, 6L)).toDF("doc_a", "doc_b")
    val kept = Clustering.keepRepresentatives(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("keepBest keeps the argmax-quality doc per cluster, min id on ties") {
    import spark.implicits._
    val docs = (1L to 7L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 5L), (4L, 6L)).toDF("doc_a", "doc_b")
    // cluster {1,2,5}: 5 wins on score; cluster {4,6}: tie → min id 4;
    // 3 and 7 are singletons (kept regardless of score)
    val scores = Seq((1L, 0.2), (2L, 0.5), (5L, 0.9), (4L, 0.7), (6L, 0.7),
      (3L, 0.0), (7L, 1.0)).toDF("doc_id", "quality")
    val kept = Clustering.keepBest(docs, pairs, scores)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L, 4L, 3L, 7L))
  }

  test("assignSplitsByCluster: clustered docs share a split; singletons match the id-keyed split") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 5L), (4L, 6L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Sampling.assignSplitsByCluster(docs, pairs)
      .select("doc_id", "component", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byComp = got.groupBy(_._2)
    assert(byComp.forall { case (_, rows) => rows.map(_._3).distinct.length == 1 },
      s"every cluster must land in exactly one split: ${got.toSeq}")
    assert(got.count(_._2 == 1L) == 3 && got.count(_._2 == 4L) == 2)
    // singletons: component = doc_id, so the split equals the plain split
    val plain = Sampling.assignSplits(docs)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val clustered = Set(1L, 2L, 5L, 4L, 6L, 10L, 11L)
    assert(got.filterNot(r => clustered(r._1)).forall(r => plain(r._1) == r._3))
  }

  test("keepBest: a cluster absent from scores keeps its min-id representative; scored beats unscored") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    // cluster {1,2}: NO scores at all — must not be deleted, min id 1
    // survives; cluster {4,5}: only 5 is scored — the scored node wins
    // even though 4 < 5; 3 and 6 singletons
    val scores = Seq((5L, 0.1), (3L, 0.9)).toDF("doc_id", "quality")
    val kept = Clustering.keepBest(docs, pairs, scores)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 3L, 6L))
  }

  test("keepBest with a constant score degrades to keepRepresentatives") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 5L), (4L, 6L)).toDF("doc_a", "doc_b")
    val scores = (1L to 6L).map(i => (i, 0.5)).toDF("doc_id", "quality")
    val best = Clustering.keepBest(docs, pairs, scores)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val reps = Clustering.keepRepresentatives(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == reps)
  }
}
