package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def resolveMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.resolve(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("two components resolve to their minima") {
    val got = resolveMap(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges (round count is log n, not diameter)") {
    // a 60-node path: min-label propagation would need 60 rounds; the
    // star rounds must finish within the default maxIter = 20
    val chain = (0L until 59L).map(i => (i, i + 1))
    val got = resolveMap(chain)
    assert(got.size == 60 && got.values.forall(_ == 0L))
  }

  test("exhausting maxIter unconverged fails loudly (and is overridable)") {
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.resolve(chain, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // diagnostics escape hatch: best-effort result, no throw
    val loose = ConnectedComponents
      .resolve(chain, maxIter = 1, requireConverged = false)
      .as[(Long, Long)].collect().toMap
    assert(loose.size == 60)
  }

  test("matches an in-memory union-find on random graphs") {
    val rnd = new scala.util.Random(13)
    (1 to 15).foreach { _ =>
      val n = 2 + rnd.nextInt(28)
      val edges = (0 until n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // reference union-find over the same edge list
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = nodes.map { x =>
          // canonical component = min node of the set, which union-by-min
          // preserves as the root
          x -> find(x)
        }.toMap
        val got = resolveMap(edges)
        assert(got == want, s"edges=$edges")
      }
    }
  }

  test("duplicate edges, reversed edges, and self-loops are tolerated") {
    val got = resolveMap(Seq((2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("component ids are stable under node-id permutation of the same topology") {
    // star centered high, leaves low: root must still be the min id
    val got = resolveMap(Seq((100L, 7L), (100L, 3L), (100L, 9L)))
    assert(got == Map(100L -> 3L, 7L -> 3L, 3L -> 3L, 9L -> 3L))
  }

  test("cluster keep-set semantics on the dedup pair output") {
    // docs fixture from DedupSpec: pair (2,3) near-dup; with exact dups
    // (0,1) unioned in, keep set = {0, 2, 4}
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "one two three four five six seven eight nine ten eleven twelve thirteen"),
      (3L, "one two three four five six seven eight nine ten eleven twelve fourteen"),
      (4L, "completely different content about spark catalyst optimizer and tungsten engine"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5).select("id_a", "id_b")
    val comp = ConnectedComponents.resolve(pairs).as[(Long, Long)].collect().toMap
    // doc 0/1 are exact dups → jaccard 1.0 pair; 2/3 near-dups; 4 absent
    assert(comp == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }
}
