package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 0/1 exact dups; 2/3 near-dups (1-token edit); 4 unrelated.
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK TODAY"),
    (2L, "one two three four five six seven eight nine ten eleven twelve thirteen"),
    (3L, "one two three four five six seven eight nine ten eleven twelve fourteen"),
    (4L, "completely different content about spark catalyst optimizer and tungsten engine"),
  ).toDF("doc_id", "text")

  test("exact dedup groups case-insensitive identical texts") {
    val got = Dedup.exact(docs).orderBy("keep_id").collect()
    assert(got.length == 4)
    val first = got.head
    assert(first.getAs[Long]("keep_id") == 0L && first.getAs[Long]("n_copies") == 2L)
  }

  test("ngram jaccard finds the near-dup pair and not unrelated docs") {
    val got = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 3L)))
  }

  test("ngram jaccard value matches hand computation") {
    // 11 trigrams each, 10 shared → j = 10 / (11+11-10) = 0.8333
    val j = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5)
      .select("jaccard").as[Double].head()
    assert(j == 0.8333)
  }

  test("hot-shingle pruning keeps near-dup pairs while bounding join width") {
    // shingles of the 2/3 near-dup pair are rare; df cap removes only the
    // corpus-wide hot shingles, so the pair survives with jaccard intact
    val got = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5, maxDocFreq = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 3L)))
  }

  test("minhash LSH surfaces the high-similarity pair") {
    val got = Dedup.minhashLsh(docs, k = 16, bands = 4, minEstimate = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((2L, 3L)))
    assert(!got.contains((0L, 4L)))
  }

  test("simhash distance 0 for identical token multisets, small for near-dups") {
    val sims = Dedup.simhashDocs(docs).orderBy("id").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(2L), sims(3L)) <= 10)
    assert(ham(sims(2L), sims(4L)) > 10)
  }

  test("simhash pairs candidate+verify returns near-dups only") {
    val got = Dedup.simhashPairs(docs, maxDist = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((2L, 3L)))
    assert(!got.contains((2L, 4L)))
  }

  test("embedding near-dup by cosine with explicit label blocking") {
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f, 0.0f), 1), // same vector, different block
    ).toDF("vec_id", "embedding", "label")
    val got = Dedup.embeddingNearDup(embs, threshold = 0.9, blockCol = Some("label"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L))) // 0-3 blocked apart, 0-2 orthogonal
  }

  // 64-dim corpus for the default-LSH-blocking tests: a planted near-dup
  // pair on a single low-cardinality label (the VERDICT r2 quadratic
  // scenario for label blocking).
  private lazy val wideEmbs = {
    val rnd = new scala.util.Random(3L)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val rows = (0L, base, 0) +: (1L, near, 0) +:
      (2L until 200L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat), 0))
    rows.toDF("vec_id", "embedding", "label")
  }

  test("default LSH blocking finds near-identical vectors without a label column") {
    val got = Dedup.embeddingNearDup(wideEmbs, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // near-identical vectors agree on every plane sign → same bucket
    assert(got == Set((0L, 1L)))
  }

  test("default LSH blocking bounds candidate width where label blocking is quadratic") {
    import org.apache.spark.sql.functions.{col, count, lit, max}
    // single label → label blocking puts all 200 rows in ONE block
    // (200·199/2 candidate pairs); LSH buckets split the corpus so the
    // widest block is a small fraction of it.
    val bucketed = wideEmbs.select(
      graft.functions.VectorFunctions.lshBucket(col("embedding"), Dedup.nearDupPlanes).as("blk"))
    val maxBucket = bucketed.groupBy("blk").agg(count(lit(1)).as("n"))
      .agg(max("n")).as[Long].head()
    assert(maxBucket < 60, s"widest LSH block $maxBucket of 200")
  }

  test("oversized blocks are dropped by maxItemsPerBlock before the pair join") {
    val got = Dedup.embeddingNearDup(wideEmbs, threshold = 0.99,
      blockCol = Some("label"), maxItemsPerBlock = 100L)
      .collect()
    assert(got.isEmpty) // the single 200-row label block exceeds the cap
  }

  test("verifiedJaccard on LSH candidates equals exact all-pairs jaccard") {
    val exact = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5)
      .select("id_a", "id_b", "n_common", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    val viaMinhash = Dedup.verifiedJaccard(docs,
      Dedup.minhashLsh(docs, k = 16, bands = 4, minEstimate = 0.5), threshold = 0.5)
      .as[(Long, Long, Long, Double)].collect().toSet
    val viaSimhash = Dedup.verifiedJaccard(docs,
      Dedup.simhashPairs(docs, maxDist = 10), threshold = 0.5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaMinhash == exact)
    assert(viaSimhash == exact)
  }
}
