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

  test("shingle-frame forms (rescan/pin/distinct) agree on a corpus with in-doc repeats") {
    // repeated phrases INSIDE each doc: the per-row array_distinct forms
    // equal the frame-level distinct() exactly when ids are unique — the
    // precondition ngramJaccardForm's scaladoc states; this corpus makes
    // the repeat case load-bearing (docs 0/1 repeat their own trigrams),
    // and the capped run exercises the hot-df consumer under each form
    val rep = Seq(
      (0L, "alpha beta gamma alpha beta gamma alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma alpha beta gamma alpha beta gamma delta epsilon eta"),
      (2L, "one two three four five six one two three four five six seven"),
      (3L, "totally unrelated words about catalyst plans and shuffle partitions"),
    ).toDF("doc_id", "text")
    for (cap <- Seq(0L, 2L)) {
      val ref = Dedup.ngramJaccardForm(rep, 3, 0.2, "doc_id", "text", cap,
        "distinct")._1.orderBy("id_a", "id_b").collect().toSeq
      for (form <- Seq("rescan", "pin", "stage")) {
        val (df, free) = Dedup.ngramJaccardForm(rep, 3, 0.2, "doc_id", "text",
          cap, form)
        val got = df.orderBy("id_a", "id_b").collect().toSeq
        free()
        assert(got == ref, s"form=$form cap=$cap diverged from distinct")
      }
      // grouped candidate join (r14): one shuffle + per-group pair
      // emission must reproduce the self-join's pairs and n_common
      // exactly (requires the cap, so only the capped arm runs it)
      if (cap > 0) {
        val (df, free) = Dedup.ngramJaccardForm(rep, 3, 0.2, "doc_id",
          "text", cap, "rescan", joinForm = "groups")
        val got = df.orderBy("id_a", "id_b").collect().toSeq
        free()
        assert(got == ref, s"joinForm=groups cap=$cap diverged")
      }
    }
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

  test("cross-corpus near-dup finds only corpus-x-probe pairs, correctly oriented") {
    // probe = doc 3 (near-dup of corpus doc 2); corpus = the rest
    val probe = docs.filter(col("doc_id") === 3L)
    val corpus = docs.filter(col("doc_id") =!= 3L)
    val got = Dedup.crossCorpusNearDup(corpus, probe, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.toSeq.map(p => (p._1, p._2)) == Seq((2L, 3L)),
      "exactly the planted cross pair, corpus id first")
    assert(got.head._3 == 0.8333) // same exact value as the symmetric join
    // corpus-internal near-dups never appear: with 2 AND 3 both on the
    // corpus side (probe = the unrelated doc 4), the symmetric join
    // would find (2,3) but the cross join must find nothing
    val probe4 = docs.filter(col("doc_id") === 4L)
    val corpus4 = docs.filter(col("doc_id") =!= 4L)
    assert(Dedup.crossCorpusNearDup(corpus4, probe4, threshold = 0.5).count() == 0L)
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

  test("portable simhash: top 4 signature bits are zero, candidates are exactly the Hamming<=maxDist pairs") {
    // a corpus with one near-dup pair (2/3) plus case-distinct exact-dup
    // shingle sets (0/1 share every lowercased... actually differ: shingles
    // are case-sensitive, so 0/1 are far apart) — enough structure to
    // exercise both sides of the pigeonhole
    val sims = Dedup.simhashDocsPortable(docs).as[(Long, Long)].collect().toMap
    // feature hashes are < 2^60, so bits 60-63 only ever decrement
    assert(sims.values.forall(s => (s >>> Dedup.PortableSimHashBits) == 0L))
    for (maxDist <- Seq(3, 10)) {
      val brute = (for {
        a <- sims.keys; b <- sims.keys if a < b
        if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= maxDist
      } yield (a, b)).toSet
      val got = Dedup.simhashPairsPortable(docs, maxDist = maxDist)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // pigeonhole completeness AND no spurious pairs: the chunk join
      // finds exactly the Hamming<=maxDist pairs
      assert(got == brute, s"maxDist=$maxDist")
    }
  }

  test("block-combination simhash finds exactly the chunk scheme's pairs (Manku pigeonhole)") {
    // both schemes are exact on Hamming<=maxDist by pigeonhole, so their
    // verified outputs must be identical sets — the combination tables
    // only change WHERE pairs meet (30-bit keys in 20 tables vs 15-bit
    // keys in 4), not WHICH pairs survive
    // (3, 7) is the DECLARED q123 configuration (C(7,4) = 35 tables on
    // 32-36-bit keys — the rung above q116's measured 2^30 envelope)
    for ((maxDist, nBlocks) <- Seq((3, 6), (3, 7), (2, 5), (3, 4))) {
      val chunk = Dedup.simhashPairsPortable(docs, maxDist = maxDist)
        .select("id_a", "id_b", "hamming")
        .as[(Long, Long, Int)].collect().toSet
      val combo = Dedup.simhashPairsCombinatorial(docs, maxDist = maxDist,
        nBlocks = nBlocks)
        .select("id_a", "id_b", "hamming")
        .as[(Long, Long, Int)].collect().toSet
      assert(combo == chunk, s"maxDist=$maxDist nBlocks=$nBlocks")
    }
  }

  test("permuted-table simhash finds exactly the chunk scheme's pairs (double pigeonhole)") {
    // the recursive scheme (outer block + sub-block of its complement)
    // is exact on Hamming<=maxDist like the other two — identical
    // verified sets, only WHERE pairs meet differs (27-bit keys in 16
    // tables at the q122 defaults)
    for ((maxDist, nOuter, nInner) <- Seq((3, 4, 4), (2, 3, 5), (3, 5, 4))) {
      val chunk = Dedup.simhashPairsPortable(docs, maxDist = maxDist)
        .select("id_a", "id_b", "hamming")
        .as[(Long, Long, Int)].collect().toSet
      val perm = Dedup.simhashPairsPermuted(docs, maxDist = maxDist,
        nOuter = nOuter, nInner = nInner)
        .select("id_a", "id_b", "hamming")
        .as[(Long, Long, Int)].collect().toSet
      assert(perm == chunk, s"maxDist=$maxDist nOuter=$nOuter nInner=$nInner")
    }
  }

  test("pinSims/pruneSingletons dials are output-invariant (r14)") {
    // pin = one localCheckpoint of the (id, simhash) frame instead of
    // re-deriving the signature pipeline per join side; prune = drop
    // singleton (table, key) buckets before the salted self-join (a
    // 1-row bucket can't produce a pair). Both must be pure plan
    // re-shapes: identical verified sets on every scheme.
    val base = Dedup.simhashPairsCombinatorial(docs, maxDist = 3,
      pinSims = false, pruneSingletons = false)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val basePerm = Dedup.simhashPairsPermuted(docs, maxDist = 3,
      pinSims = false, pruneSingletons = false)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(basePerm == base) // schemes agree (pigeonhole), dials aside
    for (pin <- Seq(true, false); prune <- Seq(true, false)
        if pin || prune) {
      val combo = Dedup.simhashPairsCombinatorial(docs, maxDist = 3,
        pinSims = pin, pruneSingletons = prune)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
      assert(combo == base, s"combo pin=$pin prune=$prune")
      val perm = Dedup.simhashPairsPermuted(docs, maxDist = 3,
        pinSims = pin, pruneSingletons = prune)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
      assert(perm == base, s"permuted pin=$pin prune=$prune")
    }
    // same dials on the minhash band join (a singleton band bucket can't
    // hold a candidate pair; pinning the signature frame is a pure reuse)
    val lshBase = Dedup.minhashLsh(docs, pinSigs = false,
      pruneSingletons = false)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    for (pin <- Seq(true, false); prune <- Seq(true, false) if pin || prune) {
      val lsh = Dedup.minhashLsh(docs, pinSigs = pin,
        pruneSingletons = prune)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(lsh == lshBase, s"minhash pin=$pin prune=$prune")
    }
  }

  test("permuted-table segments cover each outer block's complement exactly once") {
    // structural laws of the q122 enumeration (what the generated
    // oracle packs): 16 tables; table (i,j)'s first run is outer block
    // i; the inner runs of i's four tables tile i's complement exactly;
    // widths are balanced (15 + 11..12 bits)
    val bits = Dedup.PortableSimHashBits
    val segs = Dedup.simhashPermutedSegments(bits, 4, 4)
    assert(segs.size == 16)
    val outer = Dedup.simhashBlockBounds(bits, 4)
    for (i <- 0 until 4) {
      val tables = segs.slice(i * 4, i * 4 + 4)
      assert(tables.forall(_.head == outer(i)))
      val innerBits = tables.flatMap(_.tail)
        .flatMap { case (off, w) => off until (off + w) }.sorted
      val complement = (0 until bits).filterNot(b =>
        b >= outer(i)._1 && b < outer(i)._1 + outer(i)._2)
      assert(innerBits == complement, s"outer block $i complement tiling")
      assert(tables.forall(t => { val kw = t.map(_._2).sum; kw == 26 || kw == 27 }))
    }
    // packing pin: hand-compute table (0,0)'s key for one signature —
    // outer block 0 (bits 0-14) then the complement's first 12 bits
    // (bits 15-26), packed consecutively
    val sig = 0x0FED_CBA9_8765_4321L & ((1L << bits) - 1)
    val sims = Seq((1L, sig)).toDF("id", "simhash")
    val keys = Dedup.simhashPermutedKeys(sims, maxDist = 3, bits = bits,
        nOuter = 4, nInner = 4)
      .select("tbl_idx", "tbl_key").as[(Int, Long)].collect()
      .sortBy(_._1).map(_._2).toSeq
    assert(keys.size == 16)
    val want00 = (sig & 32767L) | (((sig >>> 15) & 4095L) << 15)
    assert(keys.head == want00)
  }

  test("combo keys pack the chosen blocks' bits consecutively (q116 oracle contract)") {
    // hand-compute the 20 packed keys for one signature and pin the
    // frame's (combo_idx, combo_key) rows against them — the exact
    // arithmetic the generated oracle SQL mirrors
    val sig = 0x0FED_CBA9_8765_4321L & ((1L << 60) - 1)
    val sims = Seq((1L, sig)).toDF("id", "simhash")
    val got = Dedup.simhashComboKeys(sims, maxDist = 3,
        bits = Dedup.PortableSimHashBits, nBlocks = 6)
      .select("combo_idx", "combo_key").as[(Int, Long)].collect()
      .sortBy(_._1).map(_._2).toSeq
    def block(b: Int): Long = (sig >>> (10 * b)) & 1023L
    val want = (0 until 6).combinations(3).map { bs =>
      bs.zipWithIndex.map { case (b, j) => block(b) << (10 * j) }
        .reduce(_ | _)
    }.toSeq
    assert(got.size == 20 && got == want)
    // a single-bit flip in block b changes exactly the C(5,2) = 10 keys
    // whose combo contains b — the pigeonhole's working half
    val flipped = sig ^ (1L << 25) // bit 25 lives in block 2
    val sims2 = Seq((1L, flipped)).toDF("id", "simhash")
    val got2 = Dedup.simhashComboKeys(sims2, maxDist = 3,
        bits = Dedup.PortableSimHashBits, nBlocks = 6)
      .select("combo_idx", "combo_key").as[(Int, Long)].collect()
      .sortBy(_._1).map(_._2).toSeq
    val combos = (0 until 6).combinations(3).toSeq
    val changed = got.zip(got2).zipWithIndex
      .collect { case ((a, b), i) if a != b => i }
    assert(changed == combos.zipWithIndex
      .collect { case (bs, i) if bs.contains(2) => i })
  }

  test("q123 adversarial fixture: hand-written 7-block layout + 35 combos on a 5-sig corpus") {
    // VERDICT r13 #4/#7: q123's oracle SQL is GENERATED from the same
    // simhashCombos/simhashBlockBounds enumeration the operator packs,
    // so a bug in that shared enumeration would escape both sides. This
    // fixture is independent of it: the 9/9/9/9/8/8/8 block layout and
    // all 35 lexicographic 4-subsets are hand-written literals, and the
    // candidate/pair semantics are brute-forced — perturb the shared
    // enumeration (order, bounds, packing) and this fails even though
    // operator and oracle still agree with each other.
    val bounds = Seq((0, 9), (9, 9), (18, 9), (27, 9), (36, 8), (44, 8), (52, 8))
    val combos: Seq[Seq[Int]] = Seq(
      Seq(0,1,2,3), Seq(0,1,2,4), Seq(0,1,2,5), Seq(0,1,2,6), Seq(0,1,3,4),
      Seq(0,1,3,5), Seq(0,1,3,6), Seq(0,1,4,5), Seq(0,1,4,6), Seq(0,1,5,6),
      Seq(0,2,3,4), Seq(0,2,3,5), Seq(0,2,3,6), Seq(0,2,4,5), Seq(0,2,4,6),
      Seq(0,2,5,6), Seq(0,3,4,5), Seq(0,3,4,6), Seq(0,3,5,6), Seq(0,4,5,6),
      Seq(1,2,3,4), Seq(1,2,3,5), Seq(1,2,3,6), Seq(1,2,4,5), Seq(1,2,4,6),
      Seq(1,2,5,6), Seq(1,3,4,5), Seq(1,3,4,6), Seq(1,3,5,6), Seq(1,4,5,6),
      Seq(2,3,4,5), Seq(2,3,4,6), Seq(2,3,5,6), Seq(2,4,5,6), Seq(3,4,5,6))
    val mask = (1L << 60) - 1
    val s0 = 0x0FED_CBA9_8765_4321L & mask
    // 3 flips in 3 distinct blocks (bits 3 / 20 / 45 -> blocks 0, 2, 5)
    val s1 = s0 ^ (1L << 3) ^ (1L << 20) ^ (1L << 45)
    // 4 flips in 4 distinct blocks — just outside maxDist
    val s2 = s0 ^ (1L << 7) ^ (1L << 12) ^ (1L << 30) ^ (1L << 55)
    val s3 = s0 // exact dup
    val s4 = 0x02468_ACE1_3579_BDFL & mask // unrelated
    val sigs = Seq((10L, s0), (11L, s1), (12L, s2), (13L, s3), (14L, s4))
    val sims = sigs.toDF("id", "simhash")
    // hand-computed expected keys: pack each combo's blocks consecutively
    def handKeys(sig: Long): Seq[Long] = combos.map { bs =>
      bs.foldLeft((0L, 0)) { case ((acc, shift), b) =>
        val (off, w) = bounds(b)
        (acc | (((sig >>> off) & ((1L << w) - 1)) << shift), shift + w)
      }._1
    }
    val got = Dedup.simhashComboKeys(sims, maxDist = 3,
        bits = Dedup.PortableSimHashBits, nBlocks = 7)
      .select(col("id"), col("combo_idx"), col("combo_key"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for ((id, sig) <- sigs)
      assert(got(id) == handKeys(sig), s"combo keys of sig id=$id")
    // candidate semantics: ids sharing any (idx, key) -> exactly the
    // brute-force Hamming<=3 pairs after the Hamming filter
    val keyed = sigs.flatMap { case (id, s) =>
      handKeys(s).zipWithIndex.map { case (k, i) => ((i, k), id) } }
    val cands = keyed.groupBy(_._1).values.flatMap { g =>
      val ids = g.map(_._2).distinct.sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sigOf = sigs.toMap
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b && ham(sa, sb) <= 3
    } yield (a, b)).toSet
    assert(brute == Set((10L, 11L), (10L, 13L), (11L, 13L)))
    assert(brute.subsetOf(cands), "7-block pigeonhole completeness (hand keys)")
    assert(cands.filter { case (a, b) => ham(sigOf(a), sigOf(b)) <= 3 } == brute)
    // and the operator's own keyed join agrees with the hand candidates
    val opCands = Dedup.simhashComboKeys(sims, maxDist = 3,
        bits = Dedup.PortableSimHashBits, nBlocks = 7)
      .select(col("combo_idx").cast("long"), col("combo_key"), col("id"))
      .as[(Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).values.flatMap { g =>
        val ids = g.map(_._3).distinct.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
      }.toSet
    assert(opCands == cands)
  }

  test("pigeonhole laws hold on 360 random signatures for both table schemes") {
    // drive the REAL key frames (simhashChunkKeys / simhashComboKeys)
    // with seeded random 60-bit signatures plus planted <=3-flip pairs,
    // and check the laws over all ~65k pairs:
    //   completeness: every Hamming<=3 pair shares a chunk AND a combo
    //   exactness:    candidates filtered to Hamming<=3 = the brute set
    //   packing:      a combo key matches iff all 3 chosen blocks match
    val rnd = new scala.util.Random(11)
    val mask = (1L << Dedup.PortableSimHashBits) - 1
    val base = Seq.tabulate(300)(i => (i.toLong, rnd.nextLong() & mask))
    val planted = (0 until 60).map { i =>
      var s2 = base(i)._2
      val r = new scala.util.Random(100 + i)
      (0 until (i % 4)).foreach(_ => s2 ^= 1L << r.nextInt(60))
      (1000L + i, s2)
    }
    val all = base ++ planted
    val sigOf = all.toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val brute = (for {
      (a, sa) <- all; (b, sb) <- all if a < b && ham(sa, sb) <= 3
    } yield (a, b)).toSet
    assert(brute.size >= 45, "planted pairs must make the law non-vacuous")

    val df = all.toDF("id", "simhash")
    def candidates(keys: org.apache.spark.sql.DataFrame,
        idx: String, key: String): Set[(Long, Long)] = {
      val rows = keys.select(col(idx).cast("long"), col(key), col("id"))
        .as[(Long, Long, Long)].collect()
      rows.groupBy(r => (r._1, r._2)).valuesIterator.flatMap { g =>
        val ids = g.map(_._3).distinct.sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    }
    val chunkCand = candidates(Dedup.simhashChunkKeys(
      df.select(col("id"), col("simhash")), maxDist = 3,
      bits = Dedup.PortableSimHashBits), "chunk_idx", "chunk")
    val comboCand = candidates(Dedup.simhashComboKeys(
      df.select(col("id"), col("simhash")), maxDist = 3,
      bits = Dedup.PortableSimHashBits, nBlocks = 6), "combo_idx", "combo_key")
    assert(brute.subsetOf(chunkCand), "chunk pigeonhole completeness")
    assert(brute.subsetOf(comboCand), "combo pigeonhole completeness")
    assert(chunkCand.filter { case (a, b) => ham(sigOf(a), sigOf(b)) <= 3 } == brute)
    assert(comboCand.filter { case (a, b) => ham(sigOf(a), sigOf(b)) <= 3 } == brute)
    // packing exactness: combo candidacy == some block triple identical
    def blocks(s: Long): IndexedSeq[Long] =
      (0 until 6).map(b => (s >>> (10 * b)) & 1023L)
    val tripleMatch = (for {
      (a, sa) <- all; (b, sb) <- all if a < b
      if (0 until 6).combinations(3).exists(t =>
        t.forall(bi => blocks(sa)(bi) == blocks(sb)(bi)))
    } yield (a, b)).toSet
    assert(comboCand == tripleMatch, "combo key equality == block-triple equality")
  }

  test("radius-1 multiprobe completeness law on random plane signatures") {
    // the q113 scaladoc's contract, checked on the REAL probeBuckets /
    // coarsening columns over random 10-bit plane signatures: any two
    // signatures differing in at most ONE plane must meet (side A's
    // effective bucket inside side B's probe set, in either
    // orientation); and flips of the merged top plane are the identity
    // on the effective bucket, so top-plane-only pairs in merged
    // regions meet too
    val scheme = Dedup.AdaptiveScheme(9, 3) // planesUsed = 10, m = 3
    val rnd = new scala.util.Random(13)
    val fulls = Seq.fill(300)(rnd.nextInt(1 << 10)).distinct
    // maxProbePlanes = 0 freezes every flip -> the 1-element array holding
    // the row's own coarsened (effective) bucket
    val rows = fulls.toDF("full").select(col("full"),
        element_at(Dedup.probeBuckets(col("full"), scheme, 0), 1).as("blk"),
        Dedup.probeBuckets(col("full"), scheme).as("probes"))
      .as[(Int, Int, Seq[Int])].collect()
    val byFull = rows.map(r => r._1 -> r).toMap
    var checked = 0
    for (a <- byFull.keys; b <- byFull.keys
         if a < b && Integer.bitCount(a ^ b) <= 1) {
      val meet = byFull(a)._3.contains(byFull(b)._2) ||
        byFull(b)._3.contains(byFull(a)._2)
      assert(meet, s"fulls $a,$b differ in <=1 plane but never meet")
      checked += 1
    }
    assert(checked >= 20, "sample must exercise the law non-vacuously")
    // merged-region top-plane law: low >= m makes the top flip invisible
    for (a <- byFull.keys) {
      val b = a ^ (1 << 9) // flip the top plane
      if ((a & 511) >= 3 && byFull.contains(b))
        assert(byFull(a)._2 == byFull(b)._2,
          s"merged region: $a and $b must coarsen to the same bucket")
    }
  }

  test("rademacher plane i is independent of family size (q113 oracle prefix contract)") {
    // the q113 oracle embeds the 30-plane family and masks the bucket to
    // the low nPlanes bits — valid iff rademacherPlanes(k) is a prefix of
    // rademacherPlanes(30) for every k
    val fam = graft.functions.VectorFunctions
      .rademacherPlanes(Dedup.MaxAdaptivePlanes, 64, seed = 7L)
    for (k <- Seq(1, 4, 7, 16)) {
      val small = graft.functions.VectorFunctions.rademacherPlanes(k, 64, seed = 7L)
      assert(fam.take(k).map(_.toSeq).toSeq == small.map(_.toSeq).toSeq, s"k=$k")
    }
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

  test("adaptive near-dup: exact on candidates, high recall on planted pairs") {
    // GenScale's embedding fixture: 8 planted cosine>=0.99 pairs over a
    // 200-vector gaussian background
    val embs = graft.tools.GenScale.embeddings(spark, 0.01, seed = 42L).toDF()
    val planted = (0 until graft.tools.GenScale.nDupPairs(0.01))
      .map(p => (2L * p, 2L * p + 1)).toSet

    // brute-force ground truth at the same rounded threshold
    val vecs = embs.as[(Long, Array[Float], Int)].collect().map(v => v._1 -> v._2).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val truth = (for {
      i <- vecs.keys; j <- vecs.keys if i < j
      if math.rint(cos(vecs(i), vecs(j)) * 10000) / 10000 >= 0.99
    } yield (i, j)).toSet

    val got = Dedup.embeddingNearDupAdaptive(embs, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(truth), "every reported pair is a true >=threshold pair")
    val recall = got.intersect(planted).size.toDouble / planted.size
    assert(recall >= 0.8, s"planted recall $recall (multiprobe radius 1)")

    // a smaller bucket target forces MORE planes; exactness must hold and
    // recall stay useful (the documented recall/cost dial)
    val fine = Dedup.embeddingNearDupAdaptive(embs, threshold = 0.99, targetPerBucket = 4L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fine.subsetOf(truth))
    assert(fine.intersect(planted).size.toDouble / planted.size >= 0.8)

    // deterministic under input repartitioning
    val again = Dedup.embeddingNearDupAdaptive(embs.repartition(13), threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(again == got)
  }

  test("oversized blocks are dropped by maxItemsPerBlock before the pair join") {
    val got = Dedup.embeddingNearDup(wideEmbs, threshold = 0.99,
      blockCol = Some("label"), maxItemsPerBlock = 100L)
      .collect()
    assert(got.isEmpty) // the single 200-row label block exceeds the cap
  }

  test("spanDupStats counts shared windows, not near-dup pairs") {
    // docs 2/3: 13 tokens -> 6 windows of 8; token 13 differs, so windows
    // 1-5 are shared and window 6 is not. docs 0/1 differ in case (windows
    // are case-sensitive) and doc 4 has 10 tokens -> 3 unique windows.
    val got = Dedup.spanDupStats(docs, windowTokens = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(2L) == ((6L, 5L, 0.8333)))
    assert(got(3L) == ((6L, 5L, 0.8333)))
    assert(got(0L) == ((7L, 0L, 0.0)))
    assert(got(1L) == ((7L, 0L, 0.0)))
    assert(got(4L) == ((3L, 0L, 0.0)))
  }

  test("spanDupStats: exact copies are fully duplicated, short docs report zero") {
    val f = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "too short for windows"),
    ).toDF("doc_id", "text")
    val got = Dedup.spanDupStats(f, windowTokens = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == ((3L, 3L, 1.0)) && got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((0L, 0L, 0.0)), "doc below window width still gets a row")
  }

  test("ngramContainment catches a doc embedded in a larger one that jaccard misses") {
    val prefix = "one two three four five six seven eight nine ten eleven twelve"
    val f = Seq(
      (0L, prefix), // 12 tokens -> 10 trigrams, all present in doc 1
      (1L, prefix + " alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "completely unrelated content about catalyst and tungsten and codegen"),
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(f, n = 3, threshold = 0.5)
      .as[(Long, Long, Long, Double)].collect()
    assert(cont.toSeq == Seq((0L, 1L, 10L, 1.0)),
      "all 10 of the smaller doc's trigrams occur in the larger doc")
    // the same pair is invisible to jaccard at the same threshold:
    // j = 10 / (10 + 22 - 10) = 0.4545
    val jac = Dedup.ngramJaccard(f, n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(!jac.contains((0L, 1L)))
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

  test("prefix-filter candidates are a superset of qualifying pairs and prune hard") {
    // fixture corpus: a planted near-dup cluster over unrelated docs
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val truePairs = Dedup.ngramJaccard(corpus, n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cands = Dedup.prefixCandidates(corpus, threshold = 0.5)
      .as[(Long, Long)].collect().toSet
    assert(truePairs.subsetOf(cands),
      s"prefix filter lost ${(truePairs -- cands).size} qualifying pairs")
    val n = corpus.count()
    val allPairs = n * (n - 1) / 2
    assert(cands.size < allPairs / 10,
      s"prefix filter must prune: ${cands.size} candidates of $allPairs pairs")
    // end-to-end: verification makes the output exactly the true pair set
    val verified = Dedup.verifiedJaccard(corpus,
      Dedup.prefixCandidates(corpus, threshold = 0.5), threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(verified == truePairs)
  }

  test("prefix-filter df guard warns on uniform corpora, stays silent on diverse ones") {
    // degenerate corpus: 40 docs over a 6-word vocabulary — every
    // 3-shingle is shared by a large fraction of docs, the measured
    // adversarial case (exponent 1.08); the guard must fire
    val rnd = new scala.util.Random(42L)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val uniform = (0L until 40L).map { id =>
      (id, Seq.fill(10)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val warn = Dedup.prefixFilterWarning(uniform)
    assert(warn.isDefined, "uniform corpus must trigger the guard")
    assert(warn.get.contains("minhashLsh"), "warning names the substitute route")
    // the profile the decision is made from is coherent
    val prof = Dedup.shingleDfProfile(uniform).head()
    assert(prof.getLong(0) == 40L, "n_docs")
    assert(prof.getLong(3) > 2L, "p99 df is genuinely high here")
    // diverse corpus: the driver fixture (Heaps-ish vocabulary) — silent
    val diverse = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(Dedup.prefixFilterWarning(diverse).isEmpty,
      "realistic corpus must not trigger the guard")
    // the guard is diagnostic only: candidates identical with and without
    val withGuard = Dedup.prefixCandidates(uniform, threshold = 0.5)
      .as[(Long, Long)].collect().toSet
    val without = Dedup.prefixCandidates(uniform, threshold = 0.5, guard = false)
      .as[(Long, Long)].collect().toSet
    assert(withGuard == without)
  }

  test("incrementalNearDup: priorities, blame ids, and degenerate frames") {
    // history: 10 (near-dups batch 2/3 family), 4 (unrelated)
    val history = docs.filter(col("doc_id").isin(4L))
      .unionByName(Seq((10L, "one two three four five six seven eight nine ten eleven twelve thirteen"))
        .toDF("doc_id", "text"))
    val batch = docs.filter(col("doc_id").isin(0L, 1L, 2L, 3L))
    val got = Dedup.incrementalNearDup(history, batch, threshold = 0.5)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    // 2 and 3 near-dup history doc 10 -> dup_history beats the in-batch
    // pair they also form; 0/1 differ in CASE, so raw-shingle Jaccard
    // sees no overlap (only exact dedup's lowercased fingerprint joins
    // them) -> both kept
    assert(got == Seq(
      (0L, "kept", -1L), (1L, "kept", -1L),
      (2L, "dup_history", 10L), (3L, "dup_history", 10L)))
    // empty batch -> empty verdict frame, no failure
    assert(Dedup.incrementalNearDup(history, batch.limit(0)).count() == 0)
    // empty history -> pure within-batch dedup (lower-id wins)
    val noHist = Dedup.incrementalNearDup(batch.limit(0), batch, threshold = 0.5)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(noHist == Seq(
      (0L, "kept", -1L), (1L, "kept", -1L),
      (2L, "kept", -1L), (3L, "dup_batch", 2L)))
  }

  test("prefix-filter bound holds on random corpora across thresholds") {
    // randomized trial of the SSJoin prefix theorem: on corpora designed
    // to produce borderline Jaccard values (tiny vocab, short docs), the
    // verified prefix-join output must equal exact ngramJaccard for
    // every threshold — a fixture can't probe the bound's edge cases,
    // random borderline pairs can
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 1 to 5; t <- Seq(0.3, 0.5, 0.8)) {
      val corpus = (0L until 30L).map { id =>
        val n = 5 + rnd.nextInt(8)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val exact = Dedup.ngramJaccard(corpus, n = 3, threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val viaPrefix = Dedup.verifiedJaccard(corpus,
        Dedup.prefixCandidates(corpus, threshold = t), threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(viaPrefix == exact,
        s"trial $trial t=$t: prefix join lost ${(exact -- viaPrefix).size} / " +
          s"invented ${(viaPrefix -- exact).size} pairs")
    }
  }
}
