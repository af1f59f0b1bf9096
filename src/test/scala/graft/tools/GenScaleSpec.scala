package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards the credibility of the BENCH_SCALE artifact: the generator
  * must be deterministic (same seed → byte-identical rows, regardless
  * of run or parallelism) and the planted structure the scale family
  * measures against must actually exist at every sf. */
class GenScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sf = 0.01 // 500 docs / 200 vecs / 60k lineitem — fast

  test("documents generation is deterministic and plants J>=0.5 clusters") {
    val a = GenScale.documents(spark, sf, seed = 42L).collect().sortBy(_.doc_id)
    val b = GenScale.documents(spark, sf, seed = 42L).collect().sortBy(_.doc_id)
    assert(a.map(_.text).toSeq == b.map(_.text).toSeq, "same seed, same corpus")
    assert(a.length == GenScale.nDocs(sf))
    // a different seed changes the corpus
    val c = GenScale.documents(spark, sf, seed = 43L).collect().sortBy(_.doc_id)
    assert(a.map(_.text).toSeq != c.map(_.text).toSeq)

    def tri(t: String): Set[Seq[String]] =
      t.split(" ").toSeq.sliding(3).map(_.toSeq).toSet
    val byId = a.map(d => d.doc_id -> d.text).toMap
    // every planted cluster: representative vs members J >= 0.5
    val clusters = GenScale.nClusters(sf)
    val jacs = (0 until clusters).flatMap { cl =>
      val base = tri(byId(cl.toLong * GenScale.ClusterSize))
      (1 until GenScale.ClusterSize).map { m =>
        val o = tri(byId(cl.toLong * GenScale.ClusterSize + m))
        (base & o).size.toDouble / (base | o).size
      }
    }
    assert(jacs.forall(_ >= 0.5), s"planted pairs above threshold: min=${jacs.min}")
    // background docs: a sample of non-cluster pairs sits far below
    val bg = a.drop(clusters * GenScale.ClusterSize).take(40).map(d => tri(d.text))
    val bgJacs = for (i <- bg.indices; j <- (i + 1) until bg.length)
      yield (bg(i) & bg(j)).size.toDouble / (bg(i) | bg(j)).size
    assert(bgJacs.max < 0.5, s"background stays below threshold: max=${bgJacs.max}")
  }

  test("embeddings plant cosine>=0.99 pairs over a gaussian background") {
    val e = GenScale.embeddings(spark, sf, seed = 42L).collect().sortBy(_.vec_id)
    assert(e.length == GenScale.nVecs(sf))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val byId = e.map(v => v.vec_id -> v.embedding).toMap
    val pairs = GenScale.nDupPairs(sf)
    val cosines = (0 until pairs).map(p => cos(byId(2L * p), byId(2L * p + 1)))
    assert(cosines.forall(_ >= 0.99), s"planted cosines: min=${cosines.min}")
    // background pair of high-dim gaussians: cosine concentrates near 0
    assert(math.abs(cos(byId(e.length - 1L), byId(e.length - 2L))) < 0.6)
  }

  test("lineitem key spaces scale with sf and rows are deterministic") {
    val li = GenScale.lineitem(spark, sf, seed = 42L)
    val (rows, maxPart, maxSupp) = li
      .agg(count(lit(1)), max("l_partkey"), max("l_suppkey"))
      .as[(Long, Long, Long)].head()
    assert(rows == GenScale.nLineitem(sf))
    assert(maxPart < GenScale.nParts(sf) && maxSupp < GenScale.nSupps(sf))
    val again = GenScale.lineitem(spark, sf, seed = 42L)
      .agg(sum(col("l_extendedprice"))).as[Double].head()
    val first = li.agg(sum(col("l_extendedprice"))).as[Double].head()
    assert(again == first, "identical aggregate under regeneration")
  }
}
