package graft.arxiv

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Proves the reference's checkpoint-resume contract
  * (`final_tables.py:14-45`): a transport outage mid-run loses at most
  * the in-flight batch, and the rerun fetches ONLY DOIs absent from the
  * checkpoint. Transport is stubbed; call counting goes through a
  * JVM-static state object (valid in local mode, where executors share
  * the JVM). */
object StubTransportState {
  val calls = new AtomicInteger(0)
  @volatile var failAfter: Int = Int.MaxValue
  def reset(failAfterCalls: Int = Int.MaxValue): Unit = {
    calls.set(0)
    failAfter = failAfterCalls
  }
}

class StubTransport extends DoiTransport {
  def fetch(doi: String): Option[String] = {
    val n = StubTransportState.calls.incrementAndGet()
    if (n > StubTransportState.failAfter)
      throw new RuntimeException(s"transport outage at call $n")
    if (doi.endsWith("missing")) None
    else if (doi.endsWith("notok")) Some("""{"status":"error"}""")
    else {
      val cites = doi.filter(_.isDigit).toIntOption.getOrElse(0)
      Some(
        s"""{"status":"ok","message":{"type":"journal-article",
           |"is-referenced-by-count":$cites,
           |"ISSN":["1111-$cites","2222-$cites"]}}""".stripMargin.replace("\n", ""))
    }
  }
}

class CheckpointedEnricherSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("enricher-ckpt").toString + "/ckpt"

  test("payload parsing: ok rows populate fields, misses and errors stay null") {
    StubTransportState.reset()
    val dir = freshDir()
    val enricher = new CheckpointedEnricher(new StubTransport, dir, batchSize = 10)
    val dois = Seq("10.1/7", "10.1/missing", "10.1/notok").toDF("doi")
    val got = enricher.lookup(dois).collect().map(r =>
      r.getString(0) -> ((r.getString(1), Option(r.get(2)), r.getString(3)))).toMap
    // digits of "10.1/7" → 1017
    assert(got("10.1/7") == (("journal-article", Some(1017), "1111-1017")))
    assert(got("10.1/missing") == ((null, None, null)))
    assert(got("10.1/notok") == ((null, None, null)))
  }

  test("resume after mid-run outage fetches only unfetched DOIs") {
    val dir = freshDir()
    val dois = (1 to 10).map(i => s"10.2/$i").toDF("doi")

    // first run: transport dies during the third batch (after 7 calls) —
    // two full batches of 3 are committed to the checkpoint
    StubTransportState.reset(failAfterCalls = 7)
    val e1 = new CheckpointedEnricher(new StubTransport, dir, batchSize = 3)
    intercept[Exception] { e1.lookup(dois) }
    val committed = spark.read.parquet(dir).select("doi").as[String].collect().toSet
    assert(committed.size == 6, s"expected 2 committed batches, got $committed")

    // rerun with a healthy transport: exactly the 4 uncommitted DOIs fetched
    StubTransportState.reset()
    val e2 = new CheckpointedEnricher(new StubTransport, dir, batchSize = 3)
    val out = e2.lookup(dois)
    assert(out.count() == 10)
    assert(out.filter(col("type") === "journal-article").count() == 10)
    assert(StubTransportState.calls.get() == 4,
      s"rerun fetched ${StubTransportState.calls.get()} DOIs, expected 4")
  }

  test("already-complete checkpoint short-circuits with zero fetches") {
    val dir = freshDir()
    val dois = (1 to 5).map(i => s"10.3/$i").toDF("doi")
    StubTransportState.reset()
    new CheckpointedEnricher(new StubTransport, dir, batchSize = 5).lookup(dois).count()
    StubTransportState.reset()
    val out = new CheckpointedEnricher(new StubTransport, dir, batchSize = 5).lookup(dois)
    assert(out.count() == 5 && StubTransportState.calls.get() == 0)
  }

  test("per-partition rate limit floors the batch wall-clock") {
    val dir = freshDir()
    StubTransportState.reset()
    val e = new CheckpointedEnricher(new StubTransport, dir,
      batchSize = 4, minIntervalMs = 60L, fetchParallelism = 1)
    val t0 = System.nanoTime()
    e.lookup((1 to 4).map(i => s"10.4/$i").toDF("doi")).count()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 240.0, s"4 fetches at 60ms floor took ${elapsedMs}ms")
  }

  test("plugs into Augment.articleReady as the production Enricher") {
    val dir = freshDir()
    StubTransportState.reset()
    val article = Seq(
      ("art1", "Title one", "10.5/3", 2, null: String, null: String, null: String, 2020),
      ("art2", "Title two", "10.5/missing", 1, null: String, null: String, null: String, 2021),
    ).toDF("article_id", "title", "doi", "n_authors", "journal_issn", "type", "n_cites", "year")
    val gold = Augment.articleReady(article,
      new CheckpointedEnricher(new StubTransport, dir, batchSize = 10))
    val rows = gold.collect()
    // only the journal-article row survives, with enriched fields
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("article_id") == "art1"
      && r.getAs[Int]("n_cites") == 1053
      && r.getAs[String]("journal_issn") == "1111-1053")
  }
}
