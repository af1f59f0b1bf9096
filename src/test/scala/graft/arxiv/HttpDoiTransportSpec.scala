package graft.arxiv

import java.io.IOException
import org.scalatest.funsuite.AnyFunSuite

/** Retry/backoff policy test with a scripted fake [[HttpGet]] — no live
  * HTTP (the CheckpointedEnricher specs keep their stub transports; this
  * covers the production transport's policy layer). */
class HttpDoiTransportSpec extends AnyFunSuite {

  /** Scripted responses: Left(e) throws, Right((status, body)) returns.
    * Records every requested URL and every backoff sleep. */
  private class Scripted(script: (Either[IOException, (Int, String)])*) extends HttpGet {
    val urls = scala.collection.mutable.ArrayBuffer.empty[String]
    private val it = script.iterator
    def get(url: String): (Int, String) = {
      urls += url
      if (!it.hasNext) fail("transport called more times than scripted")
      it.next() match {
        case Left(e) => throw e
        case Right(r) => r
      }
    }
  }

  private def transport(http: Scripted,
      sleeps: scala.collection.mutable.ArrayBuffer[Long]) =
    new HttpDoiTransport(http, maxAttempts = 3, backoffBaseMs = 100L,
      mailto = Some("ops@example.org"), sleeper = sleeps += _)

  test("200 returns the body with no retry, no sleep") {
    val http = new Scripted(Right((200, """{"status":"ok"}""")))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(transport(http, sleeps).fetch("10.1/x").contains("""{"status":"ok"}"""))
    assert(sleeps.isEmpty && http.urls.size == 1)
  }

  test("5xx retries with exponential backoff until success") {
    val http = new Scripted(Right((500, "")), Right((503, "")), Right((200, "ok")))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(transport(http, sleeps).fetch("10.1/x").contains("ok"))
    assert(sleeps.toSeq == Seq(100L, 200L), "base * 2^(attempt-1)")
    assert(http.urls.size == 3)
  }

  test("429 is retried like a 5xx (rate-limit pushback)") {
    val http = new Scripted(Right((429, "")), Right((200, "ok")))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(transport(http, sleeps).fetch("10.1/x").contains("ok"))
    assert(sleeps.toSeq == Seq(100L))
  }

  test("transient 408/425 are retried, not recorded as misses") {
    val http = new Scripted(Right((408, "")), Right((425, "")), Right((200, "ok")))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(transport(http, sleeps).fetch("10.1/x").contains("ok"))
    assert(sleeps.toSeq == Seq(100L, 200L))
  }

  test("persistent 5xx throws after maxAttempts — checkpoint-resume takes over") {
    val http = new Scripted(Right((500, "")), Right((502, "")), Right((500, "")))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val e = intercept[IOException](transport(http, sleeps).fetch("10.1/x"))
    assert(e.getMessage.contains("after 3 attempts"))
    assert(sleeps.toSeq == Seq(100L, 200L), "no sleep after the final attempt")
  }

  test("transport-level IOExceptions retry, then surface the cause") {
    val boom = new IOException("connection reset")
    val http = new Scripted(Left(boom), Right((200, "ok")))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(transport(http, sleeps).fetch("10.1/x").contains("ok"))

    val http2 = new Scripted(Left(boom), Left(boom), Left(boom))
    val e = intercept[IOException](
      transport(http2, scala.collection.mutable.ArrayBuffer.empty[Long]).fetch("10.1/x"))
    assert(e.getCause eq boom)
  }

  test("404 and other 4xx are graceful misses: None, no retry, no sleep") {
    for (status <- Seq(404, 400, 403)) {
      val http = new Scripted(Right((status, "")))
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      assert(transport(http, sleeps).fetch("10.1/x").isEmpty, s"status $status")
      assert(sleeps.isEmpty && http.urls.size == 1)
    }
  }

  test("url is path-encoded and carries the polite-pool mailto") {
    val http = new Scripted(Right((200, "ok")))
    val t = transport(http, scala.collection.mutable.ArrayBuffer.empty[Long])
    t.fetch("10.1000/a<b>/c d")
    val u = http.urls.head
    assert(u.startsWith("https://api.crossref.org/works/"))
    assert(u.contains("%2F"), "DOI slashes encoded")
    assert(!u.contains("<") && !u.contains(" "), "DOI special chars encoded")
    // PATH encoding, not form encoding: a '+' in the path would be sent
    // verbatim to the server (servers don't decode '+' in paths) and a
    // space-bearing DOI would silently 404
    assert(u.contains("%20") && !u.substring(0, u.indexOf('?')).contains("+"),
      s"space percent-encoded in path: $u")
    assert(u.endsWith("?mailto=ops%40example.org"))
  }

  test("the checkpointed enricher runs end-to-end over the policy transport") {
    // flaky-but-recovering transport under the REAL enricher loop:
    // every DOI first 503s, then succeeds — retry absorbs the blips and
    // the checkpoint ends complete.
    val spark = graft.SparkSpec.session
    import spark.implicits._
    FlakyRecovering.seen.clear()
    val dir = java.nio.file.Files.createTempDirectory("http_enrich").toString
    val enricher = new CheckpointedEnricher(
      new HttpDoiTransport(new FlakyRecovering, maxAttempts = 3, backoffBaseMs = 1L),
      s"$dir/checkpoint", batchSize = 2)
    val got = enricher.lookup(Seq("10.1/a", "10.1/b", "10.1/c").toDF("doi"))
      .orderBy("doi").as[(String, String, Int, String)].collect().toSeq
    assert(got == Seq(
      ("10.1/a", "journal-article", 7, "1234-5678"),
      ("10.1/b", "journal-article", 7, "1234-5678"),
      ("10.1/c", "journal-article", 7, "1234-5678")))
    assert(FlakyRecovering.seen.values.forall(_ == 2), "each DOI: one 503 + one 200")
  }
}

/** Top-level (no outer-class capture — ships through mapPartitions in
  * local mode): first call per URL 503s, second succeeds. State lives in
  * the companion, outside serialization. */
private class FlakyRecovering extends HttpGet {
  def get(url: String): (Int, String) = FlakyRecovering.synchronized {
    val n = FlakyRecovering.seen.getOrElse(url, 0)
    FlakyRecovering.seen(url) = n + 1
    if (n == 0) (503, "")
    else (200,
      """{"status":"ok","message":{"type":"journal-article",""" +
        """"is-referenced-by-count":7,"ISSN":["1234-5678"]}}""")
  }
}

private object FlakyRecovering {
  val seen = scala.collection.mutable.Map.empty[String, Int]
}
