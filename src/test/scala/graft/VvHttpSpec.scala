package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._

import graft.enrich.{VvEnrichment, VvHttp}
import graft.enrich.VvEnrichment.RetryPolicy

/** S7 live-transport spec: the java.net.http transport against a local
  * HTTP fixture server (zero egress — the public endpoint is never
  * touched). Covers parse, error mapping, retry policy, and the
  * end-to-end distinct-set enrichment contract.
  */
class VvHttpSpec extends SparkSpec {
  import spark.implicits._

  private val okBody =
    """{"current_symbol":"BRCA1","hgnc":"HGNC:1100","ensembl_gene_id":"ENSG00000012048",
      |"transcripts":[{"reference":"NM_007294.4"},{"reference":"ENST00000357654"},
      |{"reference":"NR_027676.2"}]}""".stripMargin

  /** Serve `routes(path, hitNumber)`; hands the base URL to `body`. */
  private def serve(routes: (String, Int) => (Int, String))(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new ConcurrentHashMap[String, Integer]()
    server.createContext("/", { exchange =>
      // RAW path: percent-escapes stay visible, so routes can assert
      // exactly what goes on the wire
      val path = exchange.getRequestURI.getRawPath
      val n: Int = hits.merge(path, 1, (a, b) => a + b)
      val (code, payload) = routes(path, n)
      val bytes = payload.getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(code, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("http transport parses gene2transcripts JSON; transcripts split by prefix") {
    serve((_, _) => (200, okBody)) { base =>
      val out = VvHttp.transport(base)("BRCA1")
      assert(out == Right(VvEnrichment.GeneXref("BRCA1", "HGNC:1100",
        "ENSG00000012048", Seq("NM_007294.4", "NR_027676.2"), Seq("ENST00000357654"))))
    }
  }

  test("gene symbols percent-encode in the path: space becomes %20, never '+'") {
    // URLEncoder alone would send ".../MT-TL+1" — a literal plus in a
    // path segment, silently querying the wrong symbol
    serve { (path, _) =>
      if (path.endsWith("/MT-TL%201")) (200, okBody) else (404, """{"error":"wrong path"}""")
    } { base =>
      assert(VvHttp.transport(base)("MT-TL 1").isRight)
    }
  }

  test("http transport maps HTTP failures and API error bodies to Left") {
    serve { (path, _) =>
      if (path.endsWith("/NOPE")) (200, """{"error":"gene not found"}""")
      else (500, "boom")
    } { base =>
      assert(VvHttp.transport(base)("NOPE") == Left("VV: gene not found"))
      assert(VvHttp.transport(base)("TP53") == Left("VV: HTTP 500 for 'TP53'"))
    }
    // connection refused (nothing listening) degrades to Left, not a throw
    val dead = VvHttp.transport("http://127.0.0.1:1", timeoutMs = 500)("G")
    assert(dead.isLeft)
    // a 200 with no transcript data is a lookup FAILURE, not a
    // null-field success
    serve((_, _) => (200, """{"current_symbol":"GHOST","transcripts":[]}""")) { base =>
      assert(VvHttp.transport(base)("GHOST") ==
        Left("VV: no transcript data for 'GHOST'"))
    }
  }

  test("retry policy drives the http transport: two 500s then success") {
    serve { (_, n) => if (n < 3) (500, "flaky") else (200, okBody) } { base =>
      val out = VvEnrichment.withRetry(VvHttp.transport(base),
        RetryPolicy(sleeper = _ => ()))("BRCA1")
      assert(out.exists(_.hgncId == "HGNC:1100"))
    }
  }

  test("end-to-end enrich over http: one call per distinct gene, xrefs joined back") {
    val hitCount = new ConcurrentHashMap[String, Integer]()
    serve { (path, _) =>
      hitCount.merge(path, 1, (a, b) => a + b)
      if (path.endsWith("/BAD")) (404, "not found") else (200, okBody)
    } { base =>
      val recs = Seq(("P1", "BRCA1"), ("P2", "BRCA1"), ("P3", "BAD"))
        .toDF("patient", "gene_symbol")
      val out = VvEnrichment.enrich(recs, "gene_symbol",
        VvHttp.transport(base), enabled = true,
        policy = RetryPolicy(sleeper = _ => ()))
        .collect().map(r => r.getAs[String]("patient") ->
          ((r.getAs[String]("hgnc_id"), r.getAs[String]("vv_error")))).toMap
      assert(out("P1") == (("HGNC:1100", null)))
      assert(out("P2") == (("HGNC:1100", null)))
      assert(out("P3")._1 == null && out("P3")._2 == "VV: HTTP 404 for 'BAD'")
      // distinct-set contract: BRCA1 fetched once, BAD retried 4x
      var brca = 0; var bad = 0
      hitCount.forEach { (k, v) =>
        if (k.endsWith("/BRCA1")) brca = v else if (k.endsWith("/BAD")) bad = v
      }
      assert(brca == 1, s"BRCA1 fetched $brca times")
      assert(bad == 4, s"BAD fetched $bad times (expected 4 retry attempts)")
    }
  }
}
