package graft.enrich

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Live `java.net.http` implementation of [[VvEnrichment.Transport]]
  * (S7; ref endpoint shape: src/P6/vv_lookup.py:164-223 —
  * GET {base}/VariantValidator/tools/gene2transcripts/{gene}, 10 s
  * timeout, JSON body). OFF by default: [[VvEnrichment.enrich]] only
  * runs a transport when explicitly enabled, and the base URL comes
  * from VV_BASE_URL so tests point it at a local fixture server —
  * this container is zero-egress, so the public default is never
  * reachable here and exists for API parity only.
  *
  * The returned Transport is a serializable closure over plain config
  * values; the HttpClient itself lives in a JVM-local cache (one per
  * timeout config per executor), because clients hold sockets and
  * threads that must not ride along with the task closure.
  */
object VvHttp {

  val DefaultBaseUrl = "https://rest.variantvalidator.org"
  val DefaultTimeoutMs = 10000L

  private val clients = new ConcurrentHashMap[Long, HttpClient]()
  private def client(timeoutMs: Long): HttpClient =
    clients.computeIfAbsent(timeoutMs, t =>
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(t))
        .followRedirects(HttpClient.Redirect.NORMAL)
        .build())

  private lazy val mapper = new ObjectMapper()

  /** Base URL from the environment, mirroring the reference's
    * VV_BASE_URL override (ref: src/P6/vv_lookup.py:50).
    */
  def baseUrlFromEnv: String = sys.env.getOrElse("VV_BASE_URL", DefaultBaseUrl)

  def transport(baseUrl: String = baseUrlFromEnv,
      timeoutMs: Long = DefaultTimeoutMs): VvEnrichment.Transport = { gene =>
    // URLEncoder is form-encoding: it turns a space into '+', which in
    // a URL PATH segment is a literal plus — the lookup would silently
    // query the wrong symbol. Percent-escape it back.
    val url = s"${baseUrl.stripSuffix("/")}/VariantValidator/tools/gene2transcripts/" +
      java.net.URLEncoder.encode(gene, "UTF-8").replace("+", "%20")
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Accept", "application/json")
        .GET().build()
      val resp = client(timeoutMs).send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        Left(s"VV: HTTP ${resp.statusCode()} for '$gene'")
      else parseBody(gene, resp.body())
    } catch {
      case e: Exception =>
        Left(s"VV: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Parse a gene2transcripts JSON body. The public API returns either
    * an object or a one-element array; an "error" field (or a missing
    * transcript list) is a lookup failure, not an exception.
    */
  private[enrich] def parseBody(gene: String,
      body: String): Either[String, VvEnrichment.GeneXref] = {
    val parsed =
      try Right(mapper.readTree(body))
      catch { case e: Exception => Left(s"VV: unparseable JSON: ${e.getMessage}") }
    parsed.flatMap { root0 =>
      val root = if (root0.isArray && root0.size() > 0) root0.get(0) else root0
      if (root.hasNonNull("error"))
        Left(s"VV: ${root.get("error").asText()}")
      else {
        val txs = asSeq(root.path("transcripts"))
          .map(t => t.path("reference").asText(""))
          .filter(_.nonEmpty)
        if (txs.isEmpty)
          // an empty/missing transcript list is a lookup failure, not a
          // silently-null success — it must reach the vv_error channel
          Left(s"VV: no transcript data for '$gene'")
        else {
          val (ensemblTx, refseqTx) = txs.partition(_.startsWith("ENST"))
          Right(VvEnrichment.GeneXref(
            gene = orElse(root, "current_symbol", gene),
            hgncId = orElse(root, "hgnc", null),
            ensemblGeneId = orElse(root, "ensembl_gene_id", null),
            refseqTranscripts = refseqTx,
            ensemblTranscripts = ensemblTx))
        }
      }
    }
  }

  private def asSeq(n: JsonNode): Seq[JsonNode] =
    if (n.isArray) (0 until n.size()).map(n.get) else Seq.empty

  private def orElse(n: JsonNode, field: String, dflt: String): String =
    if (n.hasNonNull(field)) n.get(field).asText(dflt) else dflt
}
