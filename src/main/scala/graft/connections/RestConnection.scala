package graft.connections

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import graft.template.{Api, Json}

/** REST ingestion framework (reference: the ankaflow/connections/rest
  * package; SURVEY.md §2.8).
  *
  * Driver-side HTTP (like the reference — ingestion is inherently a
  * driver/edge concern), then pages of JSON are materialized into a
  * DataFrame in one `spark.read.json` pass (scale note: pages are
  * buffered as strings and parallelized; a 100 TB pipeline would ingest
  * via object storage, not HTTP — this mirrors the reference's scope).
  *
  * Supported: auth basic/bearer/header; Pagination / StatePolling /
  * URLPolling handlers; JMESPath-subset `locator` record extraction;
  * 429 wait-and-retry with doubling, ≥500 retries, ≥400 raise
  * (rest/server.py:343-467); transport retries with exponential backoff.
  */
final class RestConnection(ctx: ConnContext) extends Connection(ctx) {

  private val client = conn.map("client")
  private val request = conn.map("request")

  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).collect { case v if v != null => v.toString }

  private def submap(m: Map[String, Any], k: String): Map[String, Any] =
    m.get(k) match {
      case Some(mm: Map[_, _]) => mm.map { case (a, b) => a.toString -> b }
      case _ => Map.empty
    }

  private lazy val http: HttpClient = {
    val timeout = str(client, "timeout").map(_.toDouble).getOrElse(5.0)
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis((timeout * 1000).toLong))
      .build()
  }

  /** One HTTP round with the reference's error policy. Returns body.
    * `payload = true` marks a DATA-file fetch: the custom errorhandler
    * condition applies to API response envelopes, not to the payload
    * bytes themselves (a JSONL record that happens to contain the
    * condition's field must not abort the download). */
  private def doRequest(method: String, url: String, headers: Map[String, String],
      body: Option[String], maxRetries: Int, initialBackoff: Double,
      payload: Boolean = false): String = {
    var rateWait = 1.0
    var attempt = 0
    var authRetried = false
    var digestHeader: Option[String] = None
    while (true) {
      val builder = HttpRequest.newBuilder().uri(URI.create(url))
      // oauth2/digest headers are re-resolved per attempt
      (headers ++ oauthHeaders ++ digestHeader.map("Authorization" -> _))
        .foreach { case (k, v) => builder.header(k, v) }
      val req = method.toUpperCase match {
        case "GET" => builder.GET().build()
        case "POST" => builder
          .POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
          .build()
        case "PUT" => builder
          .PUT(HttpRequest.BodyPublishers.ofString(body.getOrElse("")))
          .build()
        case "DELETE" => builder.DELETE().build()
        case other => sys.error(s"unsupported HTTP method: $other")
      }
      val resp: HttpResponse[String] =
        try http.send(req, HttpResponse.BodyHandlers.ofString())
        catch {
          case e: java.io.IOException if attempt < maxRetries =>
            Thread.sleep((initialBackoff * math.pow(2, attempt) * 1000).toLong)
            attempt += 1
            null
        }
      if (resp != null) {
        val code = resp.statusCode()
        if (errorStatusCodes.contains(code)) {
          // listed codes fail fast, before any retry policy
          sys.error(s"HTTP $code from $url: ${resp.body().take(500)}")
        } else if (code == 429) {
          // UNBOUNDED by reference design: the reference's 429 handler
          // re-fetches with doubling wait and never decrements its retry
          // budget (rest/server.py:349-374 — only 5xx consumes
          // self.retry), so a persistently rate-limiting endpoint waits
          // forever there too. downloadFile (no reference counterpart)
          // caps instead. Extension over the reference: an RFC 9110
          // `Retry-After: <delay-seconds>` takes precedence over the
          // doubling schedule — a rate-limiting server says when to come
          // back, and waiting less just burns its quota again.
          val retryAfter = {
            val h = resp.headers().firstValue("Retry-After")
            if (h.isPresent) scala.util.Try(h.get.toDouble).toOption else None
          }
          retryAfter match {
            case Some(sec) =>
              // clamp untrusted header input: a negative value would make
              // Thread.sleep throw, a huge one would park the thread for
              // hours — [0, 300 s] covers every sane rate limiter
              val ms = math.min(math.max(0.0, sec), 300.0) * 1000
              Thread.sleep(ms.toLong)
            case None =>
              Thread.sleep((rateWait * 1000).toLong)
              rateWait *= 2 // doubles per retry (rest/server.py:369-374)
          }
        } else if (code >= 500) {
          if (attempt >= maxRetries)
            sys.error(s"HTTP $code from $url after $attempt retries")
          Thread.sleep(((attempt + 1) * 1000).toLong)
          attempt += 1
        } else if (code == 401 && isOAuth && !authRetried) {
          // token expired mid-flow: refresh once and retry
          // (reference OAuth2Auth.auth_flow, rest/server.py:100-117)
          refreshTokens()
          authRetried = true
        } else if (code == 401 && isDigest && digestHeader.isEmpty) {
          val challenge = resp.headers().firstValue("WWW-Authenticate").orElse("")
          if (!challenge.toLowerCase.startsWith("digest"))
            sys.error(s"HTTP 401 from $url without a Digest challenge")
          val u = URI.create(url)
          val reqUri = u.getRawPath +
            Option(u.getRawQuery).map("?" + _).getOrElse("")
          digestHeader = Some(digestAnswer(challenge, method, reqUri))
        } else if (code >= 400) { // listed errorStatusCodes already raised above
          sys.error(s"HTTP $code from $url: ${resp.body().take(500)}")
        } else {
          val b = resp.body()
          if (!payload) checkCustomError(b, url)
          return b
        }
      }
    }
    sys.error("unreachable")
  }

  // Custom error detection (reference: RestErrorHandler,
  // ankaflow/models/rest.py:157-171; rest/server.py:363,415-417): a
  // `condition` JMESPath evaluated truthy on an otherwise-OK response
  // raises, with the message extracted at `message` (or the whole body);
  // `error_status_codes` forces listed codes to be treated as errors.
  private def errorHandler: Map[String, Any] = submap(request, "errorhandler")

  private def errorStatusCodes: Set[Int] =
    errorHandler.get("error_status_codes") match {
      case Some(l: List[_]) => l.map(String.valueOf(_).toInt).toSet
      case _ => Set.empty
    }

  private def checkCustomError(body: String, url: String): Unit =
    str(errorHandler, "condition").foreach { cond =>
      val parsed = try Json.parse(body) catch { case _: Exception => null }
      if (parsed != null &&
        graft.template.Renderer.stringToBool(Api.look(List(cond, parsed, null)))) {
        val msg = str(errorHandler, "message")
          .flatMap(m => Option(Api.look(List(m, parsed, null))))
          .map(String.valueOf(_))
          .getOrElse(body.take(500))
        sys.error(s"REST error from $url: $msg")
      }
    }

  private def auth: Map[String, Any] = submap(client, "auth")
  private def isOAuth: Boolean =
    str(auth, "kind").exists(_.equalsIgnoreCase("oauth2"))

  private def authHeaders: Map[String, String] = auth match {
    case a if a.isEmpty => Map.empty
    case a => str(a, "kind").getOrElse("").toLowerCase match {
      case "basic" =>
        val cred = java.util.Base64.getEncoder.encodeToString(
          s"${str(a, "username").getOrElse("")}:${str(a, "password").getOrElse("")}"
            .getBytes("UTF-8"))
        Map("Authorization" -> s"Basic $cred")
      case "bearer" =>
        Map("Authorization" -> s"Bearer ${str(a, "token").getOrElse("")}")
      case "header" =>
        submap(a, "values").map { case (k, v) => k -> String.valueOf(v) }
      case "digest" => Map.empty // challenge-driven; resolved in doRequest
      case "oauth2" => Map.empty // resolved per-attempt via oauthHeaders
      case other => sys.error(s"unsupported auth kind: $other")
    }
  }

  // ------------------------------------------------------------ Digest
  // RFC 7616 (MD5) challenge-response (reference: DigestAuthShim over
  // httpx.DigestAuth, rest/server.py:31-36): a 401 with WWW-Authenticate:
  // Digest is answered once with the computed Authorization header.
  private def isDigest: Boolean =
    str(auth, "kind").exists(_.equalsIgnoreCase("digest"))

  private var digestNc = 0

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Build the Authorization header for a Digest challenge. */
  private def digestAnswer(challenge: String, method: String,
      uri: String): String = {
    def param(k: String): Option[String] =
      (k + "=\"([^\"]*)\"").r.findFirstMatchIn(challenge).map(_.group(1))
        .orElse((k + "=([^,\\s]+)").r.findFirstMatchIn(challenge).map(_.group(1)))
    val realm = param("realm").getOrElse("")
    val nonce = param("nonce").getOrElse(sys.error("digest challenge has no nonce"))
    val qop = param("qop").map(_.split(",")(0).trim)
    val opaque = param("opaque")
    val user = str(auth, "username").getOrElse("")
    val pass = str(auth, "password").getOrElse("")
    val ha1 = md5hex(s"$user:$realm:$pass")
    val ha2 = md5hex(s"${method.toUpperCase}:$uri")
    digestNc += 1
    val nc = f"$digestNc%08x"
    val cnonce = md5hex(s"$nonce$digestNc") // deterministic client nonce
    val response = qop match {
      case Some(q) => md5hex(s"$ha1:$nonce:$nc:$cnonce:$q:$ha2")
      case None => md5hex(s"$ha1:$nonce:$ha2")
    }
    val base = Seq(
      s"""username="$user"""", s"""realm="$realm"""", s"""nonce="$nonce"""",
      s"""uri="$uri"""", s"""response="$response"""")
    val extra = qop.map(q => Seq(s"qop=$q", s"nc=$nc", s"""cnonce="$cnonce""""))
      .getOrElse(Nil) ++ opaque.map(o => s"""opaque="$o"""").toSeq
    "Digest " + (base ++ extra).mkString(", ")
  }

  // ------------------------------------------------------------ OAuth2
  // Reference: OAuth2Auth + token exchange (RFC 8693) / refresh flows,
  // ankaflow/connections/rest/server.py:58-211. Transient statuses on the
  // token endpoint retry ≤3 with 2^(n+1) backoff; a 401 on the data call
  // triggers one refresh+retry (wired in doRequest). Token state lives on
  // the resolved [[OAuth2Provider]]: `provider: <name>` looks it up in
  // the flow's oauthKeyring (rotations persist there and fire its
  // callbacks), `provider: {…}` defines one inline, and bare auth-level
  // config/refresh_token fields keep working as an anonymous inline
  // provider.
  private lazy val provider: OAuth2Provider = auth.get("provider") match {
    case Some(name: String) =>
      ctx.cfg.oauthKeyring.find(_.name == name).getOrElse(
        sys.error(s"Provider '$name' not found in keyring."))
    case Some(m: Map[_, _]) =>
      OAuth2Provider.fromMap(m.map { case (k, v) => k.toString -> v })
    case _ => OAuth2Provider.fromMap(auth)
  }

  private def accessToken: Option[String] = provider.accessToken
  private def accessToken_=(v: Option[String]): Unit = provider.accessToken = v
  private def refreshToken: Option[String] = provider.refreshToken
  private def refreshToken_=(v: Option[String]): Unit = provider.refreshToken = v

  private def oauthConfig: Map[String, Any] = provider.config

  private def oauthHeaders: Map[String, String] =
    if (!isOAuth) Map.empty
    else {
      if (accessToken.isEmpty) refreshTokens()
      val headerName = str(auth, "oauth_header").getOrElse("Authorization")
      accessToken.map { t =>
        val v = if (headerName == "Authorization") s"Bearer $t" else t
        Map(headerName -> v)
      }.getOrElse(Map.empty)
    }

  private val transientStatuses = Set(429, 500, 502, 503, 504)

  /** Fetch new tokens: refresh flow when a refresh_token is held, else
    * RFC 8693 token exchange (rest/server.py:152-189). */
  private def refreshTokens(): Unit = {
    val conf = oauthConfig
    val tokenUrl = str(conf, "access_token_url").getOrElse(
      sys.error("oauth2 requires config.access_token_url"))
    val base = refreshToken match {
      case Some(rt) => Map(
        "grant_type" -> "refresh_token",
        "refresh_token" -> rt)
      case None => Map(
        "grant_type" -> str(conf, "grant_type")
          .getOrElse("urn:ietf:params:oauth:grant-type:token-exchange"),
        "subject_token" -> provider.subjectToken
          .orElse(str(conf, "subject_token")).getOrElse(""),
        "subject_token_type" -> str(conf, "subject_token_type")
          .getOrElse("urn:ietf:params:oauth:token-type:refresh_token"),
        "requested_token_type" -> str(conf, "requested_token_type")
          .getOrElse("urn:ietf:params:oauth:token-type:access_token"))
    }
    val payload = base ++ Map(
      "client_id" -> str(conf, "client_id").getOrElse(""),
      "client_secret" -> str(conf, "client_secret").getOrElse("")) ++
      submap(conf, "extra_params").map { case (k, v) => k -> String.valueOf(v) }
    val form = payload.filter(_._2.nonEmpty).map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")

    var attempt = 0
    val maxRetries = 3
    var done = false
    while (!done) {
      val req = HttpRequest.newBuilder().uri(URI.create(tokenUrl))
        .header("Accept", "application/json")
        .header("Content-Type", "application/x-www-form-urlencoded")
        .timeout(Duration.ofSeconds(10))
        .POST(HttpRequest.BodyPublishers.ofString(form))
        .build()
      val resp: HttpResponse[String] =
        try http.send(req, HttpResponse.BodyHandlers.ofString())
        catch {
          case e: java.io.IOException =>
            if (attempt < maxRetries - 1) {
              Thread.sleep((math.pow(2, attempt + 1) * 1000).toLong)
              attempt += 1; null
            } else throw e
        }
      if (resp != null) {
        val code = resp.statusCode()
        if (transientStatuses.contains(code) && attempt < maxRetries - 1) {
          Thread.sleep((math.pow(2, attempt + 1) * 1000).toLong)
          attempt += 1
        } else if (code >= 400) {
          accessToken = None // kill switch (rest/server.py:126)
          // failure callback with the RFC 6749 error key when the
          // provider answered JSON, raw body excerpt otherwise
          // (rest/server.py:127-147), then fail the pipeline
          val (errMsg, body): (String, Any) =
            try {
              Json.parse(resp.body()) match {
                case m: Map[_, _] =>
                  val mm = m.map { case (k, v) => k.toString -> v }
                  (mm.get("error").map(String.valueOf(_))
                    .getOrElse("unknown_error"), mm)
                case other => ("non_json_response", String.valueOf(other))
              }
            } catch {
              case _: Exception => ("non_json_response", resp.body().take(200))
            }
          provider.onRefreshFail(provider.name, Map(
            "error" -> errMsg, "status_code" -> code, "body" -> body))
          sys.error(s"OAuth2 token refresh failed: HTTP $code " +
            resp.body().take(200))
        } else {
          val data = Json.parse(resp.body()) match {
            case m: Map[_, _] => m.map { case (k, v) => k.toString -> v }
            case other => sys.error(s"token endpoint returned non-object: $other")
          }
          accessToken = data.get("access_token").map(String.valueOf(_))
          data.get("refresh_token").foreach(rt =>
            refreshToken = Some(String.valueOf(rt)))
          if (accessToken.isEmpty)
            sys.error("token endpoint response has no access_token")
          // success callback so the host can persist rotated tokens
          // (rest/server.py:121-123)
          provider.onTokenRefresh(provider.name, data)
          done = true
        }
      }
    }
  }

  private def buildUrl(endpoint: String, query: Map[String, Any]): String = {
    val base = str(client, "base_url").getOrElse("").stripSuffix("/")
    val qs =
      if (query.isEmpty) ""
      else "?" + query.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(String.valueOf(v), "UTF-8")
      }.mkString("&")
    s"$base/${endpoint.stripPrefix("/")}$qs"
  }

  /** Extract the record list at `locator` (JMESPath subset) from a page. */
  private def extractRecords(body: String, locator: String): List[Any] = {
    val parsed = Json.parse(body)
    val at = if (locator == null || locator.isEmpty) parsed
      else Api.look(List(locator, parsed, null))
    at match {
      case l: List[_] => l
      case null => Nil
      case m => List(m)
    }
  }

  /** Fetch outcome: in-memory JSON records, or a downloaded data file
    * with its kind (the reference's Materializer accepts both,
    * rest/common.py:99-121 — files carry csv/parquet/jsonl payloads the
    * in-memory JSON path can't). */
  private sealed trait Fetched
  private final case class Records(rows: List[Any]) extends Fetched
  private final case class DataFile(path: String, kind: String) extends Fetched

  /** "text/csv" / "application/vnd.apache.parquet" / "jsonl" / … → kind. */
  private def contentKind(ct: String): String = {
    val c = ct.toLowerCase
    if (c.contains("parquet")) "parquet"
    else if (c.contains("csv")) "csv"
    else if (c.contains("jsonl")) "jsonl"
    else "json"
  }

  /** Binary-safe download to a temp file (parquet bodies can't ride a
    * String). Like doRequest, transient 429/5xx and IO errors retry
    * with backoff and a 401 under OAuth refreshes once — but unlike
    * doRequest (which mirrors the reference's unbounded 429 loop), 429
    * here counts against maxRetries: downloads have no reference
    * counterpart to stay faithful to, so they fail fast instead of
    * hanging. The temp file is removed on failure and at JVM exit (the
    * success path must outlive this call — Spark reads it lazily). */
  private def downloadFile(url: String, headers: Map[String, String],
      maxRetries: Int, initialBackoff: Double): String = {
    val tmp = java.nio.file.Files.createTempFile("graft_rest", ".dat")
    tmp.toFile.deleteOnExit()
    var attempt = 0
    var rateWait = 1.0
    var authRetried = false
    try {
      while (true) {
        val b = HttpRequest.newBuilder().uri(URI.create(url))
        (headers ++ oauthHeaders).foreach { case (k, v) => b.header(k, v) }
        val resp =
          try http.send(b.GET().build(),
            HttpResponse.BodyHandlers.ofFile(tmp,
              java.nio.file.StandardOpenOption.WRITE,
              java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
          catch {
            case _: java.io.IOException if attempt < maxRetries =>
              Thread.sleep((initialBackoff * math.pow(2, attempt) * 1000).toLong)
              attempt += 1
              null
          }
        if (resp != null) {
          val code = resp.statusCode()
          if (errorStatusCodes.contains(code)) {
            // configured fail-fast codes bypass every retry, as in
            // doRequest
            sys.error(s"HTTP $code from $url")
          } else if (code == 429 && attempt < maxRetries) {
            // rate-limit retries count against maxRetries like 5xx —
            // otherwise a persistently 429ing endpoint hangs forever
            Thread.sleep((rateWait * 1000).toLong)
            rateWait *= 2
            attempt += 1
          } else if (code >= 500 && attempt < maxRetries) {
            Thread.sleep(((attempt + 1) * 1000).toLong)
            attempt += 1
          } else if (code == 401 && isOAuth && !authRetried) {
            refreshTokens()
            authRetried = true
          } else if (code >= 400) {
            sys.error(s"REST file download failed: HTTP $code $url")
          } else return tmp.toString
        }
      }
      tmp.toString // unreachable
    } catch {
      case e: Throwable =>
        java.nio.file.Files.deleteIfExists(tmp)
        throw e
    }
  }

  /** Run the request + handler state machine; returns all record pages. */
  private def fetchAll(): Fetched = {
    val endpoint = str(request, "endpoint").getOrElse(sys.error("Rest: no endpoint"))
    val method = str(request, "method").getOrElse("get")
    val headers = authHeaders ++
      str(request, "content_type").map("Content-Type" -> _).toMap
    val response = submap(request, "response")
    val recLocator = str(response, "locator").getOrElse("")
    val handler = submap(response, "handler")
    val maxRetries = str(request, "max_retries").map(_.toInt).getOrElse(0)
    val backoff = str(request, "initial_backoff").map(_.toDouble).getOrElse(0.5)
    val bodyTpl = request.get("body").map(Json.write)
    val baseQuery = submap(request, "query")

    str(handler, "kind").getOrElse("") match {
      // "Basic" is the reference's explicit single-request no-op handler
      // (models/rest.py ResponseHandlerTypes.BASIC); absent/empty means
      // the same thing.
      case k if k.isEmpty || k.equalsIgnoreCase("basic") =>
        Records(extractRecords(doRequest(method, buildUrl(endpoint, baseQuery),
          headers, bodyTpl, maxRetries, backoff), recLocator))

      case "Pagination" =>
        // increment page_param per page; stop when page < page_size or
        // total_records reached (rest/rest.py:54-121)
        val pageParam = str(handler, "page_param").getOrElse("page")
        val pageSize = str(handler, "page_size").map(_.toInt).getOrElse(100)
        val increment = str(handler, "increment").map(_.toInt).getOrElse(1)
        val throttle = str(handler, "throttle").map(_.toDouble)
        val totalLocator = str(handler, "total_records").getOrElse("")
        val inBody = str(handler, "param_locator").contains("body")
        val bodyMap0: Map[String, Any] = request.get("body") match {
          case Some(m: Map[_, _]) => m.map { case (k, v) => k.toString -> v }
          case Some(s: String) => Json.parse(s) match {
            // a templated JSON-string body is fine as long as it's an object
            case m: Map[_, _] => m.map { case (k, v) => k.toString -> v }
            case other => sys.error(
              s"Pagination in body mode needs a JSON object body, got: $other")
          }
          case Some(other) => sys.error(
            s"Pagination in body mode needs an object body, got: $other")
          case None => Map.empty
        }
        val all = mutable.ListBuffer[Any]()
        // initial page comes from wherever the param lives (reference
        // reads req.body[page_param] in body mode, rest/rest.py:65)
        var page = (if (inBody) bodyMap0.get(pageParam)
          else baseQuery.get(pageParam))
          .map(String.valueOf(_).toInt).getOrElse(0)
        var continue = true
        while (continue) {
          val q = if (inBody) baseQuery else baseQuery + (pageParam -> page)
          // body mode always sends a body so the page param advances even
          // when no body template was configured
          val b = if (inBody) Some(Json.write(bodyMap0 + (pageParam -> page)))
          else bodyTpl
          val body = doRequest(method, buildUrl(endpoint, q), headers, b,
            maxRetries, backoff)
          val recs = extractRecords(body, recLocator)
          all ++= recs
          val total = if (totalLocator.nonEmpty)
            Option(Api.look(List(totalLocator, Json.parse(body), null)))
              .collect { case n: Number => n.longValue }
          else None
          continue = recs.size >= pageSize &&
            total.forall(t => all.size < t)
          page += increment
          if (continue) throttle.foreach(t => Thread.sleep((t * 1000).toLong))
        }
        Records(all.toList)

      case "StatePolling" =>
        // poll same endpoint until ready_status truthy (rest/rest.py:150-175)
        val readyLocator = str(handler, "ready_status").getOrElse("status")
        var wait = 1.0
        var result: List[Any] = null
        while (result == null) {
          val body = doRequest(method, buildUrl(endpoint, baseQuery), headers,
            bodyTpl, maxRetries, backoff)
          val parsed = Json.parse(body)
          val ready = Api.look(List(readyLocator, parsed, null))
          if (graft.template.Renderer.stringToBool(ready))
            result = extractRecords(body, recLocator)
          else { Thread.sleep((wait * 1000).toLong); wait *= 1.5 }
        }
        Records(result)

      case "URLPolling" =>
        // poll until ready, then fetch the file at the locator URL
        val readyLocator = str(handler, "ready_status").getOrElse("status")
        val urlLocator = str(handler, "locator")
          .orElse(Some(recLocator)).getOrElse("url")
        var wait = 1.0
        var fileUrl: String = null
        while (fileUrl == null) {
          val body = doRequest(method, buildUrl(endpoint, baseQuery), headers,
            bodyTpl, maxRetries, backoff)
          val parsed = Json.parse(body)
          val ready = Api.look(List(readyLocator, parsed, null))
          if (graft.template.Renderer.stringToBool(ready))
            fileUrl = String.valueOf(Api.look(List(urlLocator, parsed, null)))
          else { Thread.sleep((wait * 1000).toLong); wait *= 1.5 }
        }
        // the fetched file's payload kind comes from the response's
        // content_type (DataType enum; Materializer dispatches read_json/
        // read_csv/read_parquet on it, rest/common.py:124-140). Text
        // payloads ride doRequest (full retry + oauth + digest
        // machinery); only binary parquet needs the raw downloader,
        // which covers oauth but not digest challenges.
        contentKind(str(response, "content_type").getOrElse("json")) match {
          case "json" =>
            Records(extractRecords(doRequest("GET", fileUrl, headers, None,
              maxRetries, backoff), ""))
          case "parquet" => DataFile(
            downloadFile(fileUrl, headers, maxRetries, backoff), "parquet")
          case kind =>
            val body = doRequest("GET", fileUrl, headers, None,
              maxRetries, backoff, payload = true)
            val tmp = java.nio.file.Files.createTempFile("graft_rest", ".dat")
            tmp.toFile.deleteOnExit()
            java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
            DataFile(tmp.toString, kind)
        }

      case other => sys.error(s"unknown REST handler kind: $other")
    }
  }

  /** Materializer (rest/common.py:38-156): records → DataFrame; declared
    * `fields` stabilize empty/ragged responses. */
  override def tap(query: Option[String], limit: Option[Int]): DataFrame = {
    val declared = conn.fields
    val raw = fetchAll() match {
      case Records(records) =>
        val jsonRows = records.map(Json.write)
        val reader = spark.read
        val withSchema =
          if (declared.nonEmpty) reader.schema(SchemaUtil.toStruct(declared))
          else reader
        if (jsonRows.isEmpty && declared.nonEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            SchemaUtil.toStruct(declared))
        else withSchema.json(
          spark.createDataset(jsonRows)(org.apache.spark.sql.Encoders.STRING))
      case DataFile(p, "parquet") => spark.read.parquet(p)
      case DataFile(p, "csv") =>
        val rdr = spark.read.option("header", "true")
        if (declared.nonEmpty) rdr.schema(SchemaUtil.toStruct(declared)).csv(p)
        else rdr.option("inferSchema", "true").csv(p)
      case DataFile(p, "jsonl") =>
        if (declared.nonEmpty)
          spark.read.schema(SchemaUtil.toStruct(declared)).json(p)
        else spark.read.json(p)
      case DataFile(_, other) => sys.error(s"unsupported content kind: $other")
    }
    finishTap(raw, query, limit)
  }

  /** Sink = fire the request; body may carry the previous stage's data
    * (rest/rest.py:329-330). */
  override def sink(from: DataFrame): Unit = {
    val endpoint = str(request, "endpoint").getOrElse(sys.error("Rest: no endpoint"))
    val method = str(request, "method").getOrElse("post")
    val headers = authHeaders ++
      str(request, "content_type").map("Content-Type" -> _).toMap
    val body = request.get("body") match {
      case Some(b) => Json.write(b)
      case None => "[" + graft.core.Flow.guardedCollect(from,
        "Rest sink body", ctx.cfg.maxDriverRows).mkString(",") + "]"
    }
    doRequest(method, buildUrl(endpoint, submap(request, "query")), headers,
      Some(body),
      str(request, "max_retries").map(_.toInt).getOrElse(0),
      str(request, "initial_backoff").map(_.toDouble).getOrElse(0.5))
  }
}
