package graft.sources

import java.io.{InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.Duration

/** S2 transport adapters — the network half of ingest that
  * [[IngestArchive.ingest]] abstracts behind its injected `fetch`
  * callback (reference: GoNonratAnnotationPipeline.java:327-342
  * dispatches on an `ftp`/`http` URL prefix and passes local paths
  * through untouched; the heavy lifting there lives in a bundled
  * downloader class built on commons-net/httpclient).
  *
  * Spark-side this is deliberately driver-only plumbing: source files
  * are single gzip archives fetched once per run, then read by the
  * cluster via [[GafReader]] — distributing a one-file download buys
  * nothing. Both adapters use ONLY the JDK (java.net.http for HTTP(S);
  * a minimal RFC 959 control/data-socket client for FTP), so the
  * zero-egress test path stays dependency-free and the production path
  * gains no library the build doesn't already carry.
  *
  * Every adapter writes to the `Path` that `ingest` hands it (the
  * `.part` temp file), so partial downloads never collide with the
  * date-stamped archive and the same-size dedup runs on complete
  * files only.
  */
object Transport {

  /** One client for the process: HttpClient is thread-safe, and each
    * instance owns a selector thread + connection pool that lives until
    * GC — a per-download client would pin one of each per archive
    * fetched. The 10s value bounds only CONNECT; per-request transfer
    * time is the `timeout` each [[http]] call carries.
    */
  private lazy val httpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  /** HTTP(S) GET to `dest`. Follows redirects; any non-2xx status
    * throws (a silent 404 body archived as a GAF would poison every
    * downstream run until the next date stamp).
    */
  def http(url: String,
           timeout: Duration = Duration.ofMinutes(5)): Path => Unit = {
    dest =>
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(timeout).GET().build()
      val resp =
        httpClient.send(req, HttpResponse.BodyHandlers.ofInputStream())
      if (resp.statusCode() / 100 != 2) {
        resp.body().close()
        throw new java.io.IOException(
          s"GET $url -> HTTP ${resp.statusCode()}")
      }
      val in = resp.body()
      try Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
  }

  /** FTP RETR to `dest` — a minimal RFC 959 client: USER/PASS login,
    * `TYPE I` (binary), `PASV` for the data connection, `RETR`. URL
    * form `ftp://[user[:pass]@]host[:port]/path`; anonymous login when
    * no credentials are given (the reference's GOA/MGI sources are
    * anonymous FTP). Active mode is deliberately unsupported: passive
    * is what survives NAT/egress filtering, and the reference's
    * sources all speak it.
    */
  def ftp(url: String,
          timeoutMs: Int = 300000): Path => Unit = { dest =>
    val uri = URI.create(url)
    require(uri.getScheme == "ftp", s"not an ftp url: $url")
    val host = uri.getHost
    val port = if (uri.getPort > 0) uri.getPort else 21
    val (user, pass) = Option(uri.getUserInfo) match {
      case Some(ui) =>
        val i = ui.indexOf(':')
        if (i >= 0) (ui.substring(0, i), ui.substring(i + 1))
        else (ui, "")
      case None => ("anonymous", "anonymous@")
    }
    val ctrl = new Socket()
    ctrl.connect(new InetSocketAddress(host, port), timeoutMs)
    ctrl.setSoTimeout(timeoutMs)
    try {
      val in = ctrl.getInputStream
      val out = ctrl.getOutputStream
      expect(in, 220)
      send(out, s"USER $user")
      val u = reply(in)
      if (u / 100 == 3) { send(out, s"PASS $pass"); expect(in, 230) }
      else if (u != 230)
        throw new java.io.IOException(s"USER rejected: $u")
      send(out, "TYPE I"); expect(in, 200)
      send(out, "PASV")
      val pasv = replyLine(in)
      if (pasv._1 != 227)
        throw new java.io.IOException(s"PASV rejected: $pasv")
      // RFC 1123 §4.1.2.6: trust the PASV port but not the address —
      // NAT'd servers advertise internal IPs; reuse the control host
      val dPort = parsePasv(pasv._2)._2
      val data = new Socket()
      data.connect(new InetSocketAddress(host, dPort), timeoutMs)
      data.setSoTimeout(timeoutMs)
      try {
        send(out, s"RETR ${uri.getPath}")
        expect(in, 150, 125)
        val din = data.getInputStream
        Files.copy(din, dest, StandardCopyOption.REPLACE_EXISTING)
        din.close()
        data.close()
        expect(in, 226, 250)
      } finally if (!data.isClosed) data.close()
      send(out, "QUIT")
    } finally ctrl.close()
    ()
  }

  /** Reference-shaped dispatch (GoNonratAnnotationPipeline.java:329):
    * `ftp://`/`http(s)://` gets a transport; anything else is a local
    * path the caller reads directly — `None`, mirroring the
    * `return file` branch.
    */
  def forUrl(url: String): Option[Path => Unit] =
    if (url.startsWith("http://") || url.startsWith("https://"))
      Some(http(url))
    else if (url.startsWith("ftp://")) Some(ftp(url))
    else None

  // --- tiny FTP protocol helpers ------------------------------------

  private def send(out: OutputStream, line: String): Unit = {
    out.write((line + "\r\n").getBytes(US_ASCII))
    out.flush()
  }

  /** Read one reply, skipping RFC 959 multi-line continuations
    * (`ddd-` opens a block closed by `ddd<space>`).
    */
  private def replyLine(in: InputStream): (Int, String) = {
    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
      if (c == -1 && sb.isEmpty)
        throw new java.io.IOException("FTP control connection closed")
      sb.toString
    }
    var line = readLine()
    if (line.length >= 4 && line.charAt(3) == '-') {
      val code = line.substring(0, 3)
      while (!(line.length >= 4 && line.startsWith(code) &&
          line.charAt(3) == ' '))
        line = readLine()
    }
    (line.take(3).toInt, line)
  }

  private def reply(in: InputStream): Int = replyLine(in)._1

  /** Wire-level failures are IOException — the same contract the HTTP
    * adapter's non-2xx path establishes — so a transport-agnostic
    * caller can retry/report every fetch error uniformly. `require`
    * stays reserved for caller bugs (e.g. a non-ftp URL).
    */
  private def expect(in: InputStream, codes: Int*): Unit = {
    val (c, line) = replyLine(in)
    if (!codes.contains(c)) throw new java.io.IOException(
      s"expected ${codes.mkString("/")}, got: $line")
  }

  /** `227 Entering Passive Mode (h1,h2,h3,h4,p1,p2)` → (host, port).
    * RFC 959 does not mandate the parentheses (wu-ftpd-style servers
    * omit them), so take the LAST six numbers — never the reply code.
    */
  private def parsePasv(line: String): (String, Int) = {
    val nums = "\\d+".r.findAllIn(line).map(_.toInt).toSeq.takeRight(6)
    if (nums.length < 6)
      throw new java.io.IOException(s"unparseable PASV reply: $line")
    (nums.take(4).mkString("."), nums(4) * 256 + nums(5))
  }
}
