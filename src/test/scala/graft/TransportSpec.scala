package graft

import java.io.OutputStream
import java.net.{InetAddress, InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Paths}
import java.time.LocalDate

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IngestArchive, Transport}

/** S2 transport adapters against local fixture servers (verdict r9
  * item 8): the HTTP path over a JDK HttpServer, the FTP path over a
  * minimal in-test RFC 959 server (220/USER/PASS/TYPE/PASV/RETR/QUIT —
  * the exact command sequence the client emits), and the
  * reference-shaped `forUrl` dispatch feeding [[IngestArchive]]'s
  * injected fetch. No Spark session: this is driver-side plumbing.
  */
class TransportSpec extends AnyFunSuite {

  private val payload =
    ("!gaf-version: 2.2\n" + ("UniProtKB\tP1\tgene\t" * 50)).getBytes(US_ASCII)

  test("http adapter downloads bytes; non-2xx fails loudly; forUrl " +
      "dispatch plugs into IngestArchive") {
    val server = HttpServer.create(
      new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
    server.createContext("/data/goa.gaf.gz", ex => {
      ex.sendResponseHeaders(200, payload.length.toLong)
      val os = ex.getResponseBody; os.write(payload); os.close()
    })
    server.createContext("/missing.gaf.gz", ex => {
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val dir = Files.createTempDirectory("graft_transport").toString
      val url = s"$base/data/goa.gaf.gz"
      // reference dispatch: URL -> transport, local path -> None
      assert(Transport.forUrl("/local/dir/file.gaf").isEmpty)
      val fetch = Transport.forUrl(url).get
      val r = IngestArchive.ingest(dir, "goa.gaf.gz",
        LocalDate.of(2026, 2, 1))(fetch)
      assert(r.downloaded)
      assert(Files.readAllBytes(r.path).toSeq === payload.toSeq)
      // a 404 must throw, not archive the error body
      val boom = intercept[java.io.IOException] {
        Transport.http(s"$base/missing.gaf.gz")(
          Paths.get(dir).resolve("x.part"))
      }
      assert(boom.getMessage.contains("404"), boom.getMessage)
    } finally server.stop(0)
  }

  /** Minimal single-client RFC 959 fixture: enough server to prove the
    * client's command sequence and data-channel handling. `pasvLine`
    * renders the 227 reply from the data port (parenthesized or bare —
    * RFC 959 mandates neither); `retrReply`, when set, replaces the
    * transfer with a failure reply.
    */
  private def ftpFixture(pasvLine: Int => String,
                         retrReply: Option[String] = None)
      : (ServerSocket, java.util.concurrent.CopyOnWriteArrayList[String],
         Thread) = {
    val ctrl = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val seen = new java.util.concurrent.CopyOnWriteArrayList[String]
    val t = new Thread(() => {
      val s = ctrl.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, US_ASCII))
      val out: OutputStream = s.getOutputStream
      def say(l: String): Unit = {
        out.write((l + "\r\n").getBytes(US_ASCII)); out.flush()
      }
      // multi-line banner: the client must skip the continuation block
      say("220-graft test ftpd")
      say("220 ready")
      var data: ServerSocket = null
      var go = true
      while (go) {
        val line = in.readLine()
        if (line == null) go = false
        else {
          seen.add(line)
          val cmd = line.takeWhile(_ != ' ')
          cmd match {
            case "USER" => say("331 need password")
            case "PASS" => say("230 logged in")
            case "TYPE" => say("200 binary")
            case "PASV" =>
              data = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
              say(pasvLine(data.getLocalPort))
            case "RETR" => retrReply match {
              case Some(fail) =>
                if (data != null) { data.close(); data = null }
                say(fail)
              case None =>
                say("150 opening data connection")
                val d = data.accept()
                d.getOutputStream.write(payload)
                d.close(); data.close()
                say("226 transfer complete")
            }
            case "QUIT" => say("221 bye"); go = false
            case _ => say("502 not implemented")
          }
        }
      }
      s.close()
    })
    t.setDaemon(true); t.start()
    (ctrl, seen, t)
  }

  test("ftp adapter logs in, negotiates PASV, RETRs the file") {
    val (ctrl, seen, t) = ftpFixture(p =>
      s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
    try {
      val dest = Files.createTempFile("graft_ftp", ".part")
      Transport.forUrl(
        s"ftp://127.0.0.1:${ctrl.getLocalPort}/pub/goa.gaf.gz").get(dest)
      assert(Files.readAllBytes(dest).toSeq === payload.toSeq)
      val cmds = seen.toArray.map(_.toString.takeWhile(_ != ' ')).toSeq
      assert(cmds.startsWith(Seq("USER", "PASS", "TYPE", "PASV", "RETR")),
        cmds.mkString(","))
      // anonymous login + binary mode + the requested path, verbatim
      assert(seen.get(0) === "USER anonymous")
      assert(seen.get(2) === "TYPE I")
      assert(seen.get(4) === "RETR /pub/goa.gaf.gz")
    } finally { t.join(5000); ctrl.close() }
  }

  test("paren-free PASV reply parses to the right data port (the 227 " +
      "code must never be consumed as an address octet)") {
    // wu-ftpd-style reply without parentheses: a first-six-numbers
    // parse reads [227,127,0,0] as the host and 1*256+pHi as the port
    val (ctrl, _, t) = ftpFixture(p =>
      s"227 Entering Passive Mode 127,0,0,1,${p / 256},${p % 256}")
    try {
      val dest = Files.createTempFile("graft_ftp_np", ".part")
      Transport.ftp(
        s"ftp://127.0.0.1:${ctrl.getLocalPort}/pub/goa.gaf.gz")(dest)
      assert(Files.readAllBytes(dest).toSeq === payload.toSeq)
    } finally { t.join(5000); ctrl.close() }
  }

  test("ftp server failures surface as IOException — the same contract " +
      "as the http adapter's non-2xx path") {
    val (ctrl, _, t) = ftpFixture(
      p => s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})",
      retrReply = Some("550 no such file"))
    try {
      val dest = Files.createTempFile("graft_ftp_err", ".part")
      val boom = intercept[java.io.IOException] {
        Transport.ftp(
          s"ftp://127.0.0.1:${ctrl.getLocalPort}/pub/missing.gaf.gz")(dest)
      }
      assert(boom.getMessage.contains("550"), boom.getMessage)
    } finally { t.join(5000); ctrl.close() }
  }
}
