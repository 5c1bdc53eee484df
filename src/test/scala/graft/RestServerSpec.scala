package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.RestServer

/** REST control surface (X2-X4): list stages, run a stage on the shared
  * session, fetch artifacts; unknown stages and traversal attempts are
  * rejected. */
class RestServerSpec extends AnyFunSuite {

  test("stages list / run / output endpoints") {
    val outDir = Files.createTempDirectory("rest").toFile
    Files.writeString(new java.io.File(outDir, "result.txt").toPath, "hello")
    var ran = 0
    val srv = new RestServer(0, outDir.getAbsolutePath, Map(
      "clean" -> (() => { ran += 1; "cleaned 42 rows" }),
      "boom" -> (() => sys.error("kaput"))))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    val http = HttpClient.newHttpClient()
    def get(p: String) = http.send(
      HttpRequest.newBuilder(URI.create(base + p)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    def post(p: String, body: String) = http.send(
      HttpRequest.newBuilder(URI.create(base + p))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    try {
      val page = get("/")
      assert(page.statusCode() == 200 &&
        page.headers().firstValue("Content-Type").orElse("").startsWith("text/html") &&
        page.body().contains("graft pipeline console") &&
        page.body().contains("fetch('run'"))
      assert(get("/no-such-path").statusCode() == 404)
      assert(get("/stages").body() == """["boom","clean"]""")
      // backend_api.py JSON-shape parity (the X3 contract): /scripts
      // wraps in {"scripts":[...]}, a COMPLETED run answers 200 with
      // stdout/stderr/returncode (failing stage = returncode 1, not an
      // HTTP error), /output-files wraps in {"files":[...]}, /output/<f>
      // in {"content":"..."}
      assert(get("/scripts").body() == """{"scripts":["boom","clean"]}""")
      val run = post("/run", """{"stage":"clean"}""")
      assert(run.statusCode() == 200 && run.body().contains("cleaned 42 rows"))
      assert(run.body().contains(""""returncode":0""") &&
        run.body().contains(""""stdout":"cleaned 42 rows"""") &&
        run.body().contains(""""stderr":""""))
      assert(ran == 1)
      assert(post("/run", """{"stage":"nope"}""").statusCode() == 400)
      val failed = post("/run", """{"stage":"boom"}""")
      assert(failed.statusCode() == 200 &&
        failed.body().contains(""""returncode":1""") &&
        failed.body().contains(""""ok":false""") &&
        failed.body().contains("kaput"))
      assert(get("/output-files").body() == """{"files":["result.txt"]}""")
      assert(get("/output/result.txt").body() == """{"content":"hello"}""")
      assert(get("/output/../../etc/passwd").statusCode() == 404)
    } finally srv.stop()
  }

  test("concurrent runs serialize (racing-writes hazard fixed, SURVEY 3.2)") {
    val outDir = Files.createTempDirectory("rest").toFile
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = new RestServer(0, outDir.getAbsolutePath, Map(
      "stage" -> (() => {
        val n = inFlight.incrementAndGet()
        maxInFlight.updateAndGet(m => math.max(m, n))
        Thread.sleep(150)
        inFlight.decrementAndGet()
        "done"
      })))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val futs = (1 to 4).map(_ => pool.submit(
        new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            val http = HttpClient.newHttpClient()
            http.send(HttpRequest.newBuilder(URI.create(base + "/run"))
              .POST(HttpRequest.BodyPublishers.ofString("""{"stage":"stage"}"""))
              .build(), HttpResponse.BodyHandlers.ofString()).statusCode()
          }
        }))
      // HTTP dispatch is a thread pool, so reads stay responsive while the
      // runs execute — the run serialization below is runExec's doing, not
      // an artifact of single-threaded HTTP dispatch
      Thread.sleep(50)
      val http = HttpClient.newHttpClient()
      val t0 = System.nanoTime()
      val stagesList = http.send(
        HttpRequest.newBuilder(URI.create(base + "/stages")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val readMs = (System.nanoTime() - t0) / 1e6
      assert(stagesList.statusCode() == 200 && readMs < 300,
        s"read blocked behind runs (${readMs}ms)")
      assert(futs.map(_.get()).forall(_ == 200))
      pool.shutdown()
      assert(maxInFlight.get() == 1,
        s"stages overlapped: ${maxInFlight.get()} in flight")
    } finally srv.stop()
  }

  test("run timeout cancels the stage (backend_api.py:26 parity)") {
    val outDir = Files.createTempDirectory("rest").toFile
    @volatile var interrupted = false
    val started = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val timedOut = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val srv = new RestServer(0, outDir.getAbsolutePath, Map(
      "slow" -> (() =>
        try { Thread.sleep(10000); "never" }
        catch { case _: InterruptedException => interrupted = true; throw new RuntimeException("interrupted") }),
      "fast" -> (() => "quick")), runTimeoutMs = 300L,
      onRunStart = id => started.add(id),
      onRunTimeout = id => timedOut.add(id))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    val http = HttpClient.newHttpClient()
    def post(p: String, body: String) = http.send(
      HttpRequest.newBuilder(URI.create(base + p))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    try {
      val run = post("/run", """{"stage":"slow"}""")
      assert(run.statusCode() == 500 && run.body().contains(""""timedOut":true"""))
      // backend_api.py:32-33 parity: the timeout path is the except branch
      // -> 500 with an "error" key
      assert(run.body().contains(""""error":"""))
      // the distributed-cancel hook fired for the run that actually started
      // (ApiMain wires setJobGroup/cancelJobGroup to these ids)
      assert(timedOut.size == 1 && started.contains(timedOut.peek()))
      // the worker thread was interrupted, and the executor is free again
      org.scalatest.concurrent.Eventually.eventually(
        org.scalatest.concurrent.Eventually.timeout(
          org.scalatest.time.Span(5, org.scalatest.time.Seconds))) {
        assert(interrupted)
      }
      val ok = post("/run", """{"stage":"fast"}""")
      assert(ok.statusCode() == 200 && ok.body().contains("quick"))
    } finally srv.stop()
  }

  test("queued run that times out never cancels a later run's job group") {
    val outDir = Files.createTempDirectory("rest").toFile
    val started = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val timedOut = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // ignores interruption for ~1.2s — the shape that used to poison the
    // queue: every queued request timed out in line and a blanket
    // cancelAllJobs could kill whatever run was executing by then
    val srv = new RestServer(0, outDir.getAbsolutePath, Map(
      "stubborn" -> (() => {
        val end = System.nanoTime() + 1200L * 1000 * 1000
        while (System.nanoTime() < end)
          try Thread.sleep(50) catch { case _: InterruptedException => () }
        "survived"
      })), runTimeoutMs = 300L,
      onRunStart = id => started.add(id),
      onRunTimeout = id => timedOut.add(id))
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val futs = (1 to 2).map(_ => pool.submit(
        new java.util.concurrent.Callable[Int] {
          def call(): Int = {
            val http = HttpClient.newHttpClient()
            http.send(HttpRequest.newBuilder(URI.create(base + "/run"))
              .POST(HttpRequest.BodyPublishers.ofString("""{"stage":"stubborn"}"""))
              .build(), HttpResponse.BodyHandlers.ofString()).statusCode()
          }
        }))
      assert(futs.map(_.get()).forall(_ == 500)) // both time out
      // both runs got distinct timeout cancels, but only ONE ever started:
      // the queued run's cancel targets an empty job group (a no-op), so it
      // cannot hit jobs submitted by the run that is still executing
      assert(timedOut.size == 2)
      assert(timedOut.toArray.toSet.size == 2)
      assert(started.size == 1)
      pool.shutdown()
    } finally srv.stop()
  }
}
