package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.CountDownLatch

import scala.util.Random

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.api.RestServer
import graft.core.Engine

/** The reference's HTTP threading tests (test_fastapi_threading.py:57-174)
  * driven through [[RestServer]]'s thread pool + async train queue over
  * real sockets: concurrent POST /add and POST /remove while POST /train
  * runs, with the exact published counters asserted via GET /info.
  * TrainConcurrencySpec proves the same windows at the Engine layer; this
  * spec proves the TRANSPORT preserves them — the request pool, the async
  * train thread, and the JSON envelopes, not just the verbs.
  *
  * Determinism: [[RestServer.TrainSeam]] pins the async train inside its
  * snapshot window (the same `onSnapshot` seam Engine.train exposes), so
  * the "during training" HTTP mutations land in an exact window instead of
  * wherever a sleep-based race puts them — the reference test threads +
  * sleeps for the same effect (test_fastapi_threading.py:80-98).
  */
class RestTrainThreadingSpec extends SparkSpec {

  // 64: the smallest dimension whose HEURISTIC params (the auto-queued
  // initial train has no explicit body) are identity-PCA valid
  private val D = 64
  private val Seed = 11L

  private lazy val seam = new RestServer.TrainSeam(() => (), kmeansIters = 3)
  private lazy val engine = new Engine(spark, tmpDir("graft-rest-thr"))
  private lazy val server = new RestServer(engine, port = 0, trainSeam = seam).start()
  private lazy val base = s"http://127.0.0.1:${server.boundPort}"
  private val client = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  override def afterAll(): Unit = {
    server.stop()
    super.afterAll()
  }

  private def get(path: String): (Int, JsonNode) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }

  private def post(path: String, json: String = ""): (Int, JsonNode) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(base + path))
        .POST(HttpRequest.BodyPublishers.ofString(json))
        .header("Content-Type", "application/json").build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readTree(r.body()))
  }

  private def mkCorpus(n: Int, seed: Long, centers: Int = 40): Array[Array[Float]] = {
    val rnd = new Random(seed)
    val cs = Array.fill(centers, D)(rnd.nextGaussian().toFloat)
    Array.tabulate(n) { i =>
      val c = cs(i % centers)
      Array.tabulate(D)(j => c(j) + 0.3f * rnd.nextGaussian().toFloat)
    }
  }

  /** POST the rows through /db/{db}/add in batches, as a client would. */
  private def httpAdd(db: String, rows: Array[Array[Float]], tag: String,
                      batch: Int = 5000): Unit =
    rows.grouped(batch).zipWithIndex.foreach { case (g, b) =>
      val body = g.zipWithIndex.map { case (v, i) =>
        s"""[${v.mkString("[", ",", "]")}, {"tag": "$tag-${b * batch + i}"}]"""
      }.mkString("""{"add_data": [""", ",", "]}")
      val (c, r) = post(s"/db/$db/add", body)
      assert(c == 200, s"add batch $b failed: $r")
    }

  private def infoOf(db: String): JsonNode = {
    val (c, b) = get(s"/db/$db/info")
    assert(c == 200)
    mapper.readTree(b.get("db_info").asText())
  }

  private def awaitStatus(db: String, want: String, timeoutS: Int = 300): String = {
    val deadline = System.nanoTime() + timeoutS * 1000L * 1000 * 1000
    var s = ""
    while ({ s = get(s"/db/$db/train")._2.get("status").asText()
             s != want && s != "failed" } && System.nanoTime() < deadline)
      Thread.sleep(100)
    s
  }

  private val trainBody =
    s"""{"pca_dimension": $D, "opq_dimension": $D, "compressed_vector_bytes": 8,
        "omit_opq": true}"""

  test("adds during train over HTTP -> exact 32,000 / 0.9375 via GET /info " +
       "(test_fastapi_threading.py:57-136; test_fastapi.py:102-152)") {
    val corpus = mkCorpus(30000, Seed)
    assert(post("/db/create", s"""{"name":"conc","vector_dimension":$D}""")._1 == 200)

    // Phase the adds so the M3 auto-train cutoff (25,000) is crossed by
    // the LAST batch: the initial-training queue — the same path the
    // reference's add endpoint takes (fastapi.py:173-186) — then snapshots
    // exactly the 30,000 rows, and the seam pins its drainer in-window.
    val pinned = new CountDownLatch(1)
    val resume = new CountDownLatch(1)
    seam.onSnapshot = () => { pinned.countDown(); resume.await() }
    httpAdd("conc", corpus.take(24000), "m")
    httpAdd("conc", corpus.drop(24000), "m2", batch = 6000)
    pinned.await()
    try {
      // the auto-queued train is pinned in its snapshot window: the
      // transport reports "in progress", the M3 queue verb shows the db,
      // and an explicit POST /train gets the reference's 400
      assert(get("/db/conc/train")._2.get("status").asText() == "in progress")
      val q0 = get("/db/get_initial_training_queue")._2
        .get("initial_training_queue")
      assert((0 until q0.size()).map(q0.get(_).asText()).contains("conc"))
      val (cd, bd) = post("/db/conc/train", trainBody)
      assert(cd == 400 && bd.get("detail").asText() ==
        "This database is in the process of training already")
      // the reference test re-adds copies of the first 2000 vectors
      httpAdd("conc", corpus.take(2000), "dup", batch = 1000)
      // and the rows are visible to reads immediately, mid-train
      assert(infoOf("conc").get("num_vectors").asLong() == 32000L)
    } finally resume.countDown()
    assert(awaitStatus("conc", "complete") == "complete")

    val info = infoOf("conc")
    assert(info.get("num_vectors").asLong() == 32000L)
    assert(info.get("num_vectors_trained_on").asLong() == 30000L)
    assert(info.get("num_new_vectors").asLong() == 2000L)
    assert(info.get("num_trained_vectors_removed").asLong() == 0L)
    assert(info.get("coverage_ratio").asDouble() == 0.9375)
    assert(info.get("trained").asBoolean())

    // a during-train duplicate serves through the trained HTTP query path:
    // id 30000+i duplicates id i, so 30007 must rank beside 7
    val q = corpus(7).mkString("[", ",", "]")
    val (cq, bq) = post("/db/conc/query",
      s"""{"query_vector": $q, "preliminary_top_k": 500, "final_top_k": 5}""")
    assert(cq == 200)
    val ids = (0 until bq.get("ids").size()).map(bq.get("ids").get(_).asLong())
    assert(ids.contains(30007L), s"during-train duplicate 30007 missing from $ids")

    // test__005 parity: removing the duplicates restores coverage 1.0
    val rmBody = (30000L until 32000L).mkString("""{"ids": [""", ",", "]}")
    assert(post("/db/conc/remove", rmBody)._1 == 200)
    val info2 = infoOf("conc")
    assert(info2.get("num_new_vectors").asLong() == 0L)
    assert(info2.get("coverage_ratio").asDouble() == 1.0)
  }

  test("removes during train over HTTP -> 24,000 -> 20,000 reconcile " +
       "(test_fastapi_threading.py:175-255)") {
    assert(post("/db/create", s"""{"name":"rm","vector_dimension":$D}""")._1 == 200)
    httpAdd("rm", mkCorpus(24000, Seed + 1), "m")

    val pinned = new CountDownLatch(1)
    val resume = new CountDownLatch(1)
    seam.onSnapshot = () => { pinned.countDown(); resume.await() }
    assert(post("/db/rm/train", trainBody)._1 == 200)
    pinned.await()
    try {
      // 4000/24000 crosses the 10% compaction threshold — the physical
      // rewrite must defer while the train holds the version (D4), yet
      // the transport sees the rows gone immediately
      val rmBody = (0L until 4000L).mkString("""{"ids": [""", ",", "]}")
      val (cr, br) = post("/db/rm/remove", rmBody)
      assert(cr == 200 && br.get("message").asText() ==
        "4000 vectors removed successfully")
      val mid = infoOf("rm")
      assert(mid.get("num_vectors").asLong() == 20000L)
      assert(mid.get("num_pending_deletes").asLong() == 4000L)
    } finally resume.countDown()
    assert(awaitStatus("rm", "complete") == "complete")

    val info = infoOf("rm")
    assert(info.get("num_vectors").asLong() == 20000L)
    assert(info.get("num_vectors_trained_on").asLong() == 24000L)
    assert(info.get("num_trained_vectors_removed").asLong() == 4000L)
    assert(info.get("num_new_vectors").asLong() == 0L)
    // the deferred compaction replayed post-swap
    assert(info.get("num_pending_deletes").asLong() == 0L)
    // removed rows are unservable, survivors are (spot-check rank-1 self-hit)
    val survivor = mkCorpus(24000, Seed + 1)(4321)
    val (cq, bq) = post("/db/rm/query",
      s"""{"query_vector": ${survivor.mkString("[", ",", "]")},
           "preliminary_top_k": 500, "final_top_k": 3}""")
    assert(cq == 200)
    val ids = (0 until bq.get("ids").size()).map(bq.get("ids").get(_).asLong())
    assert(ids.head == 4321L)
    assert(ids.forall(_ >= 4000L), s"removed id served: $ids")
  }
}
