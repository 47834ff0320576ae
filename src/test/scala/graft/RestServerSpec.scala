package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.api.RestServer
import graft.core.Engine

/** M1 — the HTTP transport (api/fastapi.py:67-470) exercised over real
  * sockets: route shapes, status codes, FastAPI error envelopes, and the
  * end-to-end lifecycle (create → add → query → info → remove → cache
  * verbs → train status → delete) against a live [[RestServer]] on an
  * ephemeral port.
  */
class RestServerSpec extends SparkSpec {

  private lazy val engine = new Engine(spark, tmpDir("graft-rest"))
  private lazy val server = new RestServer(engine, port = 0).start()
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

  private def vecJson(v: Seq[Double]): String = v.mkString("[", ",", "]")

  test("health + test endpoints (fastapi.py:67-73)") {
    assert(get("/health") == ((200, mapper.readTree("""{"status":"healthy"}"""))))
    assert(get("/test")._2.get("status").asText() == "healthy")
  }

  test("create: success, duplicate 400, invalid name 400 (fastapi.py:108-119)") {
    val (c1, b1) = post("/db/create", """{"name":"restdb","vector_dimension":8}""")
    assert(c1 == 200 && b1.get("message").asText() == "Database created successfully")
    val (c2, b2) = post("/db/create", """{"name":"restdb"}""")
    assert(c2 == 400 &&
      b2.get("detail").asText() == "Database with this name already exists")
    val (c3, b3) = post("/db/create", """{"name":"bad/name"}""")
    assert(c3 == 400 && b3.get("detail").asText().contains("invalid database name"))
  }

  test("add + query round-trip with dict metadata (fastapi.py:151-188, 341-353)") {
    // 8-d one-hot-ish corpus: row i points along axis i%8 with weight 1+i
    val rows = (0 until 24).map { i =>
      val v = Array.fill(8)(0.01)
      v(i % 8) = 1.0 + i
      s"""[${vecJson(v.toSeq)}, {"tag": $i}]"""
    }
    val (ca, ba) = post("/db/restdb/add",
      s"""{"add_data": [${rows.mkString(",")}]}""")
    assert(ca == 200 && ba.get("message").asText() ==
      "Vectors and text added successfully")

    // query along axis 3: best match is the largest row on that axis
    // (i = 19: axis 19%8=3, weight 20), cosine-descending
    val q = Array.fill(8)(0.0); q(3) = 1.0
    val (cq, bq) = post("/db/restdb/query",
      s"""{"query_vector": ${vecJson(q.toSeq)}, "final_top_k": 3}""")
    assert(cq == 200)
    val ids = (0 until 3).map(bq.get("ids").get(_).asLong())
    val sims = (0 until 3).map(bq.get("cosine_similarity").get(_).asDouble())
    assert(ids.head == 19L) // axis-3 rows: i = 3, 11, 19; 19 has max weight
    assert(sims == sims.sorted.reverse)
    assert(Set(3L, 11L, 19L) == ids.toSet)
    // metadata round-trips as a dict, aligned with ids
    assert(bq.get("metadata").get(0).get("tag").asInt() == 19)
  }

  test("query validation + 404 (fastapi.py:341-353)") {
    val (cm, bm) = post("/db/nosuch/query", """{"query_vector":[1,0]}""")
    assert(cm == 404 && bm.get("detail").asText() == "Database not found")
    val (cd, _) = post("/db/restdb/query", """{"query_vector":[1,0,0]}""")
    assert(cd == 400) // dimension mismatch
  }

  test("info envelope: db_info is a JSON-encoded string (fastapi.py:75-105)") {
    val (ci, bi) = get("/db/restdb/info")
    assert(ci == 200)
    assert(bi.get("db_info").isTextual) // the reference json.dumps's it
    val inner = mapper.readTree(bi.get("db_info").asText())
    assert(inner.get("name").asText() == "restdb")
    assert(inner.get("num_vectors").asLong() == 24L)
    assert(inner.get("vector_dimension").asInt() == 8)
    assert(!inner.get("trained").asBoolean())
    assert(get("/db/nosuch/info")._1 == 404)
  }

  test("remove ids (fastapi.py:191-212)") {
    val (cr, br) = post("/db/restdb/remove", """{"ids":[0,1]}""")
    assert(cr == 200 && br.get("message").asText() == "2 vectors removed successfully")
    val inner = mapper.readTree(get("/db/restdb/info")._2.get("db_info").asText())
    assert(inner.get("num_vectors").asLong() == 22L)
    assert(post("/db/restdb/remove", """{"ids":[-5]}""")._1 == 400)
  }

  test("train: async start, status endpoint, small-db bypass → failed " +
       "(fastapi.py:314-338; T3)") {
    assert(get("/db/restdb/train")._2.get("status").asText() == "not started")
    val (ct, bt) = post("/db/restdb/train")
    assert(ct == 200 && bt.get("status").asText() == "training successfully initiated")
    // 22 rows is far below the 5,000 flat floor: the async train bypasses
    // and the status endpoint reports the reference's "failed" (the swap
    // found no new index, fastapi.py:288-296)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var status = ""
    while ({ status = get("/db/restdb/train")._2.get("status").asText()
             status == "in progress" || status == "not started" } &&
           System.nanoTime() < deadline) Thread.sleep(100)
    assert(status == "failed")
    // queries still serve (flat path) after the bypass
    val q = Array.fill(8)(0.0); q(3) = 1.0
    assert(post("/db/restdb/query",
      s"""{"query_vector": ${vecJson(q.toSeq)}, "final_top_k": 2}""")._1 == 200)
    assert(post("/db/nosuch/train")._1 == 404)
  }

  test("cache verbs: view_cache / remove_from_cache / update_max_memory_usage " +
       "(fastapi.py:447-470)") {
    val (cv, bv) = get("/db/view_cache")
    assert(cv == 200 && bv.get("cache_keys").isArray &&
      bv.get("max_memory_usage").asLong() > 0)
    assert(post("/db/restdb/remove_from_cache")._2.get("message").asText() ==
      "Database removed from cache")
    val (cu, bu) = post("/db/update_max_memory_usage",
      """{"max_memory_usage": 123456789}""")
    assert(cu == 200 && bu.get("message").asText() ==
      "Max memory usage updated successfully")
    assert(get("/db/view_cache")._2.get("max_memory_usage").asLong() == 123456789L)
  }

  test("save + reload + training queues (fastapi.py:356-374, 409-445)") {
    assert(post("/db/restdb/save")._2.get("message").asText() ==
      "Database saved successfully")
    assert(post("/db/restdb/reload")._2.get("message").asText() ==
      "Database reloaded successfully")
    assert(post("/db/nosuch/save")._1 == 404)
    val (cq, bq) = get("/db/get_initial_training_queue")
    assert(cq == 200 && bq.get("initial_training_queue").isArray)
    // 22 rows: nothing is due — the sweep returns an empty queue
    val (cf, bf) = get("/db/find_indexes_to_train")
    assert(cf == 200 && bf.get("training_queue").size() == 0)
  }

  test("delete: 200 then 404 (fastapi.py:377-389)") {
    assert(post("/db/restdb/delete")._2.get("message").asText() ==
      "Database deleted successfully")
    assert(get("/db/restdb/info")._1 == 404)
    assert(post("/db/restdb/delete")._1 == 404)
  }

  test("url-encoded db names with spaces route correctly") {
    assert(post("/db/create", """{"name":"My DB-2","vector_dimension":4}""")._1 == 200)
    assert(get("/db/My%20DB-2/info")._1 == 200)
    assert(post("/db/My%20DB-2/delete")._1 == 200)
  }
}
