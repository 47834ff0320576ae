package graft

import org.apache.spark.sql.SparkSession

import graft.api.RestServer
import graft.core.Engine

/** Standalone REST serving entrypoint — the counterpart of the reference's
  * `uvicorn app:app --host 0.0.0.0 --port 8000` (api/fastapi.py:472-478).
  *
  * Env: GRAFT_ROOT (engine root, default /tmp/graft-serve),
  * GRAFT_PORT (8000), SPARK_GRAFT_CPUS (32).
  *
  * One SparkSession backs every database under the root; the HTTP layer is
  * stateless beyond its training queues, so horizontal scale-out is N of
  * these processes behind a load balancer sharing an object-store root —
  * the catalog's epoch protocol (catalog/Catalog.scala) makes cross-driver
  * swaps safe, which a reference deployment cannot do (its LMDB + pickle
  * state is single-host).
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("GRAFT_ROOT", "/tmp/graft-serve")
    val port = sys.env.getOrElse("GRAFT_PORT", "8000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new Engine(spark, root)
    val server = new RestServer(engine, port).start()
    System.err.println(s"graft REST serving on 127.0.0.1:${server.boundPort} root=$root")
    sys.addShutdownHook { server.stop(); spark.stop() }
    Thread.currentThread().join() // serve until killed
  }
}
