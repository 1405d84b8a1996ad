package graft.tools

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession

/** Serving-layer latency/throughput measurement (r18 verdict #6): the
  * reference publishes no serving numbers (SURVEY §6 "absent"), so this
  * records the engine's own — per-route p50/p90/p99/mean over N warm
  * sequential requests plus an 8-thread saturation pass for q/s —
  * against the golden-tested Q1–Q3 routes of
  * [[graft.serve.ApiServer]] (reference api/api.py's three POST
  * endpoints). First requests per route train/load the versioned model
  * and JIT the plan — excluded via a warm-up pass, like Bench.
  *
  * Usage: runMain graft.tools.ServeBench [sfDir] [nRequests]
  * Prints one JSON line; recorded in BASELINE.md. Dev/measurement tool
  * only — not part of the driver contract.
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(200)
    val cpus = math.max(1, math.min(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      Runtime.getRuntime.availableProcessors())).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val server = new graft.serve.ApiServer(spark, dir)
    server.start()
    val port = server.boundPort

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val canon = {
      val o = mapper.createObjectNode()
      graft.query.Endpoints.canonicalFeatures.foreach {
        case (k, v) => o.put(k, v)
      }
      mapper.writeValueAsString(o)
    }
    val routes: Seq[(String, String, String)] = Seq(
      ("predict", "/predict/duration/3", canon),
      ("sensitivity", "/analyze/sensitivity/2",
        s"""{"base_features": $canon, "variable_feature_name": "Distance",
           |"variation_values": [1.0, 2.0, 3.0, 4.0, 5.0]}""".stripMargin),
      ("optimal_time", "/suggest/optimal-time/3",
        s"""{"base_conditions": $canon, "target_duration_max": 1e9,
           |"hours_to_evaluate": [6, 8, 10, 12, 14, 16, 18, 20],
           |"minute_of_hour": 30}""".stripMargin))

    def post(path: String, body: String): Int = {
      val c = new URL(s"http://127.0.0.1:$port$path")
        .openConnection().asInstanceOf[HttpURLConnection]
      c.setRequestMethod("POST"); c.setDoOutput(true)
      c.setRequestProperty("Content-Type", "application/json")
      c.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
      val code = c.getResponseCode
      // getErrorStream is null when an error response has no body —
      // surface the status code instead of NPEing past the diagnostic
      val in = if (code < 400) c.getInputStream else c.getErrorStream
      if (in != null) in.readAllBytes()
      c.disconnect(); code
    }

    def pct(sorted: Array[Double], p: Double): Double =
      sorted(math.min(sorted.length - 1,
        math.max(0, math.ceil(p * sorted.length).toInt - 1)))

    val parts = routes.map { case (name, path, body) =>
      // warm: model train/load + plan JIT outside the timed window
      (1 to 20).foreach(_ => require(post(path, body) == 200, s"warm $name"))
      val lat = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        require(post(path, body) == 200)
        (System.nanoTime() - t0) / 1e6
      }.toArray.sorted
      // saturation: 8 client threads, n requests total; non-200s are
      // counted and fail the run — a q/s built from fast error
      // responses would silently inflate the recorded numbers
      val threads = 8
      val bad = new java.util.concurrent.atomic.AtomicLong(0)
      val t0 = System.nanoTime()
      val pool = (1 to threads).map { _ =>
        new Thread(() => (1 to n / threads).foreach { _ =>
          if (post(path, body) != 200) bad.incrementAndGet()
        })
      }
      pool.foreach(_.start()); pool.foreach(_.join())
      require(bad.get() == 0, s"$name saturation: ${bad.get()} non-200s")
      val qps = (n / threads * threads) / ((System.nanoTime() - t0) / 1e9)
      println(f"[serve] $name%-12s p50=${pct(lat, 0.50)}%7.2f ms  " +
        f"p90=${pct(lat, 0.90)}%7.2f  p99=${pct(lat, 0.99)}%7.2f  " +
        f"mean=${lat.sum / lat.length}%7.2f  qps(8thr)=$qps%7.1f")
      f""""$name":{"p50_ms":${pct(lat, 0.50)}%.2f,"p90_ms":${pct(lat,
        0.90)}%.2f,"p99_ms":${pct(lat, 0.99)}%.2f,"mean_ms":${lat.sum /
        lat.length}%.2f,"qps_8thr":$qps%.1f}"""
    }
    println(s"""{"metric":"serve_bench","sf_dir":"$dir","n":$n,""" +
      parts.mkString(",") + "}")
    server.stop()
    spark.stop()
    // model-store/serving pools are non-daemon; without an explicit
    // exit the JVM lingers after main returns (observed: DestroyJavaVM
    // + 4 live pool threads)
    sys.exit(0)
  }
}
