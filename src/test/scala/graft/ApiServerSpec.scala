package graft

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import com.fasterxml.jackson.databind.ObjectMapper
import graft.query.Endpoints
import graft.serve.ApiServer

/** The HTTP shell (reference api/api.py:77-313 parity): routes, status
  * codes, validation messages, and agreement with the underlying
  * Endpoints dataflows. */
class ApiServerSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private lazy val server: ApiServer = {
    val s = new ApiServer(spark, sf)
    s.start()
    s
  }

  private def post(path: String, body: String): (Int, String) = {
    val url = new URL(s"http://127.0.0.1:${server.boundPort}$path")
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("POST")
    c.setDoOutput(true)
    c.setRequestProperty("Content-Type", "application/json")
    c.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    val code = c.getResponseCode
    val in = if (code < 400) c.getInputStream else c.getErrorStream
    val text = new String(in.readAllBytes(), StandardCharsets.UTF_8)
    c.disconnect()
    (code, text)
  }

  private def canonicalJson: String = {
    val o = mapper.createObjectNode()
    Endpoints.canonicalFeatures.foreach { case (k, v) => o.put(k, v) }
    mapper.writeValueAsString(o)
  }

  test("POST /predict/duration/3 with the canonical payload matches q1Predict") {
    val (code, body) = post("/predict/duration/3", canonicalJson)
    assert(code == 200, body)
    val node = mapper.readTree(body)
    assert(node.get("model_version_used").asText() == "model_3")
    val want = Endpoints.q1Predict(spark, sf)
      .collect()(0).getAs[Double]("predicted_duration")
    assert(node.get("predicted_duration").asDouble() == want)
    assert(node.get("missing_features_defaulted").isNull)
  }

  test("missing features default to 0.0 and are reported; invalid values 400") {
    val (code, body) = post("/predict/duration/1", """{"Distance": 3.5}""")
    assert(code == 200, body)
    val node = mapper.readTree(body)
    val reported = node.get("missing_features_defaulted")
    assert(reported.isArray && reported.size() == 18, body)
    val (code2, body2) =
      post("/predict/duration/1", """{"Distance": "not-a-number"}""")
    assert(code2 == 400, body2)
    assert(mapper.readTree(body2).get("error").asText()
      .contains("Invalid non-numeric"), body2)
  }

  test("unknown model version 404, empty body 400, GET 405") {
    val (code, _) = post("/predict/duration/9", canonicalJson)
    assert(code == 404)
    val (code2, _) = post("/predict/duration/2", "")
    assert(code2 == 400)
    val url = new URL(s"http://127.0.0.1:${server.boundPort}/predict/duration/1")
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("GET")
    assert(c.getResponseCode == 405)
    c.disconnect()
  }

  test("POST /analyze/sensitivity validates the payload and batches the grid") {
    val payload = s"""{"base_features": $canonicalJson,
      "variable_feature_name": "Distance",
      "variation_values": [1.0, 2.0, 3.0]}"""
    val (code, body) = post("/analyze/sensitivity/2", payload)
    assert(code == 200, body)
    val results = mapper.readTree(body).get("analysis_results")
    assert(results.size() == 3, body)
    // agreement with the dataflow
    val want = Endpoints.q2Sensitivity(spark, sf, 2, "Distance",
        Seq(1.0f, 2.0f, 3.0f)).collect()
      .map(r => r.getAs[Double]("prediction")).toSeq
    val got = (0 until 3).map(i =>
      results.get(i).get("predicted_duration").asDouble())
    assert(got == want)
    val bad = s"""{"base_features": $canonicalJson,
      "variable_feature_name": "NotAFeature", "variation_values": [1.0]}"""
    val (code2, body2) = post("/analyze/sensitivity/2", bad)
    assert(code2 == 400 &&
      mapper.readTree(body2).get("error").asText().contains("NotAFeature"))
  }

  test("POST /suggest/optimal-time skips invalid hours, sorts by duration") {
    val payload = s"""{"base_conditions": $canonicalJson,
      "target_duration_max": 1e9, "hours_to_evaluate": [-1, 8, 9, 10, 30],
      "minute_of_hour": 30}"""
    val (code, body) = post("/suggest/optimal-time/3", payload)
    assert(code == 200, body)
    val node = mapper.readTree(body)
    val sugg = node.get("suggestions")
    assert(sugg.size() == 3, body) // -1 and 30 skipped
    val durations = (0 until sugg.size()).map(i =>
      sugg.get(i).get("predicted_duration").asDouble())
    assert(durations == durations.sorted, body)
    val (code2, body2) = post("/suggest/optimal-time/3",
      s"""{"base_conditions": $canonicalJson, "target_duration_max": 10,
        "hours_to_evaluate": [8], "minute_of_hour": 99}""")
    assert(code2 == 400 &&
      mapper.readTree(body2).get("error").asText().contains("minute_of_hour"))
  }
}
