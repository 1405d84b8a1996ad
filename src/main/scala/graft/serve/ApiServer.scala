package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.query.Endpoints
import graft.schema.Schemas

/** HTTP serving shell for the three model-backed query programs — the
  * route/validation/error-code surface of the reference's Flask API
  * (api/api.py:77-313), over [[graft.query.Endpoints]]' dataflows:
  *
  *   - POST /predict/duration/{version}       (api/api.py:78)
  *   - POST /analyze/sensitivity/{version}    (api/api.py:107)
  *   - POST /suggest/optimal-time/{version}   (api/api.py:227)
  *
  * Validation mirrors the reference: unknown model version → 404; no/
  * malformed JSON body → 400; non-numeric feature values → 400 listing
  * the offenders (api/api.py:50-73); missing features default to 0.0
  * and are reported in `missing_features_defaulted`; an unknown
  * `variable_feature_name` → 400; out-of-range hours are skipped
  * (api/api.py:263-265); suggestions sort by predicted duration
  * ascending (api/api.py:298).
  *
  * Built on the JDK's `com.sun.net.httpserver` + the Jackson shipped
  * with Spark — zero added dependencies. This is a thin shell by
  * design: every query program, its batching (one Spark job per
  * request, not one per variation — the reference's own optimization)
  * and its id-ordered prediction/input association live in
  * [[Endpoints]]; the shell only parses, validates, and serializes.
  * Serving at scale is horizontal (N stateless shells over shared
  * model artifacts), not a Spark-cluster concern.
  */
final class ApiServer(spark: SparkSession, dir: String, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/predict/duration/", handler(predictDuration))
  server.createContext("/analyze/sensitivity/", handler(analyzeSensitivity))
  server.createContext("/suggest/optimal-time/", handler(suggestOptimalTime))
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  /** The bound port (useful with port = 0 → ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  private val versions: Set[String] = (1 to graft.ml.Trainer.MaxVersions)
    .map(_.toString).toSet

  /** api/api.py:50-73: coerce every known feature to float; missing →
    * (0.0, reported); non-numeric → error listing the offenders. */
  private def validateFeatures(node: JsonNode)
      : Either[String, (Map[String, Float], List[String])] = {
    var missing = List.empty[String]
    var invalid = List.empty[String]
    val vals = Schemas.featureCols.flatMap { c =>
      val v = node.get(c)
      if (v == null || v.isNull) { missing ::= c; Some(c -> 0.0f) }
      else if (v.isNumber) Some(c -> v.floatValue())
      else if (v.isTextual) {
        try Some(c -> v.asText().trim.toFloat)
        catch { case _: NumberFormatException => invalid ::= c; None }
      } else { invalid ::= c; None }
    }.toMap
    if (invalid.nonEmpty)
      Left(s"Invalid non-numeric values for features: ${invalid.reverse.mkString(", ")}")
    else Right((vals, missing.reverse))
  }

  private def handler(f: (String, JsonNode) => (Int, ObjectNode)): HttpHandler =
    (ex: HttpExchange) => {
      val (status, body) =
        try {
          if (ex.getRequestMethod != "POST")
            (405, err("Method not allowed; POST a JSON payload"))
          else {
            val version = ex.getRequestURI.getPath.split('/').last
            if (!versions.contains(version))
              (404, err(s"Model 'model_$version' not loaded or not found."))
            else {
              val bytes = ex.getRequestBody.readAllBytes()
              if (bytes.isEmpty) (400, err("No input data provided"))
              else {
                val node =
                  try mapper.readTree(bytes)
                  catch { case _: Exception => null }
                if (node == null || !node.isObject)
                  (400, err("Malformed JSON payload"))
                else f(version, node)
              }
            }
          }
        } catch {
          case e: Exception => (500, err(s"Prediction error: ${e.getMessage}"))
        }
      val out = mapper.writeValueAsBytes(body)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    }

  private def err(msg: String): ObjectNode =
    mapper.createObjectNode().put("error", msg)

  /** api/api.py:77-104. */
  private def predictDuration(version: String, node: JsonNode): (Int, ObjectNode) =
    validateFeatures(node) match {
      case Left(msg) => (400, err(msg))
      case Right((features, missing)) =>
        val pred = Endpoints.q1Predict(spark, dir, version.toInt, features)
          .collect()(0).getAs[Double]("predicted_duration")
        val o = mapper.createObjectNode()
        o.put("model_version_used", s"model_$version")
        o.put("predicted_duration", pred)
        if (missing.nonEmpty) {
          val a = o.putArray("missing_features_defaulted")
          missing.foreach(m => a.add(m))
        } else o.putNull("missing_features_defaulted")
        (200, o)
    }

  /** api/api.py:107-223: one batched transform over the variation grid. */
  private def analyzeSensitivity(version: String, node: JsonNode): (Int, ObjectNode) = {
    val base = node.get("base_features")
    val feat = node.get("variable_feature_name")
    val vars = node.get("variation_values")
    if (base == null || feat == null || vars == null)
      return (400, err("Missing 'base_features', 'variable_feature_name', or 'variation_values' in payload."))
    if (!vars.isArray)
      return (400, err("'variation_values' must be a list."))
    val featName = feat.asText()
    if (!Schemas.featureCols.contains(featName))
      return (400, err(s"Invalid 'variable_feature_name': $featName. Not a model feature."))
    validateFeatures(base) match {
      case Left(msg) => (400, err(msg))
      case Right((features, _)) =>
        import scala.jdk.CollectionConverters._
        val values = vars.asInstanceOf[ArrayNode].elements().asScala
          .map(_.floatValue()).toSeq
        if (values.isEmpty)
          return (400, err("No valid variations to process after validation."))
        val rows = Endpoints.q2Sensitivity(spark, dir, version.toInt,
            featName, values, features).collect()
        val o = mapper.createObjectNode()
        o.put("model_version_used", s"model_$version")
        val a = o.putArray("analysis_results")
        rows.foreach { r =>
          val e = a.addObject()
          e.put("varied_feature", featName)
          e.put("value", r.getAs[Float]("varied_value"))
          e.put("predicted_duration", r.getAs[Double]("prediction"))
        }
        (200, o)
    }
  }

  /** api/api.py:227-313: hour grid, band filter, sort by duration. */
  private def suggestOptimalTime(version: String, node: JsonNode): (Int, ObjectNode) = {
    val base = node.get("base_conditions")
    val hoursN = node.get("hours_to_evaluate")
    val maxN = node.get("target_duration_max")
    if (base == null || hoursN == null || maxN == null)
      return (400, err("Missing 'base_conditions', 'hours_to_evaluate', or 'target_duration_max'."))
    if (!hoursN.isArray)
      return (400, err("'hours_to_evaluate' must be a list of integers (0-23)."))
    val minute = if (node.has("minute_of_hour")) node.get("minute_of_hour").asInt() else 0
    if (minute < 0 || minute > 59)
      return (400, err("minute_of_hour must be between 0 and 59."))
    val maxDur = maxN.asDouble()
    val minDur = if (node.has("target_duration_min"))
      node.get("target_duration_min").asDouble() else 0.0
    validateFeatures(base) match {
      case Left(msg) => (400, err(msg))
      case Right((features, _)) =>
        import scala.jdk.CollectionConverters._
        // out-of-range hours are skipped, like api/api.py:263-265
        val hours = hoursN.asInstanceOf[ArrayNode].elements().asScala
          .map(_.asInt()).toSeq
        val rows = Endpoints.q3OptimalTime(spark, dir, version.toInt,
            hours, minute, minDur, maxDur, features).collect()
        val o = mapper.createObjectNode()
        o.put("model_version_used", s"model_$version")
        o.put("target_duration_min", minDur)
        o.put("target_duration_max", maxDur)
        val a = o.putArray("suggestions")
        rows.foreach { r =>
          val e = a.addObject()
          e.put("hour_of_day", r.getAs[Int]("hour"))
          e.put("minute_of_hour", minute)
          e.put("predicted_duration", r.getAs[Double]("prediction"))
          e.put("within_target_range", true)
        }
        (200, o)
    }
  }
}
