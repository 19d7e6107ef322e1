package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.core.Escape

/**
 * Telegraf HTTP JSON input: `{"metrics":[{name,timestamp,fields{},tags{}}]}`
 * -> one point per numeric/bool field. Semantics per
 * /root/reference/receiver/telegraf_http_json.go:20-150:
 *  - tag keys sorted; reserved key `name` -> `_name` (NOT applied in the
 *    single-tag fast path — reference quirk preserved);
 *  - path = escapePath(name) [+ concatChar + escapePath(field) unless
 *    field == "value"] + `?` + encoded tags;
 *  - bool fields -> 0/1; non-numeric fields skipped; NaN skipped.
 */
object TelegrafJson {

  final case class Point(path: String, value: Double, timestamp: Long)

  private val mapper = new ObjectMapper()

  def encodeTags(tags: Map[String, String]): String = {
    if (tags.isEmpty) return ""
    if (tags.size == 1) {
      val (k, v) = tags.head
      return Escape.query(k) + "=" + Escape.query(v) // no `name` rename here (quirk)
    }
    tags.keys.toSeq.sorted.zipWithIndex.map { case (k0, i) =>
      val k = if (k0 == "name") "_name" else k0
      (if (i > 0) "&" else "") + Escape.query(k) + "=" + Escape.query(tags(k0))
    }.mkString
  }

  def decode(body: String, concatChar: String = "_"): Seq[Point] = {
    val root = mapper.readTree(body)
    val metrics = root.path("metrics")
    if (!metrics.isArray) return Nil
    val out = Seq.newBuilder[Point]
    metrics.forEach { m: JsonNode =>
      val name = m.path("name").asText("")
      val ts = m.path("timestamp").asLong(0)
      val tags = {
        val b = Map.newBuilder[String, String]
        val t = m.path("tags")
        if (t.isObject) t.fields().forEachRemaining(e => b += ((e.getKey, e.getValue.asText())))
        b.result()
      }
      val encodedTags = encodeTags(tags)
      val fields = m.path("fields")
      if (fields.isObject) {
        fields.fields().forEachRemaining { e =>
          val vNode = e.getValue
          val v: java.lang.Double =
            if (vNode.isNumber) vNode.asDouble()
            else if (vNode.isBoolean) (if (vNode.asBoolean()) 1.0 else 0.0)
            else null
          if (v != null && !v.isNaN) {
            val sb = new java.lang.StringBuilder(Escape.path(name))
            if (e.getKey != "value") { sb.append(concatChar); sb.append(Escape.path(e.getKey)) }
            sb.append('?').append(encodedTags)
            out += Point(sb.toString, v, ts)
          }
        }
      }
    }
    out.result()
  }
}
