package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.query.SearchOutput

/** JSON subprocess protocol (reference subprocess_interface.py:82-300):
  * one JSON request on stdin -> one JSON response on stdout, request types
  * `query` (default) | `summary` | `collections` | `config`, input
  * validation and the standardized success/error envelopes. The engine
  * side is injected (Deps) so the protocol is unit-testable without Spark;
  * GraftCli wires the real SparkBackend.
  *
  * `summary` in the reference is LLM-backed (out of engine scope, SURVEY
  * §2.12); here it is a deterministic extractive stand-in over the caller-
  * provided chunks so the protocol surface is complete and testable.
  */
object Subprocess {

  case class Deps(
      runQuery: (String, GraftConfig.Tree) => SearchOutput,
      listCollections: String => Seq[String])

  private val M = new ObjectMapper()

  private def jsonToTree(n: JsonNode): Any = {
    if (n == null || n.isNull) null
    else if (n.isObject) {
      val it = n.fields()
      var m: GraftConfig.Tree = Map.empty
      while (it.hasNext) { val e = it.next(); m += (e.getKey -> jsonToTree(e.getValue)) }
      m
    } else if (n.isArray) {
      val b = Seq.newBuilder[Any]
      n.forEach(e => b += jsonToTree(e))
      b.result()
    }
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else n.asText()
  }

  private def treeToJson(v: Any): JsonNode = v match {
    case null => M.getNodeFactory.nullNode()
    case m: Map[_, _] =>
      val o = M.createObjectNode()
      m.asInstanceOf[GraftConfig.Tree].foreach { case (k, x) => o.set[JsonNode](k, treeToJson(x)) }
      o
    case s: Seq[_] =>
      val a = M.createArrayNode()
      s.foreach(x => a.add(treeToJson(x)))
      a
    case b: Boolean => M.getNodeFactory.booleanNode(b)
    case l: Long => M.getNodeFactory.numberNode(l)
    case i: Int => M.getNodeFactory.numberNode(i)
    case d: Double => M.getNodeFactory.numberNode(d)
    case s: String => M.getNodeFactory.textNode(s)
    case other => M.getNodeFactory.textNode(other.toString)
  }

  /** Reference validate_input (subprocess_interface.py:82-133). */
  def validate(data: JsonNode): Option[String] = {
    if (data == null || !data.isObject) return Some("Input must be a JSON object")
    val typ = Option(data.get("type")).map(_.asText()).getOrElse("query")
    val isSummary = typ == "summary"
    val isCollections = typ == "collections"
    val isConfig = typ == "config"
    if (isSummary) {
      if (!data.has("query")) return Some("Missing required field 'query' for summary request")
      if (!data.has("chunks") || !data.get("chunks").isArray)
        return Some("Missing or invalid 'chunks' field for summary request")
    } else if (!isCollections && !isConfig) {
      if (!data.has("query")) return Some("Missing required field 'query'")
    }
    if (!isCollections && data.has("query") &&
        (!data.get("query").isTextual || data.get("query").asText().trim.isEmpty))
      return Some("Field 'query' must be a non-empty string")
    if (data.has("config") && !data.get("config").isObject)
      return Some("Field 'config' must be an object if provided")
    if (data.has("config")) {
      val config = data.get("config")
      if (config.has("paths")) {
        if (!config.get("paths").isObject) return Some("config.paths must be an object")
        for (k <- Seq("pdf_dir", "cache_dir")) {
          val p = config.get("paths").get(k)
          if (p != null && !p.isTextual) return Some(s"config.paths.$k must be a string")
        }
      }
      if (config.has("rerank")) {
        if (!config.get("rerank").isObject) return Some("config.rerank must be an object")
        val k = config.get("rerank").get("final_top_k")
        if (k != null && (!k.isIntegralNumber || k.asLong() < 1))
          return Some("config.rerank.final_top_k must be a positive integer")
      }
    }
    None
  }

  private def errorResponse(msg: String, query: Option[String]): ObjectNode = {
    val o = M.createObjectNode()
    o.put("success", false)
    query match { case Some(q) => o.put("query", q); case None => o.putNull("query") }
    o.set[JsonNode]("results", M.createArrayNode())
    o.put("error", msg)
    o.put("count", 0)
    o
  }

  private def putOpt(o: ObjectNode, k: String, v: Option[String]): Unit =
    v match { case Some(s) => o.put(k, s); case None => o.putNull(k); () }
  private def putOptD(o: ObjectNode, k: String, v: Option[Double]): Unit =
    v match { case Some(d) => o.put(k, d); case None => o.putNull(k); () }

  private def resultsNode(out: SearchOutput): ArrayNode = {
    val arr = M.createArrayNode()
    out.results.foreach { r =>
      val o = M.createObjectNode()
      o.put("text", r.text)
      o.put("citation", r.citation)
      val src = M.createObjectNode()
      src.put("file", r.source.file)
      src.put("page", r.source.page)
      putOpt(src, "doi", r.source.doi)
      putOpt(src, "title", r.source.title)
      putOpt(src, "citekey", r.source.citekey)
      o.set[JsonNode]("source", src)
      putOpt(o, "pandoc", r.pandoc)
      putOptD(o, "score", r.score)
      arr.add(o)
    }
    arr
  }

  private def successResponse(out: Option[SearchOutput], query: String,
                              summary: Option[String]): ObjectNode = {
    val o = M.createObjectNode()
    o.put("success", true)
    o.put("query", query)
    o.set[JsonNode]("results", out.map(resultsNode).getOrElse(M.createArrayNode()))
    putOpt(o, "summary", summary)
    o.putNull("summary_debug")
    out match {
      case Some(s) =>
        val c = M.createObjectNode()
        c.put("level", s.confidence.level)
        c.put("score", s.confidence.score)
        c.put("spread", s.confidence.spread)
        c.put("stability", s.confidence.stability)
        o.set[JsonNode]("confidence", c)
      case None => o.putNull("confidence")
    }
    o.putNull("error")
    o.put("count", out.map(_.results.length).getOrElse(0))
    o
  }

  /** Deterministic extractive stand-in for the LLM summary: first sentence
    * of each chunk, deduplicated, capped.
    */
  def extractiveSummary(query: String, chunks: Seq[String], maxChars: Int = 600): String = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    chunks.foreach { c =>
      val s = graft.analysis.Analyzer.splitIntoSentences(c).headOption.getOrElse(c.trim)
      if (s.nonEmpty) seen += s
    }
    val joined = seen.mkString(" ")
    if (joined.length <= maxChars) joined else joined.take(maxChars - 3) + "..."
  }

  /** Reference process_config (subprocess_interface.py:136-152): defaults
    * -> config file (config.yaml when unspecified) -> inline config data,
    * then environment adaptation. Deliberately NO GRAFT_* env-var layer —
    * the reference subprocess is env-insensitive; env overrides apply only
    * on the interactive CLI path (GraftCli.main).
    */
  def processConfig(configData: GraftConfig.Tree,
                    configFile: Option[String]): GraftConfig.Tree = {
    val fileCfg = GraftConfig.loadFile(configFile.getOrElse("config.yaml"))
    Environment.adapt(
      GraftConfig.merge(GraftConfig.merge(GraftConfig.defaults, fileCfg), configData))
  }

  /** Handle one request; returns (responseJson, exitCode). */
  def handle(input: String, deps: Deps): (String, Int) = {
    val data =
      try M.readTree(input)
      catch {
        case e: Exception =>
          return (M.writeValueAsString(
            errorResponse(s"Invalid JSON input: ${e.getMessage}", None)), 1)
      }
    validate(data) match {
      case Some(msg) => return (M.writeValueAsString(errorResponse(msg, None)), 1)
      case None => ()
    }
    val typ = Option(data.get("type")).map(_.asText()).getOrElse("query")
    val query = Option(data.get("query")).map(_.asText()).getOrElse("")
    val configFile = Option(data.get("config_file")).filter(_.isTextual).map(_.asText())
    val configData = Option(data.get("config")).map(jsonToTree(_).asInstanceOf[GraftConfig.Tree])
      .getOrElse(Map.empty: GraftConfig.Tree)
    val cfg = processConfig(configData, configFile)

    try {
      typ match {
        case "config" =>
          val o = M.createObjectNode()
          o.put("success", true)
          o.set[JsonNode]("config", treeToJson(cfg))
          (M.writeValueAsString(o), 0)
        case "collections" =>
          val o = M.createObjectNode()
          o.put("success", true)
          val arr = M.createArrayNode()
          deps.listCollections(GraftConfig.str(cfg, "paths", "pdf_dir")).foreach(arr.add)
          o.set[JsonNode]("collections", arr)
          o.putNull("error")
          (M.writeValueAsString(o), 0)
        case "summary" =>
          val chunks = Option(data.get("chunks")).map { a =>
            val b = Seq.newBuilder[String]; a.forEach(n => b += n.asText()); b.result()
          }.getOrElse(Nil)
          val resp = successResponse(None, query,
            Some(extractiveSummary(query, chunks)))
          (M.writeValueAsString(resp), 0)
        case _ =>
          val out = deps.runQuery(query, cfg)
          (M.writeValueAsString(successResponse(Some(out), query, None)), 0)
      }
    } catch {
      case e: Exception =>
        (M.writeValueAsString(errorResponse(e.getMessage, Some(query))), 1)
    }
  }

  /** Batch query mode (reference cli_subprocess.py:124-230): one JSON
    * document `{"queries": [<str> | {"query": <str>, "config": {...}}]}`
    * -> one `{"batch_results": [envelope...], "total_queries": N,
    * "successful_queries": M}` document. ONE engine session serves every
    * query (deps carries the live backend); per-query envelopes match the
    * direct-query shape (success/query/results/count/error), per-query
    * failures are isolated, malformed entries get an "Invalid query
    * format" envelope.
    *
    * Returns Left(message) for structural errors (reference: stderr +
    * exit 1) or Right(outputJson).
    */
  def handleBatch(input: String, deps: Deps,
                  baseCfg: GraftConfig.Tree): Either[String, String] = {
    val data =
      try M.readTree(input)
      catch { case e: Exception => return Left(s"Error in batch processing: ${e.getMessage}") }
    if (data == null || !data.isObject || !data.has("queries"))
      return Left("Batch file must contain a 'queries' array")
    val queries = data.get("queries")
    if (!queries.isArray)
      return Left("'queries' must be an array")

    def envelope(q: String, out: SearchOutput): ObjectNode = {
      val o = M.createObjectNode()
      o.put("success", true)
      o.put("query", q)
      o.set[JsonNode]("results", resultsNode(out))
      o.put("count", out.results.length)
      o.putNull("error")
      o
    }

    val results = M.createArrayNode()
    var successful = 0
    queries.forEach { qn =>
      val parsed: Either[String, (String, GraftConfig.Tree)] =
        if (qn.isTextual) Right((qn.asText(), baseCfg))
        else if (qn.isObject)
          Right((Option(qn.get("query")).map(_.asText()).getOrElse(""),
            GraftConfig.merge(baseCfg,
              Option(qn.get("config")).filter(_.isObject)
                .map(jsonToTree(_).asInstanceOf[GraftConfig.Tree])
                .getOrElse(Map.empty: GraftConfig.Tree))))
        else Left(qn.toString) // reference: str(query) in the error envelope
      parsed match {
        case Left(repr) =>
          results.add(errorResponse("Invalid query format", Some(repr)))
        case Right((q, cfg)) =>
          try {
            results.add(envelope(q, deps.runQuery(q, cfg)))
            successful += 1
          } catch {
            case e: Exception => results.add(errorResponse(e.getMessage, Some(q)))
          }
      }
    }
    val o = M.createObjectNode()
    o.set[JsonNode]("batch_results", results)
    o.put("total_queries", queries.size())
    o.put("successful_queries", successful)
    Right(M.writeValueAsString(o))
  }

  /** Pretty-print a JSON document (reference --pretty, indent-2 spirit;
    * exact whitespace is a human convenience, not a protocol surface).
    */
  def prettify(json: String): String =
    M.writerWithDefaultPrettyPrinter().writeValueAsString(M.readTree(json))

  /** Collections = sub-directories of the corpus dir (reference
    * list_collections over pdf_dir).
    */
  def fsCollections(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) Nil
    else {
      val out = Seq.newBuilder[String]
      java.nio.file.Files.list(p).forEach { c =>
        if (java.nio.file.Files.isDirectory(c)) out += c.getFileName.toString
      }
      out.result().sorted
    }
  }
}
