package graft.config

/** Environment detection + config adaptation (reference environment.py:
  * detect_environment:15-54, get_default_paths:57-103,
  * adapt_config_for_environment:106-158).
  *
  * The thread-pinning side of the reference (pdf_thread_workers) is
  * driver-local tuning there; here the same keys land under `performance`
  * so a reference-shaped config round-trips, while actual engine
  * parallelism stays with Spark (executor/core counts), where it belongs
  * at cluster scale.
  */
object Environment {

  case class EnvInfo(envType: String, platform: String, workingDir: String,
                     homeDir: String, tempDir: String, isInteractive: Boolean)

  /** Mirrors detect_environment: codespace > docker > ci > local. */
  def detect(env: Map[String, String] = sys.env,
             dockerEnvExists: Boolean = java.nio.file.Files.exists(
               java.nio.file.Paths.get("/.dockerenv"))): EnvInfo = {
    val envType =
      if (env.get("CODESPACES").contains("true")) "codespace"
      else if (dockerEnvExists || env.get("DOCKER_CONTAINER").exists(_.nonEmpty)) "docker"
      else if (Seq("CI", "GITHUB_ACTIONS", "GITLAB_CI", "JENKINS_URL")
                 .exists(v => env.get(v).exists(_.nonEmpty))) "ci"
      else "local"
    EnvInfo(envType,
      sys.props.getOrElse("os.name", "unknown").toLowerCase,
      sys.props.getOrElse("user.dir", "."),
      sys.props.getOrElse("user.home", "."),
      "/tmp",
      System.console() != null)
  }

  /** Mirrors get_default_paths: environment-appropriate pdf/cache dirs. */
  def defaultPaths(info: EnvInfo, env: Map[String, String] = sys.env): Map[String, String] =
    info.envType match {
      case "codespace" =>
        val ws = env.getOrElse("GITHUB_WORKSPACE", "/workspaces")
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(ws)))
          Map("pdf_dir" -> s"$ws/pdfs", "cache_dir" -> s"$ws/.rag_cache")
        else Map("pdf_dir" -> "pdfs", "cache_dir" -> ".rag_cache")
      case "docker" =>
        if (java.nio.file.Files.exists(java.nio.file.Paths.get("/data")))
          Map("pdf_dir" -> "/data/pdfs", "cache_dir" -> "/data/.rag_cache")
        else Map("pdf_dir" -> "pdfs", "cache_dir" -> "/tmp/.rag_cache")
      case "ci" =>
        Map("pdf_dir" -> "pdfs", "cache_dir" -> s"${info.tempDir}/.rag_cache")
      case _ =>
        Map("pdf_dir" -> "pdfs", "cache_dir" -> ".rag_cache")
    }

  /** Mirrors adapt_config_for_environment: replace generic default paths
    * that don't exist with environment-appropriate ones, and set
    * conservative performance defaults per environment type (setdefault
    * semantics — explicit values are never overwritten).
    */
  def adapt(cfg: GraftConfig.Tree, info: EnvInfo = detect(),
            env: Map[String, String] = sys.env): GraftConfig.Tree = {
    val dp = defaultPaths(info, env)
    def pathOf(key: String): Option[String] =
      GraftConfig.getPath(cfg, Seq("paths", key)) match {
        case s: String => Some(s); case _ => None
      }
    def exists(p: Option[String]): Boolean =
      p.exists(s => s.nonEmpty && java.nio.file.Files.exists(java.nio.file.Paths.get(s)))
    var out = cfg
    if (!exists(pathOf("pdf_dir")) && pathOf("pdf_dir").forall(_ == "pdfs"))
      out = GraftConfig.setPath(out, Seq("paths", "pdf_dir"), dp("pdf_dir"))
    if (!exists(pathOf("cache_dir")) &&
        pathOf("cache_dir").forall(v => v == ".rag_cache" || v == ".raq_cache"))
      out = GraftConfig.setPath(out, Seq("paths", "cache_dir"), dp("cache_dir"))
    def setDefault(path: Seq[String], v: Any): Unit =
      if (GraftConfig.getPath(out, path) == null)
        out = GraftConfig.setPath(out, path, v)
    info.envType match {
      case "ci" =>
        setDefault(Seq("performance", "api_semaphore_size"), 2L)
        setDefault(Seq("performance", "pdf_thread_workers"), 1L)
      case "codespace" =>
        setDefault(Seq("performance", "api_semaphore_size"), 3L)
        setDefault(Seq("performance", "pdf_thread_workers"), 2L)
      case _ =>
        setDefault(Seq("performance", "api_semaphore_size"), 5L)
    }
    out
  }
}
