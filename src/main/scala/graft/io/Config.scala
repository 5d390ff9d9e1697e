package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connection/config model (`lwetl/config_parser.py` — SURVEY §1.4):
  * a layered config of drivers / servers / aliases resolved from
  * oracle-style login strings `user/password@service`, mapped onto
  * `spark.read.jdbc` options instead of a client cursor.
  *
  * The reference merges YAML from module dir → /etc/lwetl → ~/.lwetl;
  * here the layers are plain key-value maps merged the same way
  * (`config_parser.py:66-83` merge semantics: later layers override,
  * nested maps merge). A minimal flat-YAML subset parser is included so
  * existing config files keep working without a YAML dependency.
  * Alias passwords encrypted with Fernet are decrypted through
  * [[Security.decrypt]] (JDK-crypto implementation of the public Fernet
  * spec, cross-validated against Python `cryptography`) — wired via
  * [[Config.decrypt]] when the layered config sets `encrypt: true`.
  */
object Config {

  case class Driver(urlPrefix: String, attr: String = "", escape: Boolean = false,
                    jdbcClass: String = "")
  case class Server(dbType: String, url: String)

  case class Resolved(user: Option[String], password: Option[String],
                      dbType: String, schema: Option[String], url: String,
                      escape: Boolean)

  case class Conf(drivers: Map[String, Driver] = Map.empty,
                  servers: Map[String, Server] = Map.empty,
                  aliases: Map[String, String] = Map.empty,
                  encrypt: Option[Boolean] = None) {
    /** Layer merge: `other` overrides/extends this (reference `merge`). */
    def merged(other: Conf): Conf = Conf(
      drivers ++ other.drivers, servers ++ other.servers, aliases ++ other.aliases,
      other.encrypt.orElse(encrypt))
    /** Alias passwords encrypted? Defaults TRUE like the reference
      * (`lwetl_security/main.py:109-111`). */
    def pwEncrypted: Boolean = encrypt.getOrElse(true)
  }

  /** Password decrypt hook — the reference's Fernet layer
    * (`lwetl/security.py`); identity by default. */
  var decrypt: String => String = identity

  class ServiceNotFound(msg: String) extends IllegalArgumentException(msg)

  /** `parse_login` parity (`config_parser.py:86-146`): resolve alias →
    * `user/password@service` → (credentials, type, schema, url, escape). */
  def parseLogin(cfg: Conf, login: String): Resolved = {
    // sqlite shortcut: direct file reference
    if (login.startsWith("sqlite:") && cfg.drivers.contains("sqlite")) {
      val dbFile = login.drop(7)
      val d = cfg.drivers("sqlite")
      return Resolved(None, None, "sqlite", None, d.urlPrefix + dbFile, escape = false)
    }
    val cred = cfg.aliases.getOrElse(login, login)
    val (userPass, service) = cred.lastIndexOf('@') match {
      case -1 => (None, cred)
      case i => (Some(cred.substring(0, i)), cred.substring(i + 1))
    }
    val (user, pass) = userPass match {
      case Some(up) => up.lastIndexOf('/') match {
        case -1 => (Some(up), None)
        case i => (Some(up.substring(0, i)), Some(decrypt(up.substring(i + 1))))
      }
      case None => (None, None)
    }
    val serviceName = service.trim.toLowerCase
    val srv = cfg.servers.getOrElse(serviceName,
      throw new ServiceNotFound(
        s"Service ($serviceName) not found in list (${cfg.servers.keys.mkString(", ")})"))
    val drv = cfg.drivers.getOrElse(srv.dbType,
      throw new ServiceNotFound(
        s"Database type (${srv.dbType}) not found in list (${cfg.drivers.keys.mkString(", ")})"))
    val url = drv.urlPrefix + srv.url + drv.attr
    val schema =
      if (srv.dbType == "oracle") user
      else Some(srv.url.split("/").last)
    Resolved(user, pass, srv.dbType, schema, url, drv.escape)
  }

  /** Options for `spark.read.format("jdbc")` from a resolved login —
    * fetchsize defaults to the reference's array_size=1000
    * (`lwetl/jdbc.py:626`); `partitionColumn`+bounds turn the single
    * cursor stream into N parallel range scans. */
  def jdbcOptions(r: Resolved, fetchSize: Int = 1000): Map[String, String] = {
    val base = Map("url" -> r.url, "fetchsize" -> fetchSize.toString)
    val auth = Seq(
      r.user.map("user" -> _), r.password.map("password" -> _),
      r.dbType match {
        case t if t.nonEmpty && cfgDriverClass(r.dbType).nonEmpty =>
          Some("driver" -> cfgDriverClass(r.dbType))
        case _ => None
      }).flatten
    base ++ auth
  }

  private def cfgDriverClass(dbType: String): String = dbType match {
    case "oracle" => "oracle.jdbc.OracleDriver"
    case "mysql" => "com.mysql.cj.jdbc.Driver"
    case "sqlserver" => "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    case "postgresql" => "org.postgresql.Driver"
    case "sqlite" => "org.sqlite.JDBC"
    case "derby" => "org.apache.derby.jdbc.EmbeddedDriver"
    case _ => ""
  }

  /** Read a table/query through the resolved connection. `partitionOn`
    * (pk column, lower, upper, n) parallelizes the scan — the scale
    * replacement for the reference's single ordered cursor. */
  def readJdbc(spark: SparkSession, r: Resolved, tableOrQuery: String,
               partitionOn: Option[(String, Long, Long, Int)] = None,
               fetchSize: Int = 1000): DataFrame = {
    val reader0 = spark.read.format("jdbc")
    val withOpts = jdbcOptions(r, fetchSize).foldLeft(reader0) {
      case (rd, (k, v)) => rd.option(k, v)
    }
    val keyed =
      if (tableOrQuery.trim.toLowerCase.startsWith("select "))
        withOpts.option("query", tableOrQuery)
      else withOpts.option("dbtable", tableOrQuery)
    partitionOn match {
      case Some((c, lo, hi, n)) => keyed
        .option("partitionColumn", c)
        .option("lowerBound", lo.toString).option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
        .load()
      case None => keyed.load()
    }
  }

  /** Connection Properties (user/password/driver class) for a resolved
    * login — the one place this trio is assembled. */
  def connectionProps(r: Resolved): java.util.Properties = {
    val props = new java.util.Properties()
    r.user.foreach(props.setProperty("user", _))
    r.password.foreach(props.setProperty("password", _))
    val cls = cfgDriverClass(r.dbType)
    if (cls.nonEmpty) props.setProperty("driver", cls)
    props
  }

  /** Batched JDBC append — the MultiParameterUploader/executemany path
    * (`lwetl/uploader.py:644-698`): Spark's JDBC writer batches
    * `batchsize` rows per executeBatch, per partition (the reference's
    * commit-every-N becomes per-partition transactions). */
  def writeJdbc(df: DataFrame, r: Resolved, table: String,
                batchSize: Int = 1000): Unit = {
    val props = connectionProps(r)
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode("append").jdbc(r.url, table, props)
  }

  // ------------------------------------------------ flat-YAML subset

  /** Parse the minimal YAML subset the reference configs use: 2-space
    * nested maps of scalar leaves (drivers/servers/alias sections). No
    * sequences, anchors, or multi-line scalars. */
  def parseYaml(text: String): Conf = {
    // section → name → key → value
    val tree = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]]
    var section: String = null
    var entry: String = null
    // comment strip must be quote-aware: a '#' inside a quoted scalar
    // (passwords!) is data, and YAML only treats '#' as a comment when
    // preceded by whitespace or at line start. A quote only OPENS a
    // quoted region at the start of a token (YAML: a mid-scalar
    // apostrophe like it's-pw is plain data).
    def stripComment(l: String): String = {
      var quote: Char = 0
      var i = 0
      while (i < l.length) {
        val c = l.charAt(i)
        if (quote != 0) {
          if (c == quote) {
            // a doubled '' inside single quotes is an escaped quote,
            // not a close — consume both and stay quoted
            if (quote == '\'' && i + 1 < l.length && l.charAt(i + 1) == '\'') i += 1
            else quote = 0
          }
        } else c match {
          case '\'' | '"' if i == 0 || l.charAt(i - 1) == ':' ||
            Character.isWhitespace(l.charAt(i - 1)) => quote = c
          case '#' if i == 0 || Character.isWhitespace(l.charAt(i - 1)) =>
            return l.substring(0, i)
          case _ =>
        }
        i += 1
      }
      l
    }
    text.split("\r?\n").foreach { raw =>
      val line = stripComment(raw).replaceAll("\\s+$", "")
      if (line.trim.nonEmpty) {
        val indent = line.takeWhile(_ == ' ').length
        val body = line.trim
        val (k, v) = body.split(":", 2) match {
          case Array(a, b) => (a.trim, b.trim)
          case Array(a) => (a.trim, "")
        }
        if (indent == 0 && v.nonEmpty) { // top-level scalar (e.g. encrypt: false)
          tree.getOrElseUpdate("@scalars", scala.collection.mutable.Map.empty)
            .getOrElseUpdate("", scala.collection.mutable.Map.empty)
            .update(k, stripQuotes(v))
          section = k; entry = null
        }
        else if (indent == 0) { section = k; entry = null }
        else if (indent == 2 && v.isEmpty) {
          entry = k
          tree.getOrElseUpdate(section, scala.collection.mutable.Map.empty)
            .getOrElseUpdate(entry, scala.collection.mutable.Map.empty)
        }
        else if (indent == 2) { // flat alias: name: value
          tree.getOrElseUpdate(section, scala.collection.mutable.Map.empty)
            .getOrElseUpdate("", scala.collection.mutable.Map.empty)
            .update(k, stripQuotes(v))
        }
        else if (indent >= 4 && entry != null)
          tree(section)(entry).update(k, stripQuotes(v))
      }
    }
    val drivers = tree.getOrElse("drivers", scala.collection.mutable.Map.empty).collect {
      case (name, m) if name.nonEmpty => name -> Driver(
        urlPrefix = m.getOrElse("url", ""),
        attr = m.getOrElse("attr", ""),
        escape = m.get("escape").exists(x => Set("true", "1", "yes").contains(x.toLowerCase)),
        jdbcClass = m.getOrElse("class", ""))
    }.toMap
    val servers = tree.getOrElse("servers", scala.collection.mutable.Map.empty).collect {
      case (name, m) if name.nonEmpty =>
        name.toLowerCase -> Server(m.getOrElse("type", ""), m.getOrElse("url", ""))
    }.toMap
    val aliases = tree.getOrElse("alias", scala.collection.mutable.Map.empty)
      .getOrElse("", scala.collection.mutable.Map.empty[String, String]).toMap
    val encrypt = tree.getOrElse("@scalars", scala.collection.mutable.Map.empty)
      .getOrElse("", scala.collection.mutable.Map.empty[String, String])
      .get("encrypt").map(x => Set("true", "1", "yes").contains(x.toLowerCase))
    Conf(drivers, servers, aliases, encrypt)
  }

  /** Render a Conf back to the flat-YAML subset (the security CLI's
    * rewrite path, `lwetl_security/main.py:154-170`). */
  def dumpYaml(cfg: Conf): String = {
    val sb = new StringBuilder
    cfg.encrypt.foreach(e => sb ++= s"encrypt: $e\n")
    if (cfg.drivers.nonEmpty) {
      sb ++= "drivers:\n"
      cfg.drivers.toSeq.sortBy(_._1).foreach { case (n, d) =>
        sb ++= s"  $n:\n    url: '${d.urlPrefix}'\n"
        if (d.attr.nonEmpty) sb ++= s"    attr: '${d.attr}'\n"
        if (d.escape) sb ++= "    escape: true\n"
        if (d.jdbcClass.nonEmpty) sb ++= s"    class: ${d.jdbcClass}\n"
      }
    }
    if (cfg.servers.nonEmpty) {
      sb ++= "servers:\n"
      cfg.servers.toSeq.sortBy(_._1).foreach { case (n, s) =>
        sb ++= s"  $n:\n    type: ${s.dbType}\n    url: '${s.url}'\n"
      }
    }
    if (cfg.aliases.nonEmpty) {
      sb ++= "alias:\n"
      cfg.aliases.toSeq.sortBy(_._1).foreach { case (n, v) =>
        // quote credentials that could be mis-lexed (comments, quotes,
        // edge whitespace) so the round trip is lossless — YAML single
        // quotes with '' doubling, which stripQuotes undoes exactly
        val needsQuote = v.exists(c => c == '#' || c == '\'' || c == '"') ||
          v != v.trim
        sb ++= (if (needsQuote) s"  $n: '${v.replace("'", "''")}'\n"
                else s"  $n: $v\n")
      }
    }
    sb.toString
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      // YAML single-quote escaping doubles the quote
      s.substring(1, s.length - 1).replace("''", "'")
    else if (s.length >= 2 && s.head == '"' && s.last == '"')
      s.substring(1, s.length - 1)
    else s

  // --------------------------------------------- file layering + TNS

  /** The reference's config search order (`config_parser.py:55-60`):
    * workdir, module dir, /etc/lwetl, ~/lwetl — LATER files override
    * earlier ones (`:190-199` merges each file over the accumulated
    * config, so the home layer has the last word). */
  def configFiles(workDir: String = ".",
                  moduleDir: Option[String] = None,
                  etcDir: String = "/etc/lwetl",
                  homeDir: String = System.getProperty("user.home")): Seq[String] = {
    val dirs = moduleDir.toSeq ++ Seq(etcDir, s"$homeDir/lwetl")
    (workDir +: dirs).map(d => s"$d/config.yml")
  }

  /** Load-and-merge every existing config file, lowest precedence
    * first (`config_parser.py:190-199`). Unreadable files are skipped
    * the way the reference skips PermissionError. */
  def loadLayered(files: Seq[String]): Conf =
    files.foldLeft(Conf()) { (acc, f) =>
      val p = java.nio.file.Paths.get(f)
      if (!java.nio.file.Files.isReadable(p)) acc
      else scala.util.Try(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        .toOption.map(t => acc.merged(parseYaml(t))).getOrElse(acc)
    }

  /** Parse Oracle `tnsnames.ora` text into server entries
    * (`config_parser.py:298-337`): comment/blank lines dropped, each
    * `LABEL = (DESCRIPTION=...)` balanced-paren group becomes an oracle
    * service named by the lowercased label. The reference needs a
    * recursive regex for the nesting; a depth counter does the same. */
  def parseTnsNames(text: String): Map[String, Server] = {
    val body = text.linesIterator
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .mkString("\n")
    val entries = scala.collection.mutable.LinkedHashMap.empty[String, Server]
    var from = 0
    var open = body.indexOf('(', from)
    while (open >= 0) {
      var depth = 0
      var i = open
      var end = -1
      while (i < body.length && end < 0) {
        body.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = i + 1
          case _ =>
        }
        i += 1
      }
      if (end < 0) { open = -1 } // unbalanced tail: stop, like the regex would
      else {
        val label = body.substring(from, open).split("=")(0).trim.toLowerCase
        if (label.nonEmpty && !entries.contains(label))
          entries(label) = Server("oracle", body.substring(open, end))
        from = end
        open = body.indexOf('(', from)
      }
    }
    entries.toMap
  }

  /** Merge TNS entries under an existing config — config-defined
    * servers win, TNS fills the gaps (`config_parser.py:330-333`). */
  def withTns(cfg: Conf, tnsText: String): Conf =
    cfg.copy(servers = parseTnsNames(tnsText) ++ cfg.servers)
}
