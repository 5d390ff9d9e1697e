package graft.io

import graft.SparkSpec

class ConfigSpec extends SparkSpec {
  import Config._

  private val yaml =
    """drivers:
      |  mysql:
      |    url: "jdbc:mysql://"
      |    attr: "?useUnicode=true"
      |    escape: true
      |  oracle:
      |    url: "jdbc:oracle:thin:@"
      |servers:
      |  MyDb:
      |    type: mysql
      |    url: "localhost:3306/mydb"
      |  orcl:
      |    type: oracle
      |    url: "localhost:1521/orcl"
      |alias:
      |  scott: "scott/tiger@mydb"
      |""".stripMargin

  test("yaml subset parses drivers/servers/aliases") {
    val cfg = parseYaml(yaml)
    assert(cfg.drivers("mysql") ==
      Driver("jdbc:mysql://", "?useUnicode=true", escape = true))
    assert(cfg.servers("mydb") == Server("mysql", "localhost:3306/mydb"))
    assert(cfg.aliases("scott") == "scott/tiger@mydb")
  }

  test("parseLogin resolves alias → credentials, url, schema, escape") {
    val r = parseLogin(parseYaml(yaml), "scott")
    assert(r == Resolved(Some("scott"), Some("tiger"), "mysql", Some("mydb"),
      "jdbc:mysql://localhost:3306/mydb?useUnicode=true", escape = true))
  }

  test("oracle schema = user; direct login without alias") {
    val r = parseLogin(parseYaml(yaml), "sys/pw@ORCL")
    assert(r.dbType == "oracle")
    assert(r.schema.contains("sys"))
    assert(r.url == "jdbc:oracle:thin:@localhost:1521/orcl")
  }

  test("unknown service raises ServiceNotFound (reference negative test)") {
    intercept[ServiceNotFound] { parseLogin(parseYaml(yaml), "u/p@nowhere") }
  }

  test("layer merge: later layer overrides") {
    val a = parseYaml(yaml)
    val b = Conf(servers = Map("mydb" -> Server("mysql", "prod:3306/mydb")))
    assert(a.merged(b).servers("mydb").url == "prod:3306/mydb")
    assert(a.merged(b).aliases("scott") == "scott/tiger@mydb")
  }

  test("jdbcOptions carry fetchsize (array_size parity) and auth") {
    val r = parseLogin(parseYaml(yaml), "scott")
    val o = jdbcOptions(r)
    assert(o("fetchsize") == "1000")
    assert(o("user") == "scott" && o("password") == "tiger")
    assert(o("driver") == "com.mysql.cj.jdbc.Driver")
  }

  test("file layering: workdir < module < etc < home, missing files skipped") {
    // reproduce the reference's CFG_FILES precedence on a disk fixture
    // (config_parser.py:55-60,190-199): each later file merges OVER the
    // accumulated config, so the home layer wins
    val root = java.nio.file.Files.createTempDirectory("graftcfg")
    def put(dir: String, body: String): String = {
      val d = root.resolve(dir)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("config.yml"), body.getBytes("UTF-8"))
      d.toString
    }
    val work = put("work",
      "servers:\n  db1:\n    type: mysql\n    url: work:3306/db1\n" +
        "  db2:\n    type: mysql\n    url: work:3306/db2\n")
    val mod = put("module",
      "drivers:\n  mysql:\n    url: \"jdbc:mysql://\"\n" +
        "servers:\n  db1:\n    type: mysql\n    url: module:3306/db1\n")
    val etc = put("etc",
      "servers:\n  db3:\n    type: mysql\n    url: etc:3306/db3\n")
    val home = put("home",
      "servers:\n  db1:\n    type: mysql\n    url: home:3306/db1\n")
    val files = Seq(s"$work/config.yml", s"$mod/config.yml",
      s"$etc/config.yml", s"$home/config.yml", s"$root/missing/config.yml")
    val cfg = loadLayered(files)
    assert(cfg.servers("db1").url == "home:3306/db1", "home layer wins")
    assert(cfg.servers("db2").url == "work:3306/db2", "unshadowed keys survive")
    assert(cfg.servers("db3").url == "etc:3306/db3")
    assert(cfg.drivers("mysql").urlPrefix == "jdbc:mysql://")
    // default candidate list has the reference's shape
    val cand = configFiles("/w", Some("/m"), "/etc/lwetl", "/home/u")
    assert(cand == Seq("/w/config.yml", "/m/config.yml",
      "/etc/lwetl/config.yml", "/home/u/lwetl/config.yml"))
  }

  test("tnsnames.ora: balanced-paren entries become oracle servers") {
    // one realistic multi-line entry + comments + a second compact one
    val tns =
      """# Oracle Net Services names
        |ORCL.WORLD =
        |  (DESCRIPTION =
        |    (ADDRESS = (PROTOCOL = TCP)(HOST = dbhost.example)(PORT = 1521))
        |    (CONNECT_DATA =
        |      (SERVER = DEDICATED)
        |      (SERVICE_NAME = orcl)
        |    )
        |  )
        |
        |# a second service
        |REPORTS = (DESCRIPTION=(ADDRESS=(PROTOCOL=TCP)(HOST=rpt)(PORT=1521))(CONNECT_DATA=(SID=rpt)))
        |""".stripMargin
    val servers = parseTnsNames(tns)
    assert(servers.keySet == Set("orcl.world", "reports"))
    assert(servers("orcl.world").dbType == "oracle")
    assert(servers("orcl.world").url.startsWith("(DESCRIPTION"))
    assert(servers("orcl.world").url.contains("(SERVICE_NAME = orcl)"))
    assert(servers("reports").url.endsWith("(SID=rpt)))"))

    // config-defined servers win over TNS entries (config_parser.py:330-333)
    val cfg = Conf(
      drivers = Map("oracle" -> Driver("jdbc:oracle:thin:@")),
      servers = Map("reports" -> Server("oracle", "explicit:1521/rpt")))
    val merged = withTns(cfg, tns)
    assert(merged.servers("reports").url == "explicit:1521/rpt")
    assert(merged.servers.contains("orcl.world"))
    // and a TNS service resolves through parse_login end-to-end
    val r = parseLogin(merged, "scott/tiger@orcl.world")
    assert(r.dbType == "oracle" && r.url.startsWith("jdbc:oracle:thin:@(DESCRIPTION"))
  }
}
