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
}
