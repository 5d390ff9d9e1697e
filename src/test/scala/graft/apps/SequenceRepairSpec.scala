package graft.apps

import graft.SparkSpec

/** Sequence repair (`examples/oracle-update-sequences.py`): matching,
  * thresholding, statement text — and the plan logic executed against
  * LIVE Derby sequences (Derby speaks `NEXT VALUE FOR`, so the
  * oracle-dialect statements are text-checked and the equivalent Derby
  * dance proves the semantics end to end). */
class SequenceRepairSpec extends SparkSpec {
  import SequenceRepair._
  import spark.implicits._

  test("matchSequences: prefix match, first table wins, one sequence per table") {
    val m = matchSequences(
      Seq("ORDERS", "ORDER_ITEMS"),
      Seq(("ORDERS_SEQ", 10L), ("ORDERS_SEQ2", 20L), ("ORDER_ITEMS_SEQ", 5L),
        ("UNRELATED_SEQ", 1L)))
    // ORDERS_SEQ and ORDERS_SEQ2 both prefix-match ORDERS; first claims
    assert(m("ORDERS") == Sequence("ORDERS_SEQ", 10L))
    // ORDER_ITEMS_SEQ starts with "ORDERS"? No — but it DOES start with
    // "ORDER_ITEMS"; table order decides which table claims it first
    assert(m("ORDER_ITEMS") == Sequence("ORDER_ITEMS_SEQ", 5L))
    assert(m.size == 2)
  }

  test("plan: one distributed max-probe job, repair only where max > last_number") {
    val orders = Seq(1L, 2L, 50L).toDF("ID")
    val items = Seq(3L, 4L).toDF("IID")
    val repairs = plan(
      Map("ORDERS" -> (orders, "ID"), "ITEMS" -> (items, "IID")),
      Seq(("ORDERS_SEQ", 10L), ("ITEMS_SEQ", 99L)))
    val byTable = repairs.map(r => r.table -> r).toMap
    assert(byTable("ORDERS").needed, "max 50 > last_number 10")
    assert(byTable("ORDERS").maxPk == 50L)
    assert(!byTable("ITEMS").needed, "max 4 <= last_number 99")
  }

  test("plan handles lowercase table names (case-normalized lookups)") {
    val orders = Seq(1L, 2L, 50L).toDF("id")
    val repairs = plan(
      Map("orders" -> (orders, "id")),
      Seq(("ORDERS_SEQ", 10L)))
    assert(repairs.head.needed && repairs.head.maxPk == 50L)
    assert(repairs.head.table == "ORDERS")
  }

  test("repair statements match the reference dance (:85-95)") {
    val stmts = repairStatements(Repair("ORDERS", "ID", "ORDERS_SEQ", 10L, 50L))
    assert(stmts == Seq(
      "DROP SEQUENCE ORDERS_SEQ",
      "CREATE SEQUENCE ORDERS_SEQ START WITH 1 MINVALUE 1 INCREMENT BY 50",
      "SELECT ORDERS_SEQ.NEXTVAL FROM DUAL",
      "SELECT ORDERS_SEQ.NEXTVAL FROM DUAL",
      "ALTER SEQUENCE ORDERS_SEQ INCREMENT BY 1",
      "SELECT ORDERS_SEQ.NEXTVAL FROM DUAL"))
    val piped = repairPlanStatements(spark, Seq(
      Repair("A", "ID", "A_SEQ", 1L, 5L), Repair("B", "ID", "B_SEQ", 9L, 2L)))
    assert(piped.count() == 6, "only the needed repair renders")
  }

  test("the dance fast-forwards a LIVE Derby sequence past max(pk)") {
    val dbDir = java.nio.file.Files.createTempDirectory("graftseq")
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/db;create=true")
    val st = conn.createStatement()
    st.execute("CREATE SEQUENCE ORDERS_SEQ AS BIGINT START WITH 1")
    st.execute("CREATE TABLE ORDERS (ID BIGINT PRIMARY KEY)")
    // consume a few values, insert rows far beyond the sequence
    (1 to 3).foreach { _ =>
      st.executeQuery("VALUES NEXT VALUE FOR ORDERS_SEQ").close()
    }
    st.execute("INSERT INTO ORDERS VALUES (1), (2), (50)")

    // plan off the live table through Spark (the distributed max probe)
    val cfg = graft.io.Config.Conf(
      drivers = Map("derby" -> graft.io.Config.Driver("jdbc:derby:")),
      servers = Map("db" -> graft.io.Config.Server("derby", s"$dbDir/db")))
    val r = graft.io.Config.parseLogin(cfg, "db")
    val live = graft.io.Config.readJdbc(spark, r, "ORDERS")
    val repairs = plan(Map("ORDERS" -> (live, "ID")), Seq(("ORDERS_SEQ", 3L)))
    assert(repairs.head.needed && repairs.head.maxPk == 50L)

    // execute the Derby-dialect equivalent of the rendered dance
    val rp = repairs.head
    st.execute(s"DROP SEQUENCE ${rp.sequence} RESTRICT")
    st.execute(s"CREATE SEQUENCE ${rp.sequence} AS BIGINT START WITH 1 INCREMENT BY ${rp.maxPk}")
    st.executeQuery(s"VALUES NEXT VALUE FOR ${rp.sequence}").close()
    st.executeQuery(s"VALUES NEXT VALUE FOR ${rp.sequence}").close()
    st.execute(s"DROP SEQUENCE ${rp.sequence} RESTRICT")
    st.execute(s"CREATE SEQUENCE ${rp.sequence} AS BIGINT START WITH ${rp.maxPk + 1}")
    val rs = st.executeQuery(s"VALUES NEXT VALUE FOR ${rp.sequence}")
    rs.next()
    val next = rs.getLong(1)
    rs.close(); st.close(); conn.close()
    assert(next > rp.maxPk, s"sequence must land beyond max(pk): got $next")
  }
}
