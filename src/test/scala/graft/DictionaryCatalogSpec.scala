package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.cdc._

/** S2 online bootstrap: dictionary built from catalog-table DataFrames
  * (the shape ReplicatorOnline's SYS.OBJ$/USER$/COL$/CCOL$ flashback
  * queries produce), then used by the real materialize join. */
class DictionaryCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fromCatalog resolves owners, column order, pk, hidden flags") {
    import spark.implicits._
    val objs = Seq((100L, 101L, 7L, "ORDERS"), (200L, 201L, 7L, "ITEMS"))
      .toDF("obj", "data_obj", "owner_id", "name")
    val users = Seq((7L, "APP")).toDF("user_id", "name")
    val cols = Seq(
      (100L, 2, "VAL", 1, 4000, -1, -1, true, false),
      (100L, 1, "ID", 2, 0, 10, 0, false, false),
      (100L, 3, "SYS_NC1", 1, 0, -1, -1, true, true), // hidden
      (200L, 1, "SKU", 1, 30, -1, -1, false, false))
      .toDF("obj", "col_no", "name", "type_code", "length", "precision",
        "scale", "nullable", "hidden")
    val pks = Seq((100L, "ID")).toDF("obj", "name")
    val dict = Dictionary.fromCatalog(objs, users, cols, Some(pks))

    val orders = dict.lookup(100L, 1L).get
    assert(orders.owner == "APP" && orders.name == "ORDERS")
    assert(orders.columns.map(_.name) == Seq("ID", "VAL", "SYS_NC1")) // col_no order
    assert(orders.keyColumns.map(_.name) == Seq("ID"))
    assert(orders.resolvedTagCols == Seq("ID")) // tagType=pk inferred
    assert(orders.visibleColumns().map(_.name) == Seq("ID", "VAL"))
    val items = dict.lookup(200L, 1L).get
    assert(items.keyColumns.isEmpty && items.resolvedTagCols.isEmpty)

    // and it drives the real pipeline end-to-end
    implicit val s: SparkSession = spark
    val msgs = TxnAssembly.assembleBatch(Seq(
      ChangeEvent(2L, "1.0.1", Op.Ins).copy(obj = 100L,
        after = Map("ID" -> "5", "VAL" -> "x", "SYS_NC1" -> "internal")),
      ChangeEvent(3L, "1.0.1", Op.Commit)).toDS())
    val out = Materialize(msgs, dict).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Map[String, String]]("after") ==
      Map("ID" -> "5", "VAL" -> "x")) // hidden col suppressed
    assert(out.head.getAs[String]("tag") == "5")
  }

  test("fromCatalog tolerates NULL precision/scale/data_obj (real SYS.* shape)") {
    import spark.implicits._
    // views/partitioned objects have NULL data_obj; non-NUMBER columns have
    // NULL precision/scale — substitute DbColumn defaults, don't NPE
    val objs = Seq((300L, None: Option[Long], 7L, "V_ORDERS"))
      .toDF("obj", "data_obj", "owner_id", "name")
    val users = Seq((7L, "APP")).toDF("user_id", "name")
    val cols = Seq(
      (300L, 1, "NAME", 1, 4000, None: Option[Int], None: Option[Int],
        None: Option[Boolean], None: Option[Boolean]))
      .toDF("obj", "col_no", "name", "type_code", "length", "precision",
        "scale", "nullable", "hidden")
    val dict = Dictionary.fromCatalog(objs, users, cols)
    val t = dict.tables.find(_.obj == 300L).get
    assert(t.dataObj == 0L)
    val c = t.columns.head
    assert(c.precision == -1 && c.scale == -1 && c.nullable && !c.hidden)
  }
}
