package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.exceptions.{InvalidArgument, InvalidArgumentValue, UnsupportedType}
import graft.qs.QuickSight
import graft.qs.QuickSight.QsClient

/** Injected-client tests for the QuickSight wrappers — no Spark
  * session needed. The fake pages its list results two at a time so
  * every listAll call exercises NextToken draining.
  */
class QuickSightSpec extends AnyFunSuite {

  /** In-memory account: two users, three data sources (two sharing a
    * name), datasets, dashboards. Records every mutating call.
    */
  private class FakeQs extends QsClient {
    val users = Seq(
      Map[String, Any]("UserName" -> "john", "Arn" -> "arn:user/john"),
      Map[String, Any]("UserName" -> "mary", "Arn" -> "arn:user/mary"))
    var dataSources = Seq(
      Map[String, Any]("Name" -> "athena-ds", "DataSourceId" -> "ds-1",
        "Arn" -> "arn:ds/ds-1"),
      Map[String, Any]("Name" -> "dup", "DataSourceId" -> "ds-2",
        "Arn" -> "arn:ds/ds-2"),
      Map[String, Any]("Name" -> "dup", "DataSourceId" -> "ds-3",
        "Arn" -> "arn:ds/ds-3"))
    var datasets = Seq(
      Map[String, Any]("Name" -> "docs", "DataSetId" -> "dset-1"))
    var dashboards = Seq(
      Map[String, Any]("Name" -> "board", "DashboardId" -> "dash-1"))

    var created: Seq[(String, Map[String, Any])] = Nil
    var deleted: Seq[(String, Map[String, Any])] = Nil
    var listCalls: Seq[String] = Nil

    private def items(op: String): Seq[Map[String, Any]] = op match {
      case "list_users" => users
      case "list_data_sources" => dataSources
      case "list_data_sets" => datasets
      case "list_dashboards" => dashboards
      case "list_templates" => Nil
      case "list_ingestions" => Seq(
        Map[String, Any]("IngestionId" -> "ing-1",
          "IngestionStatus" -> "COMPLETED"))
      case other => fail(s"unexpected list op $other")
    }

    def listPage(op: String, params: Map[String, String],
                 nextToken: Option[String])
        : (Seq[Map[String, Any]], Option[String]) = {
      listCalls :+= op
      val all = items(op)
      val from = nextToken.map(_.toInt).getOrElse(0)
      val page = all.slice(from, from + 2)
      val next = if (from + 2 < all.size) Some((from + 2).toString)
                 else None
      (page, next)
    }

    def describe(op: String, params: Map[String, String])
        : Map[String, Any] =
      Map("op" -> op) ++ params

    def create(op: String, args: Map[String, Any])
        : Map[String, Any] = {
      created :+= (op -> args)
      args.get("IngestionId").map(i => Map[String, Any](
        "IngestionId" -> i)).getOrElse(Map.empty)
    }

    def delete(op: String, params: Map[String, Any]): Unit =
      deleted :+= (op -> params)
  }

  test("listAll drains NextToken pages") {
    val qs = new FakeQs
    val sources = QuickSight.listDataSources(qs)
    assert(sources.size == 3) // 3 items at page size 2 → 2 pages
    assert(qs.listCalls.count(_ == "list_data_sources") == 2)
  }

  test("name→id resolution: unique, missing, and ambiguous names") {
    val qs = new FakeQs
    assert(QuickSight.getDataSourceId(qs, "athena-ds") == "ds-1")
    assert(QuickSight.getDataSourceArn(qs, "athena-ds") == "arn:ds/ds-1")
    assert(QuickSight.getDatasetId(qs, "docs") == "dset-1")
    assert(QuickSight.getDashboardId(qs, "board") == "dash-1")
    assert(QuickSight.getDataSourceIds(qs, "dup") == Seq("ds-2", "ds-3"))
    intercept[InvalidArgument] { QuickSight.getDataSourceId(qs, "dup") }
    intercept[InvalidArgument] { QuickSight.getDataSourceId(qs, "nope") }
  }

  test("athena→QuickSight type mapping") {
    assert(QuickSight.athenaToQuickSightType("bigint") == "INTEGER")
    assert(QuickSight.athenaToQuickSightType("DOUBLE") == "DECIMAL")
    assert(QuickSight.athenaToQuickSightType("decimal(12,2)") == "DECIMAL")
    assert(QuickSight.athenaToQuickSightType("varchar") == "STRING")
    assert(QuickSight.athenaToQuickSightType("date") == "DATETIME")
    assert(QuickSight.athenaToQuickSightType("binary") == "BIT")
    intercept[UnsupportedType] {
      QuickSight.athenaToQuickSightType("array<int>")
    }
  }

  test("generatePermissions maps usernames to ARNs, manage wins over use") {
    val qs = new FakeQs
    val perms = QuickSight.generatePermissions(qs, "dataset",
      allowedToUse = Seq("john", "mary"), allowedToManage = Seq("mary"))
    // mary was in both lists → only her manage grant survives
    assert(perms.size == 2)
    val byArn = perms.map(p => p("Principal") ->
      p("Actions").asInstanceOf[Seq[String]]).toMap
    assert(byArn("arn:user/john").contains("quicksight:PassDataSet"))
    assert(!byArn("arn:user/john").contains("quicksight:UpdateDataSet"))
    assert(byArn("arn:user/mary").contains("quicksight:UpdateDataSet"))
    assert(QuickSight.generatePermissions(qs, "dataset") == Nil)
    intercept[InvalidArgumentValue] {
      QuickSight.generatePermissions(qs, "dashboard",
        allowedToUse = Seq("john"))
    }
  }

  test("createAthenaDataSource assembles the full argument tree") {
    val qs = new FakeQs
    QuickSight.createAthenaDataSource(qs, "new-ds", "111122223333",
      workgroup = "wg", allowedToManage = Seq("mary"),
      tags = Map("env" -> "prod"))
    val (op, args) = qs.created.head
    assert(op == "create_data_source")
    assert(args("DataSourceId") == "new-ds" && args("Type") == "ATHENA")
    val params = args("DataSourceParameters")
      .asInstanceOf[Map[String, Map[String, String]]]
    assert(params("AthenaParameters")("WorkGroup") == "wg")
    val perms = args("Permissions").asInstanceOf[Seq[Map[String, Any]]]
    assert(perms.head("Principal") == "arn:user/mary")
    assert(args("Tags").asInstanceOf[Seq[Map[String, String]]].head ==
      Map("Key" -> "env", "Value" -> "prod"))
  }

  test("createAthenaDataset validates arguments and builds table maps") {
    val qs = new FakeQs
    val cols = Seq("doc_id" -> "bigint", "body" -> "string")
    // database/table path, resolving the data source arn by name
    val id = QuickSight.createAthenaDataset(qs, "tbl-dset",
      "111122223333", cols, database = Some("db"), table = Some("t"),
      dataSourceName = Some("athena-ds"), importMode = "SPICE",
      renameColumns = Seq("body" -> "text"),
      castColumnsTypes = Seq("doc_id" -> "string"),
      datasetId = Some("fixed-id"), tableId = Some("tid"))
    assert(id == "fixed-id")
    val (op, args) = qs.created.head
    assert(op == "create_data_set" && args("ImportMode") == "SPICE")
    val phys = args("PhysicalTableMap")
      .asInstanceOf[Map[String, Map[String, Map[String, Any]]]]
    val rel = phys("tid")("RelationalTable")
    assert(rel("DataSourceArn") == "arn:ds/ds-1")
    assert(rel("Schema") == "db" && rel("Name") == "t")
    assert(rel("InputColumns") == Seq(
      Map("Name" -> "doc_id", "Type" -> "INTEGER"),
      Map("Name" -> "body", "Type" -> "STRING")))
    val logical = args("LogicalTableMap")
      .asInstanceOf[Map[String, Map[String, Any]]]("tid")
    val trans = logical("DataTransforms")
      .asInstanceOf[Seq[Map[String, Map[String, String]]]]
    assert(trans.head("RenameColumnOperation")("NewColumnName") == "text")
    assert(trans(1)("CastColumnTypeOperation")("NewColumnType") ==
      "STRING")

    // sql path gets a CustomSql physical table
    QuickSight.createAthenaDataset(qs, "sql-dset", "111122223333",
      cols, sql = Some("SELECT 1 AS doc_id"), dataSourceArn =
        Some("arn:ds/ds-9"), tableId = Some("t2"))
    val phys2 = qs.created.last._2("PhysicalTableMap")
      .asInstanceOf[Map[String, Map[String, Map[String, Any]]]]
    assert(phys2("t2")("CustomSql")("SqlQuery") == "SELECT 1 AS doc_id")

    intercept[InvalidArgument] { // no source
      QuickSight.createAthenaDataset(qs, "x", "1", cols,
        database = Some("d"), table = Some("t"))
    }
    intercept[InvalidArgument] { // neither table nor sql
      QuickSight.createAthenaDataset(qs, "x", "1", cols,
        dataSourceArn = Some("a"))
    }
    intercept[InvalidArgument] { // database AND sql
      QuickSight.createAthenaDataset(qs, "x", "1", cols,
        database = Some("d"), sql = Some("s"),
        dataSourceArn = Some("a"))
    }
    intercept[InvalidArgumentValue] {
      QuickSight.createAthenaDataset(qs, "x", "1", cols,
        database = Some("d"), table = Some("t"),
        dataSourceArn = Some("a"), importMode = "TURBO")
    }
  }

  test("ingestion lifecycle: create by name, describe, list, cancel") {
    val qs = new FakeQs
    val ingId = QuickSight.createIngestion(qs,
      datasetName = Some("docs"), ingestionId = Some("ing-42"))
    assert(ingId == "ing-42")
    assert(qs.created.head._2("DataSetId") == "dset-1")
    val desc = QuickSight.describeIngestion(qs, "ing-42",
      datasetId = Some("dset-1"))
    assert(desc("IngestionId") == "ing-42")
    assert(QuickSight.listIngestions(qs,
      datasetName = Some("docs")).size == 1)
    QuickSight.cancelIngestion(qs, "ing-42", datasetName = Some("docs"))
    assert(qs.deleted.head._1 == "cancel_ingestion")
    intercept[InvalidArgument] { QuickSight.createIngestion(qs) }
  }

  test("delete by name and deleteAll sweep") {
    val qs = new FakeQs
    QuickSight.deleteDashboard(qs, name = Some("board"),
      versionNumber = Some(3))
    assert(qs.deleted.head == ("delete_dashboard" ->
      Map[String, Any]("DashboardId" -> "dash-1", "VersionNumber" -> 3)))
    QuickSight.deleteAllDataSources(qs)
    assert(qs.deleted.count(_._1 == "delete_data_source") == 3)
    intercept[InvalidArgument] { QuickSight.deleteDataset(qs) }
  }
}
