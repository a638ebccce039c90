package graft.qs

import java.util.UUID

import org.apache.spark.sql.SparkSession

import graft.exceptions._
import graft.types.AthenaTypes

/** QuickSight wrappers (reference: the awswrangler/quicksight package) —
  * BI-object CRUD over an injected client, the same seam pattern as
  * Sts/Logs/Emr. The reference drives a boto3 `quicksight` client
  * whose list calls paginate via NextToken and whose create calls take
  * assembled JSON argument trees; everything on this side of the seam
  * — pagination draining, name→id resolution, permission assembly,
  * dataset physical/logical table maps, type mapping — is the logic
  * worth testing, and the adapter a user writes against the AWS SDK is
  * one line per operation.
  *
  * Op names passed through the seam are the boto3 operation names the
  * reference uses (`quicksight/_get_list.py:17-37` is itself generic
  * over `func_name`/`attr_name`, which this mirrors).
  */
object QuickSight {

  /** The QuickSight API surface (reference `_utils.client("quicksight")`
    * call sites). One page per `listPage` call — NextToken draining
    * lives on the library side, mirroring `_get_list._list`.
    */
  trait QsClient {
    /** One page of a paginated list op → (items, nextToken). */
    def listPage(op: String, params: Map[String, String],
                 nextToken: Option[String])
        : (Seq[Map[String, Any]], Option[String])
    /** describe_* op → the described object. */
    def describe(op: String, params: Map[String, String])
        : Map[String, Any]
    /** create_* op → response (e.g. IngestionId). */
    def create(op: String, args: Map[String, Any]): Map[String, Any]
    /** delete_* / cancel_* op. */
    def delete(op: String, params: Map[String, Any]): Unit
  }

  // ------------------------------------------------------------------
  // list_* (reference: quicksight/_get_list.py)
  // ------------------------------------------------------------------

  /** Drain a paginated list op (reference: `_list`,
    * _get_list.py:17-37).
    */
  def listAll(client: QsClient, op: String,
              params: Map[String, String] = Map.empty)
      : Seq[Map[String, Any]] = {
    val out = Seq.newBuilder[Map[String, Any]]
    var token: Option[String] = None
    var first = true
    while (first || token.isDefined) {
      first = false
      val (items, next) = client.listPage(op, params, token)
      out ++= items
      token = next
    }
    out.result()
  }

  def listDashboards(client: QsClient): Seq[Map[String, Any]] =
    listAll(client, "list_dashboards")

  def listDatasets(client: QsClient): Seq[Map[String, Any]] =
    listAll(client, "list_data_sets")

  def listDataSources(client: QsClient): Seq[Map[String, Any]] =
    listAll(client, "list_data_sources")

  def listTemplates(client: QsClient): Seq[Map[String, Any]] =
    listAll(client, "list_templates")

  def listGroups(client: QsClient, namespace: String = "default")
      : Seq[Map[String, Any]] =
    listAll(client, "list_groups", Map("Namespace" -> namespace))

  def listGroupMemberships(client: QsClient, groupName: String,
                           namespace: String = "default")
      : Seq[Map[String, Any]] =
    listAll(client, "list_group_memberships",
      Map("GroupName" -> groupName, "Namespace" -> namespace))

  def listUsers(client: QsClient, namespace: String = "default")
      : Seq[Map[String, Any]] =
    listAll(client, "list_users", Map("Namespace" -> namespace))

  def listUserGroups(client: QsClient, userName: String,
                     namespace: String = "default")
      : Seq[Map[String, Any]] =
    listAll(client, "list_user_groups",
      Map("UserName" -> userName, "Namespace" -> namespace))

  def listIamPolicyAssignments(client: QsClient,
                               status: Option[String] = None,
                               namespace: String = "default")
      : Seq[Map[String, Any]] =
    listAll(client, "list_iam_policy_assignments",
      Map("Namespace" -> namespace) ++
        status.map("AssignmentStatus" -> _))

  def listIamPolicyAssignmentsForUser(client: QsClient, userName: String,
                                      namespace: String = "default")
      : Seq[Map[String, Any]] =
    listAll(client, "list_iam_policy_assignments_for_user",
      Map("UserName" -> userName, "Namespace" -> namespace))

  def listIngestions(client: QsClient,
                     datasetName: Option[String] = None,
                     datasetId: Option[String] = None)
      : Seq[Map[String, Any]] = {
    val id = resolveDatasetId(client, datasetName, datasetId)
    listAll(client, "list_ingestions", Map("DataSetId" -> id))
  }

  // ------------------------------------------------------------------
  // name → id resolution (reference: _get_list.py:423-457)
  // ------------------------------------------------------------------

  private def ids(items: Seq[Map[String, Any]], name: String,
                  attr: String): Seq[String] =
    items.collect {
      case it if it.get("Name").contains(name) => it(attr).toString
    }

  /** 0 matches and >1 matches are both errors, mirroring `_get_id`
    * (_get_list.py:437-457) — an ambiguous name must be disambiguated
    * by id.
    */
  private def one(matches: Seq[String], attr: String,
                  name: String): String = matches match {
    case Seq(id) => id
    case Seq() =>
      throw InvalidArgument(s"There is no $attr related with name $name")
    case many =>
      throw InvalidArgument(
        s"There is ${many.size} $attr with name $name. " +
          "Please pass the id argument to specify which one you want.")
  }

  def getDashboardIds(client: QsClient, name: String): Seq[String] =
    ids(listDashboards(client), name, "DashboardId")
  def getDashboardId(client: QsClient, name: String): String =
    one(getDashboardIds(client, name), "DashboardId", name)

  def getDatasetIds(client: QsClient, name: String): Seq[String] =
    ids(listDatasets(client), name, "DataSetId")
  def getDatasetId(client: QsClient, name: String): String =
    one(getDatasetIds(client, name), "DataSetId", name)

  def getDataSourceIds(client: QsClient, name: String): Seq[String] =
    ids(listDataSources(client), name, "DataSourceId")
  def getDataSourceId(client: QsClient, name: String): String =
    one(getDataSourceIds(client, name), "DataSourceId", name)

  def getTemplateIds(client: QsClient, name: String): Seq[String] =
    ids(listTemplates(client), name, "TemplateId")
  def getTemplateId(client: QsClient, name: String): String =
    one(getTemplateIds(client, name), "TemplateId", name)

  def getDataSourceArns(client: QsClient, name: String): Seq[String] =
    ids(listDataSources(client), name, "Arn")
  def getDataSourceArn(client: QsClient, name: String): String =
    one(getDataSourceArns(client, name), "Arn", name)

  private def resolveDatasetId(client: QsClient, name: Option[String],
                               id: Option[String]): String =
    id.orElse(name.map(getDatasetId(client, _))).getOrElse(
      throw InvalidArgument(
        "You must pass a not None dataset_name or dataset_id argument."))

  // ------------------------------------------------------------------
  // describe_* (reference: quicksight/_describe.py)
  // ------------------------------------------------------------------

  def describeDashboard(client: QsClient,
                        name: Option[String] = None,
                        dashboardId: Option[String] = None)
      : Map[String, Any] = {
    val id = dashboardId.orElse(name.map(getDashboardId(client, _)))
      .getOrElse(throw InvalidArgument(
        "You must pass a not None name or dashboard_id argument."))
    client.describe("describe_dashboard", Map("DashboardId" -> id))
  }

  def describeDataSource(client: QsClient,
                         name: Option[String] = None,
                         dataSourceId: Option[String] = None)
      : Map[String, Any] = {
    val id = dataSourceId.orElse(name.map(getDataSourceId(client, _)))
      .getOrElse(throw InvalidArgument(
        "You must pass a not None name or data_source_id argument."))
    client.describe("describe_data_source", Map("DataSourceId" -> id))
  }

  def describeDataSourcePermissions(client: QsClient,
                                    name: Option[String] = None,
                                    dataSourceId: Option[String] = None)
      : Map[String, Any] = {
    val id = dataSourceId.orElse(name.map(getDataSourceId(client, _)))
      .getOrElse(throw InvalidArgument(
        "You must pass a not None name or data_source_id argument."))
    client.describe("describe_data_source_permissions",
      Map("DataSourceId" -> id))
  }

  def describeDataset(client: QsClient,
                      name: Option[String] = None,
                      datasetId: Option[String] = None)
      : Map[String, Any] =
    client.describe("describe_data_set",
      Map("DataSetId" -> resolveDatasetId(client, name, datasetId)))

  def describeIngestion(client: QsClient, ingestionId: String,
                        datasetName: Option[String] = None,
                        datasetId: Option[String] = None)
      : Map[String, Any] =
    client.describe("describe_ingestion", Map(
      "IngestionId" -> ingestionId,
      "DataSetId" -> resolveDatasetId(client, datasetName, datasetId)))

  // ------------------------------------------------------------------
  // delete_* / cancel_* (reference: _delete.py, _cancel.py)
  // ------------------------------------------------------------------

  def deleteDashboard(client: QsClient,
                      name: Option[String] = None,
                      dashboardId: Option[String] = None,
                      versionNumber: Option[Int] = None): Unit = {
    val id = dashboardId.orElse(name.map(getDashboardId(client, _)))
      .getOrElse(throw InvalidArgument(
        "You must pass a not None name or dashboard_id argument."))
    client.delete("delete_dashboard",
      Map[String, Any]("DashboardId" -> id) ++
        versionNumber.map("VersionNumber" -> _))
  }

  def deleteDataset(client: QsClient,
                    name: Option[String] = None,
                    datasetId: Option[String] = None): Unit =
    client.delete("delete_data_set", Map[String, Any](
      "DataSetId" -> resolveDatasetId(client, name, datasetId)))

  def deleteDataSource(client: QsClient,
                       name: Option[String] = None,
                       dataSourceId: Option[String] = None): Unit = {
    val id = dataSourceId.orElse(name.map(getDataSourceId(client, _)))
      .getOrElse(throw InvalidArgument(
        "You must pass a not None name or data_source_id argument."))
    client.delete("delete_data_source", Map[String, Any](
      "DataSourceId" -> id))
  }

  def deleteTemplate(client: QsClient,
                     name: Option[String] = None,
                     templateId: Option[String] = None,
                     versionNumber: Option[Int] = None): Unit = {
    val id = templateId.orElse(name.map(getTemplateId(client, _)))
      .getOrElse(throw InvalidArgument(
        "You must pass a not None name or template_id argument."))
    client.delete("delete_template",
      Map[String, Any]("TemplateId" -> id) ++
        versionNumber.map("VersionNumber" -> _))
  }

  def deleteAllDashboards(client: QsClient): Unit =
    listDashboards(client).foreach(d => client.delete("delete_dashboard",
      Map[String, Any]("DashboardId" -> d("DashboardId").toString)))

  def deleteAllDatasets(client: QsClient): Unit =
    listDatasets(client).foreach(d => client.delete("delete_data_set",
      Map[String, Any]("DataSetId" -> d("DataSetId").toString)))

  def deleteAllDataSources(client: QsClient): Unit =
    listDataSources(client).foreach(d =>
      client.delete("delete_data_source",
        Map[String, Any]("DataSourceId" -> d("DataSourceId").toString)))

  def deleteAllTemplates(client: QsClient): Unit =
    listTemplates(client).foreach(t => client.delete("delete_template",
      Map[String, Any]("TemplateId" -> t("TemplateId").toString)))

  def cancelIngestion(client: QsClient, ingestionId: String,
                      datasetName: Option[String] = None,
                      datasetId: Option[String] = None): Unit =
    client.delete("cancel_ingestion", Map[String, Any](
      "IngestionId" -> ingestionId,
      "DataSetId" -> resolveDatasetId(client, datasetName, datasetId)))

  // ------------------------------------------------------------------
  // create_* (reference: quicksight/_create.py)
  // ------------------------------------------------------------------

  /** Athena → QuickSight type mapping (reference:
    * _data_types.athena2quicksight, _data_types.py:121-148).
    */
  def athenaToQuickSightType(dtype: String): String = {
    val t = dtype.toLowerCase
    t match {
      case "tinyint" | "smallint" | "int" | "integer" | "bigint" =>
        "INTEGER"
      case "float" | "real" | "double" => "DECIMAL"
      case "boolean" | "bool" => "BOOLEAN"
      case "string" | "char" | "varchar" => "STRING"
      case "timestamp" | "date" => "DATETIME"
      case "binary" => "BIT"
      case _ if t.startsWith("decimal") => "DECIMAL"
      case _ =>
        throw UnsupportedType(s"Unsupported Athena type: $dtype")
    }
  }

  /** Per-resource permission action sets (reference: _ALLOWED_ACTIONS,
    * _create.py:15-52).
    */
  private val allowedActions: Map[String, Map[String, Seq[String]]] = Map(
    "data_source" -> Map(
      "allowed_to_use" -> Seq(
        "quicksight:DescribeDataSource",
        "quicksight:DescribeDataSourcePermissions",
        "quicksight:PassDataSource"),
      "allowed_to_manage" -> Seq(
        "quicksight:DescribeDataSource",
        "quicksight:DescribeDataSourcePermissions",
        "quicksight:PassDataSource",
        "quicksight:UpdateDataSource",
        "quicksight:DeleteDataSource",
        "quicksight:UpdateDataSourcePermissions")),
    "dataset" -> Map(
      "allowed_to_use" -> Seq(
        "quicksight:DescribeDataSet",
        "quicksight:DescribeDataSetPermissions",
        "quicksight:PassDataSet",
        "quicksight:DescribeIngestion",
        "quicksight:ListIngestions"),
      "allowed_to_manage" -> Seq(
        "quicksight:DescribeDataSet",
        "quicksight:DescribeDataSetPermissions",
        "quicksight:PassDataSet",
        "quicksight:DescribeIngestion",
        "quicksight:ListIngestions",
        "quicksight:UpdateDataSet",
        "quicksight:DeleteDataSet",
        "quicksight:CreateIngestion",
        "quicksight:CancelIngestion",
        "quicksight:UpdateDataSetPermissions")))

  /** Username → principal-ARN permission entries (reference:
    * `_generate_permissions` + `_usernames_to_arns`,
    * _create.py:55-97). A user present in both lists is kept only in
    * manage — same dedup rule as the reference.
    */
  def generatePermissions(client: QsClient, resource: String,
                          allowedToUse: Seq[String] = Nil,
                          allowedToManage: Seq[String] = Nil,
                          namespace: String = "default")
      : Seq[Map[String, Any]] = {
    if (allowedToUse.isEmpty && allowedToManage.isEmpty) return Nil
    val actions = allowedActions.getOrElse(resource,
      throw InvalidArgumentValue(
        s"resource must be one of ${allowedActions.keySet}, got $resource"))
    val use = allowedToUse.filterNot(allowedToManage.contains)
    val users = listUsers(client, namespace)
    def arns(names: Seq[String]): Seq[String] = users.collect {
      case u if u.get("UserName").exists(n => names.contains(n.toString)) =>
        u("Arn").toString
    }
    arns(use).map(arn => Map[String, Any](
      "Principal" -> arn, "Actions" -> actions("allowed_to_use"))) ++
      arns(allowedToManage).map(arn => Map[String, Any](
        "Principal" -> arn, "Actions" -> actions("allowed_to_manage")))
  }

  /** Rename/cast column transforms (reference:
    * `_generate_transformations`, _create.py:100-110). Rename order
    * follows the caller's Seq — the reference iterates dict insertion
    * order, so Seq-of-pairs is the faithful Scala shape.
    */
  def generateTransformations(
      renameColumns: Seq[(String, String)] = Nil,
      castColumnsTypes: Seq[(String, String)] = Nil)
      : Seq[Map[String, Any]] =
    renameColumns.map { case (from, to) =>
      Map[String, Any]("RenameColumnOperation" ->
        Map("ColumnName" -> from, "NewColumnName" -> to))
    } ++ castColumnsTypes.map { case (col, tpe) =>
      Map[String, Any]("CastColumnTypeOperation" ->
        Map("ColumnName" -> col, "NewColumnType" -> tpe.toUpperCase))
    }

  /** reference: create_athena_data_source (_create.py:113-192). */
  def createAthenaDataSource(client: QsClient, name: String,
                             accountId: String,
                             workgroup: String = "primary",
                             allowedToUse: Seq[String] = Nil,
                             allowedToManage: Seq[String] = Nil,
                             tags: Map[String, String] = Map.empty,
                             namespace: String = "default"): Unit = {
    val permissions = generatePermissions(client, "data_source",
      allowedToUse, allowedToManage, namespace)
    val args: Map[String, Any] = Map(
      "AwsAccountId" -> accountId,
      "DataSourceId" -> name,
      "Name" -> name,
      "Type" -> "ATHENA",
      "DataSourceParameters" ->
        Map("AthenaParameters" -> Map("WorkGroup" -> workgroup)),
      "SslProperties" -> Map("DisableSsl" -> true)) ++
      (if (permissions.nonEmpty) Some("Permissions" -> permissions)
       else None) ++
      (if (tags.nonEmpty)
         Some("Tags" -> tags.toSeq.sortBy(_._1).map { case (k, v) =>
           Map("Key" -> k, "Value" -> v) }) else None)
    client.create("create_data_source", args)
  }

  /** Ordered (column, athenaType) pairs for a cataloged table — the
    * Spark-side stand-in for the reference's Glue lookup
    * (`extract_athena_table_columns`, quicksight/_utils.py:14-22);
    * this library's catalog IS the Spark catalog.
    */
  def extractTableColumns(spark: SparkSession, database: String,
                          table: String): Seq[(String, String)] =
    spark.table(s"`$database`.`$table`").schema.fields.toSeq
      .map(f => f.name -> AthenaTypes.fromSpark(f.dataType))

  /** Ordered (column, athenaType) pairs for an arbitrary SQL text —
    * the reference runs a `LIMIT 0` wrapper through Athena
    * (`extract_athena_query_columns`, quicksight/_utils.py:24-37);
    * here the analyzer answers without executing.
    */
  def extractQueryColumns(spark: SparkSession, sql: String)
      : Seq[(String, String)] =
    spark.sql(s"SELECT ds.* FROM ( $sql ) ds LIMIT 0").schema.fields
      .toSeq.map(f => f.name -> AthenaTypes.fromSpark(f.dataType))

  private def hexUuid(): String =
    UUID.randomUUID().toString.replace("-", "")

  /** reference: create_athena_dataset (_create.py:193-357). Returns
    * the dataset id. `columns` carries the (name, athenaType) pairs a
    * caller got from [[extractTableColumns]]/[[extractQueryColumns]] —
    * taking them as data keeps this builder pure. Fixed `datasetId` /
    * `tableId` are accepted for reproducible infrastructure (the
    * reference always mints uuid4s).
    */
  def createAthenaDataset(client: QsClient, name: String,
                          accountId: String,
                          columns: Seq[(String, String)],
                          database: Option[String] = None,
                          table: Option[String] = None,
                          sql: Option[String] = None,
                          sqlName: String = "CustomSQL",
                          dataSourceName: Option[String] = None,
                          dataSourceArn: Option[String] = None,
                          importMode: String = "DIRECT_QUERY",
                          allowedToUse: Seq[String] = Nil,
                          allowedToManage: Seq[String] = Nil,
                          logicalTableAlias: String = "LogicalTable",
                          renameColumns: Seq[(String, String)] = Nil,
                          castColumnsTypes: Seq[(String, String)] = Nil,
                          tags: Map[String, String] = Map.empty,
                          namespace: String = "default",
                          datasetId: Option[String] = None,
                          tableId: Option[String] = None): String = {
    if (dataSourceName.isEmpty && dataSourceArn.isEmpty)
      throw InvalidArgument(
        "You must pass a not None data_source_name or data_source_arn " +
          "argument.")
    if (database.isEmpty && table.isEmpty && sql.isEmpty)
      throw InvalidArgument("You must pass database/table OR sql argument.")
    if (database.isDefined && sql.isDefined)
      throw InvalidArgument(
        "If you provide sql argument, please include the database name " +
          "inside the sql statement. Do NOT pass in with database argument.")
    if (importMode != "SPICE" && importMode != "DIRECT_QUERY")
      throw InvalidArgumentValue(
        s"importMode must be SPICE|DIRECT_QUERY, got $importMode")

    val arn = dataSourceArn.getOrElse(
      getDataSourceArn(client, dataSourceName.get))
    val inputColumns = columns.map { case (n, t) =>
      Map("Name" -> n, "Type" -> athenaToQuickSightType(t))
    }
    val physicalTable: Map[String, Any] = sql match {
      case Some(q) => Map("CustomSql" -> Map(
        "DataSourceArn" -> arn, "Name" -> sqlName, "SqlQuery" -> q,
        "Columns" -> inputColumns))
      case None => Map("RelationalTable" -> Map(
        "DataSourceArn" -> arn,
        "Schema" -> database.getOrElse(throw InvalidArgument(
          "You must pass database together with table.")),
        "Name" -> table.getOrElse(throw InvalidArgument(
          "You must pass table together with database.")),
        "InputColumns" -> inputColumns))
    }

    val tUuid = tableId.getOrElse(hexUuid())
    val dsId = datasetId.getOrElse(hexUuid())
    val trans = generateTransformations(renameColumns, castColumnsTypes)
    val logical: Map[String, Any] = Map(
      "Alias" -> logicalTableAlias,
      "Source" -> Map("PhysicalTableId" -> tUuid)) ++
      (if (trans.nonEmpty) Some("DataTransforms" -> trans) else None)
    val permissions = generatePermissions(client, "dataset",
      allowedToUse, allowedToManage, namespace)

    val args: Map[String, Any] = Map(
      "AwsAccountId" -> accountId,
      "DataSetId" -> dsId,
      "Name" -> name,
      "ImportMode" -> importMode,
      "PhysicalTableMap" -> Map(tUuid -> physicalTable),
      "LogicalTableMap" -> Map(tUuid -> logical)) ++
      (if (permissions.nonEmpty) Some("Permissions" -> permissions)
       else None) ++
      (if (tags.nonEmpty)
         Some("Tags" -> tags.toSeq.sortBy(_._1).map { case (k, v) =>
           Map("Key" -> k, "Value" -> v) }) else None)
    client.create("create_data_set", args)
    dsId
  }

  /** reference: create_ingestion (_create.py:359-408). Returns the
    * ingestion id.
    */
  def createIngestion(client: QsClient,
                      datasetName: Option[String] = None,
                      datasetId: Option[String] = None,
                      ingestionId: Option[String] = None): String = {
    val dsId = resolveDatasetId(client, datasetName, datasetId)
    val ingId = ingestionId.getOrElse(hexUuid())
    val resp = client.create("create_ingestion", Map[String, Any](
      "DataSetId" -> dsId, "IngestionId" -> ingId))
    resp.getOrElse("IngestionId", ingId).toString
  }
}
