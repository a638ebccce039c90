package graft.emr

import graft.exceptions._

/** EMR step submission and cluster lifecycle (reference
  * awswrangler/emr.py). Step packaging (build_step, build_spark_step,
  * submit_steps, submit_spark_step, get_step_state — emr.py:830-1092)
  * is the Spark-adjacent slice a user touches per job; cluster CRUD
  * (create_cluster/_build_cluster_args emr.py:81-689, terminate
  * :721-745) is pure RunJobFlow argument assembly, re-expressed here
  * as a pure builder over a typed config plus the same injected-client
  * seam as Sts/Logs — the AWS SDK call itself is the caller's one-line
  * adapter, so everything testable lives on this side of the seam.
  */
object Emr {

  /** EMR Step structure (reference: emr.py:880-885 — Name,
    * ActionOnFailure, HadoopJarStep{Jar, Args}).
    */
  case class Step(name: String, actionOnFailure: String, jar: String,
                  args: Seq[String])

  /** The EMR API surface the builders submit through. */
  trait EmrClient {
    /** add_job_flow_steps → step ids, one per step. */
    def addJobFlowSteps(clusterId: String, steps: Seq[Step]): Seq[String]
    /** describe_step → Step.Status.State. */
    def stepState(clusterId: String, stepId: String): String
  }

  private val validActions = Set("TERMINATE_JOB_FLOW",
    "TERMINATE_CLUSTER", "CANCEL_AND_WAIT", "CONTINUE")

  /** reference: emr.build_step (emr.py:830-885). `script = true`
    * routes through the per-region script-runner jar; plain commands
    * use command-runner.
    */
  def buildStep(command: String, name: String = "my-step",
                actionOnFailure: String = "CONTINUE",
                script: Boolean = false,
                region: String = "us-east-1"): Step = {
    if (!validActions.contains(actionOnFailure))
      throw InvalidArgumentValue(
        s"actionOnFailure must be one of $validActions, got $actionOnFailure")
    val jar =
      if (script)
        s"s3://$region.elasticmapreduce/libs/script-runner/script-runner.jar"
      else "command-runner.jar"
    Step(name, actionOnFailure, jar, command.split(" ").toSeq)
  }

  /** reference: emr.build_spark_step (emr.py:967-1032) — assembles the
    * `spark-submit` command, including the YARN-docker conf block when
    * a docker image is given.
    */
  def buildSparkStep(path: String, deployMode: String = "cluster",
                     dockerImage: Option[String] = None,
                     name: String = "my-step",
                     actionOnFailure: String = "CONTINUE",
                     region: String = "us-east-1"): Step = {
    if (deployMode != "cluster" && deployMode != "client")
      throw InvalidArgumentValue(
        s"deployMode must be cluster|client, got $deployMode")
    // the docker YARN-runtime confs only apply cluster-side (the
    // reference hardcodes --deploy-mode cluster in its docker branch,
    // emr.py:1014); rejecting beats silently overriding the caller
    if (deployMode == "client" && dockerImage.isDefined)
      throw InvalidArgumentValue(
        "dockerImage requires deployMode=cluster (YARN docker runtime " +
          "confs do not apply to a client-mode driver)")
    val cmd = dockerImage match {
      case None => s"spark-submit --deploy-mode $deployMode $path"
      case Some(img) =>
        val config = "hdfs:///user/hadoop/config.json"
        val docker = Seq(
          "YARN_CONTAINER_RUNTIME_TYPE=docker",
          s"YARN_CONTAINER_RUNTIME_DOCKER_IMAGE=$img",
          s"YARN_CONTAINER_RUNTIME_DOCKER_CLIENT_CONFIG=$config",
          "YARN_CONTAINER_RUNTIME_DOCKER_MOUNTS=/etc/passwd:/etc/passwd:ro")
        val confs = docker.map(d => s"--conf spark.executorEnv.$d") ++
          docker.map(d => s"--conf spark.yarn.appMasterEnv.$d")
        (Seq("spark-submit", "--deploy-mode", "cluster") ++ confs ++
          Seq(path)).mkString(" ")
    }
    buildStep(cmd, name, actionOnFailure, script = false, region)
  }

  /** reference: emr.submit_steps (emr.py:930-965) */
  def submitSteps(client: EmrClient, clusterId: String,
                  steps: Seq[Step]): Seq[String] =
    client.addJobFlowSteps(clusterId, steps)

  /** reference: emr.submit_spark_step (emr.py:1040-1092) */
  def submitSparkStep(client: EmrClient, clusterId: String, path: String,
                      deployMode: String = "cluster",
                      dockerImage: Option[String] = None,
                      name: String = "my-step",
                      actionOnFailure: String = "CONTINUE",
                      region: String = "us-east-1"): String =
    submitSteps(client, clusterId, Seq(buildSparkStep(path, deployMode,
      dockerImage, name, actionOnFailure, region))).head

  /** reference: emr.get_step_state (emr.py:888-917) */
  def getStepState(client: EmrClient, clusterId: String,
                   stepId: String): String =
    client.stepState(clusterId, stepId)

  // ----------------------------------------------------------------
  // Cluster lifecycle (reference: emr.py:81-745)
  // ----------------------------------------------------------------

  /** The cluster-lifecycle API surface (run_job_flow /
    * describe_cluster / terminate_job_flows). Kept separate from
    * [[EmrClient]] so existing step-only adapters stay source
    * compatible.
    */
  trait ClusterClient {
    /** run_job_flow(args) → JobFlowId (cluster id). */
    def runJobFlow(args: Map[String, Any]): String
    /** describe_cluster → Cluster.Status.State. */
    def clusterState(clusterId: String): String
    /** terminate_job_flows(JobFlowIds=[...]). */
    def terminateJobFlows(clusterIds: Seq[String]): Unit
  }

  /** One instance fleet's sizing knobs (master/core/task share the
    * shape — reference emr.py:271-385 repeats the block three times).
    */
  case class FleetConfig(instanceType: String = "r5.xlarge",
                         ebsSizeGb: Int = 64,
                         numOnDemand: Int = 0,
                         numSpot: Int = 0,
                         spotBidPercentageOfOnDemand: Int = 100,
                         spotProvisioningTimeoutMinutes: Int = 5,
                         spotTimeoutToOnDemand: Boolean = true)

  /** create_cluster's parameter surface (reference emr.py:389-449),
    * grouped: the three per-role instance blocks become [[FleetConfig]]
    * values instead of 21 positional parameters.
    */
  case class ClusterConfig(subnetId: String,
                           clusterName: String = "my-emr-cluster",
                           loggingS3Path: Option[String] = None,
                           emrRelease: String = "emr-6.0.0",
                           emrEc2Role: String = "EMR_EC2_DefaultRole",
                           emrRole: String = "EMR_DefaultRole",
                           master: FleetConfig = FleetConfig(numOnDemand = 1),
                           core: FleetConfig = FleetConfig(),
                           task: FleetConfig = FleetConfig(),
                           python3: Boolean = true,
                           sparkGlueCatalog: Boolean = true,
                           hiveGlueCatalog: Boolean = true,
                           prestoGlueCatalog: Boolean = true,
                           consistentView: Boolean = false,
                           consistentViewRetrySeconds: Int = 10,
                           consistentViewRetryCount: Int = 5,
                           consistentViewTableName: String = "EmrFSMetadata",
                           bootstrapsPaths: Seq[String] = Nil,
                           debugging: Boolean = true,
                           applications: Seq[String] = Nil,
                           visibleToAllUsers: Boolean = true,
                           keyPairName: Option[String] = None,
                           securityGroupMaster: Option[String] = None,
                           securityGroupsMasterAdditional: Seq[String] = Nil,
                           securityGroupSlave: Option[String] = None,
                           securityGroupsSlaveAdditional: Seq[String] = Nil,
                           securityGroupServiceAccess: Option[String] = None,
                           docker: Boolean = false,
                           extraPublicRegistries: Seq[String] = Nil,
                           sparkLogLevel: String = "WARN",
                           sparkJarsPath: Seq[String] = Nil,
                           sparkDefaults: Map[String, String] = Map.empty,
                           sparkPyarrow: Boolean = false,
                           customClassifications: Seq[Map[String, Any]] = Nil,
                           maximizeResourceAllocation: Boolean = false,
                           steps: Seq[Step] = Nil,
                           keepClusterAliveWhenNoSteps: Boolean = true,
                           terminationProtected: Boolean = false,
                           tags: Map[String, String] = Map.empty,
                           region: String = "us-east-1")

  /** reference: emr._get_default_logging_path (emr.py:33-78). */
  def defaultLoggingPath(accountId: String, region: String): String =
    s"s3://aws-logs-$accountId-$region/elasticmapreduce/"

  private def classification(name: String, props: Map[String, String],
                             nested: Seq[Map[String, Any]] = Nil)
      : Map[String, Any] =
    Map("Classification" -> name, "Properties" -> props,
      "Configurations" -> nested)

  /** export-style env classification (spark-env / yarn-env / livy-env
    * wrap their properties in a nested `export` block —
    * reference emr.py:183-203).
    */
  private def envClassification(name: String, env: Map[String, String])
      : Map[String, Any] =
    classification(name, Map.empty,
      Seq(classification("export", env)))

  private val glueFactory =
    "com.amazonaws.glue.catalog.metastore.AWSGlueDataCatalogHiveClientFactory"

  private def fleet(role: String, f: FleetConfig): Map[String, Any] = {
    val base: Map[String, Any] = Map(
      "Name" -> role,
      "InstanceFleetType" -> role,
      "TargetOnDemandCapacity" -> f.numOnDemand,
      "TargetSpotCapacity" -> f.numSpot,
      "InstanceTypeConfigs" -> Seq(Map(
        "InstanceType" -> f.instanceType,
        "WeightedCapacity" -> 1,
        "BidPriceAsPercentageOfOnDemandPrice" ->
          f.spotBidPercentageOfOnDemand,
        "EbsConfiguration" -> Map(
          "EbsBlockDeviceConfigs" -> Seq(Map(
            "VolumeSpecification" -> Map(
              "SizeInGB" -> f.ebsSizeGb, "VolumeType" -> "gp2"),
            "VolumesPerInstance" -> 1)),
          "EbsOptimized" -> true))))
    if (f.numSpot > 0)
      base + ("LaunchSpecifications" -> Map(
        "SpotSpecification" -> Map(
          "TimeoutDurationMinutes" -> f.spotProvisioningTimeoutMinutes,
          "TimeoutAction" ->
            (if (f.spotTimeoutToOnDemand) "SWITCH_TO_ON_DEMAND"
             else "TERMINATE_CLUSTER"))))
    else base
  }

  /** Pure RunJobFlow argument assembly (reference:
    * emr._build_cluster_args, emr.py:81-386). Differences from the
    * reference, on purpose: `accountId` is a parameter instead of an
    * STS call buried in the builder (keeps it pure), and the docker
    * registry list honors `extraPublicRegistries` (the reference reads
    * a never-set `extra_registries` key, so its parameter silently
    * no-ops).
    */
  def buildClusterArgs(cfg: ClusterConfig, accountId: String)
      : Map[String, Any] = {
    if (cfg.master.numOnDemand + cfg.master.numSpot < 1)
      throw InvalidArgumentValue(
        "master fleet needs at least one instance (on-demand or spot)")

    // spark-defaults accumulates pyarrow + jars on top of the caller's
    val sparkDefaults =
      cfg.sparkDefaults ++
        (if (cfg.sparkPyarrow)
           Map("spark.sql.execution.arrow.enabled" -> "true")
         else Map.empty) ++
        (if (cfg.sparkJarsPath.nonEmpty)
           Map("spark.jars" -> cfg.sparkJarsPath.mkString(","))
         else Map.empty)
    val arrowEnv =
      if (cfg.sparkPyarrow) Map("ARROW_PRE_0_15_IPC_FORMAT" -> "1")
      else Map.empty[String, String]
    val sparkEnv = arrowEnv ++
      (if (cfg.python3) Map("PYSPARK_PYTHON" -> "/usr/bin/python3")
       else Map.empty)

    val configurations: Seq[Map[String, Any]] =
      Seq(classification("spark-log4j",
        Map("log4j.rootCategory" -> s"${cfg.sparkLogLevel}, console"))) ++
      (if (cfg.docker) {
        val registries = (Seq("local", "centos",
          s"$accountId.dkr.ecr.${cfg.region}.amazonaws.com") ++
          cfg.extraPublicRegistries).mkString(",")
        Seq(classification("container-executor", Map.empty, Seq(
          classification("docker", Map(
            "docker.privileged-containers.registries" -> registries,
            "docker.trusted.registries" -> registries)))))
      } else Nil) ++
      (if (sparkEnv.nonEmpty) Seq(envClassification("spark-env", sparkEnv))
       else Nil) ++
      (if (arrowEnv.nonEmpty)
         Seq(envClassification("yarn-env", arrowEnv),
             envClassification("livy-env", arrowEnv))
       else Nil) ++
      (if (cfg.sparkGlueCatalog)
         Seq(classification("spark-hive-site",
           Map("hive.metastore.client.factory.class" -> glueFactory)))
       else Nil) ++
      (if (cfg.hiveGlueCatalog)
         Seq(classification("hive-site",
           Map("hive.metastore.client.factory.class" -> glueFactory)))
       else Nil) ++
      (if (cfg.prestoGlueCatalog)
         Seq(classification("presto-connector-hive",
           Map("hive.metastore.glue.datacatalog.enabled" -> "true")))
       else Nil) ++
      (if (cfg.consistentView)
         Seq(classification("emrfs-site", Map(
           "fs.s3.consistent" -> "true",
           "fs.s3.consistent.retryPeriodSeconds" ->
             cfg.consistentViewRetrySeconds.toString,
           "fs.s3.consistent.retryCount" ->
             cfg.consistentViewRetryCount.toString,
           "fs.s3.consistent.metadata.tableName" ->
             cfg.consistentViewTableName)))
       else Nil) ++
      (if (cfg.maximizeResourceAllocation)
         Seq(classification("spark",
           Map("maximizeResourceAllocation" -> "true")))
       else Nil) ++
      (if (sparkDefaults.nonEmpty)
         Seq(Map[String, Any]("Classification" -> "spark-defaults",
           "Properties" -> sparkDefaults))
       else Nil) ++
      cfg.customClassifications

    val fleets: Seq[Map[String, Any]] =
      Seq(fleet("MASTER", cfg.master)) ++
        (if (cfg.core.numOnDemand + cfg.core.numSpot > 0)
           Seq(fleet("CORE", cfg.core)) else Nil) ++
        (if (cfg.task.numOnDemand + cfg.task.numSpot > 0)
           Seq(fleet("TASK", cfg.task)) else Nil)

    val instances: Map[String, Any] = Map(
      "KeepJobFlowAliveWhenNoSteps" -> cfg.keepClusterAliveWhenNoSteps,
      "TerminationProtected" -> cfg.terminationProtected,
      "Ec2SubnetId" -> cfg.subnetId,
      "InstanceFleets" -> fleets) ++
      cfg.keyPairName.map("Ec2KeyName" -> _) ++
      cfg.securityGroupMaster.map("EmrManagedMasterSecurityGroup" -> _) ++
      (if (cfg.securityGroupsMasterAdditional.nonEmpty)
         Some("AdditionalMasterSecurityGroups" ->
           cfg.securityGroupsMasterAdditional) else None) ++
      cfg.securityGroupSlave.map("EmrManagedSlaveSecurityGroup" -> _) ++
      (if (cfg.securityGroupsSlaveAdditional.nonEmpty)
         Some("AdditionalSlaveSecurityGroups" ->
           cfg.securityGroupsSlaveAdditional) else None) ++
      cfg.securityGroupServiceAccess.map(
        "ServiceAccessSecurityGroup" -> _)

    val debugStep = Step("Setup Hadoop Debugging", "TERMINATE_CLUSTER",
      "command-runner.jar", Seq("state-pusher-script"))
    val allSteps: Seq[Step] =
      (if (cfg.debugging) Seq(debugStep) else Nil) ++ cfg.steps

    Map(
      "Name" -> cfg.clusterName,
      "LogUri" -> cfg.loggingS3Path.getOrElse(
        defaultLoggingPath(accountId, cfg.region)),
      "ReleaseLabel" -> cfg.emrRelease,
      "VisibleToAllUsers" -> cfg.visibleToAllUsers,
      "JobFlowRole" -> cfg.emrEc2Role,
      "ServiceRole" -> cfg.emrRole,
      "Instances" -> instances,
      "Configurations" -> configurations) ++
      (if (cfg.applications.nonEmpty)
         Some("Applications" ->
           cfg.applications.map(a => Map("Name" -> a))) else None) ++
      (if (cfg.bootstrapsPaths.nonEmpty)
         Some("BootstrapActions" -> cfg.bootstrapsPaths.map(p =>
           Map("Name" -> p,
             "ScriptBootstrapAction" -> Map("Path" -> p)))) else None) ++
      (if (allSteps.nonEmpty) Some("Steps" -> allSteps) else None) ++
      (if (cfg.tags.nonEmpty)
         Some("Tags" -> cfg.tags.toSeq.sortBy(_._1).map {
           case (k, v) => Map("Key" -> k, "Value" -> v) }) else None)
  }

  /** reference: emr.create_cluster (emr.py:389-689) */
  def createCluster(client: ClusterClient, cfg: ClusterConfig,
                    accountId: String): String =
    client.runJobFlow(buildClusterArgs(cfg, accountId))

  /** reference: emr.get_cluster_state (emr.py:690-718) */
  def getClusterState(client: ClusterClient, clusterId: String): String =
    client.clusterState(clusterId)

  /** reference: emr.terminate_cluster (emr.py:721-745) */
  def terminateCluster(client: ClusterClient, clusterId: String): Unit =
    client.terminateJobFlows(Seq(clusterId))

  /** The ECR login-refresh job the refresh step runs (reference:
    * emr._get_ecr_credentials_refresh_content, emr.py:15-27 — a tiny
    * PySpark script that re-runs `aws ecr get-login` and pushes the
    * resulting docker config to HDFS for the YARN docker runtime).
    * Re-expressed, not copied: same two commands, own wrapper.
    */
  def ecrCredentialsRefreshScript(region: String): String =
    s"""import subprocess
       |subprocess.run(
       |    "sudo -s eval $$(aws ecr get-login --region $region --no-include-email)",
       |    shell=True, check=True)
       |subprocess.run(
       |    "sudo hdfs dfs -put -f /root/.docker/config.json /user/hadoop/",
       |    shell=True, check=True)
       |print("done")
       |""".stripMargin

  /** reference: emr.submit_ecr_credentials_refresh (emr.py:920-965).
    * Stages the refresh script at `path/ecr_credentials_refresh.py`
    * through the injected writer (Hadoop-FS-backed in this library,
    * so file:// in tests and s3a:// in production) and submits it as a
    * cluster-mode spark step.
    */
  def submitEcrCredentialsRefresh(client: EmrClient, clusterId: String,
                                  path: String,
                                  stageScript: (String, String) => Unit,
                                  actionOnFailure: String = "CONTINUE",
                                  region: String = "us-east-1"): String = {
    val scriptPath =
      s"${path.stripSuffix("/")}/ecr_credentials_refresh.py"
    stageScript(scriptPath, ecrCredentialsRefreshScript(region))
    val step = buildStep(
      command = s"spark-submit --deploy-mode cluster $scriptPath",
      name = "ECR Credentials Refresh",
      actionOnFailure = actionOnFailure, script = false, region = region)
    client.addJobFlowSteps(clusterId, Seq(step)).head
  }
}
