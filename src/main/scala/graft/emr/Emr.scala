package graft.emr

import graft.exceptions._

/** EMR step submission — the one Spark-adjacent slice of the
  * reference's EMR module (reference awswrangler/emr.py:830-1092:
  * build_step, build_spark_step, submit_steps, submit_spark_step,
  * get_step_state). The cluster-CRUD remainder of emr.py (~1,100 LoC
  * of create_cluster/terminate plumbing) stays out of scope — zero
  * Spark content (SURVEY.md §2.10); this module covers the part a
  * Spark user actually touches: packaging a `spark-submit` invocation
  * as an EMR step and driving it through an injected client, the same
  * seam pattern as Sts/Logs.
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
}
