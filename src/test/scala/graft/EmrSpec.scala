package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.emr.Emr
import graft.exceptions.InvalidArgumentValue
import graft.sources.FsOps

/** Injected-client tests for the EMR step builders and the bucket
  * region lookup — no Spark session needed.
  */
class EmrSpec extends AnyFunSuite {

  private class FakeEmr extends Emr.EmrClient {
    var submitted: Seq[(String, Emr.Step)] = Nil
    def addJobFlowSteps(clusterId: String,
                        steps: Seq[Emr.Step]): Seq[String] = {
      submitted ++= steps.map(clusterId -> _)
      steps.zipWithIndex.map { case (_, i) => s"s-${submitted.size + i}" }
    }
    def stepState(clusterId: String, stepId: String): String = "COMPLETED"
  }

  test("buildStep picks command-runner vs regional script-runner") {
    val cmd = Emr.buildStep("""echo hello""")
    assert(cmd.jar == "command-runner.jar")
    assert(cmd.args == Seq("echo", "hello"))
    val script = Emr.buildStep("s3://b/run.sh arg1", script = true,
      region = "eu-west-1")
    assert(script.jar ==
      "s3://eu-west-1.elasticmapreduce/libs/script-runner/script-runner.jar")
    intercept[InvalidArgumentValue] {
      Emr.buildStep("ls", actionOnFailure = "EXPLODE")
    }
  }

  test("buildSparkStep assembles spark-submit, with docker confs when asked") {
    val plain = Emr.buildSparkStep("s3://b/app.py", deployMode = "client")
    assert(plain.args ==
      Seq("spark-submit", "--deploy-mode", "client", "s3://b/app.py"))
    val docker = Emr.buildSparkStep("s3://b/app.py",
      dockerImage = Some("123.dkr.ecr.us-east-1.amazonaws.com/img:tag"))
    assert(docker.args.head == "spark-submit")
    assert(docker.args.last == "s3://b/app.py")
    // 4 docker env confs on both the executor and AM sides
    assert(docker.args.count(_ == "--conf") == 8)
    assert(docker.args.exists(_.contains(
      "spark.executorEnv.YARN_CONTAINER_RUNTIME_DOCKER_IMAGE=123.dkr")))
    assert(docker.args.exists(_.startsWith("spark.yarn.appMasterEnv.")))
    intercept[InvalidArgumentValue] {
      Emr.buildSparkStep("s3://b/app.py", deployMode = "edge")
    }
  }

  test("submitSparkStep routes one step through the client") {
    val client = new FakeEmr
    val id = Emr.submitSparkStep(client, "j-123", "s3://b/app.py")
    assert(id.startsWith("s-"))
    assert(client.submitted.map(_._1) == Seq("j-123"))
    assert(client.submitted.head._2.args.contains("s3://b/app.py"))
    assert(Emr.getStepState(client, "j-123", id) == "COMPLETED")
  }

  private class FakeCluster extends Emr.ClusterClient {
    var ran: Seq[Map[String, Any]] = Nil
    var terminated: Seq[String] = Nil
    def runJobFlow(args: Map[String, Any]): String = {
      ran :+= args; s"j-${ran.size}"
    }
    def clusterState(clusterId: String): String = "WAITING"
    def terminateJobFlows(ids: Seq[String]): Unit = terminated ++= ids
  }

  // navigate the untyped RunJobFlow arg tree in assertions
  private def sub(m: Any, key: String): Any =
    m.asInstanceOf[Map[String, Any]](key)
  private def seqOf(m: Any, key: String): Seq[Map[String, Any]] =
    sub(m, key).asInstanceOf[Seq[Map[String, Any]]]

  test("buildClusterArgs assembles fleets, configurations, and defaults") {
    val cfg = Emr.ClusterConfig(subnetId = "subnet-1",
      core = Emr.FleetConfig(numSpot = 4, numOnDemand = 1),
      applications = Seq("Hadoop", "Spark"),
      sparkPyarrow = true,
      tags = Map("team" -> "data"))
    val args = Emr.buildClusterArgs(cfg, accountId = "111122223333")

    assert(sub(args, "LogUri") ==
      "s3://aws-logs-111122223333-us-east-1/elasticmapreduce/")
    assert(sub(args, "ReleaseLabel") == "emr-6.0.0")
    val inst = sub(args, "Instances")
    assert(sub(inst, "Ec2SubnetId") == "subnet-1")
    val fleets = seqOf(inst, "InstanceFleets")
    // task fleet has zero capacity → only MASTER + CORE materialize
    assert(fleets.map(_("Name")) == Seq("MASTER", "CORE"))
    val core = fleets.find(_("Name") == "CORE").get
    assert(core("TargetSpotCapacity") == 4)
    // spot capacity present → launch spec with the on-demand fallback
    val spot = sub(sub(core, "LaunchSpecifications"), "SpotSpecification")
    assert(sub(spot, "TimeoutAction") == "SWITCH_TO_ON_DEMAND")
    // master is all on-demand → no launch spec at all
    assert(!fleets.head.contains("LaunchSpecifications"))

    val classifications =
      seqOf(args, "Configurations").map(_("Classification"))
    // pyarrow flips on spark-defaults + the three env exports
    assert(classifications.contains("spark-defaults"))
    assert(Seq("spark-env", "yarn-env", "livy-env")
      .forall(classifications.contains))
    // glue catalog trio defaults on
    assert(Seq("spark-hive-site", "hive-site", "presto-connector-hive")
      .forall(classifications.contains))
    assert(seqOf(args, "Applications").map(_("Name")) ==
      Seq("Hadoop", "Spark"))
    assert(seqOf(args, "Tags").head ==
      Map("Key" -> "team", "Value" -> "data"))
    // debugging defaults on → the state-pusher step is queued
    val steps = sub(args, "Steps").asInstanceOf[Seq[Emr.Step]]
    assert(steps.map(_.name) == Seq("Setup Hadoop Debugging"))
  }

  test("buildClusterArgs docker registries honor extraPublicRegistries") {
    val cfg = Emr.ClusterConfig(subnetId = "s", docker = true,
      extraPublicRegistries = Seq("quay.io"), region = "eu-west-1",
      debugging = false)
    val args = Emr.buildClusterArgs(cfg, "999")
    val ce = seqOf(args, "Configurations")
      .find(_("Classification") == "container-executor").get
    val dockerProps = sub(seqOf(ce, "Configurations").head, "Properties")
    assert(sub(dockerProps, "docker.trusted.registries") ==
      "local,centos,999.dkr.ecr.eu-west-1.amazonaws.com,quay.io")
    assert(!args.contains("Steps")) // debugging off, no steps
    intercept[InvalidArgumentValue] {
      Emr.buildClusterArgs(Emr.ClusterConfig(subnetId = "s",
        master = Emr.FleetConfig(numOnDemand = 0)), "999")
    }
  }

  test("cluster lifecycle routes through the injected client") {
    val client = new FakeCluster
    val id = Emr.createCluster(client,
      Emr.ClusterConfig(subnetId = "subnet-9"), "123456789012")
    assert(id == "j-1")
    assert(Emr.getClusterState(client, id) == "WAITING")
    Emr.terminateCluster(client, id)
    assert(client.terminated == Seq("j-1"))
  }

  test("submitEcrCredentialsRefresh stages the script then submits the step") {
    val client = new FakeEmr
    var staged: Seq[(String, String)] = Nil
    val stepId = Emr.submitEcrCredentialsRefresh(client, "j-7",
      "s3://bucket/emr/", (p, body) => staged :+= (p -> body),
      region = "us-west-2")
    assert(staged.map(_._1) ==
      Seq("s3://bucket/emr/ecr_credentials_refresh.py"))
    assert(staged.head._2.contains("aws ecr get-login --region us-west-2"))
    assert(stepId.startsWith("s-"))
    val step = client.submitted.head._2
    assert(step.name == "ECR Credentials Refresh")
    assert(step.args.take(3) ==
      Seq("spark-submit", "--deploy-mode", "cluster"))
  }

  test("getBucketRegion maps null LocationConstraint to us-east-1") {
    val client = new FsOps.BucketClient {
      def bucketLocation(bucket: String): String =
        if (bucket == "legacy") null else "eu-central-1"
    }
    assert(FsOps.getBucketRegion(client, "legacy") == "us-east-1")
    assert(FsOps.getBucketRegion(client, "b") == "eu-central-1")
    intercept[InvalidArgumentValue] {
      FsOps.getBucketRegion(client, "")
    }
  }
}
