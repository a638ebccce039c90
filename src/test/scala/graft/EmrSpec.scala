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
