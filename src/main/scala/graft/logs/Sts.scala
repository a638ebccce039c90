package graft.logs

/** Caller-identity helpers (reference awswrangler/sts.py:13-80).
  * Pure client delegation — the trait is what an AWS-SDK-backed
  * implementation plugs into; nothing here touches Spark.
  */
object Sts {

  /** boto3 sts.get_caller_identity surface. */
  trait StsClient {
    def callerAccount: String
    def callerArn: String
  }

  /** reference: sts.get_account_id */
  def getAccountId(client: StsClient): String = client.callerAccount

  /** reference: sts.get_current_identity_arn */
  def getCurrentIdentityArn(client: StsClient): String = client.callerArn

  /** reference: sts.get_current_identity_name — the final segment of
    * the ARN (`arn:aws:iam::123:user/NAME` → `NAME`).
    */
  def getCurrentIdentityName(client: StsClient): String = {
    val arn = client.callerArn
    arn.substring(arn.lastIndexOf('/') + 1)
  }
}
