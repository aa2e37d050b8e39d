package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.connections.FlowConfig
import graft.core.Flow

/** Per-connection scoped cloud credentials (reference inject_secrets,
  * server.py:132-169): bucket-scoped S3A keys, GCS HMAC via the interop
  * endpoint, field-level fallback to the flow default, raw hadoop
  * passthrough. Exercised through real flows over local parquet — the
  * credentials land in hadoopConfiguration (where S3A would read them)
  * without disturbing local reads. */
class CloudSecretsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"
  private def hc = spark.sparkContext.hadoopConfiguration

  test("two taps with different buckets get independent scoped keys") {
    val yaml =
      s"""
         |- name: A
         |  kind: tap
         |  connection:
         |    kind: Parquet
         |    locator: $sf/region.parquet
         |    config:
         |      s3: {bucket: bkt-a, access_key_id: AKA, secret_access_key: SA,
         |           region: eu-west-1}
         |- name: B
         |  kind: tap
         |  connection:
         |    kind: Parquet
         |    locator: $sf/nation.parquet
         |    config:
         |      s3: {bucket: bkt-b, access_key_id: AKB, secret_access_key: SB}
         |- name: Joined
         |  kind: transform
         |  query: >
         |    SELECT r_name, COUNT(*) AS n FROM A JOIN B ON r_regionkey = n_regionkey
         |    GROUP BY r_name ORDER BY r_name
         |""".stripMargin
    val flow = Flow.runYaml(spark, yaml)
    assert(flow.df().count() == 5)
    // both scopes coexist: neither overwrote the other
    assert(hc.get("fs.s3a.bucket.bkt-a.access.key") == "AKA")
    assert(hc.get("fs.s3a.bucket.bkt-a.secret.key") == "SA")
    assert(hc.get("fs.s3a.bucket.bkt-a.endpoint.region") == "eu-west-1")
    assert(hc.get("fs.s3a.bucket.bkt-b.access.key") == "AKB")
    assert(hc.get("fs.s3a.bucket.bkt-b.secret.key") == "SB")
    // nothing leaked into the global (unscoped) S3A settings
    assert(hc.get("fs.s3a.access.key") == null)
  }

  test("connection config falls back to the flow default per field") {
    val yaml =
      s"""
         |- name: T
         |  kind: tap
         |  connection:
         |    kind: Parquet
         |    locator: $sf/region.parquet
         |    config:
         |      s3: {bucket: bkt-own, access_key_id: OWN_KEY}
         |""".stripMargin
    Flow.runYaml(spark, yaml, config = FlowConfig(defaultConnection = Map(
      "s3" -> Map("access_key_id" -> "DEF_KEY",
        "secret_access_key" -> "DEF_SECRET"))))
    // own key wins, missing secret comes from the default block
    assert(hc.get("fs.s3a.bucket.bkt-own.access.key") == "OWN_KEY")
    assert(hc.get("fs.s3a.bucket.bkt-own.secret.key") == "DEF_SECRET")
  }

  test("gs hmac without a bucket scope is rejected (would poison global s3a)") {
    // scoped s3 configs inherit unset keys (endpoint!) from the global
    // level, so an unscoped gs interop mapping is never safe
    val ex = intercept[Exception](Flow.runYaml(spark,
      s"""
         |- name: T
         |  kind: tap
         |  connection:
         |    kind: Parquet
         |    locator: $sf/region.parquet
         |    config:
         |      gs: {hmac_key: GK, hmac_secret: GS}
         |""".stripMargin))
    assert(ex.getMessage.contains("bucket"))
    assert(hc.get("fs.s3a.endpoint") == null) // nothing leaked globally
  }

  test("gs hmac creds ride the S3 interop endpoint; hadoop map passes through") {
    val yaml =
      s"""
         |- name: T
         |  kind: tap
         |  connection:
         |    kind: Parquet
         |    locator: $sf/region.parquet
         |    config:
         |      gs: {bucket: gbkt, hmac_key: GK, hmac_secret: GS}
         |      hadoop: {fs.azure.account.key.acct.blob.core.windows.net: AZKEY}
         |""".stripMargin
    Flow.runYaml(spark, yaml)
    assert(hc.get("fs.s3a.bucket.gbkt.access.key") == "GK")
    assert(hc.get("fs.s3a.bucket.gbkt.secret.key") == "GS")
    assert(hc.get("fs.s3a.bucket.gbkt.endpoint") == "https://storage.googleapis.com")
    assert(hc.get("fs.azure.account.key.acct.blob.core.windows.net") == "AZKEY")
  }
}
