package graft.connections

import org.apache.spark.sql.SparkSession
import graft.model.ConnectionDef

/** Per-connection scoped cloud credentials.
  *
  * The reference injects a bucket-scoped secret before EVERY tap/sink/sql
  * (`inject_secrets`, ankaflow/internal/server.py:132-169, called from
  * ankaflow/core/flow.py:215,291,321), with the connection's own `config:`
  * block falling back to the flow's `default_connection` field by field
  * (ankaflow/core/flow.py:97-98, server.py `x or default` chains).
  *
  * Spark's public equivalent of DuckDB's `CREATE SECRET … SCOPE 'bucket'`
  * is Hadoop S3A per-bucket configuration: `fs.s3a.bucket.<name>.access.key`
  * (etc.) overrides the global `fs.s3a.*` setting only for paths inside
  * that bucket, so two stages reading different buckets with different
  * credentials coexist in one session — no flow-global mutation, no
  * ordering hazard. GCS HMAC credentials ride the same mechanism through
  * the GCS XML interop endpoint (storage.googleapis.com speaks the S3
  * protocol with HMAC keys). Any other Hadoop filesystem setting passes
  * through a raw `hadoop:` map (per-bucket keys allowed), covering
  * connectors this container can't exercise.
  *
  * YAML shape (same as the reference's ConnectionConfiguration,
  * ankaflow/models/configs.py:150-203):
  * {{{
  * connection:
  *   kind: Parquet
  *   locator: s3a://bucket-a/data.parquet
  *   config:
  *     s3: {bucket: bucket-a, access_key_id: AK…, secret_access_key: …,
  *          region: us-east-1, session_token: …, endpoint: …}
  *     gs: {bucket: bucket-b, hmac_key: …, hmac_secret: …}
  *     hadoop: {fs.azure.account.key.acct.blob.core.windows.net: …}
  * }}}
  */
object CloudSecrets {

  /** Apply the connection's scoped credentials to the session's Hadoop
    * configuration. Field-level fallback to `cfg.defaultConnection`. */
  def inject(spark: SparkSession, conn: ConnectionDef, cfg: FlowConfig): Unit = {
    val own = conn.map("config")
    val defaults = cfg.defaultConnection
    if (own.isEmpty && defaults.isEmpty) return
    val hc = spark.sparkContext.hadoopConfiguration

    def section(root: Map[String, Any], key: String): Map[String, String] =
      root.get(key) match {
        case Some(m: Map[_, _]) => m.collect {
          case (k, v) if v != null => k.toString -> v.toString
        }
        case _ => Map.empty
      }
    // field-level fallback, like the reference's `own.x or default.x`
    def merged(key: String): Map[String, String] =
      section(defaults, key) ++ section(own, key)

    val s3 = merged("s3")
    if (s3.contains("access_key_id")) {
      // scoped when a bucket is named, session-global otherwise (the
      // reference's _init_secrets/global path has no SCOPE either)
      val prefix = s3.get("bucket")
        .map(b => s"fs.s3a.bucket.$b.").getOrElse("fs.s3a.")
      s3.get("access_key_id").foreach(v => hc.set(prefix + "access.key", v))
      s3.get("secret_access_key").foreach(v => hc.set(prefix + "secret.key", v))
      s3.get("session_token").foreach(v => hc.set(prefix + "session.token", v))
      s3.get("region").foreach(v => hc.set(prefix + "endpoint.region", v))
      s3.get("endpoint").foreach(v => hc.set(prefix + "endpoint", v))
    }

    val gs = merged("gs")
    if (gs.contains("hmac_key")) {
      // HMAC keys → S3-compatible XML API, and a bucket scope is
      // REQUIRED. Unscoped gs would write the global fs.s3a.* endpoint
      // and credentials, which poisons every other s3a access in the
      // session: per-bucket s3 configs inherit any key they don't
      // explicitly set from the global level (a scoped AWS config
      // without an explicit endpoint would suddenly talk to GCS), and a
      // later stage's connection can't see this one's config to detect
      // the collision. DuckDB's native typed GCS secret has no such
      // interference, so the reference can allow it; the s3a-interop
      // mapping cannot.
      val bucket = gs.getOrElse("bucket", sys.error(
        "gs HMAC credentials need a 'bucket' scope: unscoped they would " +
          "redirect the session-global fs.s3a.* endpoint/credentials " +
          "that every other S3A access inherits from"))
      val prefix = s"fs.s3a.bucket.$bucket."
      gs.get("hmac_key").foreach(v => hc.set(prefix + "access.key", v))
      gs.get("hmac_secret").foreach(v => hc.set(prefix + "secret.key", v))
      hc.set(prefix + "endpoint", "https://storage.googleapis.com")
      hc.set(prefix + "path.style.access", "true")
    }

    merged("hadoop").foreach { case (k, v) => hc.set(k, v) }
  }
}
