package graft.store

import org.apache.spark.sql.SparkSession

/** Azure ADLS Gen2 (ABFS) credential plumbing — the Spark-native analogue
  * of the reference's AzureDestination credential chain
  * (destination/azure.py:8-79, azure_utils.py convert_options): the
  * reference converts a `storage_options` dict into fsspec/object_store
  * credentials; here the same option vocabulary is converted into the
  * public `hadoop-azure` (ABFS) configuration keys on the session's Hadoop
  * configuration, after which every `abfss://` path — destination roots,
  * VersionedTable storage, log sinks — just works through the [[Fs]] seam.
  *
  * Supported option keys (reference vocabulary):
  *  - `account_name` — required for conf targeting (per-account keys)
  *  - `account_key` — shared-key auth
  *  - `sas_token` — fixed SAS auth
  *  - `client_id` / `client_secret` / `tenant_id` — OAuth 2.0 client
  *    credentials (the service-principal subset of DefaultAzureCredential;
  *    interactive flows are meaningless on a cluster)
  *  - `connection_string` — parsed for AccountName/AccountKey/BlobEndpoint
  *  - `use_emulator` — targets Azurite's well-known dev account/key
  *
  * No live Azure is touched here: this only SETS configuration; the
  * hadoop-azure driver authenticates lazily on first filesystem access.
  */
object AzureConf {
  /** Azurite/dev-storage well-known account + key (public constants). */
  val EmulatorAccount = "devstoreaccount1"
  val EmulatorKey: String =
    "Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4I6tq/K1SZFPTOtr/KBHBeksoGMGw=="

  val DefaultSuffix = "dfs.core.windows.net"

  /** abfss:// path for (container, account, path-in-container). */
  def abfssPath(container: String, account: String, path: String,
      suffix: String = DefaultSuffix): String = {
    val rel = path.stripPrefix("/")
    s"abfss://$container@$account.$suffix/$rel"
  }

  /** Parse an Azure storage connection string into option-map form. */
  def parseConnectionString(cs: String): Map[String, String] = {
    val kv = cs.split(';').filter(_.contains("=")).map { part =>
      val i = part.indexOf('=')
      part.substring(0, i) -> part.substring(i + 1)
    }.toMap
    Seq(
      kv.get("AccountName").map("account_name" -> _),
      kv.get("AccountKey").map("account_key" -> _),
      kv.get("BlobEndpoint").map("blob_endpoint" -> _)
    ).flatten.toMap
  }

  /** Apply `options` as ABFS auth configuration for `account_name` on the
    * session's Hadoop configuration. Returns the resolved account name.
    * Precedence mirrors the reference's convert_options: explicit key >
    * SAS > client credentials; `use_emulator` overrides with the Azurite
    * dev account. */
  def apply(spark: SparkSession, options: Map[String, String],
      suffix: String = DefaultSuffix): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val opts =
      options.get("connection_string").map(cs => parseConnectionString(cs) ++ options)
        .getOrElse(options)
    val emulator = opts.get("use_emulator").exists(v => v == "1" || v.toLowerCase == "true")
    val account =
      if (emulator) EmulatorAccount
      else opts.getOrElse("account_name",
        throw new IllegalArgumentException("azure options need account_name (or use_emulator)"))
    val host = s"$account.$suffix"

    if (emulator) {
      conf.set(s"fs.azure.account.auth.type.$host", "SharedKey")
      conf.set(s"fs.azure.account.key.$host", opts.getOrElse("account_key", EmulatorKey))
    } else if (opts.contains("account_key")) {
      conf.set(s"fs.azure.account.auth.type.$host", "SharedKey")
      conf.set(s"fs.azure.account.key.$host", opts("account_key"))
    } else if (opts.contains("sas_token")) {
      conf.set(s"fs.azure.account.auth.type.$host", "SAS")
      conf.set(s"fs.azure.sas.token.provider.type.$host",
        "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider")
      conf.set(s"fs.azure.sas.fixed.token.$host", opts("sas_token").stripPrefix("?"))
    } else if (opts.contains("client_id") && opts.contains("client_secret")) {
      val tenant = opts.getOrElse("tenant_id",
        throw new IllegalArgumentException("client-credential auth needs tenant_id"))
      conf.set(s"fs.azure.account.auth.type.$host", "OAuth")
      conf.set(s"fs.azure.account.oauth.provider.type.$host",
        "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider")
      conf.set(s"fs.azure.account.oauth2.client.id.$host", opts("client_id"))
      conf.set(s"fs.azure.account.oauth2.client.secret.$host", opts("client_secret"))
      conf.set(s"fs.azure.account.oauth2.client.endpoint.$host",
        s"https://login.microsoftonline.com/$tenant/oauth2/token")
    } else throw new IllegalArgumentException(
      "azure options need one of: account_key, sas_token, client_id+client_secret, " +
        "connection_string, use_emulator")
    account
  }
}
