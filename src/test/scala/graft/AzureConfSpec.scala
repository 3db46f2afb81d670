package graft

import org.apache.spark.sql.types._

import graft.scd2.SyncDestination
import graft.store.AzureConf

/** AzureConf: storage-option → hadoop-azure key conversion (reference
  * destination/azure.py + azure_utils.py convert_options), and the
  * dual-dialect schema.json snapshot (reference db_to_delta.py:187-200).
  * Pure configuration tests — no live Azure. */
class AzureConfSpec extends SparkSuite {

  private def hconf = spark.sparkContext.hadoopConfiguration

  test("account_key options configure SharedKey auth for the account") {
    AzureConf(spark, Map("account_name" -> "acctkeyed", "account_key" -> "k123=="))
    assert(hconf.get("fs.azure.account.auth.type.acctkeyed.dfs.core.windows.net") == "SharedKey")
    assert(hconf.get("fs.azure.account.key.acctkeyed.dfs.core.windows.net") == "k123==")
  }

  test("sas_token options configure a fixed SAS provider (leading ? stripped)") {
    AzureConf(spark, Map("account_name" -> "acctsas", "sas_token" -> "?sv=2024&sig=abc"))
    val h = "acctsas.dfs.core.windows.net"
    assert(hconf.get(s"fs.azure.account.auth.type.$h") == "SAS")
    assert(hconf.get(s"fs.azure.sas.token.provider.type.$h")
      == "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider")
    assert(hconf.get(s"fs.azure.sas.fixed.token.$h") == "sv=2024&sig=abc")
  }

  test("client credentials configure OAuth with the tenant token endpoint") {
    AzureConf(spark, Map("account_name" -> "acctoauth",
      "client_id" -> "cid", "client_secret" -> "cs", "tenant_id" -> "tid"))
    val h = "acctoauth.dfs.core.windows.net"
    assert(hconf.get(s"fs.azure.account.auth.type.$h") == "OAuth")
    assert(hconf.get(s"fs.azure.account.oauth2.client.id.$h") == "cid")
    assert(hconf.get(s"fs.azure.account.oauth2.client.endpoint.$h")
      == "https://login.microsoftonline.com/tid/oauth2/token")
  }

  test("connection_string parses and use_emulator targets the Azurite account") {
    val parsed = AzureConf.parseConnectionString(
      "DefaultEndpointsProtocol=https;AccountName=csacct;AccountKey=ck==;EndpointSuffix=core.windows.net")
    assert(parsed("account_name") == "csacct" && parsed("account_key") == "ck==")
    val acct = AzureConf(spark, Map("use_emulator" -> "1"))
    assert(acct == AzureConf.EmulatorAccount)
    assert(hconf.get(s"fs.azure.account.key.devstoreaccount1.dfs.core.windows.net")
      == AzureConf.EmulatorKey)
  }

  test("missing credentials and missing account fail loudly") {
    intercept[IllegalArgumentException](AzureConf(spark, Map("account_name" -> "a")))
    intercept[IllegalArgumentException](AzureConf(spark, Map("account_key" -> "k")))
    intercept[IllegalArgumentException](AzureConf(spark,
      Map("account_name" -> "a", "client_id" -> "x", "client_secret" -> "y")))
  }

  test("abfssPath renders container@account.suffix") {
    assert(AzureConf.abfssPath("raw", "lake", "/tables/t1")
      == "abfss://raw@lake.dfs.core.windows.net/tables/t1")
  }

  test("schema.json carries both source and target dialect types") {
    val root = tmpDir("schemajson")
    val dest = new SyncDestination(spark, root)
    val cols = Seq(
      ColInfo("Order ID", LongType, nullable = false, isIdentity = true,
        sourceType = Some("bigint identity")),
      ColInfo("rv", LongType, sourceType = Some("rowversion")),
      ColInfo("note", StringType)) // catalog-less: src falls back to Spark DDL
    dest.writeSchemaJson(cols, WriteConfig())
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(new java.io.File(s"$root/meta/schema.json"))
    val byName = node.get("columns").elements()
    val m = Iterator.continually(byName).takeWhile(_.hasNext).map(_.next())
      .map(c => c.get("column_name").asText() -> c).toMap
    assert(m("Order ID").get("data_type").asText() == "BIGINT")
    assert(m("Order ID").get("data_type_src").asText() == "bigint identity")
    assert(m("Order ID").get("is_identity").asBoolean())
    assert(m("Order ID").get("target_name").asText() == "Order_ID") // compatName
    assert(m("rv").get("data_type_src").asText() == "rowversion")
    assert(m("note").get("data_type_src").asText() == "STRING")
    // programmatic consumers keep a full Spark schema
    val st = DataType.fromJson(node.get("spark_schema").toString).asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("Order_ID", "rv", "note"))
  }
}
