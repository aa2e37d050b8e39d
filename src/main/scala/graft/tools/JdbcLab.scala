package graft.tools

import java.sql.DriverManager
import org.apache.spark.sql.SparkSession

/** Dev lab: feasibility spike for the p18 JDBC gate.
  *
  * Leg A — embedded Derby: Spark JDBC write (DerbyDialect), raw sqlStmt,
  * plain + partitioned JDBC read-back.
  * Leg B — in-process HiveServer2 (spark-hive-thriftserver jar) as a
  * loopback full-SQL JDBC endpoint: can the ranked-dedup query
  * (ROW_NUMBER OVER (PARTITION BY ...)) run remotely over hive-jdbc and
  * be read by spark.read.jdbc?
  */
object JdbcLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._

    // ---- Leg A: Derby
    val dbDir = java.nio.file.Files.createTempDirectory("jdbclab").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val df = Seq((1L, "a", 10L), (1L, "a", 5L), (2L, "b", 3L)).toDF("user_id", "event_type", "event_id")
    df.write.mode("append").jdbc(url, "events", new java.util.Properties())
    println("derby write OK")
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("DELETE FROM events WHERE \"event_id\" = 3")
    st.close(); c.close()
    println("derby sqlStmt OK")
    val back = spark.read.option("fetchsize", "1000").jdbc(url, "events", new java.util.Properties())
    println("derby plain read: " + back.count())
    val part = spark.read
      .option("partitionColumn", "event_id").option("numPartitions", "2")
      .option("lowerBound", "0").option("upperBound", "10")
      .jdbc(url, "events", new java.util.Properties())
    println("derby partitioned read: " + part.rdd.getNumPartitions + " parts, " + part.count() + " rows")

    // ---- Leg B: Hive thrift loopback
    val port = 10123
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "127.0.0.1")
    val cls = Class.forName("org.apache.spark.sql.hive.thriftserver.HiveThriftServer2")
    val m = cls.getMethod("startWithContext", Class.forName("org.apache.spark.sql.SQLContext"))
    m.invoke(null, spark.sqlContext)
    println("thrift started")
    Thread.sleep(3000)
    df.createOrReplaceGlobalTempView("events_v")
    val hurl = s"jdbc:hive2://127.0.0.1:$port/default"
    val hc = DriverManager.getConnection(hurl, "anonymous", "")
    val hst = hc.createStatement()
    val rs = hst.executeQuery("SELECT * FROM (SELECT user_id, event_type, event_id, ROW_NUMBER() OVER (PARTITION BY `user_id`, `event_type` ORDER BY `event_id` DESC) AS rnk FROM global_temp.events_v) t WHERE rnk = 1")
    while (rs.next()) println(s"hive ranked: ${rs.getLong(1)} ${rs.getString(2)} ${rs.getLong(3)}")
    hst.close(); hc.close()
    // spark.read.jdbc over hive2 needs a backtick-quoting dialect
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(
      new org.apache.spark.sql.jdbc.JdbcDialect {
        override def canHandle(u: String): Boolean = u.startsWith("jdbc:hive2")
        override def quoteIdentifier(colName: String): String =
          s"`${colName.replace("`", "``")}`"
      })
    try {
      val hdf = spark.read.option("fetchsize", "1000")
        .jdbc(hurl, "(SELECT user_id, event_id FROM global_temp.events_v) q", new java.util.Properties())
      hdf.show()
      println("spark read over hive2 OK: " + hdf.count())
    } catch { case e: Exception => println("spark read over hive2 FAIL: " + e) }
    spark.stop()
    System.exit(0)
  }
}
