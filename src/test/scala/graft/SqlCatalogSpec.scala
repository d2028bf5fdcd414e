package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.{JdbcManifestStore, LakeCatalog}

/** SQL-database catalog backend (the reference's demo-5 portability
  * story): the same LakeCatalog semantics with manifests as rows in an
  * embedded Derby database — transactions, time travel, the one-read
  * snapshot feed, conditional-put commit races, and lossless migration
  * between file-backed and SQL-backed catalogs. */
class SqlCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def dsnLake(): LakeCatalog = {
    val dir = tmpDir("sql_lake")
    new LakeCatalog(spark, dir, Some(s"jdbc:derby:$dir/catalog_db;create=true"))
  }

  test("core semantics hold on a SQL-database catalog") {
    val cat = dsnLake()
    cat.createTable("t", StructType(Seq(
      StructField("id", IntegerType), StructField("v", StringType))),
      primaryKey = Seq("id"))
    cat.insert("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    cat.update("t", col("id") === 2, Map("v" -> lit("b2")))
    cat.delete("t", col("id") === 3)
    assert(cat.currentVersion === 4)
    // current state + time travel resolve from database rows
    assert(cat.read("t").orderBy("id").as[(Int, String)].collect()
      === Array((1, "a"), (2, "b2")))
    assert(cat.readAt("t", 2).count() === 3)
    // snapshot feed + change summaries ride the header history
    assert(cat.snapshots().count() === 4)
    // metadata access is SQL-query-shaped: a fresh catalog over the same
    // DSN sees everything (state lives in the database, not the process)
    val dsn = s"jdbc:derby:${cat.root}/catalog_db"
    val cat2 = new LakeCatalog(spark, cat.root, Some(dsn))
    assert(cat2.read("t").count() === 2)
    assert(cat2.snapshots().count() === 4)
  }

  test("version claim is a conditional put: racing inserts serialize") {
    val cat = dsnLake()
    cat.createTable("t", StructType(Seq(StructField("id", IntegerType))))
    val dsn = s"jdbc:derby:${cat.root}/catalog_db"
    val store = new JdbcManifestStore(dsn)
    val base = cat.current
    val v = cat.currentVersion + 1
    val r1 = store.publish(v, base.copy(snapshotId = v), base)
    val r2 = store.publish(v, base.copy(snapshotId = v), base)
    assert(r1.isDefined && r2.isEmpty, "duplicate-key insert must lose")
    // and through the optimistic retry loop, concurrent writers all land
    val catB = new LakeCatalog(spark, cat.root, Some(dsn))
    val t1 = new Thread(() => cat.insert("t", Seq(1).toDF("id")))
    val t2 = new Thread(() => catB.insert("t", Seq(2).toDF("id")))
    t1.start(); t2.start(); t1.join(); t2.join()
    val fresh = new LakeCatalog(spark, cat.root, Some(dsn))
    assert(fresh.read("t").as[Int].collect().sorted === Array(1, 2))
  }

  test("vacuum works on the SQL backend: expired versions and blobs removed") {
    val cat = dsnLake()
    cat.createTable("t", StructType(Seq(StructField("id", IntegerType))))
    (1 to 5).foreach(i => cat.insert("t", Seq(i).toDF("id")))
    cat.delete("t", col("id") <= 2)
    val cur = cat.currentVersion
    assert(cat.readAt("t", 3).count() === 2)
    cat.vacuum(keepLast = 2)
    // expired version unreadable from a fresh catalog (no cache assist)
    val dsn = s"jdbc:derby:${cat.root}/catalog_db"
    val fresh = new LakeCatalog(spark, cat.root, Some(dsn))
    intercept[Exception] { fresh.readAt("t", 3).count() }
    assert(fresh.readAt("t", cur - 1).count() === 5)
    assert(fresh.read("t").orderBy("id").as[Int].collect() === Array(3, 4, 5))
  }

  test("tags persist as database rows and pin vacuum on the SQL backend") {
    val cat = dsnLake()
    cat.createTable("t", StructType(Seq(StructField("id", IntegerType))))
    (1 to 4).foreach(i => cat.insert("t", Seq(i).toDF("id")))   // v2..v5
    cat.tag("baseline", 3)                                      // v6
    cat.insert("t", Seq(5).toDF("id"))                          // v7
    cat.vacuum(keepLast = 2)
    // a FRESH catalog over the DSN resolves the tag from database rows
    val dsn = s"jdbc:derby:${cat.root}/catalog_db"
    val fresh = new LakeCatalog(spark, cat.root, Some(dsn))
    assert(fresh.resolveRef("baseline") === 3)
    assert(fresh.readTag("t", "baseline").as[Int].collect().sorted
      === Array(1, 2))
    intercept[Exception] { fresh.readAt("t", 2).count() }
    // snapshot feed shows the retention hole truthfully (v8 is the
    // vacuum's own expiry commit)
    assert(fresh.snapshots().select("snapshot_id").as[Long].collect().sorted
      === Array(3L, 6L, 7L, 8L))
  }

  test("catalog migrates losslessly between file and SQL backends") {
    val fileCat = new LakeCatalog(spark, tmpDir("file_lake"))
    fileCat.createTable("m", StructType(Seq(
      StructField("id", IntegerType), StructField("x", DoubleType))),
      primaryKey = Seq("id"))
    fileCat.insert("m", Seq((1, 1.5), (2, 2.5)).toDF("id", "x"))
    fileCat.createView("vw", "SELECT count(*) AS n FROM m")
    // file -> SQL
    val sqlCat = dsnLake()
    fileCat.migrateTo(sqlCat)
    assert(sqlCat.read("m").count() === 2)
    assert(sqlCat.current.tables("m").primaryKey === Seq("id"))
    assert(sqlCat.readView("vw").as[Long].head() === 2L)
    // SQL -> file (round trip)
    val back = new LakeCatalog(spark, tmpDir("file_lake_back"))
    sqlCat.migrateTo(back)
    assert(back.read("m").orderBy("id").as[(Int, Double)].collect()
      === Array((1, 1.5), (2, 2.5)))
  }

  test("SQL dialect seam: DSN selection, exists/duplicate signals, DDL shapes") {
    import graft.lake.SqlDialect
    import java.sql.SQLException
    // selection by JDBC subprotocol
    assert(SqlDialect.fromDsn("jdbc:derby:memory:x;create=true")
      === SqlDialect.Derby)
    assert(SqlDialect.fromDsn("jdbc:postgresql://h/db") === SqlDialect.Postgres)
    assert(SqlDialect.fromDsn("jdbc:mysql://h/db") === SqlDialect.MySql)
    assert(SqlDialect.fromDsn("jdbc:mariadb://h/db") === SqlDialect.MySql)
    // duplicate-key loser detection: the full 23xxx integrity class,
    // so Derby/Postgres (23505) and MySQL (23000/1062) all serialize
    // the conditional put; a non-integrity state never masks a failure
    assert(SqlDialect.duplicateKey(new SQLException("dup", "23505")))
    assert(SqlDialect.duplicateKey(new SQLException("dup", "23000", 1062)))
    assert(!SqlDialect.duplicateKey(new SQLException("io", "08006")))
    assert(!SqlDialect.duplicateKey(new SQLException("nostate", null: String)))
    // table-exists signals per engine (schema-init rerun/race)
    assert(SqlDialect.Derby.tableExists(new SQLException("e", "X0Y32")))
    assert(SqlDialect.Postgres.tableExists(new SQLException("e", "42P07")))
    assert(SqlDialect.MySql.tableExists(new SQLException("e", "42S01", 1050)))
    assert(!SqlDialect.Derby.tableExists(new SQLException("e", "42P07")))
    // DDL shapes: engines with IF NOT EXISTS use it; text types per
    // engine (Derby CLOB / Postgres TEXT / MySQL LONGTEXT)
    assert(SqlDialect.Derby.createTable === "CREATE TABLE")
    assert(SqlDialect.Postgres.createTable.contains("IF NOT EXISTS"))
    assert(SqlDialect.MySql.createTable.contains("IF NOT EXISTS"))
    assert(Set("CLOB", "TEXT", "LONGTEXT").contains(SqlDialect.Derby.textType)
      && SqlDialect.Postgres.textType === "TEXT"
      && SqlDialect.MySql.textType === "LONGTEXT")
  }
}
