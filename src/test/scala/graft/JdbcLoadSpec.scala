package graft

import graft.pipeline.Load
import org.apache.spark.sql.functions._

/** S7: the JDBC append sink, exercised end-to-end against embedded Derby
  * (the JDBC engine Spark already ships for its Hive metastore — no
  * external server needed). Covers the reference's load semantics
  * (`load_sqlserver.py:70-98`): batched appended inserts, NaN → SQL
  * NULL, string edges trimmed, and append idempotence being the
  * caller's concern (two appends = two batches).
  */
class JdbcLoadSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def props = new java.util.Properties()

  test("S7 JDBC round-trip: append, NaN -> NULL, trimmed strings") {
    val df = Seq(
      ("  acme  ", "Engineer", Some(120000.0)),
      ("beta", "  Analyst", None),
      ("gamma", "Scientist  ", Some(Double.NaN))
    ).toDF("company", "title", "salary")

    Load.toJdbc(df, url, "postings", props, batchSize = 2)
    val back = spark.read.jdbc(url, "postings", props)

    assert(back.count() == 3)
    assert(back.schema.fieldNames.sorted.toSeq == Seq("company", "salary", "title"))
    val rows = back.collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    // strings trimmed at the sink edge (C17)
    assert(rows.map(_._1).toSeq == Seq("acme", "beta", "gamma"))
    assert(rows.map(_._2).toSeq == Seq("Engineer", "Analyst", "Scientist"))
    // None stays NULL; NaN becomes NULL (reference load_sqlserver.py:75)
    assert(rows.map(_._3).toSeq == Seq(Some(120000.0), None, None))

    // append mode appends — a second batch doubles the rows
    Load.toJdbc(df, url, "postings", props)
    assert(spark.read.jdbc(url, "postings", props).count() == 6)
  }

  test("S7 round-trips the transformed postings frame") {
    // The real pipeline payload: canonical 11-column schema + derived
    // columns through the actual JDBC sink, nulls intact.
    val tf = graft.pipeline.Transform.transform(
      Seq(("acme", "Senior Data Engineer (Remote)", "full-time", "Seattle, WA",
           "USA", 120000.0, "2025-10-20 09:00:00", "indeed", "python, sql",
           "communication", "Kaggle"))
        .toDF("company_name", "job_title", "job_type", "job_location",
              "country", "salary", "job_posted_date", "job_posted_site",
              "technical_skills", "soft_skills", "source")
        .withColumn("__ingest_id", xxhash64(col("job_title"))))
    Load.toJdbc(tf, url, "job_data", props)
    val back = spark.read.jdbc(url, "job_data", props)
    assert(back.count() == 1)
    val r = back.collect()(0)
    assert(r.getAs[String]("cleaned_job_title") == "Data Engineer")
    assert(r.getAs[String]("city") == "seattle")
    assert(r.getAs[Double]("salary") == 120000.0)
  }
}
