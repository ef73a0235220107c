package graft

import graft.ops.WarcOps
import graft.queries.Registry
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Web-corpus curation front-end (q176–q178): PII scrub precision on
  * plants vs near-misses, URL canonicalization equivalence classes, and
  * WARC framing — byte-exact round-trip, walked-offset contiguity, and
  * the malformed-segment quarantine contract.
  */
class CurationSpec extends SparkSpec {

  private def run(name: String) =
    Registry.byName(name).run(spark, sfDir)

  // ---- q176: PII scrub --------------------------------------------------

  test("pii: planted counts match doc_id arithmetic; near-misses excluded") {
    val rows = run("q176_pii_redact")
      .select("doc_id", "n_email", "n_phone", "n_ip").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 1 + (1 - id % 2),
        s"doc $id email count (near-miss user@localhost must not count)")
      assert(r.getLong(2) == 1L,
        s"doc $id phone count (near-miss 55-555-5555 must not count)")
      assert(r.getLong(3) == 1L,
        s"doc $id ip count (near-miss 999.300.1.1 must not count)")
    }
  }

  test("pii: golden — artifacts replaced by placeholders, body intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    Seq((7L, "plain body words")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Registry.byName("q176_pii_redact").run(spark, dir).head()
    val expected = "contact <EMAIL> mail user@localhost plain body words" +
      " call <PHONE> not 55-555-5555 ip <IP> bad 999.300.1.1 end"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getLong(4) == expected.length.toLong)
    assert(r.getString(5) == md)
  }

  // ---- q177: URL canonicalization --------------------------------------

  test("url: case/port/params/fragment variants collapse; u3 keeps :8080") {
    val rows = run("q177_url_canonicalize").collect()
    val hosts = rows.map(_.getString(0)).toSeq
    assert(hosts == hosts.sorted)
    assert(hosts.forall(h =>
      h.matches("www\\.site[0-4]\\.com") ||
      h.matches("mirror[0-6]\\.example\\.org")))
    rows.foreach { r =>
      val (host, nRaw, nCanon) = (r.getString(0), r.getLong(1), r.getLong(2))
      if (host.startsWith("www.")) {
        // u1+u2 per doc, one canonical each: exactly 2:1
        assert(nRaw == 2 * nCanon, s"$host: u1/u2 must canonicalize equal")
      } else {
        // u3 collapses onto doc_id%50 path classes: massive dedup as soon
        // as the corpus outgrows the class count
        assert(nCanon <= 50, s"$host: canonical classes bounded by path mod")
        assert(nCanon <= nRaw)
      }
    }
  }

  test("url frontier stream: folds to the identical batch q177 frame") {
    val batch = run("q177_url_canonicalize").collect().toSeq
    val stream = run("q179_url_frontier_stream").collect().toSeq
    assert(stream == batch)
  }

  test("url frontier: at-least-once batch retry replays bit-identically") {
    import graft.streaming.UrlFrontierStream
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val work = java.nio.file.Files.createTempDirectory("urlretry").toString
    val b0 = docs.where(col("doc_id") < 20)
    val b1 = docs.where(col("doc_id") >= 20 && col("doc_id") < 40)
    UrlFrontierStream.processBatch(spark, b0, 0L, work, 16, 0)
    UrlFrontierStream.processBatch(spark, b1, 1L, work, 16, 0)
    def snap() = (
      spark.read.parquet(s"$work/partials").collect()
        .map(_.toString).sorted.toSeq,
      spark.read.parquet(s"$work/url_store").collect()
        .map(_.toString).sorted.toSeq)
    val before = snap()
    // the retry scenario: batch 1 completed its appends, then the batch
    // was re-run — partials and store must come back bit-identical
    UrlFrontierStream.processBatch(spark, b1, 1L, work, 16, 0)
    assert(snap() == before)
  }

  // ---- q180: robots.txt (RFC 9309) -------------------------------------

  private def allow(robots: String, path: String,
                    token: String = "graftbot"): Boolean =
    graft.ops.RobotsOps.allowed(UTF8String.fromString(robots),
      UTF8String.fromString(token), UTF8String.fromString(path))

  test("robots: exact-token group wins, * ignored when it exists") {
    val txt = "User-agent: GraftBot\nDisallow: /a\n\n" +
      "User-agent: *\nDisallow: /b\n"
    assert(!allow(txt, "/a/x"))
    assert(allow(txt, "/b/x"), "* group must not apply when exact matches")
    assert(!allow(txt, "/b/x", token = "otherbot"))
  }

  test("robots: multiple exact groups merge; consecutive UA lines share") {
    val txt = "User-agent: graftbot\nUser-agent: other\nDisallow: /a\n\n" +
      "User-agent: graftbot\nDisallow: /b\n"
    assert(!allow(txt, "/a") && !allow(txt, "/b"))
    assert(!allow(txt, "/a", token = "other"))
    assert(allow(txt, "/b", token = "other"))
  }

  test("robots: longest match wins; Allow wins length ties") {
    val txt = "User-agent: *\nDisallow: /dir\nAllow: /dir/ok\n"
    assert(!allow(txt, "/dir/no"))
    assert(allow(txt, "/dir/ok/page"))
    val tie = "User-agent: *\nDisallow: /p\nAllow: /p\n"
    assert(allow(tie, "/page"), "equal-length Allow must win")
  }

  test("robots: empty Disallow, comments, CRLF, case, unknown directives") {
    val txt = "# policy\r\nUSER-AGENT: *\r\nCrawl-delay: 2\r\n" +
      "Disallow:\r\nDisallow: /x # inline comment\r\nSitemap: /s.xml\r\n"
    assert(allow(txt, "/anything"), "empty Disallow matches nothing")
    assert(!allow(txt, "/x/y"), "inline comment stripped from value")
    assert(allow("", "/x"), "no groups at all -> allowed")
    assert(allow("User-agent: other\nDisallow: /\n", "/x"),
      "no applicable group -> allowed")
  }

  test("robots: q180 reconciles with the frontier and splits both ways") {
    val rows = run("q180_robots_filter").collect()
    val frontier = run("q177_url_canonicalize").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (host, n, a, b) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(a + b == n, s"$host: allowed+blocked must cover the frontier")
      assert(n == frontier(host), s"$host: input is the canonical frontier")
    }
    // the fixture plants both outcomes on at least one host each
    assert(rows.exists(_.getLong(3) > 0), "some URLs must be blocked")
    assert(rows.forall(_.getLong(2) > 0), "no host blocks everything")
  }

  // ---- q178: WARC framing ----------------------------------------------

  private def rec(uri: String, payload: Array[Byte]): Array[Byte] =
    WarcOps.build(UTF8String.fromString(uri), payload)

  test("warc: build/parse round-trips bytes, offsets are walked, not guessed") {
    val p1 = "hello world".getBytes("UTF-8")
    val p2 = Array.tabulate[Byte](300)(i => (i % 251).toByte) // binary, has \r\n
    val r1 = rec("https://a/1", p1); val r2 = rec("https://a/2", p2)
    val seg = r1 ++ r2
    val parsed = WarcOps.parse(seg)
    assert(parsed.numElements() == 2)
    val g1 = parsed.getStruct(0, 5); val g2 = parsed.getStruct(1, 5)
    assert(g1.getString(0) == "https://a/1" && g1.getString(1) == "response")
    assert(g1.getLong(2) == 0L && g1.getLong(3) == p1.length.toLong)
    assert(java.util.Arrays.equals(g1.getBinary(4), p1))
    assert(g2.getLong(2) == r1.length.toLong, "second record offset = len(first)")
    assert(g2.getLong(3) == p2.length.toLong)
    assert(java.util.Arrays.equals(g2.getBinary(4), p2))
  }

  test("warc: payload containing CRLFCRLF does not split a record") {
    val tricky = "a\r\n\r\nb\r\n\r\nc".getBytes("UTF-8")
    val parsed = WarcOps.parse(rec("u", tricky))
    assert(parsed.numElements() == 1)
    assert(java.util.Arrays.equals(parsed.getStruct(0, 5).getBinary(4), tricky))
  }

  test("warc: malformed segments quarantine with IAE, never crash") {
    val good = rec("u", "payload".getBytes("UTF-8"))
    def iae(b: Array[Byte]) =
      intercept[IllegalArgumentException](WarcOps.parse(b))
    // bad magic
    val bad = good.clone(); bad(0) = 'X'
    assert(iae(bad).getMessage.contains("WARC/1.0"))
    // truncated payload (Content-Length overruns)
    assert(iae(good.dropRight(5)).getMessage.contains("overruns"))
    // missing Content-Length
    val noCl = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n").getBytes("UTF-8")
    assert(iae(noCl).getMessage.contains("Content-Length"))
    // broken separator
    val sep = good.clone(); sep(sep.length - 1) = 'x'
    assert(iae(sep).getMessage.contains("separator"))
  }

  test("warc salvage: one flipped byte costs one record, bytes accounted") {
    val recs = (1 to 4).map(i =>
      rec(s"https://a/$i", s"payload number $i".getBytes("UTF-8")))
    def corrupt(b: Array[Byte]) = { val c = b.clone(); c(0) = 'X'; c }
    // corrupt the SECOND record: salvage must keep 1, 3, 4
    val seg = recs(0) ++ corrupt(recs(1)) ++ recs(2) ++ recs(3)
    val st = WarcOps.parseLenient(seg)
    val got = st.getArray(0)
    assert(got.numElements() == 3 && st.getLong(1) == 1L)
    assert(st.getLong(2) == recs(1).length.toLong, "skipped = full record")
    assert(got.getStruct(0, 5).getString(0) == "https://a/1")
    assert(got.getStruct(1, 5).getString(0) == "https://a/3")
    assert(got.getStruct(1, 5).getLong(2) ==
      (recs(0).length + recs(1).length).toLong,
      "salvaged offsets stay absolute")
    // corrupt FIRST and LAST: middle records survive, tail fully skipped
    val seg2 = corrupt(recs(0)) ++ recs(1) ++ corrupt(recs(3))
    val st2 = WarcOps.parseLenient(seg2)
    assert(st2.getArray(0).numElements() == 1 && st2.getLong(1) == 2L)
    assert(st2.getLong(2) == (recs(0).length + recs(3).length).toLong)
    // mid-record damage (overrunning Content-Length) also salvages
    val bad = rec("https://a/x", "0123456789".getBytes("UTF-8"))
    val seg3 = bad.dropRight(6) ++ recs(2)
    val st3 = WarcOps.parseLenient(seg3)
    assert(st3.getArray(0).numElements() == 1 && st3.getLong(1) == 1L)
    assert(st3.getArray(0).getStruct(0, 5).getString(0) == "https://a/3")
    // clean segment: lenient == strict, zero accounting
    val st4 = WarcOps.parseLenient(recs(0) ++ recs(1))
    assert(st4.getArray(0).numElements() == 2 &&
      st4.getLong(1) == 0L && st4.getLong(2) == 0L)
  }

  test("warc ingest stream: per-lang totals reconcile with q172 per-doc") {
    val ing = run("q182_warc_ingest_stream").collect()
    val q172 = run("q172_html_extract").collect()
    val docs = Tables.documents(spark, sfDir)
    assert(ing.map(_.getLong(1)).sum == docs.where(col("doc_id").isNotNull)
      .count(), "every record ingested exactly once")
    assert(ing.map(_.getLong(3)).sum == q172.map(_.getLong(2)).sum,
      "n_kept total == q172's")
    assert(ing.map(_.getLong(4)).sum == q172.map(_.getLong(3)).sum,
      "kept_chars total == q172's")
  }

  test("warc: q178 offsets are contiguous and md5s match a direct rebuild") {
    val out = run("q178_warc_roundtrip").collect()
    assert(out.nonEmpty)
    // per file: offset(rec_idx=0)=0 and offsets increase strictly
    out.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.head.getLong(3) == 0L)
      assert(sorted.map(_.getLong(3)).toSeq ==
        sorted.map(_.getLong(3)).toSeq.sorted)
    }
    // payload md5 equals md5 of the html wrapper rendered directly
    val direct = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"),
        md5(graft.ops.HtmlExtract.htmlWrap(col("doc_id"),
          coalesce(col("text"), lit("")))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach(r => assert(r.getString(5) == direct(r.getLong(0))))
  }
}
