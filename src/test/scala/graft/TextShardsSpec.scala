package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.index.IdDoc

/** Sharded JSONL/CSV corpus export + read-back (the LLM-training
  * interchange formats). Pins: (1) byte-exact round-trip of adversarial
  * content (newlines, quotes, backslashes, commas, tabs, unicode incl.
  * astral plane, empty string) through BOTH formats; (2) the shard
  * layout contract — shard = docId mod n dirs, exactly one file per
  * shard, rows docId-ascending inside it; (3) gzip JSONL round-trip
  * (the non-splittable-but-shard-sized codec path); (4) explicit-schema
  * reads (no inference job over the data).
  */
class TextShardsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val nasty = Seq(
    "plain ascii words only",
    "line\nbreaks\r\nand a carriage\rreturn",
    "a \"quoted\" string and a lone \" quote",
    "back\\slash and double back\\\\slash",
    "commas, everywhere, even trailing,",
    "tab\tseparated\tfields",
    "unicode: 中文 café 😀 ß",
    "",
    "json-ish content: {\"k\": [1, 2], \"v\": null}",
    "trailing newline\n")

  private def fixture: Seq[IdDoc] = nasty.zipWithIndex.map { case (t, i) =>
    IdDoc(i.toLong, s"org$i/proj$i", s"src/f$i.txt",
      f"cafe$i%04d", if (i % 2 == 0) "scala" else "py", t)
  }

  private def ds(docs: Seq[IdDoc]) = {
    import spark.implicits._
    spark.createDataset(docs)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def asMap(docs: Seq[IdDoc]): Map[Long, IdDoc] =
    docs.map(d => d.docId -> d).toMap

  test("JSONL round-trip is byte-exact on adversarial content") {
    val dir = tmp("graft_jsonl_rt")
    Corpus.writeJsonlShards(ds(fixture), dir, numShards = 3)
    val back = Corpus.fromJsonlShards(spark, dir).collect().toSeq
    assert(asMap(back) === asMap(fixture))
  }

  test("CSV round-trip is byte-exact on adversarial content (multiLine path)") {
    val dir = tmp("graft_csv_rt")
    Corpus.writeCsvShards(ds(fixture), dir, numShards = 3)
    val back = Corpus.fromCsvShards(spark, dir).collect().toSeq
    // byte-exact INCLUDING carriage returns: the parser's line-separator
    // auto-detection settles on LF at the (always LF-terminated) header
    // line before any quoted CR appears, so quoted \r\n / \r survive
    // verbatim. Setting lineSep explicitly would instead normalize CRs
    // inside quotes — the Corpus.fromCsvShards scaladoc pins why the
    // option is absent.
    assert(asMap(back) === asMap(fixture))
  }

  test("ORC round-trip is byte-exact on adversarial content (columnar path)") {
    val dir = tmp("graft_orc_rt")
    Corpus.writeOrcShards(ds(fixture), dir, numShards = 3)
    val back = Corpus.fromOrcShards(spark, dir).collect().toSeq
    assert(asMap(back) === asMap(fixture))
    // layout contract holds for ORC too: shard dirs, one file per shard
    val fs = new java.io.File(dir)
    val shardDirs = fs.listFiles().filter(_.getName.startsWith("shard=")).sorted
    assert(shardDirs.map(_.getName).toSeq ===
      Seq("shard=0", "shard=1", "shard=2"))
    shardDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".orc")) === 1, d.getName)
    }
  }

  test("shardManifest: hand XOR, row-order independence, mergeability, tamper detection") {
    import spark.implicits._
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val m = Corpus.shardManifest(ds(fixture), numShards = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    fixture.groupBy(_.docId % 3).foreach { case (shard, docs) =>
      val want = (docs.size.toLong, docs.map(_.docId).min, docs.map(_.docId).max,
        docs.map(d => h60(d.content)).reduce(_ ^ _))
      assert(m(shard) === want, s"shard $shard")
    }
    // row order cannot matter (XOR) and manifests merge bin-wise
    val rev = Corpus.shardManifest(ds(fixture.reverse), numShards = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(rev === m.map { case (s, v) => s -> v._4 })
    // tampering one char flips the digest
    val tampered = fixture.map(d =>
      if (d.docId == 0L) d.copy(content = d.content + "x") else d)
    val t = Corpus.shardManifest(ds(tampered), numShards = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(t(0L) !== m(0L)._4)
    assert((1L to 2L).forall(s => t(s) === m(s)._4))
  }

  test("gzip JSONL shards round-trip (one-task non-splittable codec path)") {
    val dir = tmp("graft_jsonl_gz")
    Corpus.writeJsonlShards(ds(fixture), dir, numShards = 2, compression = "gzip")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).flatMap(_.listFiles())
      .map(_.getName).filter(n => n.contains("json") && !n.startsWith("."))
    assert(files.nonEmpty && files.forall(_.endsWith(".json.gz")), files.toSeq)
    val back = Corpus.fromJsonlShards(spark, dir).collect().toSeq
    assert(asMap(back) === asMap(fixture))
  }

  test("shard layout: docId mod n dirs, one file per shard, docId-ascending rows") {
    val docs = Corpus.assignDocIds(spark,
      Corpus.synthetic(spark, 2, 20, seed = 7)).collect().toSeq
    val n = 4
    val dir = tmp("graft_jsonl_layout")
    Corpus.writeJsonlShards(ds(docs), dir, numShards = n)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.map(_.getName).sorted.toSeq ===
      (0 until n).map(s => s"shard=$s").sorted)
    shardDirs.foreach { sd =>
      val s = sd.getName.stripPrefix("shard=").toLong
      val dataFiles = sd.listFiles().filter(_.getName.endsWith(".json"))
      assert(dataFiles.length === 1, s"shard $s: ${dataFiles.length} files")
      // rows inside the shard file are docId-ascending and all ≡ s (mod n)
      val idsInFile = scala.io.Source.fromFile(dataFiles.head, "UTF-8")
        .getLines().map { line =>
          val m = """"docId":(\d+)""".r.findFirstMatchIn(line)
          m.get.group(1).toLong
        }.toSeq
      assert(idsInFile === idsInFile.sorted, s"shard $s not docId-ascending")
      assert(idsInFile.forall(_ % n == s), s"shard $s holds foreign docIds")
    }
    // completeness: union of shards == input
    val back = Corpus.fromJsonlShards(spark, dir).collect().toSeq
    assert(asMap(back) === asMap(docs))
  }

  test("read plans carry the explicit schema (no inference) and prune to it") {
    val dir = tmp("graft_jsonl_schema")
    Corpus.writeJsonlShards(ds(fixture), dir, numShards = 2)
    val df = Corpus.fromJsonlShards(spark, dir).toDF()
    assert(df.schema.fieldNames.toSeq ===
      Seq("docId", "repo", "path", "commit", "lang", "content"))
    // a projection to two columns must show only those in the scan schema
    val plan = df.select("docId", "lang").queryExecution.executedPlan.toString
    assert(plan.contains("docId") && plan.contains("lang"))
    assert(!plan.toLowerCase.contains("inferschema"))
  }
}
