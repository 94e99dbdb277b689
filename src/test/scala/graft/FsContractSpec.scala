package graft

import graft.analytics.Dedup
import graft.engine.GraftDB
import graft.streaming.{GraftLog, GraftLogProducer}
import graft.util.FsContract

/** A stub FileSystem with a scheme the atomic-rename allowlist has
  * never heard of — it RESOLVES fine (it's local disk underneath), so
  * any open that proceeds past the contract gate works end-to-end.
  * The gate must refuse it anyway: the contract is a scheme allowlist
  * (rename SEMANTICS can't be probed), not a reachability check.
  */
class NonAtomicStubFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  // RawLocal directly (not the LocalFileSystem checksum wrapper): the
  // wrapper's inner raw fs would checkPath against file:/// and reject
  // graftnar: paths
  override def getScheme: String = "graftnar"
  override def getUri: java.net.URI = java.net.URI.create("graftnar:///")
}

/** The storage contract of VERDICT r15 "what's missing #2": every
  * commit protocol here uses rename as its commit point, so stores and
  * topics must refuse to open on filesystems that don't provide
  * HDFS-style atomic+exclusive rename — loudly, at open, not as a
  * silent crash-window at the first unlucky power cut.
  */
class FsContractSpec extends SparkSpec {

  private def expectRefusal(f: => Any): Unit = {
    val e = intercept[IllegalArgumentException](f)
    assert(e.getMessage.contains("ATOMIC+EXCLUSIVE rename"), e.getMessage)
    assert(e.getMessage.contains(FsContract.OverrideKey), e.getMessage)
  }

  describe("atomic-rename storage contract") {
    it("every rename-committing surface refuses S3-style schemes at open") {
      // gate fires BEFORE any fs access — no s3a connector is on the
      // classpath, so reaching the filesystem would throw a different,
      // far less actionable error. (GraftDB.atPath no longer refuses:
      // it routes these schemes to the manifest-authoritative backend,
      // which does not rename-commit — see ManifestStorageSpec.)
      expectRefusal(new graft.engine.ParquetStorage(spark, "s3a://bucket/db"))
      expectRefusal(new GraftLogProducer("s3://bucket/topic"))
      expectRefusal(GraftLog.compactTopic("s3n://bucket/topic",
        spark.sparkContext.hadoopConfiguration))
      expectRefusal(Dedup.compactDigestStore(spark, "gs://bucket/digests"))
      expectRefusal(Dedup.migrateDigestStore(spark, "gs://bucket/digests", 2))
    }

    it("an unknown scheme refuses the rename store; the manifest route demands attestation") {
      val hconf = spark.sparkContext.hadoopConfiguration
      hconf.set("fs.graftnar.impl", classOf[NonAtomicStubFs].getName)
      // the refusal under test is "NO attestation present" — start from
      // that state explicitly rather than trusting every earlier suite
      // on the shared session to have cleaned up its own attestations
      hconf.unset(graft.util.FsContract.ConditionalCreateKey)
      hconf.unset(graft.util.FsContract.SingleWriterKey)
      val base = java.nio.file.Files.createTempDirectory("graftnar").toString
      expectRefusal(new graft.engine.ParquetStorage(spark, s"graftnar://$base/db"))
      // atPath routes the unlisted scheme to the manifest backend, but
      // NOT silently: without a conditional-create or single-writer
      // attestation the claim could be check-then-PUT and two
      // committers could both win a slot — refuse, naming both keys
      val e = intercept[IllegalArgumentException] {
        GraftDB.atPath(spark, s"graftnar://$base/db")
      }
      assert(e.getMessage.contains(FsContract.ConditionalCreateKey), e.getMessage)
      assert(e.getMessage.contains(FsContract.SingleWriterKey), e.getMessage)
      // with the attestation it opens — and WORKS end-to-end
      hconf.setBoolean(FsContract.SingleWriterKey, true)
      try {
        val db = GraftDB.atPath(spark, s"graftnar://$base/db")
        assert(db.storage.isInstanceOf[graft.engine.ManifestStorage])
        db.insert(graft.model.Point(java.time.Instant.parse("2024-01-01T00:00:00Z"),
          "m", Map("t" -> "1"), Map("v" -> 1.0)))
        assert(db.length == 1)
      } finally hconf.unset(FsContract.SingleWriterKey)
    }

    it("the override opts in explicitly; the graft-log works end-to-end on the stub") {
      val hconf = spark.sparkContext.hadoopConfiguration
      hconf.set("fs.graftnar.impl", classOf[NonAtomicStubFs].getName)
      // Spark-conf form: the exact check the ParquetStorage constructor
      // runs passes with the override set and re-arms on unset. (A full
      // parquet store on the stub scheme dies deep inside Hadoop's
      // local-permission loader, which hard-requires file: URIs — a
      // stub artifact, not a contract behavior.)
      spark.conf.set(FsContract.OverrideKey, "true")
      try {
        FsContract.requireAtomicRename(spark, "graftnar:///tmp/x", "t")
      } finally spark.conf.unset(FsContract.OverrideKey)
      val base = java.nio.file.Files.createTempDirectory("graftnarok").toString
      expectRefusal(new graft.engine.ParquetStorage(spark, s"graftnar://$base/db2"))
      // the Hadoop-conf form arms producer/maintenance entry points —
      // and the topic really works END-TO-END on the stub scheme:
      // publish (create + hsync + rename seal) then batch-read back
      val topicBase = java.nio.file.Files.createTempDirectory("graftnartp").toString
      val c2 = new org.apache.hadoop.conf.Configuration(hconf)
      c2.setBoolean(FsContract.OverrideKey, true)
      val topic = s"graftnar://$topicBase/topic"
      val prod = new GraftLogProducer(topic, c2)
      assert(prod.publish(Seq("r0", "r1")) == 2L)
      assert(GraftLog.latestOffset(topic, c2) == 2L)
      assert(spark.read.format("graft-log").option("path", topic).load()
        .collect().map(_.getString(1)).sorted.toSeq == Seq("r0", "r1"))
    }

    it("URI-illegal characters cannot smuggle an object-store path past the gate") {
      // java.net.URI throws on the space; Hadoop's Path happily opens
      // the store anyway — the scheme must come from the prefix
      // pattern, not a strict URI parse that falls back to "file"
      expectRefusal(new GraftLogProducer("s3a://bucket/my topic"))
      expectRefusal(new graft.engine.ParquetStorage(spark, "s3a://bucket/my data/db"))
      assert(FsContract.schemeOf("s3a://bucket/my topic") == "s3a")
      assert(FsContract.schemeOf("/tmp/with space/x") == "file")
    }

    it("the streaming SINK is a gated surface too (epoch markers commit by rename)") {
      val opts = new java.util.HashMap[String, String]()
      opts.put("path", "s3a://bucket/topic")
      val table = new graft.streaming.GraftLogTable(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.StringType))))
      expectRefusal(table.newWriteBuilder(new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def queryId(): String = "q"
        override def schema(): org.apache.spark.sql.types.StructType =
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.StringType)))
        override def options(): org.apache.spark.sql.util.CaseInsensitiveStringMap =
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts)
      }))
      expectRefusal(GraftLog.compactSinkEpochs("s3a://bucket/topic",
        spark.sparkContext.hadoopConfiguration))
    }

    it("bare local paths and explicit hdfs-style schemes pass the gate") {
      FsContract.requireAtomicRename("/tmp/x", overrideAccepted = false, "t")
      FsContract.requireAtomicRename("file:/tmp/x", overrideAccepted = false, "t")
      FsContract.requireAtomicRename("hdfs://nn:8020/x", overrideAccepted = false, "t")
      FsContract.requireAtomicRename("abfss://c@a.dfs.core.windows.net/x",
        overrideAccepted = false, "t")
      expectRefusal(FsContract.requireAtomicRename("s3a://b/x",
        overrideAccepted = false, "t"))
    }
  }
}
