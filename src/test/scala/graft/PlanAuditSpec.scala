package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Curation, Dedup}

/** Executable plan audits: the scale claims in SURVEY/BENCH_NOTES as
  * assertions over the physical plan, so a regression that silently
  * de-optimizes a declared query (lost pushdown, broadcast demoted to
  * sort-merge, an extra shuffle) fails the build instead of only
  * showing up at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def exchanges(p: String): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r.findAllIn(p).length

  describe("scan-level operators") {
    it("pushes filters into the parquet scan and shuffles nothing") {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_quantity") < 5).select("l_orderkey", "l_quantity")
      val p = plan(li)
      assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,"), p)
      assert(exchanges(p) == 0, p)
      // column pruning: the scan reads only the 2 referenced columns
      assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:"), p)
    }

    it("keeps hash sampling a pure scan predicate (no shuffle, no job state)") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val p = plan(Curation.hashSample(docs, "doc_id", 10))
      assert(exchanges(p) == 0, p)
    }
  }

  describe("join strategy") {
    it("broadcasts every dimension of the multiway join (one fact shuffle at most)") {
      val p = plan(SparkEntry.queries("q32_join_multiway")(spark, sf))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }

    it("co-bucketed tables sort-merge join with ZERO exchange") {
      import graft.sources.Bucketing
      val base = java.nio.file.Files.createTempDirectory("graftbucketaudit").toString
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sf/orders.parquet")
          .select(col("o_custkey").as("custkey"), col("o_totalprice")),
        "audit_orders_b", s"$base/orders", "custkey", 4)
      Bucketing.writeBucketed(
        spark.read.parquet(s"$sf/customer.parquet")
          .select(col("c_custkey").as("custkey"), col("c_mktsegment")),
        "audit_customer_b", s"$base/customer", "custkey", 4)
      val j = Bucketing.cogroupedJoin(spark, "audit_orders_b", "audit_customer_b", "custkey")
      val p = plan(j)
      // the scans' bucket layout satisfies the join's required
      // HashPartitioning on BOTH sides: a shuffle here means the
      // bucket spec was lost (catalog bypass, mismatched count)
      assert(p.contains("SortMergeJoin"), p)
      assert(exchanges(p) == 0, p)
      assert(p.contains("SelectedBucketsCount"), p)
      assert(j.count() > 0)
    }
  }

  describe("single-shuffle shapes") {
    it("window rank shuffles exactly once (hash by the partition key)") {
      val p = plan(SparkEntry.queries("q33_window_rank")(spark, sf))
      // one hash shuffle for the window; the rangepartitioning exchange
      // is the declared query's presentation ORDER BY (oracle
      // determinism), not part of the operator
      assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
      // rank-k early-stops inside each group before the full sort
      assert(p.contains("WindowGroupLimit"), p)
    }

    it("exact-dedup survivor ids is one partial-agg shuffle carrying digests") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val p = plan(Dedup.exactSurvivorIds(docs, Seq("text"), "doc_id"))
      assert(exchanges(p) == 1, p)
      // partial aggregation happens map-side before the exchange
      assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
      // the shuffle key is the sha2 digest, not the document text
      assert(p.contains("sha2"), p)
    }

    it("prefix-partitioned digest store: the anti-join's store scan is partition-pruned, never O(store)") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val base = java.nio.file.Files.createTempDirectory("graftdigaudit").toString
      val store = s"$base/digests"
      Dedup.appendDigestStore(docs.filter(col("doc_id") % 2 === 0), Seq("text"), store,
        batchTag = 1L, sidecar = true, prefixLen = 2)
      // a small batch touches few of the 256 prefixes: the store side
      // of the anti-join must carry a STATIC `__kp IN (...)` partition
      // filter — O(batch + touched partitions), not a full store scan
      val batch = docs.filter(col("doc_id") % 20 === 1)
      val df = Dedup.dedupAgainstStore(batch, Seq("text"), "doc_id", store)
      val p = plan(df)
      assert("PartitionFilters: \\[[^\\]]*__kp".r.findFirstIn(p).isDefined, p)
      // and the scan honors it: every store scan node reads at most the
      // batch's touched-prefix count, strictly fewer than the store's
      // partition count
      val nStorePartitions = new java.io.File(store).listFiles()
        .count(_.getName.startsWith("__kp=p"))
      val touched = batch.select(
        substring(sha2(col("text").cast("string"), 256), 1, 2)).distinct().count()
      val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.endsWith(store)) => f
      }
      assert(scans.nonEmpty, p)
      scans.foreach { f =>
        assert(f.selectedPartitions.partitionCount <= touched &&
          f.selectedPartitions.partitionCount < nStorePartitions,
          s"store scan reads ${f.selectedPartitions.partitionCount} of " +
            s"$nStorePartitions partitions for a $touched-prefix batch")
      }
      // with the per-prefix sidecar consulted, a clean batch's plan has
      // NO store scan at all — the zero-scan path survives partitioning
      val clean = docs.filter(col("doc_id") % 2 === 1)
        .withColumn("text", concat(lit("fresh:"), col("text")))
      val g = Dedup.dedupAgainstStore(clean, Seq("text"), "doc_id", store,
        useSidecar = true)
      assert(g.queryExecution.sparkPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.endsWith(store)) => f
      }.isEmpty, "clean batch must skip the partitioned store entirely")
    }

    it("repeated-span excision shuffles digests, never span text") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val p = plan(Dedup.exciseRepeatedSpans(docs, "doc_id", "text", spanLen = 10))
      // gram identity travels as md5 — the repeated-gram count and the
      // join back are digest-keyed, so no exchange ever carries the
      // 10-token span strings (the raw `text` column may ride the
      // per-doc fold, but grams themselves are hashed pre-shuffle)
      assert(p.contains("md5"), p)
      // all joins are equi-joins (digest, id) — a cartesian would mean
      // the candidate generation degenerated
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    }

    it("trained-weights classifier: the model is ONE broadcast map row, corpus never shuffles") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val labeled = docs.withColumn("good",
        size(graft.analytics.TextAnalysis.qcTokens(col("text"))) >= 60)
      val w = graft.analytics.TextAnalysis.trainBucketWeights(labeled, "text", col("good"))
      val p = plan(graft.analytics.TextAnalysis.hashedLinearQualityWeighted(
        docs, "doc_id", "text", w))
      // scoring pass = corpus scan x broadcast(1-row map); a keyed
      // join-back of exploded tokens would show as SMJ/SHJ
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
      // exchanges: the buckets-bounded training groupBy + the one-row
      // model fold — nothing on the scoring scan itself
      assert(exchanges(p) <= 2, p)
    }

    it("trigram LM scoring never joins per-occurrence — model rides ONE broadcast row") {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val p = plan(graft.analytics.TextAnalysis.charTrigramLmScore(docs, "doc_id", "text"))
      // the scoring pass is corpus-scan x broadcast(1-row map): a keyed
      // join-back of exploded occurrences would show as SMJ/SHJ here
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
      // the only SinglePartition fold is the charset-bounded model table,
      // never the documents side: exchanges = model count shuffle +
      // model single-row fold, nothing on the scoring scan
      assert(exchanges(p) <= 2, p)
    }

    it("z-order bucket stats are a pure codegen projection + one partial-agg shuffle") {
      val e = Tables.events(spark, sf)
      val p = plan(graft.analytics.Layout.zorderBucketStats(e,
        pmod(col("user_id"), lit(1024L)),
        pmod(expr("ts_us div 3600000000"), lit(1024L)), prefixShift = 14))
      // agg key shuffle + final orderBy range exchange; the morton code
      // itself is bit ops inside whole-stage codegen — no UDF, no extra pass
      assert(exchanges(p) <= 2, p)
      // morton code is pure bit-op Project straight off the scan — no
      // UDF, no extra pass, nothing between scan and partial agg
      assert(p.contains("FileScan parquet"), p)
      assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("mapPartitions"), p)
    }

    it("curation pipeline composes as id equi-joins — nothing cartesian, no window over docs") {
      val p = plan(SparkEntry.queries("q115_curation_pipeline")(spark, sf))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
      // the only windows allowed are q94's partition-offset machinery
      // (over the tiny per-partition offsets row-set and the straddling
      // partition), never a corpus-wide single-partition window
      assert(!p.contains("Window [") ||
        p.contains("__pid"), p)
    }

    it("PQ/ADC scoring joins codes to a BROADCAST table — no SMJ, no cartesian") {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cb = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", m = 4, subDim = 16)
      val p = plan(graft.analytics.Similarity.pqTopK(e,
        e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding")),
        cb, "vec_id", "embedding", "qid", k = 10, m = 4, subDim = 16))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
      // the reduction is the bounded top-k aggregate, not a per-qid window
      assert(!p.contains("Window"), p)
    }

    it("IVF+PQ: probes and distance tables broadcast; candidates never cartesian") {
      import graft.functions.VectorFunctions.l2Normalize
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cents = graft.analytics.Similarity.centroids(
        e.select(col("label"), l2Normalize(col("embedding")).as("nv")), "label", "nv")
        .select(col("group"), col("i"), round(col("c"), 6).as("c"))
      val cb = graft.analytics.Similarity.pqCodebooks(e, "label", "embedding", m = 4, subDim = 16)
      val p = plan(graft.analytics.Similarity.ivfPqTopK(e,
        e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding")),
        cents, cb, "vec_id", "embedding", "qid", k = 10, nProbe = 2, m = 4, subDim = 16))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
    }

    it("residual IVF+PQ: quantizers broadcast, candidates never cartesian, no per-qid window") {
      import graft.functions.VectorFunctions.l2Normalize
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cents = graft.analytics.Similarity.centroids(
        e.select(col("label"), l2Normalize(col("embedding")).as("nv")), "label", "nv")
        .select(col("group"), col("i"), round(col("c"), 6).as("c"))
      val cb = graft.analytics.Similarity.residualPqCodebooks(
        e, cents, "vec_id", "embedding", m = 4, subDim = 16)
      val p = plan(graft.analytics.Similarity.residualIvfPqTopK(e,
        e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding")),
        cents, cb, "vec_id", "embedding", "qid", k = 10, nProbe = 2, m = 4, subDim = 16))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      // corpus-sized tables only ever join BROADCAST quantizer state —
      // an SMJ would mean two corpus-sized sides met
      assert(!p.contains("SortMergeJoin"), p)
      // the codebook trainer too: scan → explode → one partial-agg
      val cp = plan(cb)
      assert(!cp.contains("SortMergeJoin") && !cp.contains("CartesianProduct"), cp)
    }

    it("OPQ residual IVF+PQ: rotation is a literal gather — no new joins, no window, no cartesian") {
      import graft.functions.VectorFunctions.l2Normalize
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val cents = graft.analytics.Similarity.centroids(
        e.select(col("label"), l2Normalize(col("embedding")).as("nv")), "label", "nv")
        .select(col("group"), col("i"), round(col("c"), 6).as("c"))
      val perm = graft.analytics.Similarity.opqPermutation(
        e, cents, "vec_id", "embedding", 4, 16)
      // the permutation trainer is scan → broadcast cell-assignment →
      // explode → one 64-row agg; the only join is the broadcast
      // centroid lookup — never a corpus-sized join, and the ranking
      // window runs over exactly 64 rows
      val permPlan = plan(perm)
      assert(!permPlan.contains("SortMergeJoin") &&
        !permPlan.contains("CartesianProduct"), permPlan)
      val cb = graft.analytics.Similarity.opqResidualPqCodebooks(
        e, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      val p = plan(graft.analytics.Similarity.opqResidualIvfPqTopK(e,
        e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding")),
        cents, perm, cb, "vec_id", "embedding", "qid", k = 10, nProbe = 2,
        m = 4, subDim = 16))
      // identical shape contract to the un-rotated residual form: the
      // rotation rides as array-literal gathers inside projections
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }

    it("exact re-rank: shortlist broadcasts INTO the corpus scan — no corpus shuffle, no window") {
      import graft.functions.VectorFunctions.l2Normalize
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val q = e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding"))
      val cents = graft.analytics.Similarity.centroids(
        e.select(col("label"), l2Normalize(col("embedding")).as("nv")), "label", "nv")
        .select(col("group"), col("i"), round(col("c"), 6).as("c"))
      val perm = graft.analytics.Similarity.opqPermutation(
        e, cents, "vec_id", "embedding", 4, 16)
      val cb = graft.analytics.Similarity.opqResidualPqCodebooks(
        e, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      val short50 = graft.analytics.Similarity.opqResidualIvfPqTopK(e, q,
        cents, perm, cb, "vec_id", "embedding", "qid", 50, nProbe = 2, m = 4, subDim = 16)
      val p = plan(graft.analytics.Similarity.exactRerank(
        e, q, short50, "vec_id", "embedding", "qid", 10))
      // the refine stage itself: candidates come from a broadcast-hash
      // join of the tiny shortlist against the corpus scan (raw vectors
      // of non-candidates are pruned at the join, never shuffled), the
      // query table is broadcast, and the final top-k is the bounded
      // aggregate — a window or SMJ here would mean the refine stage
      // re-introduced the corpus-sized cost the ADC tier avoided
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("SortMergeJoin"), p)
      assert(p.contains("TopKByScore"), p)
    }

    it("partitioned graft-log batch read plans one input partition per topic-partition slice") {
      import graft.streaming.{GraftLog, GraftLogProducer}
      val topic = java.nio.file.Files.createTempDirectory("graftplogaudit").toString
      (0 until 3).foreach { part =>
        val prod = new GraftLogProducer(GraftLog.partitionDir(topic, part))
        prod.publish((0 until 10).map(_.toString))
        prod.publish((10 until 20).map(_.toString))
        ()
      }
      val df = spark.read.format("graft-log")
        .option("path", topic).option("partitioned", "true").load()
      // 3 partitions × 2 segments = 6 input partitions: a 1000-executor
      // cluster drains a partitioned backlog with segment-level
      // parallelism; the driver never opens a segment file
      assert(df.rdd.getNumPartitions === 6)
      assert(df.count() === 60L)
    }

    it("per-partition compacted topic read (q199): segment-level parallelism, no exchange") {
      // compaction must not degrade the partitioned read plan: the
      // compacted (gapped) forms still plan one input partition per
      // touched segment per topic-partition — a 1000-executor cluster
      // drains a compacted backlog with the same parallelism as an
      // uncompacted one, and no shuffle is introduced
      import graft.streaming.{GraftLog, GraftLogProducer}
      val topic = java.nio.file.Files.createTempDirectory("graftplogcmpaudit").toString
      (0 until 3).foreach { part =>
        val prod = new GraftLogProducer(GraftLog.partitionDir(topic, part))
        prod.publish((0 until 10).map(v => s"k$v\tv0"))
        prod.publish((0 until 10).map(v => s"k$v\tv1")) // supersedes seg 0
        prod.publish((0 until 5).map(v => s"x$v\t1"))   // newest, untouched
        ()
      }
      assert(GraftLog.compactPartitions(topic,
        new org.apache.hadoop.conf.Configuration()) === 30)
      val df = spark.read.format("graft-log")
        .option("path", topic).option("partitioned", "true").load()
      // 3 partitions x 3 segments (seg 0 now an empty compacted form,
      // still a planned slice covering its span) = 9 input partitions
      assert(df.rdd.getNumPartitions === 9)
      assert(df.count() === 45L) // 10 survivors + 5 newest, per partition
      assert(exchanges(plan(df)) == 0, plan(df))
    }

    it("perceptual image dedup: banded bucket join, never a cross join over assets") {
      import graft.multimodal.Multimodal
      import spark.implicits._
      val assets = Seq(
        (0L, Multimodal.encodeCellPattern(5, 2, 0, "png")),
        (1L, Multimodal.encodeCellPattern(5, 5, 3, "png")))
        .toDF("asset_id", "payload")
      val p = plan(Multimodal.perceptualDupPairs(assets, "asset_id", "payload", maxHamming = 12))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    }

    it("kmv sketch is ONE pass — no corpus DISTINCT shuffle, k-bounded partials only") {
      val e = Tables.events(spark, sf)
      val p = plan(graft.analytics.Sketch.kmvDistinct(e,
        concat(col("user_id").cast("string"), lit(":"),
          expr("ts_us div 86400000000").cast("string")), k = 256))
      // a DISTINCT-then-sort formulation would add a hashpartitioning
      // exchange over the input values; the aggregator ships ≤ k longs
      // per partition through the single global-agg exchange
      assert(exchanges(p) == 1, p)
      assert(p.contains("Exchange SinglePartition"), p)
      assert(!p.contains("hashpartitioning"), p)
    }

    it("sessionization is one key shuffle (gaps-and-islands in-partition)") {
      val e = Tables.events(spark, sf)
      val p = plan(Curation.sessionStats(e, "user_id", "ts_us", "event_id", 1800000000L))
      assert(exchanges(p) <= 2, p) // key shuffle + final agg reuse; never per-step
      assert(p.contains("Window"), p)
    }
  }

  describe("distributed-by-construction operators") {
    it("embedding near-dup kernel is source-connected (no driver collect feeding it)") {
      // Regression guard for the old collect()+broadcast path: that plan
      // started from a driver-built Range/LocalTableScan, disconnected
      // from the source. The blocked tile kernel's plan must scan the
      // parquet source directly.
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val p = plan(Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", 0.45))
      assert(p.toLowerCase.contains("scan parquet"), p)
      assert(!p.contains("Exchange SinglePartition"), p)
    }

    it("tile kernel: B(B+1)/2 tiles, B-fold replication, bounded per-tile rows at 10x") {
      // The 10x ScaleProbe scale, as actual assertions: a future
      // B-sizing regression either fattens tiles (per-task memory blows
      // up) or multiplies shuffle volume — both caught here without
      // waiting for a 100 TB run.
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val emb10 = (0 until 10).map(c =>
        emb.select((col("vec_id") + lit(c * 1000000L)).as("vec_id"), col("embedding")))
        .reduce(_ unionByName _)
      val n = emb10.count()
      val b = Dedup.denseBlockCount(n, rowsPerBlock = 1024,
        spark.sparkContext.defaultParallelism)
      // data-driven sizing: replication sqrt(work), never a single block
      assert(b >= math.ceil(n.toDouble / 1024).toInt && b > 1, s"B=$b for n=$n")
      val withBlk = emb10
        .select(col("vec_id").as("id"), col("embedding").as("v"))
        .withColumn("blk", pmod(xxhash64(col("id")), lit(b)).cast("int"))
      val tiles = Dedup.tileExpansion(withBlk, b)
        .groupBy("p", "q").count().collect()
      // every (p <= q) tile exists exactly once -> each pair meets once
      assert(tiles.length == b * (b + 1) / 2, s"tiles=${tiles.length}, B=$b")
      // total replication is exactly B rows per input row
      assert(tiles.map(_.getLong(2)).sum == n * b)
      // per-tile rows bound per-task memory: ~2n/B expected; 4n/B
      // tolerates hash-block skew. 1024 rows x 64 dims x 8 B ~ 0.5 MB
      // blocks here; the production default (8192) keeps tiles ~16 MB.
      val maxTile = tiles.map(_.getLong(2)).max
      assert(maxTile <= 4L * n / b, s"fattest tile $maxTile rows > 4n/B=${4L * n / b}")
    }

    it("bloom decontamination is a pure corpus scan — no join, no hash exchange") {
      // the eval bitset folds into the plan at construction; what runs
      // over the corpus is scan → project/filter → presentation sort
      val p = plan(SparkEntry.queries("q104_bloom_decontamination")(spark, sf))
      assert(!p.contains("Join"), p)
      assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p)
    }

    it("eps-grid near-dup candidates come from a cell equi-join, never a cross join") {
      val p = plan(SparkEntry.queries("q79_eps_grid_near_dup")(spark, sf))
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      // the join keys on the cell id (an equi-join Catalyst can shuffle)
      assert(p.contains("cellKey"), p)
    }

    it("exact ANN top-k is a bounded partial aggregate — no full-corpus per-query window") {
      // Regression guard for the old Window.partitionBy(qid) form: that
      // plan funneled every corpus row's score for a query through ONE
      // task for row_number. The TopKByScore aggregate keeps <= k
      // candidates per (query, partition) map-side, so the per-qid
      // shuffle carries k·partitions rows, not the corpus.
      val p = plan(SparkEntry.queries("q59_ann_topk")(spark, sf))
      assert(!p.contains("Window"), p)
      // typed-aggregator top-k plans as object/sort aggregate with a
      // partial phase before its exchange
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
      assert(p.contains("partial_topkbyscore") || p.contains("partial"), p)
      // the LSH tier reduces through the same bounded aggregate (its
      // only former window was the per-qid candidate ranking)
      val pLsh = plan(SparkEntry.queries("q82_ann_lsh")(spark, sf))
      assert(!pLsh.contains("Window"), pLsh)
    }

    it("IVF cell assignment is a broadcast + map-side partial min, never a corpus-wide window") {
      val p = plan(SparkEntry.queries("q81_ann_ivf")(spark, sf))
      // the tiny centroid table broadcasts to the corpus (and the probe
      // set broadcasts back to the assigned corpus)
      assert(p.contains("BroadcastExchange"), p)
      // assignment argmin runs as partial aggregation before its
      // exchange — the shuffle carries one row per vector, not the
      // corpus × cells expansion a window over the cross join would move
      assert(p.contains("partial_min") || p.contains("partial_first"), p)
      assert(!p.contains("Exchange SinglePartition"), p)
      assert(!p.contains("CartesianProduct"), p)
    }

    it("persisted IVF serving layout statically prunes the scan to the probed cells") {
      import graft.analytics.Similarity
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val cents = Similarity.centroids(
        emb.select(pmod(col("vec_id"), lit(8)).as("group"), col("embedding")),
        "group", "embedding")
      val dir = java.nio.file.Files.createTempDirectory("graftivfaudit").toString + "/ivf"
      Similarity.ivfPersist(emb, cents, "vec_id", "embedding", dir)
      val qs = emb.filter(col("vec_id") < 2).select(col("vec_id").as("qid"), col("embedding"))
      val res = Similarity.ivfTopKPersisted(dir, qs, cents, "qid", "embedding",
        k = 5, nProbe = 2)
      val p = plan(res)
      // the probed-cell literal lands in PartitionFilters — the scan
      // lists only the probed inverted-list directories; unprobed cells
      // cost zero IO (static pruning, no runtime-DPP dependence)
      assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined, p)
      assert(res.count() > 0)
    }

    it("persisted OPQ-IVF+PQ layout: codes scan statically pruned to probed cells") {
      import graft.analytics.Similarity
      import graft.functions.VectorFunctions.l2Normalize
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val cents = Similarity.centroids(
        emb.select(col("label"), l2Normalize(col("embedding")).as("nv")), "label", "nv")
        .select(col("group"), col("i"), round(col("c"), 6).as("c"))
      val perm = Similarity.opqPermutation(emb, cents, "vec_id", "embedding", 4, 16)
      val cb = Similarity.opqResidualPqCodebooks(
        emb, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      graft.util.Scratch.withDir("opqauditidx") { dir =>
        Similarity.opqIvfPqPersist(emb, cents, perm, cb,
          "vec_id", "embedding", 4, 16, dir)
        val qs = emb.filter(col("vec_id") < 2)
          .select(col("vec_id").as("qid"), col("embedding"))
        val res = Similarity.opqIvfPqTopKPersisted(dir, qs,
          "qid", "embedding", k = 5, nProbe = 2, m = 4, subDim = 16)
        val p = plan(res)
        // the probed-cell literal lands in PartitionFilters on the CODES
        // scan — unprobed inverted lists cost zero IO; and the serve tail
        // keeps the in-query contract (broadcast tables, bounded top-k)
        assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined, p)
        assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
        assert(res.count() > 0)
      }
    }

    it("high-recall re-rank (q187): wider probe/shortlist adds no corpus shuffle") {
      // the R=100/nProbe=5 operating point must keep q180's plan
      // contract: shortlist + queries ride broadcast joins, the exact
      // cosine touches only shortlist survivors, the cut is the bounded
      // TopK — recall is bought with probe width, never with a
      // corpus-sized SortMergeJoin/cartesian
      val res = SparkEntry.queries("q187_ann_rerank_hi")(spark, sf)
      val p = plan(res)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
      assert(p.contains("BroadcastHashJoin"), p)
      assert(res.count() > 0)
    }

    it("flagship persisted-config serve (q195): pruned codes scan, broadcast tables, no corpus shuffle") {
      // the deployable composition — trained cells + trained codebooks
      // persisted at the flagship default (nProbe=7/R=200), served via
      // the persisted-config rerank path — must keep every plan
      // contract of its parts: static cell pruning on the codes scan,
      // broadcast quantizers/shortlist, bounded top-k; never an SMJ,
      // cartesian, or per-query corpus window
      import graft.analytics.Similarity
      import graft.functions.VectorFunctions.l2Normalize
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val seed = Similarity.centroids(
        emb.select(col("label"), l2Normalize(col("embedding")).as("nv")), "label", "nv")
        .select(col("group"), col("i"), round(col("c"), 6).as("c"))
      val cents = Similarity.lloydRefine(emb, seed, "vec_id", "embedding", iters = 3)
      val perm = Similarity.opqPermutation(emb, cents, "vec_id", "embedding", 4, 16)
      val cb0 = Similarity.opqResidualPqCodebooks(
        emb, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      val cb = Similarity.opqPqLloydRefine(
        emb, cents, perm, cb0, "vec_id", "embedding", 4, 16, iters = 3)
      graft.util.Scratch.withDir("flagshipaudit") { dir =>
        Similarity.opqIvfPqPersist(emb, cents, perm, cb,
          "vec_id", "embedding", 4, 16, dir) // flagship defaults
        val qs = emb.filter(col("vec_id") < 2)
          .select(col("vec_id").as("qid"), col("embedding"))
        val res = Similarity.opqIvfPqTopKPersistedRerank(dir, emb, qs,
          "vec_id", "embedding", "qid", k = 10)
        val p = plan(res)
        assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined, p)
        assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
        assert(!p.contains("Window"), p)
        assert(p.contains("BroadcastHashJoin"), p)
        assert(res.count() > 0)
      }
    }

    it("compacted graft-log batch read (q197): one scan, no exchange") {
      // a log-compacted topic reads through the same DSv2 batch plan as
      // an uncompacted one — one input partition per touched segment,
      // delta-filtered inside the reader, zero shuffles introduced
      val log = graft.util.Scratch.dir("cmplogaudit")
      val producer = new graft.streaming.GraftLogProducer(log)
      (0 until 3).foreach(s =>
        producer.publish((s * 50 until s * 50 + 80).map(_.toString)))
      producer.compactTopic()
      val res = spark.read.format("graft-log").option("path", log).load()
      val p = plan(res)
      assert(exchanges(p) == 0, p)
      assert(p.contains("BatchScan") || p.contains("Scan graft-log"), p)
      // gaps preserved: distinct values [0, 180), each exactly once
      assert(res.count() === 180)
    }

    it("PQ codebook training round (q190): broadcast codebook, no corpus self-join, no window") {
      // one per-subspace Lloyd round = corpus scan x broadcast of the
      // m x 64 codebook + two partial aggs — recall is bought at train
      // time with rounds, never with a corpus-sized SortMergeJoin,
      // cartesian, or a per-vector window
      import graft.analytics.Similarity
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val nv = graft.functions.VectorFunctions.l2Normalize(col("embedding"))
      val cents = Similarity.centroids(
        e.select(col("label"), nv.as("nv")), "label", "nv")
        .select(col("group"), col("i"), round(col("c"), 6).as("c"))
      val perm = Similarity.opqPermutation(e, cents, "vec_id", "embedding", 4, 16)
      val seed = Similarity.opqResidualPqCodebooks(
        e, cents, perm, "vec_id", "embedding", 4, 16, signBits = 6)
      // one ROUND's un-checkpointed plan (the refine loop checkpoints
      // each round, which would hide the shape under a LogicalRDD)
      val trained = Similarity.opqPqLloydRound(
        Similarity.opqRotatedSubvecs(e, cents, perm, "vec_id", "embedding", 4, 16),
        seed, roundTo = 6)
      val p = plan(trained)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
      assert(!p.contains("Window"), p)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
      assert(trained.count() > 0)
    }

    it("scalable global ranking keeps the big-table window out of a single partition") {
      import graft.analytics.Ranking
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      val ranked = Ranking.withGlobalRowNumber(orders,
        Seq(col("o_totalprice").desc, col("o_orderkey")), "rn", totalCol = Some("tot"))
      val p = plan(ranked)
      // exactly one SinglePartition exchange is legal: the numPartitions-row
      // offsets cumsum. The orders-table path must stay range-partitioned.
      assert("Exchange SinglePartition".r.findAllIn(p).length <= 1, p)
      assert(p.contains("Exchange rangepartitioning"), p)
      // and the single-partition branch sits above an aggregate (tiny side)
      val idx = p.indexOf("Exchange SinglePartition")
      assert(idx >= 0 && p.substring(idx).contains("HashAggregate"), p)
      // offsets-vs-numbering CONSISTENCY pin (empirical, every CI run):
      // the single-level ranks must equal the window-reference ranks
      // exactly. This is the property that silently breaks when the two
      // internal branches materialize the range exchange independently
      // with different sampled boundaries — which is exactly what
      // happens if the frame is RANKED AGAIN (nested rankings drift run
      // to run; see Ranking's composition contract and Stats.spearman
      // for the safe composition)
      import org.apache.spark.sql.expressions.Window
      val ref = orders.withColumn("rr",
        row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      val bad = ranked.join(ref.select("o_orderkey", "rr"), "o_orderkey")
        .filter(col("rn") =!= col("rr")).count()
      assert(bad === 0L)
    }

    it("JL projection is a pure scan: zero exchanges") {
      import graft.analytics.Similarity
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val p = plan(Similarity.jlProjectQuantized(emb, "vec_id", "embedding", outDim = 8))
      assert(exchanges(p) == 0, p)
    }

    it("HLL condenses to registers before any shuffle, never a distinct over values") {
      import graft.analytics.Sketch
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val toks = docs.select(explode(graft.analytics.TextAnalysis.tokens(col("text"))).as("v"))
      val p = plan(Sketch.hllDistinct(toks, col("v")))
      // bucket partial-agg + final single-row agg: two exchanges total,
      // and no Expand (the multi-countDistinct shape this replaces)
      assert(exchanges(p) <= 2, p)
      assert(!p.contains("Expand"), p)
    }

    it("TF-IDF retrieval broadcasts the query side and cuts with the bounded aggregate") {
      import graft.analytics.TextAnalysis
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val q = docs.filter(col("doc_id") % 101 === 0)
      val p = plan(TextAnalysis.tfidfTopK(docs, "doc_id", "text", q, "doc_id", "text", k = 3))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      // ONE nested-loop is legal: the broadcast of the one-row corpus
      // count into idf (the bm25 stats-row shape); postings never meet
      // each other through it
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1, p)
      assert(!p.contains("Window"), p) // the top-k cut is the aggregate, not a window
    }

    it("edit-distance confirmation stays candidate-bound: equi-joins only") {
      import graft.analytics.Dedup
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 63, 21, 0.5)
        .select("i", "j")
      val p = plan(Dedup.editDistanceConfirm(pairs, docs, "doc_id", "text"))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.contains("levenshtein"), p) // the codegen'd built-in, not a UDF
    }

    it("spearman composes two rankings stably (rank drift guard)") {
      import graft.analytics.Stats
      val events = Tables.table(spark, sf, "events")
      val rho = Stats.spearman(events, col("value"), length(col("props")), col("event_id"))
      // determinism is the whole point: one plan, two executions, one
      // answer — the nested (rank-the-ranked-frame) formulation fails
      // exactly this assertion
      val a = rho.collect()
      val b = rho.collect()
      assert(a === b)
      val p = plan(rho)
      // every single-partition step is condensed-side (above an
      // aggregate): offsets cumsums and the one-row moment aggregate —
      // the events table itself stays range/hash partitioned
      "Exchange SinglePartition".r.findAllIn(p).matchData.foreach { m =>
        assert(p.substring(m.start).contains("HashAggregate"), p)
      }
    }

    it("budget selection: corpus stays range-partitioned; only the offsets row-set is single-partition") {
      import graft.analytics.TextAnalysis
      val docsT = spark.read.parquet(s"$sf/documents.parquet")
      val scored = TextAnalysis.qualityScore(docsT, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          round(col("quality"), 6).as("q"))
      val sel = Curation.budgetSelect(scored, Seq(col("q").desc, col("doc_id")),
        "n_tokens", budget = 5000L)
      val p = plan(sel)
      // the only SinglePartition exchanges sit above the per-partition
      // totals aggregate (numPartitions rows); the document path itself
      // is range-partitioned and whole partitions are decided by the
      // broadcast-joined offsets, never a global sort
      assert(p.contains("Exchange rangepartitioning"), p)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
      "Exchange SinglePartition".r.findAllIn(p).matchData.foreach { m =>
        assert(p.substring(m.start).contains("HashAggregate"), p)
      }
    }
  }

  private def Tables = graft.sources.Tables
}
