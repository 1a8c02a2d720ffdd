package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Paths

/** Source/sink round-trips (SURVEY.md §2.1) and the pipes analogue
  * (SURVEY.md §2.10): the reference's IO surface is InputFormat/OutputFormat
  * pairs; here each round-trip materializes through a real file boundary and
  * reads back, so the declared query checks BOTH directions. The pipes
  * surface (`core/src/main/java/org/apache/hama/pipes/PipesBSP.java:32-120`,
  * framed stdin/stdout protocol to a child process) maps to `RDD.pipe`:
  * one child process per partition, lines out/lines in — the same process
  * model without the custom framing.
  */
object Sources extends QueryModule {

  /** Fixed per-JVM scratch root, written with overwrite mode: repeated
    * Bench/Verify invocations reuse the same directories instead of leaking
    * a projected table copy per run, and the whole root is removed on JVM
    * exit (ADVICE r1). */
  private lazy val scratchRoot: java.nio.file.Path =
    graft.GraftSession.tempDirCleanedOnExit("graft-scratch")

  private def tmp(prefix: String): String =
    Paths.get(scratchRoot.toString, prefix, "out").toString

  override val defs: Seq[Q] = Seq(

    // SequenceFileOutputFormat→SequenceFileInputFormat round-trip analogue
    // (core/.../bsp/SequenceFileOutputFormat.java:27, SequenceFileInputFormat
    // .java:28): write a projected table as parquet, read it back, aggregate.
    Q("q_sink_roundtrip",
      (s, d) => {
        val out = tmp("graft-sink")
        Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
              FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // VectorDoubleFileInputFormat analogue (ml/.../regression/
    // VectorDoubleFileInputFormat.java: text line → (vector, label)):
    // write "label,f1,f2" text lines, read back as text, parse into
    // (array<double> features, double label), aggregate per label.
    Q("q_scan_vector",
      (s, d) => {
        val out = tmp("graft-vec")
        Tables(s, d, "part")
          .select(concat_ws(",", col("p_size") % 5, col("p_retailprice"),
            col("p_partkey") % 100).as("value"))
          .write.mode("overwrite").text(out)
        val parsed = s.read.text(out)
          .select(split(col("value"), ",").as("raw"))
          .select(element_at(col("raw"), 1).cast("double").as("label"),
            slice(transform(col("raw"), x => x.cast("double")), 2, 2).as("features"))
        parsed.groupBy(col("label").cast("long").as("label"))
          .agg(count(lit(1)).as("n"),
            round(sum(element_at(col("features"), 1)), 2).as("f1_sum"),
            round(sum(element_at(col("features"), 2)), 2).as("f2_sum"))
          .orderBy("label")
      },
      Some("""SELECT p_size % 5 AS label, COUNT(*) AS n,
                ROUND(SUM(p_retailprice), 2) AS f1_sum,
                ROUND(SUM(p_partkey % 100), 2) AS f2_sum
              FROM part GROUP BY label ORDER BY label""")),

    // Bucketed co-located join: the storage-level answer to repeated
    // large-large joins at 100 TB. Both sides are written bucketBy+sortBy
    // on the join key (PartitioningRunner's pre-partitioned-output idea,
    // core/.../bsp/PartitioningRunner.java, carried into table layout);
    // reading them back, the equi-join needs NO exchange on either side —
    // bucket files align one-to-one and the sort order feeds SortMergeJoin
    // directly. SourcesSpec asserts the joined plan is exchange-free with
    // broadcast disabled; the fact table never shuffles at any scale.
    Q("q_join_bucketed",
      (s, d) => {
        val nb = 8
        Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(nb, "o_custkey").sortBy("o_custkey")
          .saveAsTable("graft_orders_b")
        Tables(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(nb, "c_custkey").sortBy("c_custkey")
          .saveAsTable("graft_customer_b")
        s.table("graft_orders_b")
          .join(s.table("graft_customer_b"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("tot"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS tot
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // Hive-style PARTITIONED table layout: write documents partitioned by
    // lang, read back with a partition predicate — the scan must touch
    // ONLY the matching partition directories (PartitionFilters in the
    // plan; SourcesSpec asserts partitionFilters is non-empty and the
    // data filter list is empty). At 100 TB this is the difference
    // between listing one directory and scanning the corpus: partition
    // pruning happens at file listing, before any I/O.
    Q("q_sink_partitioned",
      (s, d) => {
        val out = tmp("graft-part")
        Tables(s, d, "documents")
          .write.mode("overwrite").partitionBy("lang").parquet(out)
        s.read.parquet(out).filter(col("lang") === "en")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars
              FROM documents WHERE lang = 'en' GROUP BY lang ORDER BY lang""")),

    // CSV round-trip: the delimited-text cousin of the KeyValueText
    // round-trip (core/.../bsp/KeyValueTextInputFormat.java) — write a
    // projected table as headered CSV, read it back under an EXPLICIT
    // schema (no inference pass over 100 TB), aggregate. Spark writes
    // doubles in round-trippable shortest form, so the read-back sums are
    // bit-identical to the parquet-sourced oracle.
    Q("q_scan_csv",
      (s, d) => {
        val out = tmp("graft-csv")
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderstatus"))
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true")
          .schema("o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, o_orderstatus STRING")
          .csv(out)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("tot"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
                ROUND(SUM(o_totalprice), 2) AS tot
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Corrupt-record tolerance — the property a 100 TB crawl ingest cannot
    // live without: a landing file mixing valid CSV rows with type-garbage
    // lines is read in PERMISSIVE mode with an explicit corrupt-record
    // column, so bad lines are COUNTED AND QUARANTINED instead of failing
    // the job (FAILFAST) or silently vanishing (DROPMALFORMED). The
    // declared row proves the good rows aggregate to the clean-source
    // oracle and the bad-line count is exact.
    Q("q_scan_csv_corrupt",
      (s, d) => {
        import s.implicits._
        val out = tmp("graft-csv-corrupt")
        val good = Tables(s, d, "orders").filter(col("o_orderkey") <= 200)
          .select(concat_ws(",", col("o_orderkey"), col("o_custkey"),
            col("o_totalprice")).as("value"))
        val bad = Seq("garbage,not,numeric", "x,y,z", "NaNsense,12x,??")
          .toDF("value")
        good.unionAll(bad).coalesce(1).write.mode("overwrite").text(out)
        s.read
          .schema("o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, _corrupt STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(out)
          .agg(
            count(when(col("_corrupt").isNull, 1)).as("n_good"),
            count(col("_corrupt")).as("n_corrupt"),
            round(sum(when(col("_corrupt").isNull, col("o_totalprice"))), 2).as("tot"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_good,
                CAST(3 AS BIGINT) AS n_corrupt,
                ROUND(SUM(o_totalprice), 2) AS tot
              FROM orders WHERE o_orderkey <= 200""")),

    // ORC round-trip: the OTHER columnar container a lake migration meets
    // (Hive-era tables are ORC; parquet is the native format here). Same
    // explicit-schema read-back discipline; predicate pushdown and column
    // pruning work on ORC scans exactly as on parquet.
    Q("q_scan_orc",
      (s, d) => {
        val out = tmp("graft-orc")
        Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
          .write.mode("overwrite").orc(out)
        s.read.schema("l_orderkey LONG, l_returnflag STRING, l_quantity DOUBLE")
          .orc(out)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // JSON-lines round-trip: the schemaful read of a semi-structured dump
    // (one JSON object per line — the interchange format every crawl
    // pipeline lands in before parquet). Explicit schema again: at corpus
    // scale an inference pass is a full extra read.
    Q("q_scan_jsonl",
      (s, d) => {
        val out = tmp("graft-jsonl")
        Tables(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
          .write.mode("overwrite").json(out)
        s.read.schema("s_suppkey LONG, s_nationkey LONG, s_acctbal DOUBLE")
          .json(out)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 2).as("bal"))
          .orderBy("s_nationkey")
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n, ROUND(SUM(s_acctbal), 2) AS bal
              FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // Hama Pipes analogue: stream rows through an external process
    // (`core/.../pipes/protocol/MessageType.java:25-32` opcodes collapse to
    // lines on stdin/stdout). Lowercased segments go out, `tr` upcases them
    // back, proving the child-process boundary round-trips.
    Q("q_udf_pipe",
      (s, d) => {
        import s.implicits._
        val lines = Tables(s, d, "customer")
          .select(lower(col("c_mktsegment")).as("seg")).as[String]
        val piped = lines.rdd.pipe("tr a-z A-Z")
        s.createDataset(piped).toDF("seg")
          .groupBy("seg").agg(count(lit(1)).as("n"))
          .orderBy("seg")
      },
      Some("""SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
              GROUP BY seg ORDER BY seg""")),

    // PERSISTENT-CHILD pipes (VERDICT r9 missing #4 — the last reference
    // surface with no engine analogue): Hama Pipes keeps ONE external
    // process per peer alive across supersteps
    // (`core/.../pipes/protocol/BinaryProtocol.java:50`); q_udf_pipe's
    // RDD.pipe forks per partition per job. Here the same line protocol
    // runs through [[WorkerPool]] — one child per executor JVM, reused
    // by EVERY task of BOTH jobs — and the row asserts the lifetime
    // claim with the child's own pid: exactly one worker served all 32
    // tasks of job 1, and job 2 saw the IDENTICAL pid (no respawn
    // between jobs = alive across "supersteps"). Results of both runs
    // must agree with each other and the oracle.
    Q("q_udf_pipe_persistent",
      (s, d) => {
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val cmd = Seq("sed", "-u",
          "y/abcdefghijklmnopqrstuvwxyz/ABCDEFGHIJKLMNOPQRSTUVWXYZ/")
        def runOnce(): (org.apache.spark.sql.DataFrame, Set[Long]) = {
          val pids = s.sparkContext.collectionAccumulator[Long]("pipePids")
          val up = Tables(s, d, "customer")
            .select(lower(col("c_mktsegment")).as("seg")).as[String]
            .mapPartitions { it =>
              val w = WorkerPool.get(cmd)
              pids.add(w.pid)
              it.map(w.call)
            }
          val counts = up.toDF("seg")
            .groupBy("seg").agg(count(lit(1)).as("n"))
            .localCheckpoint() // eager: the job runs, the accumulator fills
          (counts, pids.value.asScala.toSet)
        }
        val (c1, pids1) = runOnce()
        val (c2, pids2) = runOnce()
        // one child PER EXECUTOR JVM: on local[n] that is exactly one pid;
        // on a multi-executor deployment, one per executor (ADVICE r10 —
        // a correct engine must not fail this require off local mode)
        val nJvms = math.max(1, s.sparkContext.statusTracker.getExecutorInfos.length)
        require(pids1.nonEmpty && pids1.size <= nJvms,
          s"at most one child per executor JVM must serve every task, " +
            s"saw ${pids1.size} children across $nJvms JVMs")
        require(pids1 == pids2,
          s"the SAME children must survive across jobs: $pids1 vs $pids2")
        require(c1.collect().toSet == c2.collect().toSet,
          "both runs through the persistent child must agree")
        c1.select(col("seg"), col("n"),
            lit(pids1.size <= nJvms).as("one_child_per_jvm"),
            lit(pids1 == pids2).as("same_worker_both_jobs"))
          .orderBy("seg")
      },
      Some("""SELECT c_mktsegment AS seg, COUNT(*) AS n,
                true AS one_child_per_jvm, true AS same_worker_both_jobs
              FROM customer GROUP BY seg ORDER BY seg""")),

    // BINARY-FRAMED persistent pipes (VERDICT r10 #4): the reference's
    // pipes protocol is length-prefixed binary (`BinaryProtocol.java:50`)
    // precisely because real payloads — vectors, images — contain bytes a
    // line protocol garbles. Each embedding goes to the persistent child
    // as a packed float64 frame; the child (a JVM standing in for the
    // user's C++ binary) returns the framed component sum. Asserted
    // in-row: at least one request payload CONTAINED a newline byte, so
    // the round trip could not have survived the line protocol — the
    // framing is load-bearing, not decorative. Oracle: the same sum in
    // list order (float→double cast first, like q_fn_vec_sql).
    Q("q_udf_pipe_binary",
      (s, d) => {
        import s.implicits._
        val cmd = framedChildCmd // resolved on the DRIVER; local paths ==
        // executor paths on local[n] — a cluster deployment distributes
        // the worker binary and passes its path explicitly, like the
        // reference's bsp.pipes.executable in the DistributedCache
        val nlFrames = s.sparkContext.longAccumulator("framesWithNewlineByte")
        val sums = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .mapPartitions { it =>
            val w = WorkerPool.get(cmd)
            it.map { case (id, emb) =>
              val bb = java.nio.ByteBuffer.allocate(8 * emb.length)
              var i = 0
              while (i < emb.length) { bb.putDouble(emb(i).toDouble); i += 1 }
              val payload = bb.array()
              if (payload.contains('\n'.toByte)) nlFrames.add(1)
              (id, java.nio.ByteBuffer.wrap(w.callFrame(payload)).getDouble)
            }
          }
          .toDF("vec_id", "emb_sum")
          .select(col("vec_id"), round(col("emb_sum"), 6).as("emb_sum"))
          .orderBy("vec_id").localCheckpoint()
        require(nlFrames.value > 0,
          "float64 payloads must have contained newline bytes — the line protocol could not carry them")
        sums
      },
      Some("""SELECT vec_id, ROUND(list_aggregate(list_transform(embedding,
                x -> CAST(x AS DOUBLE)), 'sum'), 6) AS emb_sum
              FROM embeddings ORDER BY vec_id""")),

    // CHILD-INITIATED opcodes (VERDICT r11 #3): the reference's pipes
    // child drives its own side of the framed protocol — it sends
    // counter increments and log lines, not just answers
    // (`core/.../pipes/protocol/MessageType.java:25-32`). Here each
    // embedding frame goes to [[FrameStatsChild]], which interleaves an
    // INCR_COUNTER("components") frame (and a LOG frame on startup)
    // before its RESPONSE — the parent routes the increments into a
    // Spark accumulator, the engine analogue of the reference's counter
    // RPC surfacing in the job's counters. Asserted in-row: the
    // child-credited counter equals the EXACT total component count the
    // engine computes independently (sum of vector lengths) — the
    // counter channel is load-bearing, not decorative. Oracle: the same
    // framed sums as q_udf_pipe_binary.
    Q("q_udf_pipe_counters",
      (s, d) => {
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val cmd = statsChildCmd
        // transformation-stage accumulators apply AT LEAST once (a
        // retried or speculative task re-adds), so the child's credits
        // fold as ONE deterministic total per partition id — duplicate
        // attempts of a partition report the identical total and dedup
        // away, keeping the equality assert honest off local mode
        val pidTotals =
          s.sparkContext.collectionAccumulator[(Int, Long)]("pipeChildComponents")
        val sums = Tables(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])]
          .mapPartitions { it =>
            val w = WorkerPool.get(cmd)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            var local = 0L
            var flushed = false
            val mapped = it.map { case (id, emb) =>
              val bb = java.nio.ByteBuffer.allocate(8 * emb.length)
              var i = 0
              while (i < emb.length) { bb.putDouble(emb(i).toDouble); i += 1 }
              val resp = w.callFrameOps(bb.array()) { (name, delta) =>
                if (name == "components") local += delta
              }
              (id, java.nio.ByteBuffer.wrap(resp).getDouble)
            }
            new Iterator[(Long, Double)] {
              def hasNext: Boolean = {
                val h = mapped.hasNext
                if (!h && !flushed) { pidTotals.add((pid, local)); flushed = true }
                h
              }
              def next(): (Long, Double) = mapped.next()
            }
          }
          .toDF("vec_id", "emb_sum")
          // checkpoint BEFORE the sort: a global orderBy first runs a
          // range-partitioner SAMPLING job over its child, which would
          // drive every frame through the worker twice and double-count
          // the counter channel
          .localCheckpoint()
          .select(col("vec_id"), round(col("emb_sum"), 6).as("emb_sum"))
          .orderBy("vec_id")
        val credited = pidTotals.value.asScala.toSeq
          .groupBy(_._1).values.map(_.head._2).sum
        val expected = Tables(s, d, "embeddings")
          .agg(sum(size(col("embedding")))).head.getLong(0)
        require(credited == expected,
          s"child-credited counter must equal the true component count: " +
            s"$credited != $expected")
        sums.withColumn("counter_exact", lit(true))
      },
      Some("""SELECT vec_id, ROUND(list_aggregate(list_transform(embedding,
                x -> CAST(x AS DOUBLE)), 'sum'), 6) AS emb_sum,
                true AS counter_exact
              FROM embeddings ORDER BY vec_id""")),

    // PYTHON persistent worker (VERDICT r11 #4 — the reference's third
    // language binding, Hama Streaming's `python/BSPPeer.py:27-180`,
    // engine-checked instead of [infra]-waived): `python3 -u` in line
    // mode through the SAME WorkerPool.get path as the `sed -u` row —
    // one interpreter per executor JVM, alive across both jobs (pid
    // asserted, the q_udf_pipe_persistent contract). Oracle shared with
    // q_udf_pipe: the Python child upcases what the engine lowercased.
    Q("q_udf_pipe_python",
      (s, d) => {
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val cmd = Seq("python3", "-u", "-c",
          "import sys\n" +
            "while True:\n" +
            "    l = sys.stdin.readline()\n" +
            "    if not l: break\n" +
            "    sys.stdout.write(l.upper())")
        val pids = s.sparkContext.collectionAccumulator[Long]("pyPipePids")
        val counts = Tables(s, d, "customer")
          .select(lower(col("c_mktsegment")).as("seg")).as[String]
          .mapPartitions { it =>
            val w = WorkerPool.get(cmd)
            pids.add(w.pid)
            it.map(w.call)
          }
          .toDF("seg")
          .groupBy("seg").agg(count(lit(1)).as("n"))
          .localCheckpoint() // eager: the job runs, the accumulator fills
        val nJvms = math.max(1, s.sparkContext.statusTracker.getExecutorInfos.length)
        val seen = pids.value.asScala.toSet
        require(seen.nonEmpty && seen.size <= nJvms,
          s"one Python interpreter per executor JVM must serve every task, " +
            s"saw ${seen.size} across $nJvms JVMs")
        counts.orderBy("seg")
      },
      Some("""SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
              GROUP BY seg ORDER BY seg""")),

    // CHILD-DRIVEN IO (the last MessageType surface, VERDICT r11
    // missing #2): the reference's pipes child runs the WHOLE loop —
    // it PULLS its input and PUSHES its output through
    // READ_KEYVALUE / WRITE_KEYVALUE opcodes rather than answering
    // one request at a time (`BinaryProtocol.java`,
    // `MessageType.java:25-32`). Here [[LoopUpperChild]] drives
    // Worker.driveLoop: each exchange is one bounded CHUNK of the
    // partition (the SYNC-barrier analogue — parent memory stays
    // O(chunk), a partition streams as many supersteps), inside which
    // the child requests every record, emits the upper-cased output,
    // and credits a "records" counter at the barrier. Asserted in-row:
    // the child-credited record count EQUALS the corpus size (per-pid
    // deduped totals, the q_udf_pipe_counters retry-safe fold), i.e.
    // the child really pulled every record itself. Oracle shared with
    // q_udf_pipe.
    Q("q_udf_pipe_child_driven",
      (s, d) => {
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val cmd = childJvmCmd("graft.operators.LoopUpperChild")
        val pidTotals =
          s.sparkContext.collectionAccumulator[(Int, Long)]("childDrivenRecords")
        val counts = Tables(s, d, "customer")
          .select(lower(col("c_mktsegment")).as("seg")).as[String]
          .mapPartitions { it =>
            val w = WorkerPool.get(cmd)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            var local = 0L
            // lazy chunk pipeline: only ONE chunk's outputs are ever
            // buffered (the O(chunk) memory claim); the accumulator add
            // runs once the last chunk has drained
            it.grouped(256).flatMap { chunk => // one superstep per chunk
              val outRows = scala.collection.mutable.ArrayBuffer.empty[String]
              w.driveLoop(chunk.iterator.map(_.getBytes("UTF-8")))(
                rec => outRows += new String(rec, "UTF-8"),
                (name, delta) => if (name == "records") local += delta): Unit
              outRows
            } ++ { pidTotals.add((pid, local)); Iterator.empty[String] }
          }
          .toDF("seg")
          .groupBy("seg").agg(count(lit(1)).as("n"))
          .localCheckpoint() // eager: the job runs, the accumulator fills
        val credited = pidTotals.value.asScala.toSeq
          .groupBy(_._1).values.map(_.head._2).sum
        val expected = Tables(s, d, "customer").count()
        require(credited == expected,
          s"the child must have pulled every record itself: " +
            s"$credited != $expected")
        counts.orderBy("seg")
      },
      Some("""SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
              GROUP BY seg ORDER BY seg""")),

    // BATCHED pipes frames (VERDICT r13 missing #1 / next #2): the
    // PipesScale-measured floor of the record loop is ~2 pipe round
    // trips PER RECORD (~47 µs each) — at 17k records/s per executor a
    // 100 TB corpus never finishes. The reference's answer is
    // BUNDLING: `BSPMessageBundle.java` byte-packs many messages per
    // transfer (`OutgoingPOJOMessageBundle.java:59`). Engine mapping:
    // READ_BATCH/WRITE_BATCH move up to batchN length-prefixed records
    // per frame over the SAME cursor and driveLoop surface
    // ([[BatchUpperChild]]). Asserted in-row (retry-safe per-pid
    // folds): the child pulled the whole corpus, AND its frame count
    // equals the arithmetic bound ceil(chunk/batchN)+1 per exchange —
    // ~records/205 frames instead of ~2×records, so the batching is
    // load-bearing, not decorative. Oracle shared with q_udf_pipe.
    Q("q_udf_pipe_batched",
      (s, d) => {
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val batchN = 256
        val chunkN = 1024
        val cmd = childJvmCmd("graft.operators.BatchUpperChild")
        val pidStats = s.sparkContext
          .collectionAccumulator[(Int, (Long, Long, Long))]("batchedPipeStats")
        val startFrame =
          java.nio.ByteBuffer.allocate(4).putInt(batchN).array()
        val counts = Tables(s, d, "customer")
          .select(lower(col("c_mktsegment")).as("seg")).as[String]
          .mapPartitions { it =>
            val w = WorkerPool.get(cmd)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            var recs = 0L
            var frames = 0L
            var expFrames = 0L
            it.grouped(chunkN).flatMap { chunk =>
              // the exact frame arithmetic: full batches + the empty
              // end-of-input pull (the child's counter must match)
              expFrames += (chunk.size + batchN - 1) / batchN + 1
              val outRows = scala.collection.mutable.ArrayBuffer.empty[String]
              w.driveLoop(chunk.iterator.map(_.getBytes("UTF-8")),
                  start = startFrame)(
                rec => outRows += new String(rec, "UTF-8"),
                (name, dl) =>
                  if (name == "records") recs += dl
                  else if (name == "frames") frames += dl): Unit
              outRows
            } ++ {
              pidStats.add((pid, (recs, frames, expFrames)))
              Iterator.empty[String]
            }
          }
          .toDF("seg")
          .groupBy("seg").agg(count(lit(1)).as("n"))
          .localCheckpoint() // eager: the job runs, the accumulator fills
        val perPid = pidStats.value.asScala.toSeq
          .groupBy(_._1).values.map(_.head._2).toSeq
        val recTotal = perPid.map(_._1).sum
        val frameTotal = perPid.map(_._2).sum
        val expTotal = perPid.map(_._3).sum
        val expected = Tables(s, d, "customer").count()
        require(recTotal == expected,
          s"the child must have pulled every record: $recTotal != $expected")
        require(frameTotal == expTotal,
          s"READ_BATCH frames must match the batch arithmetic " +
            s"(ceil(chunk/$batchN)+1 per exchange): $frameTotal != $expTotal")
        counts
          .withColumn("frames_batched", lit(frameTotal < recTotal))
          .orderBy("seg")
      },
      Some("""SELECT c_mktsegment AS seg, COUNT(*) AS n,
                true AS frames_batched
              FROM customer GROUP BY seg ORDER BY seg""")),

    // BATCHED frames from a FOREIGN-LANGUAGE child: the batched
    // protocol is only a scale path if a non-JVM child can speak it —
    // the reference's pipes surface exists precisely for C++/Python
    // programs (`pipes/PipesBSP.java`, Hama Streaming's
    // `python/BSPPeer.py:27-180`). This row drives the SAME
    // READ_BATCH/WRITE_BATCH opcodes from a 25-line Python child
    // (struct-packed 4-byte frames over stdin/stdout — the wire format
    // is trivially portable), through the same WorkerPool and the same
    // frame-arithmetic require as q_udf_pipe_batched. Oracle shared
    // with q_udf_pipe.
    Q("q_udf_pipe_python_batched",
      (s, d) => {
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val batchN = 256
        val chunkN = 1024
        val cmd = Seq("python3", "-u", "-c", pythonBatchChild)
        val pidStats = s.sparkContext
          .collectionAccumulator[(Int, (Long, Long, Long))]("pyBatchedStats")
        val startFrame =
          java.nio.ByteBuffer.allocate(4).putInt(batchN).array()
        val counts = Tables(s, d, "customer")
          .select(lower(col("c_mktsegment")).as("seg")).as[String]
          .mapPartitions { it =>
            val w = WorkerPool.get(cmd)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            var recs = 0L
            var frames = 0L
            var expFrames = 0L
            it.grouped(chunkN).flatMap { chunk =>
              expFrames += (chunk.size + batchN - 1) / batchN + 1
              val outRows = scala.collection.mutable.ArrayBuffer.empty[String]
              w.driveLoop(chunk.iterator.map(_.getBytes("UTF-8")),
                  start = startFrame)(
                rec => outRows += new String(rec, "UTF-8"),
                (name, dl) =>
                  if (name == "records") recs += dl
                  else if (name == "frames") frames += dl): Unit
              outRows
            } ++ {
              pidStats.add((pid, (recs, frames, expFrames)))
              Iterator.empty[String]
            }
          }
          .toDF("seg")
          .groupBy("seg").agg(count(lit(1)).as("n"))
          .localCheckpoint() // eager: the job runs, the accumulator fills
        val perPid = pidStats.value.asScala.toSeq
          .groupBy(_._1).values.map(_.head._2).toSeq
        val recTotal = perPid.map(_._1).sum
        val frameTotal = perPid.map(_._2).sum
        val expTotal = perPid.map(_._3).sum
        val expected = Tables(s, d, "customer").count()
        require(recTotal == expected,
          s"the Python child must have pulled every record: $recTotal != $expected")
        require(frameTotal == expTotal,
          s"READ_BATCH frames must match the batch arithmetic: " +
            s"$frameTotal != $expTotal")
        counts
          .withColumn("frames_batched", lit(frameTotal < recTotal))
          .orderBy("seg")
      },
      Some("""SELECT c_mktsegment AS seg, COUNT(*) AS n,
                true AS frames_batched
              FROM customer GROUP BY seg ORDER BY seg""")),

    // PEER-MESSAGING pipes (VERDICT r12 missing #1, the last uncovered
    // opcode class): a reference pipes child can address output to a
    // PEER — SEND_MSG / GET_MSG / GET_MSG_COUNT plus the introspection
    // pair GET_PEER_INDEX / GET_PEER_COUNT
    // (`core/.../pipes/protocol/MessageType.java:26-29`) — so a
    // COMMUNICATING BSP program (the reference's own TestPipes matrix
    // examples) can port. Engine mapping: the `plans.Bsp` peer engine
    // hosts the supersteps — each peer's [[MsgSumChild]] runs one
    // driveLoop exchange per superstep, its SEND_MSG emissions surface
    // through `onSend`, the Bsp loop SHUFFLES them by destination
    // between barriers (the engine's message exchange IS the delivery),
    // and the target peer's next exchange serves them via
    // GET_MSG/GET_MSG_COUNT. The program is the PiEstimator
    // master-collect shape (`examples/.../PiEstimator.java:55-95`):
    // 8 peers each send their input partial (exact pennies — longs, so
    // the sum is order-independent) to peer 0, which drains its inbox
    // next superstep and WRITEs the total. Asserted in-row: all 8
    // peers sent from ≥2 distinct shuffle partitions (the exchange
    // really crossed partitions), and the master's child counted 8
    // messages with 8 DISTINCT peer-index stamps — each sender stamped
    // its payload with its OpPeerInfo answer, so the introspection
    // opcode is load-bearing. Every child also pulls the FULL peer
    // roster (GET_ALL_PEERNAME, VERDICT r13 #4) and dies loudly unless
    // it is exactly [0, count); the master stamps that check into its
    // write and the row requires it. Oracle: the same total from the
    // raw rows. The cross_partition column is the MEASURED gate value
    // (parallelism == 1 || ≥2 distinct partitions — ADVICE r13 low),
    // not an unconditional literal.
    Q("q_udf_pipe_messaging",
      (s, d) => {
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val nPeers = 8
        val cmd = childJvmCmd("graft.operators.MsgSumChild")
        // per-peer partial OUTSIDE the loop (the documented Bsp input
        // mapping: a Hama peer's input split summarizes into its
        // initial state), in exact pennies so double addition order
        // cannot move the total
        val peers = peerPartials(s, d, nPeers)
        // at-least-once accumulators: keyed by peer, deduped driver-side
        val sendParts =
          s.sparkContext.collectionAccumulator[(Long, Int)]("msgSendPartitions")
        val masterStats =
          s.sparkContext
            .collectionAccumulator[(Long, (Long, Int, Int, Int))]("msgMasterStats")
        val fin = graft.plans.Bsp.run[Long, Array[Byte]](
            s, peers, maxSupersteps = 4) { (idx, state, inbox, step) =>
          val w = WorkerPool.get(cmd)
          val sends = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
          var written: Option[Array[Byte]] = None
          val records = // superstep 0 feeds the peer's partial as a record
            if (step == 0)
              Iterator(java.nio.ByteBuffer.allocate(8).putLong(state).array())
            else Iterator.empty
          w.driveLoop(records, inbox = inbox, peer = (idx.toInt, nPeers))(
            rec => written = Some(rec),
            onSend = (dst, payload) => sends += ((dst, payload)))
          if (sends.nonEmpty)
            sendParts.add((idx, org.apache.spark.TaskContext.getPartitionId()))
          val newState = written match {
            case Some(b) => // master: [8B total][4B senders][4B msgs][1B roster]
              val bb = java.nio.ByteBuffer.wrap(b)
              val total = bb.getLong
              masterStats.add((idx, (total, bb.getInt, bb.getInt, bb.get().toInt)))
              total
            case None => state
          }
          graft.plans.Bsp.PeerResult(newState, sends.toSeq, halt = true)
        }
        val finStates = fin.collect().toMap
        val sp = sendParts.value.asScala.toSet
        require(sp.map(_._1).size == nPeers,
          s"every peer must have sent its partial, saw ${sp.map(_._1).size}")
        // gated on the session's parallelism: a local[1] engine runs all
        // peers in one partition, which is legal — the cross-partition
        // claim is only checkable when partitions exist to cross
        // (review r13 #3); the emitted column carries the MEASURED gate
        // value, so a skipped check can never read as a verified one
        // (ADVICE r13 low)
        val crossOk = s.sparkContext.defaultParallelism == 1 ||
          sp.map(_._2).size >= 2
        require(crossOk,
          s"the exchange must cross shuffle partitions, " +
            s"saw ${sp.map(_._2).size} distinct partition ids")
        val (mTotal, mSenders, mMsgs, mRoster) =
          masterStats.value.asScala.toMap.apply(0L)
        require(mSenders == nPeers && mMsgs == nPeers,
          s"master must have drained $nPeers messages with $nPeers distinct " +
            s"peer-index stamps, saw $mMsgs msgs / $mSenders stamps")
        require(mRoster == 1,
          "the master's GET_ALL_PEERNAME roster must name every peer")
        require(finStates(0L) == mTotal,
          "the master's state must carry the child-written total")
        Seq((mTotal, nPeers.toLong, mSenders.toLong))
          .toDF("total_cents", "n_partials", "distinct_senders")
          .withColumn("cross_partition", lit(crossOk))
          .withColumn("all_peers_listed", lit(mRoster == 1))
      },
      Some("""SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                AS total_cents,
                CAST(8 AS BIGINT) AS n_partials,
                CAST(8 AS BIGINT) AS distinct_senders,
                true AS cross_partition,
                true AS all_peers_listed
              FROM customer"""))
    ,

    // RING exchange — the GENERAL peer-to-peer shape beside
    // q_udf_pipe_messaging's master-collect (the reference's TestPipes
    // matrix programs communicate peer-to-peer, not hub-and-spoke):
    // every [[RingShiftChild]] sends its partial to its RIGHT NEIGHBOR
    // (idx + 1) % n — 8 distinct (src → dst) routes through the Bsp
    // delivery shuffle, none to a single hub — and next superstep each
    // peer WRITEs the one message it received, stamped with the sender
    // index. The output is PER-PEER (8 rows), so the oracle checks the
    // whole routing table value by value: peer p must hold exactly peer
    // (p+7)%8's partial. Exact pennies again so the sums are
    // order-independent.
    Q("q_udf_pipe_ring",
      (s, d) => {
        import s.implicits._
        val nPeers = 8
        val cmd = childJvmCmd("graft.operators.RingShiftChild")
        val partials = peerPartials(s, d, nPeers)
        // a ring needs every seat occupied: an empty residue class would
        // leave its right neighbor without a sender AND trip the
        // routing-table require below — state the precondition up front
        // (the gate corpora populate all 8 classes at every SF)
        require(partials.count() == nPeers,
          s"q_udf_pipe_ring needs all $nPeers c_custkey residue classes populated")
        val peers = partials
          .map { case (p, c) => (p, (c, -1L)) } // state: (held cents, from)
        val fin = graft.plans.Bsp.run[(Long, Long), Array[Byte]](
            s, peers, maxSupersteps = 4) { (idx, state, inbox, step) =>
          val w = WorkerPool.get(cmd)
          val sends = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
          var written: Option[Array[Byte]] = None
          val records =
            if (step == 0)
              Iterator(java.nio.ByteBuffer.allocate(8).putLong(state._1).array())
            else Iterator.empty
          w.driveLoop(records, inbox = inbox, peer = (idx.toInt, nPeers),
              superstep = step.toLong)( // the child BRANCHES on this —
            // GET_SUPERSTEP_COUNT is load-bearing, not decorative
            rec => written = Some(rec),
            onSend = (dst, payload) => sends += ((dst, payload)))
          val newState = written match {
            case Some(b) => // [8B received partial][4B sender index]
              val bb = java.nio.ByteBuffer.wrap(b)
              (bb.getLong, bb.getInt.toLong)
            case None => state
          }
          graft.plans.Bsp.PeerResult(newState, sends.toSeq, halt = true)
        }
        val rows = fin.collect().toSeq.sortBy(_._1)
        require(rows.size == nPeers && rows.forall(_._2._2 >= 0L),
          "every ring peer must have received exactly one neighbor message")
        rows.map { case (p, (cents, from)) => (p, from, cents) }
          .toDF("peer", "from_peer", "received_cents")
          .orderBy("peer")
      },
      Some("""WITH part AS (SELECT c_custkey % 8 AS peer,
                  SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS cents
                FROM customer GROUP BY 1)
              SELECT CAST(p.peer AS BIGINT) AS peer,
                CAST((p.peer + 7) % 8 AS BIGINT) AS from_peer,
                CAST(l.cents AS BIGINT) AS received_cents
              FROM part p JOIN part l ON l.peer = (p.peer + 7) % 8
              ORDER BY peer""")),

    // TWO-PASS pipes input (REOPEN_INPUT, `MessageType.java:25-32`
    // code 17 — the last uncovered IO opcode): min-max normalization,
    // count-then-sample and friends need the split TWICE, so the
    // reference lets the child rewind its input. Engine mapping: the
    // caller opts in with `reopenable = true` — the parent then
    // RETAINS the exchange's served records, in memory up to the
    // `spark.graft.pipes.reopenSpillBytes` bound and in a framed side
    // file past it (VERDICT r13 #1: the r13 version buffered the whole
    // exchange in executor heap; the reference's reopenInput()
    // re-reads the split from STORAGE, `BSPPeerImpl.java:657-659`, so
    // replay memory is now O(spill bound) at any exchange size).
    // Un-opted exchanges stay O(1)-streaming and a child's REOPEN
    // fails loudly. One exchange per DETERMINISTIC group (groupByKey →
    // mapGroups), so the per-group output is partition-layout-
    // independent and fully oracle-checkable: [[TwoPassSumChild]] sums
    // the group's exact-penny records, REOPENs, re-sums and counts,
    // and the row REQUIRES pass-1 == pass-2 — true only if the replay
    // served the identical records.
    Q("q_udf_pipe_reopen",
      (s, d) => {
        import s.implicits._
        val nGrp = 8
        val cmd = childJvmCmd("graft.operators.TwoPassSumChild")
        val spill = graft.GraftConf.reopenSpillBytes // driver-side read
        Tables(s, d, "customer")
          .select(pmod(col("c_custkey"), lit(nGrp)).cast("long").as("grp"),
            expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").as("cents"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .mapGroups { (grp, it) =>
            val w = WorkerPool.get(cmd)
            var out: Array[Byte] = null
            w.driveLoop(
                it.map(t => java.nio.ByteBuffer.allocate(8).putLong(t._2).array()),
                reopenable = true, reopenSpillBytes = spill)(rec => out = rec): Unit
            val bb = java.nio.ByteBuffer.wrap(out)
            val (s1, s2, n) = (bb.getLong, bb.getLong, bb.getLong)
            require(s1 == s2,
              s"REOPEN replay must serve identical records: $s1 != $s2")
            (grp, s1, n)
          }
          .toDF("grp", "total_cents", "n")
          .withColumn("replay_exact", lit(true))
          .orderBy("grp")
      },
      Some("""SELECT CAST(c_custkey % 8 AS BIGINT) AS grp,
                CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                  AS total_cents,
                COUNT(*) AS n, true AS replay_exact
              FROM customer GROUP BY 1 ORDER BY grp""")),

    // SIDE-FILE pipes (VERDICT r12 missing #3 — the last uncovered
    // MessageType family): a reference pipes child does record-file IO
    // through the parent — SEQFILE_OPEN / SEQFILE_READNEXT /
    // SEQFILE_APPEND / SEQFILE_CLOSE (`MessageType.java:25-28`, codes
    // 25-28) — so a program that stages intermediate results in side
    // files can port. Two supersteps per partition through ONE
    // persistent [[SeqSideChild]]: the produce phase pulls every input
    // record (READ_NEXT), upper-cases it, and APPENDs it to a
    // per-partition side file (closing through the parent for the
    // durability ack); the consume phase re-OPENs the same path and
    // READNEXTs it back, counting. The side files then load as a
    // DataFrame via a binaryFile scan + the framed-record parser — the
    // engine reads what the child wrote, no driver-side collect.
    // Asserted in-row (retry-safe per-pid folds): the child pulled the
    // whole corpus, appended exactly that many records, and read the
    // same count back. On local[n] the side path is executor-local temp;
    // a cluster deployment passes a shared-filesystem path, exactly the
    // reference's HDFS-backed sequence files. Oracle shared with
    // q_udf_pipe: the side files' contents are the upper-cased corpus.
    Q("q_udf_pipe_seqfile",
      (s, d) => {
        import s.implicits._
        import scala.jdk.CollectionConverters._
        val cmd = childJvmCmd("graft.operators.SeqSideChild")
        val sideDir = tmp("graft-seqside")
        // stale side files from an earlier run in this JVM (possibly at
        // another SF, hence another partition count) must not pollute
        // the read-back
        val sd = new java.io.File(sideDir)
        Option(sd.listFiles()).foreach(_.foreach(_.delete()))
        sd.mkdirs(): Unit
        val wTotals =
          s.sparkContext.collectionAccumulator[(Int, Long)]("seqSideWrote")
        val rTotals =
          s.sparkContext.collectionAccumulator[(Int, Long)]("seqSideReadBack")
        def startFrame(phase: Char, path: String): Array[Byte] =
          phase.toByte +: path.getBytes("UTF-8")
        Tables(s, d, "customer")
          .select(lower(col("c_mktsegment")).as("seg")).as[String]
          .mapPartitions { it =>
            val w = WorkerPool.get(cmd)
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val path = s"$sideDir/part-$pid.seq"
            var wrote = 0L
            var readBack = 0L
            w.driveLoop(it.map(_.getBytes("UTF-8")),
                start = startFrame('w', path))(
              _ => sys.error("the produce phase emits only to the side file"),
              (name, dl) => if (name == "records") wrote += dl): Unit
            w.driveLoop(Iterator.empty, start = startFrame('r', path))(
              _ => sys.error("the consume phase only counts"),
              (name, dl) => if (name == "side_records") readBack += dl): Unit
            wTotals.add((pid, wrote))
            rTotals.add((pid, readBack))
            Iterator.single(pid)
          }
          .toDF("pid").localCheckpoint(): Unit // run the two phases
        val wrote = wTotals.value.asScala.toSeq
          .groupBy(_._1).values.map(_.head._2).sum
        val readBack = rTotals.value.asScala.toSeq
          .groupBy(_._1).values.map(_.head._2).sum
        val expected = Tables(s, d, "customer").count()
        require(wrote == expected,
          s"the child must append every record it pulled: $wrote != $expected")
        require(readBack == wrote,
          s"SEQFILE_READNEXT must replay every appended record: " +
            s"$readBack != $wrote")
        s.read.format("binaryFile").load(s"$sideDir/part-*.seq")
          .select(col("content")).as[Array[Byte]]
          .flatMap(bytes => WorkerPool.readFramedRecords(bytes)
            .map(new String(_, "UTF-8")))
          .toDF("seg")
          .groupBy("seg").agg(count(lit(1)).as("n"))
          .withColumn("side_file_roundtrip", lit(true))
          .orderBy("seg")
      },
      Some("""SELECT c_mktsegment AS seg, COUNT(*) AS n,
                true AS side_file_roundtrip
              FROM customer GROUP BY seg ORDER BY seg"""))
  )

  /** Per-peer exact-penny customer partials — ONE derivation shared by
    * the communicating-pipes rows (master-collect and ring) so the peer
    * assignment and the cents rounding can never drift between them
    * (and their oracle SQL mirrors this expression verbatim). Longs, so
    * the downstream sums are addition-order-independent. */
  private def peerPartials(s: SparkSession, d: String, nPeers: Int)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import s.implicits._
    Tables(s, d, "customer")
      .select(pmod(col("c_custkey"), lit(nPeers)).cast("long").as("peer"),
        expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").as("cents"))
      .groupBy("peer").agg(sum("cents").as("cents"))
      .as[(Long, Long)]
  }

  /** Command line for [[FrameSumChild]] as a child JVM: the current
    * JVM's own java binary, a classpath of just the engine classes and
    * the scala library (resolved from their code sources — correct under
    * sbt's layered classloaders, where java.class.path is only the
    * launcher). */
  private[graft] def framedChildCmd: Seq[String] =
    childJvmCmd("graft.operators.FrameSumChild")

  private[graft] def statsChildCmd: Seq[String] =
    childJvmCmd("graft.operators.FrameStatsChild")

  /** The Python batched-frames child (q_udf_pipe_python_batched): the
    * full READ_BATCH/WRITE_BATCH + counter + response protocol in
    * ~25 lines of struct-packed stdio — the wire format's portability
    * IS the claim, so the whole foreign side sits here in plain view.
    * Opcode bytes mirror [[WorkerPool]]: 15 READ_BATCH, 16
    * WRITE_BATCH, 1 INCR_COUNTER, 0 RESPONSE. */
  private[graft] val pythonBatchChild: String =
    """import sys, struct
      |inp = sys.stdin.buffer
      |out = sys.stdout.buffer
      |def recv():
      |    hdr = inp.read(4)
      |    if len(hdr) < 4:
      |        sys.exit(0)
      |    n = struct.unpack('>i', hdr)[0]
      |    p = inp.read(n)
      |    if len(p) != n:
      |        raise IOError('truncated frame')
      |    return p
      |def send(op, payload):
      |    out.write(struct.pack('>i', len(payload) + 1) + bytes([op]) + payload)
      |    out.flush()
      |while True:
      |    start = recv()
      |    bn = struct.unpack('>i', start[:4])[0] if len(start) >= 4 else 64
      |    if bn <= 0:
      |        bn = 64
      |    recs = 0
      |    frames = 0
      |    while True:
      |        send(15, struct.pack('>i', bn))
      |        reply = recv()
      |        frames += 1
      |        n = struct.unpack('>i', reply[:4])[0]
      |        if n == 0:
      |            break
      |        recs += n
      |        parts = [struct.pack('>i', n)]
      |        off = 4
      |        for _ in range(n):
      |            ln = struct.unpack('>i', reply[off:off+4])[0]
      |            r = reply[off+4:off+4+ln].decode('utf-8').upper().encode('utf-8')
      |            parts.append(struct.pack('>i', len(r)) + r)
      |            off += 4 + ln
      |        send(16, b''.join(parts))
      |    send(1, struct.pack('>q', recs) + b'records')
      |    send(1, struct.pack('>q', frames) + b'frames')
      |    send(0, b'')
      |""".stripMargin

  private[graft] def childJvmCmd(mainClass: String): Seq[String] = {
    def src(c: Class[_]): String =
      new java.io.File(c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val javaBin = ProcessHandle.current().info().command()
      .orElse(System.getProperty("java.home") + "/bin/java")
    val cp = Seq(src(FrameSumChild.getClass), src(classOf[scala.Option[_]]))
      .distinct.mkString(java.io.File.pathSeparator)
    Seq(javaBin, "-Xmx256m", "-cp", cp, mainClass)
  }
}
