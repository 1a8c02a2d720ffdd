package graft.operators

/** Long-lived per-executor worker process for foreign-language UDFs —
  * the Spark analogue of Hama Pipes' persistent child: the reference
  * launches ONE external process per peer and keeps it alive across
  * every superstep, speaking a framed request/response protocol over
  * its pipes (`core/src/main/java/org/apache/hama/pipes/protocol/
  * BinaryProtocol.java:50`, opcodes `MessageType.java:25-32`), where
  * `RDD.pipe` forks a fresh child per partition per job (q_udf_pipe).
  *
  * Mapping: one child per EXECUTOR JVM per command (the pool is a
  * JVM-static singleton), reused by every task of every stage/job that
  * schedules onto the executor — exactly the per-peer lifetime. Two
  * protocols over the same pipe pair, matching the reference's two
  * transports:
  *   - [[Worker.call]] — line mode: one UTF-8 request line in, exactly
  *     one response line out (a line-buffered filter — `sed -u`,
  *     `python3 -u`, any unbuffered REPL — slots in as the worker);
  *   - [[Worker.callFrame]] — binary mode: 4-byte big-endian length +
  *     payload, both directions (`BinaryProtocol.java`'s length-framed
  *     stream). Payloads may contain newlines and arbitrary bytes —
  *     embeddings, image blobs — which the line protocol cannot carry.
  *
  * Scale posture: tasks sharing an executor serialize through the
  * child's pipe, like compute calls serialize through Hama's single
  * peer-attached process — per-executor throughput is the child's;
  * total throughput scales with executor count, and the JVM never
  * pays a fork per partition. Crashed children are respawned on next
  * acquisition (the reference's task-retry analogue) with the dead
  * worker's streams closed, not leaked; all children die with the JVM
  * via shutdown hook.
  */
object WorkerPool {

  /** refuse absurd response frames before allocating for them — a
    * desynced child (or one speaking the line protocol by mistake)
    * yields a garbage length, not an OOM */
  private val MaxFrameBytes: Int = 64 << 20

  /** Child→parent opcodes for [[Worker.callFrameOps]] — the engine's
    * rendering of the reference's child-initiated message surface
    * (`MessageType.java:25-32`): the child terminates each exchange
    * with RESPONSE and may interleave counter/log traffic before it. */
  val OpResponse: Byte = 0
  val OpIncrCounter: Byte = 1
  val OpLog: Byte = 2
  val OpReadNext: Byte = 3 // child PULLS its next input record
  val OpWrite: Byte = 4 // child EMITS an output record (0..n per input)
  // PEER-MESSAGING opcodes — the reference's SEND_MSG / GET_MSG /
  // GET_MSG_COUNT surface (`MessageType.java:26-28`) plus the peer
  // introspection pair GET_PEER_INDEX / GET_PEER_COUNT (`:28-29`): a
  // communicating pipes BSP program addresses output to a PEER, the
  // engine shuffles the emissions between chunk barriers (the SYNC
  // analogue), and the next superstep's exchange delivers them to the
  // target peer's child.
  val OpSendMsg: Byte = 5 // child EMITS [8B dst peer][payload] (one-way)
  val OpGetMsg: Byte = 6 // child PULLS next inbox message ([1][msg] / [0])
  val OpGetMsgCount: Byte = 7 // parent answers [8B remaining-inbox count]
  val OpPeerInfo: Byte = 8 // parent answers [4B peer index][4B peer count]
  // SIDE-FILE opcodes — the reference's SEQFILE_OPEN / SEQFILE_READNEXT
  // / SEQFILE_APPEND / SEQFILE_CLOSE (`MessageType.java:25-28` codes
  // 25-28): a pipes child reads and writes record side files through
  // the parent instead of touching the filesystem itself. The engine's
  // side-file format is a flat stream of 4-byte big-endian
  // length-prefixed records ([[readFramedRecords]] parses one back),
  // so a child-written side file is directly loadable as a DataFrame
  // via a binaryFile scan. Handles are per-child and close with it.
  val OpSeqOpen: Byte = 9 // [1B mode 'r'|'w'][UTF-8 path] → [4B handle]
  val OpSeqRead: Byte = 10 // [4B handle] → [1][record] / [0] at EOF
  val OpSeqAppend: Byte = 11 // [4B handle][record] (one-way)
  val OpSeqClose: Byte = 12 // [4B handle] → empty ack
  // the reference's GET_SUPERSTEP_COUNT (`MessageType.java:25-32` code
  // 16): a BSP program branches its ALGORITHM on the superstep — parent
  // answers the exchange's superstep number as 8 bytes (-1 when the
  // caller runs outside a superstep loop)
  val OpSuperstep: Byte = 13
  // the reference's REOPEN_INPUT (`MessageType.java:25-32` code 17): a
  // TWO-PASS child re-reads its input split from the start (min-max
  // then normalize, count then sample, ...). Parent acks with an empty
  // frame and replays the exchange's records — ONLY when the caller
  // opted in with `reopenable = true` (replay requires buffering the
  // served records, O(chunk) parent memory; an un-opted caller streams
  // in O(1) and a child's REOPEN fails loudly instead of silently
  // serving nothing).
  val OpReopen: Byte = 14
  // BATCHED record loop (VERDICT r13 #2): the reference's answer to
  // per-record messaging cost is BUNDLING — `BSPMessageBundle` byte-
  // packs many messages per transfer (`core/.../bsp/BSPMessageBundle
  // .java`, applied per destination at `OutgoingPOJOMessageBundle
  // .java:59`). One READ_BATCH frame asks for up to maxN records and
  // is answered with ONE frame carrying all of them length-prefixed;
  // one WRITE_BATCH frame emits many outputs. The per-frame syscall +
  // wakeup cost (the ~47 µs/record floor PipesScale measured) divides
  // across the batch; the record stream semantics are UNCHANGED —
  // batched and unbatched reads share one cursor (and one replay
  // buffer), so a child may mix them.
  val OpReadBatch: Byte = 15 // [4B maxN] → [4B n][n × (4B len + bytes)]
  val OpWriteBatch: Byte = 16 // child emits [4B n][n × (4B len + bytes)]
  // the reference's GET_ALL_PEERNAME (`MessageType.java` code 12,
  // `UplinkReader.java:289-291` answers the full peer-name list): in
  // graft's index-keyed topology peer names ARE indices, so the frame
  // is the index list — [4B count][count × 4B index]
  val OpAllPeers: Byte = 17
  // the reference's CLEAR (`MessageType.java` code 18): drop the
  // peer's remaining local message queue. One-way, like SEND_MSG — the
  // pipe's ordering makes the drop visible to the child's next
  // GET_MSG/GET_MSG_COUNT without an ack round trip.
  val OpClear: Byte = 18

  /** Default byte bound past which a REOPEN-able exchange's replay
    * buffer spills to a framed side file (VERDICT r13 #1): 8 MB keeps
    * gate-scale exchanges in memory while bounding executor heap at
    * O(spillBound) for any exchange size. Session-tunable via
    * `spark.graft.pipes.reopenSpillBytes` ([[graft.GraftConf]]). */
  val defaultReopenSpillBytes: Long = 8L << 20

  /** Replay store for REOPEN-able exchanges (VERDICT r13 #1): served
    * records buffer in memory only up to `spillBytes`; past that the
    * buffered prefix (and everything after) streams into a framed temp
    * side file — [[readFramedRecords]]' on-disk format — and replays
    * re-read it from STORAGE. Executor heap is O(min(exchange,
    * spillBytes)) at any exchange size: the reference's reopenInput()
    * re-initializes the record reader over the split
    * (`core/.../bsp/BSPPeerImpl.java:657-659` — replay against
    * storage, not memory), and this is the engine's rendering of the
    * same contract. Records are defensively copied on append
    * (iterators commonly refill ONE scratch buffer per next()). */
  private final class ReplayStore(spillBytes: Long) {
    private val mem = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    private var memBytes = 0L
    // Long counters: the spill path exists precisely so an exchange can
    // exceed memory — at 100 TB it can exceed Int too (review r14 #1);
    // only the in-memory suffix is Int-indexed, and that region is
    // bounded by spillBytes/4 records (each append adds >= 4 tracked
    // bytes), far inside Int range for any sane bound
    private var nSpilled = 0L
    private var spillFile: java.io.File = null
    private var out: java.io.DataOutputStream = null
    private var in: java.io.DataInputStream = null
    private var inAt = 0L // record index `in` returns next
    private var total = 0L
    private var cursor = 0L // next index to serve; == total when live

    def append(r: Array[Byte]): Unit = {
      val c = java.util.Arrays.copyOf(r, r.length)
      mem += c
      memBytes += c.length + 4L
      total += 1
      cursor += 1
      if (memBytes > spillBytes) spill()
    }

    private def spill(): Unit = {
      if (out == null) {
        spillFile = java.io.File.createTempFile("graft-reopen-", ".seq")
        out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(spillFile)))
      }
      mem.foreach { r => out.writeInt(r.length); out.write(r) }
      out.flush() // a replay reader may open the file any time after
      nSpilled += mem.length
      mem.clear()
      memBytes = 0L
    }

    def rewind(): Unit = { cursor = 0; closeIn() }

    /** Next replayed record; null once the replay caught up to live. */
    def nextReplay(): Array[Byte] =
      if (cursor >= total) null
      else {
        val r =
          if (cursor < nSpilled) {
            if (in == null) { // rewind closed any prior reader
              in = new java.io.DataInputStream(new java.io.BufferedInputStream(
                new java.io.FileInputStream(spillFile)))
              inAt = 0
            }
            // replay is strictly sequential from 0, so the open reader
            // is always positioned at the cursor
            require(inAt == cursor, s"replay reader desync: $inAt != $cursor")
            val n = in.readInt()
            val b = in.readNBytes(n)
            require(b.length == n, s"truncated replay spill at record $cursor")
            inAt += 1
            b
          } else mem((cursor - nSpilled).toInt) // bounded: see counter note
        cursor += 1
        r
      }

    private def closeIn(): Unit = if (in != null) { in.close(); in = null }

    def close(): Unit = {
      closeIn()
      if (out != null) out.close()
      if (spillFile != null) spillFile.delete(): Unit
    }
  }

  /** Parse one framed side file (the SEQFILE analogue's on-disk form)
    * back into its records — the read half of the contract, used by the
    * declared row's Spark-side load of child-written side files. */
  def readFramedRecords(bytes: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var off = 0
      def hasNext: Boolean = off + 4 <= bytes.length
      def next(): Array[Byte] = {
        val n = java.nio.ByteBuffer.wrap(bytes, off, 4).getInt
        require(n >= 0 && off + 4 + n <= bytes.length,
          s"corrupt framed side file: record length $n at offset $off")
        val r = java.util.Arrays.copyOfRange(bytes, off + 4, off + 4 + n)
        off += 4 + n
        r
      }
    }

  final class Worker private[WorkerPool] (cmd: Seq[String]) {
    private val proc = new ProcessBuilder(cmd: _*)
      .redirectError(ProcessBuilder.Redirect.INHERIT).start()
    private val toChild = new java.io.BufferedOutputStream(proc.getOutputStream)
    private val fromChild = new java.io.BufferedInputStream(proc.getInputStream)
    val pid: Long = proc.pid()

    // SEQFILE side-file handles (the reference keeps them per task,
    // `BinaryProtocol.java` seqFile maps): per-child, guarded by the
    // call monitor, all closed when the worker dies
    private var nextSeqHandle = 0
    private val seqReaders =
      scala.collection.mutable.Map.empty[Int, java.io.DataInputStream]
    private val seqWriters =
      scala.collection.mutable.Map.empty[Int, java.io.DataOutputStream]

    /** serve one SEQFILE opcode frame; false if `f` is not one */
    private def serveSeqOp(f: Array[Byte]): Boolean = f(0) match {
      case OpSeqOpen =>
        require(f.length >= 2, s"worker (pid $pid) sent a bare SEQFILE_OPEN")
        val path = new String(f, 2, f.length - 2, "UTF-8")
        val h = nextSeqHandle
        nextSeqHandle += 1
        f(1).toChar match {
          case 'r' => seqReaders(h) = new java.io.DataInputStream(
            new java.io.BufferedInputStream(new java.io.FileInputStream(path)))
          case 'w' =>
            Option(new java.io.File(path).getParentFile).foreach(_.mkdirs())
            seqWriters(h) = new java.io.DataOutputStream(
              new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
          case m => sys.error(s"worker (pid $pid) sent SEQFILE_OPEN mode '$m'")
        }
        writeFrame(java.nio.ByteBuffer.allocate(4).putInt(h).array())
        true
      case OpSeqRead =>
        require(f.length >= 5, s"worker (pid $pid) sent a bare SEQFILE_READNEXT")
        val h = java.nio.ByteBuffer.wrap(f, 1, 4).getInt
        val in = seqReaders.getOrElse(h,
          sys.error(s"worker (pid $pid) read from unknown seq handle $h"))
        val lenBytes = in.readNBytes(4)
        if (lenBytes.length < 4) writeFrame(Array[Byte](0)) // EOF
        else {
          val n = java.nio.ByteBuffer.wrap(lenBytes).getInt
          require(n >= 0 && n <= MaxFrameBytes,
            s"corrupt side file: record length $n on handle $h")
          val rec = in.readNBytes(n)
          require(rec.length == n, s"truncated side file on handle $h")
          val buf = new Array[Byte](n + 1)
          buf(0) = 1
          System.arraycopy(rec, 0, buf, 1, n)
          writeFrame(buf)
        }
        true
      case OpSeqAppend =>
        // validate BEFORE touching the file: a malformed frame must fail
        // the exchange, never poison the side file with a bad header
        require(f.length >= 5, s"worker (pid $pid) sent a bare SEQFILE_APPEND")
        val h = java.nio.ByteBuffer.wrap(f, 1, 4).getInt
        val out = seqWriters.getOrElse(h,
          sys.error(s"worker (pid $pid) appended to unknown seq handle $h"))
        out.writeInt(f.length - 5)
        out.write(f, 5, f.length - 5)
        true
      case OpSeqClose =>
        require(f.length >= 5, s"worker (pid $pid) sent a bare SEQFILE_CLOSE")
        val h = java.nio.ByteBuffer.wrap(f, 1, 4).getInt
        seqReaders.remove(h).foreach(_.close())
        seqWriters.remove(h).foreach(_.close())
        writeFrame(Array.emptyByteArray) // ack: the side file is durable
        true
      case _ => false
    }

    // destroy() is asynchronous (SIGTERM) — a pool lookup racing the
    // kill could still see isAlive and hand out the poisoned child, so
    // brokenness is tracked explicitly
    @volatile private var broken = false
    private[WorkerPool] def alive: Boolean = !broken && proc.isAlive

    /** An exchange that dies mid-protocol (a require, a callback
      * throwing, an unwired onSend) leaves unread frames in the pipe of
      * a child that is still ALIVE — and `get` only respawns dead
      * workers, so the failed task's RETRY would silently consume the
      * aborted exchange's stale frames instead of its own. Any abnormal
      * exit therefore kills the child: the retry acquires a respawned
      * one and a clean protocol (review r13 #1). */
    private def orDestroy[T](body: => T): T =
      try body catch { case e: Throwable => destroy(); throw e }

    /** one request line → one response line; synchronized because every
      * task on this executor shares the single child (the per-peer
      * contract — see the scale-posture note above) */
    def call(line: String): String = synchronized { orDestroy {
      toChild.write(line.getBytes("UTF-8"))
      toChild.write('\n'); toChild.flush()
      val buf = new java.io.ByteArrayOutputStream(64)
      var b = fromChild.read()
      require(b != -1,
        s"worker '${cmd.mkString(" ")}' (pid $pid) closed its pipe mid-protocol" +
          " — the failed task's retry acquires a respawned child")
      while (b != -1 && b != '\n') { buf.write(b); b = fromChild.read() }
      new String(buf.toByteArray, "UTF-8")
    } }

    /** one length-prefixed request frame → one length-prefixed response
      * frame (4-byte big-endian length + payload, both ways). The frame
      * and line protocols share the stream pair, so a worker may mix
      * them — each call holds the monitor for its full round trip. */
    def callFrame(payload: Array[Byte]): Array[Byte] = synchronized { orDestroy {
      val hdr = java.nio.ByteBuffer.allocate(4).putInt(payload.length).array()
      toChild.write(hdr); toChild.write(payload); toChild.flush()
      readFrame()
    } }

    /** CHILD-INITIATED opcodes (the reference's pipes children drive
      * their own side of the protocol — INCR_COUNTER, LOG and friends,
      * `core/.../pipes/protocol/MessageType.java:25-32` — not just
      * answer): the request goes out as a plain frame, and the child
      * replies with a SEQUENCE of opcode frames (first payload byte =
      * opcode) — any number of
      *   [[WorkerPool.OpIncrCounter]] (8-byte big-endian delta + UTF-8
      *   counter name) and [[WorkerPool.OpLog]] (UTF-8 message) frames,
      * terminated by exactly one [[WorkerPool.OpResponse]] carrying the
      * result. Counter increments surface through `onCounter` — the
      * caller wires them to a Spark accumulator, the engine analogue of
      * the reference's counter RPC. An unknown opcode is a protocol
      * desync and fails the task loudly. */
    def callFrameOps(payload: Array[Byte])(
        onCounter: (String, Long) => Unit,
        onLog: String => Unit = _ => ()): Array[Byte] = synchronized { orDestroy {
      val hdr = java.nio.ByteBuffer.allocate(4).putInt(payload.length).array()
      toChild.write(hdr); toChild.write(payload); toChild.flush()
      var resp: Array[Byte] = null
      while (resp == null) {
        val f = readFrame()
        require(f.nonEmpty, s"worker (pid $pid) sent an empty opcode frame")
        f(0) match {
          case OpResponse => resp = java.util.Arrays.copyOfRange(f, 1, f.length)
          case OpIncrCounter =>
            require(f.length >= 9,
              s"worker (pid $pid) sent a ${f.length}-byte INCR_COUNTER frame")
            val delta = java.nio.ByteBuffer.wrap(f, 1, 8).getLong
            onCounter(new String(f, 9, f.length - 9, "UTF-8"), delta)
          case OpLog => onLog(new String(f, 1, f.length - 1, "UTF-8"))
          case x => sys.error(
            s"worker (pid $pid) sent unknown opcode $x — protocol desync")
        }
      }
      resp
    } }

    /** CHILD-DRIVEN record loop — the reference's READ_KEYVALUE /
      * WRITE_KEYVALUE surface (`MessageType.java:25-32`), where the
      * child OWNS the IO loop instead of answering one request at a
      * time: the parent opens the exchange with one start frame, then
      * SERVES the child — each [[WorkerPool.OpReadNext]] is answered
      * with `[1][record]` or `[0]` at end-of-input, each
      * [[WorkerPool.OpWrite]] surfaces through `onWrite` (a child may
      * emit zero or many outputs per input), counters/logs interleave
      * as usual — until the child closes the exchange with RESPONSE.
      * One call = one barrier-delimited chunk (the SYNC analogue: a
      * caller streams a partition as bounded chunks, each exchange a
      * superstep, so parent-side memory is O(chunk), not O(partition)).
      *
      * PEER MESSAGING (the reference's communicating-BSP surface,
      * `MessageType.java:26-29`): `inbox` is the peer's messages from
      * the PREVIOUS superstep — the child drains them with
      * [[WorkerPool.OpGetMsg]] (and may size them first with
      * [[WorkerPool.OpGetMsgCount]], Hama's `getNumCurrentMessages`);
      * each [[WorkerPool.OpSendMsg]] the child emits surfaces through
      * `onSend(dstPeer, payload)` — the CALLER shuffles those by
      * destination between exchanges and feeds them to the target
      * peer's next `inbox` (the `plans.Bsp` engine is the natural
      * host). [[WorkerPool.OpPeerInfo]] answers `peer` — the child's
      * (index, count) in the exchange topology, Hama's
      * GET_PEER_INDEX / GET_PEER_COUNT. `onSend`'s default fails
      * loudly: a child that messages peers its caller never wired is
      * a lost message, not a no-op.
      *
      * BATCHED variants ([[WorkerPool.OpReadBatch]] /
      * [[WorkerPool.OpWriteBatch]]) move up to maxN length-prefixed
      * records per frame over the SAME cursor — the reference's
      * message-bundling answer to per-record transfer cost
      * (`BSPMessageBundle.java`); a child may mix batched and
      * single-record reads freely. [[WorkerPool.OpAllPeers]] answers
      * the full peer roster (indices — the engine's peer names);
      * [[WorkerPool.OpClear]] drops the remaining inbox, one-way.
      * REOPEN-able exchanges retain served records through a
      * [[ReplayStore]]: in-memory up to `reopenSpillBytes`, framed
      * side-file past it — O(spill bound) heap at any exchange size. */
    def driveLoop(records: Iterator[Array[Byte]],
        inbox: Seq[Array[Byte]] = Nil,
        peer: (Int, Int) = (-1, -1),
        superstep: Long = -1L,
        reopenable: Boolean = false,
        reopenSpillBytes: Long = WorkerPool.defaultReopenSpillBytes,
        start: Array[Byte] = Array.emptyByteArray)(
        onWrite: Array[Byte] => Unit,
        onCounter: (String, Long) => Unit = (_, _) => (),
        onLog: String => Unit = _ => (),
        onSend: (Long, Array[Byte]) => Unit = (dst, _) => sys.error(
          s"child sent a peer message (dst $dst) but the caller wired no onSend")
        ): Array[Byte] = synchronized { orDestroy {
      writeFrame(start) // start-of-chunk
      var msgs = inbox.iterator
      var remaining = inbox.size.toLong
      // REOPEN support: served records are retained ONLY under the
      // caller's opt-in, so a streaming caller keeps its O(1) parent
      // memory; retained records spill to a framed side file past
      // `reopenSpillBytes`, so an opted-in exchange is O(spill bound)
      // heap at ANY size — the reference replays from storage too
      // (VERDICT r13 #1)
      val seen = if (reopenable) new ReplayStore(reopenSpillBytes) else null
      try {
      // one record cursor shared by READ_NEXT and READ_BATCH: replay
      // first (after a REOPEN), then the live iterator
      def nextRecord(): Array[Byte] = {
        if (seen != null) {
          val rep = seen.nextReplay()
          if (rep != null) return rep
        }
        if (records.hasNext) {
          val r = records.next()
          if (seen != null) seen.append(r) // append copies defensively
          r
        } else null
      }
      var resp: Array[Byte] = null
      while (resp == null) {
        val f = readFrame()
        require(f.nonEmpty, s"worker (pid $pid) sent an empty opcode frame")
        f(0) match {
          case OpResponse => resp = java.util.Arrays.copyOfRange(f, 1, f.length)
          case OpReadNext =>
            val rec = nextRecord()
            if (rec != null) {
              val buf = new Array[Byte](rec.length + 1)
              buf(0) = 1
              System.arraycopy(rec, 0, buf, 1, rec.length)
              writeFrame(buf)
            } else writeFrame(Array[Byte](0))
          case OpReadBatch =>
            require(f.length >= 5,
              s"worker (pid $pid) sent a ${f.length}-byte READ_BATCH frame")
            val maxN = java.nio.ByteBuffer.wrap(f, 1, 4).getInt
            require(maxN > 0 && maxN <= (1 << 20),
              s"worker (pid $pid) asked for an implausible batch of $maxN")
            val buf = new java.io.ByteArrayOutputStream(4096)
            val dos = new java.io.DataOutputStream(buf)
            dos.writeInt(0) // count, patched below
            var n = 0
            var rec = nextRecord()
            while (rec != null) {
              dos.writeInt(rec.length)
              dos.write(rec)
              n += 1
              rec = if (n < maxN) nextRecord() else null
            }
            val bytes = buf.toByteArray
            java.nio.ByteBuffer.wrap(bytes).putInt(n): Unit
            writeFrame(bytes) // n == 0 is the end-of-input batch
          case OpWriteBatch =>
            require(f.length >= 5,
              s"worker (pid $pid) sent a ${f.length}-byte WRITE_BATCH frame")
            val cnt = java.nio.ByteBuffer.wrap(f, 1, 4).getInt
            require(cnt >= 0,
              s"worker (pid $pid) sent a WRITE_BATCH count of $cnt")
            var off = 5
            var i = 0
            while (i < cnt) {
              require(off + 4 <= f.length,
                s"worker (pid $pid) truncated WRITE_BATCH at record $i")
              val len = java.nio.ByteBuffer.wrap(f, off, 4).getInt
              require(len >= 0 && off + 4 + len <= f.length,
                s"worker (pid $pid) sent corrupt WRITE_BATCH length $len")
              onWrite(java.util.Arrays.copyOfRange(f, off + 4, off + 4 + len))
              off += 4 + len
              i += 1
            }
            require(off == f.length,
              s"worker (pid $pid) sent trailing bytes in a WRITE_BATCH frame")
          case OpReopen =>
            require(reopenable, s"worker (pid $pid) sent REOPEN_INPUT but " +
              "the caller did not opt in with reopenable=true")
            seen.rewind()
            writeFrame(Array.emptyByteArray) // ack: next read replays
          case OpWrite => onWrite(java.util.Arrays.copyOfRange(f, 1, f.length))
          case OpSendMsg =>
            require(f.length >= 9,
              s"worker (pid $pid) sent a ${f.length}-byte SEND_MSG frame")
            onSend(java.nio.ByteBuffer.wrap(f, 1, 8).getLong,
              java.util.Arrays.copyOfRange(f, 9, f.length))
          case OpGetMsg =>
            if (msgs.hasNext) {
              val m = msgs.next()
              remaining -= 1
              val buf = new Array[Byte](m.length + 1)
              buf(0) = 1
              System.arraycopy(m, 0, buf, 1, m.length)
              writeFrame(buf)
            } else writeFrame(Array[Byte](0))
          case OpGetMsgCount =>
            writeFrame(java.nio.ByteBuffer.allocate(8).putLong(remaining).array())
          case OpPeerInfo =>
            writeFrame(java.nio.ByteBuffer.allocate(8)
              .putInt(peer._1).putInt(peer._2).array())
          case OpAllPeers =>
            // names ARE indices in the engine's topology (MIGRATION.md):
            // the full roster is [0, count)
            val cnt = math.max(0, peer._2)
            val bb = java.nio.ByteBuffer.allocate(4 + 4 * cnt).putInt(cnt)
            (0 until cnt).foreach(bb.putInt(_))
            writeFrame(bb.array())
          case OpClear =>
            msgs = Iterator.empty
            remaining = 0L
          case OpSuperstep =>
            writeFrame(java.nio.ByteBuffer.allocate(8).putLong(superstep).array())
          case OpIncrCounter =>
            require(f.length >= 9,
              s"worker (pid $pid) sent a ${f.length}-byte INCR_COUNTER frame")
            val delta = java.nio.ByteBuffer.wrap(f, 1, 8).getLong
            onCounter(new String(f, 9, f.length - 9, "UTF-8"), delta)
          case OpLog => onLog(new String(f, 1, f.length - 1, "UTF-8"))
          case _ if serveSeqOp(f) => // SEQFILE family, answered in place
          case x => sys.error(
            s"worker (pid $pid) sent unknown opcode $x — protocol desync")
        }
      }
      resp
      } finally if (seen != null) seen.close() // spill file never leaks
    } }

    private def writeFrame(payload: Array[Byte]): Unit = {
      toChild.write(java.nio.ByteBuffer.allocate(4).putInt(payload.length).array())
      toChild.write(payload)
      toChild.flush()
    }

    private def readFrame(): Array[Byte] = {
      val respHdr = fromChild.readNBytes(4)
      require(respHdr.length == 4,
        s"worker '${cmd.mkString(" ")}' (pid $pid) closed its pipe mid-frame")
      val n = java.nio.ByteBuffer.wrap(respHdr).getInt
      require(n >= 0 && n <= MaxFrameBytes,
        s"worker (pid $pid) sent an implausible frame length $n — protocol desync")
      val resp = fromChild.readNBytes(n)
      require(resp.length == n,
        s"worker (pid $pid) truncated a $n-byte frame at ${resp.length}")
      resp
    }

    private[WorkerPool] def destroy(): Unit = {
      broken = true
      // close OUR ends of the pipes before killing the child: a worker
      // replaced while dead would otherwise leak its fds until GC
      try toChild.close() catch { case _: java.io.IOException => }
      try fromChild.close() catch { case _: java.io.IOException => }
      (seqReaders.values ++ seqWriters.values).foreach { s =>
        try s.close() catch { case _: java.io.IOException => }
      }
      seqReaders.clear(); seqWriters.clear()
      proc.destroy()
    }
  }

  private val pool = new java.util.concurrent.ConcurrentHashMap[String, Worker]()

  sys.addShutdownHook {
    pool.values().forEach(_.destroy())
  }

  /** The executor's persistent child for `cmd` — spawned on first
    * acquisition, reused for the JVM's lifetime, respawned if found
    * dead (a retried task must not inherit a broken pipe); the dead
    * worker's streams are closed on replacement. The pool key joins
    * argv on NUL — the one byte an argv element cannot contain. */
  def get(cmd: Seq[String]): Worker =
    pool.compute(cmd.mkString("\u0000"), (_, w) =>
      if (w != null && w.alive) w
      else { if (w != null) w.destroy(); new Worker(cmd) })
}
