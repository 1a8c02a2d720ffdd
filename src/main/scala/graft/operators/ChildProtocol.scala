package graft.operators

/** CHILD-side plumbing of the framed pipes protocol, shared by every
  * demo worker binary (review r13 #7 — the send/recv/ask/loop
  * boilerplate existed in five hand-synced copies; a protocol change
  * now lands once). The children ship in the engine jar, so
  * `Sources.childJvmCmd`'s classpath loads this object identically.
  *
  * Wire format (the parent side lives in [[WorkerPool.Worker]]):
  * 4-byte big-endian length + payload in both directions; child→parent
  * payloads lead with one opcode byte ([[WorkerPool]] constants),
  * parent→child answers are raw frames. */
object ChildProtocol {

  final class Conn {
    private val in = new java.io.BufferedInputStream(System.in)
    private val out = new java.io.BufferedOutputStream(System.out)

    /** one opcode frame child→parent (flushed — the parent may block on it) */
    def send(opcode: Byte, payload: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(5)
        .putInt(payload.length + 1).put(opcode).array())
      out.write(payload)
      out.flush()
    }

    /** one RAW frame child→parent (the opcode-less response of the
      * plain callFrame protocol) */
    def sendRaw(payload: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(payload.length).array())
      out.write(payload)
      out.flush()
    }

    /** one parent frame; exits 0 on a clean EOF at the frame boundary,
      * fails loudly on truncation */
    def recv(): Array[Byte] = {
      val hdr = in.readNBytes(4)
      if (hdr.length < 4) sys.exit(0) // parent closed mid-protocol
      val n = java.nio.ByteBuffer.wrap(hdr).getInt
      val p = in.readNBytes(n)
      if (p.length != n) sys.error(s"truncated frame: ${p.length} of $n")
      p
    }

    /** request/answer round trip for the pull opcodes (READ_NEXT,
      * GET_MSG, PEER_INFO, SEQFILE_*, ...) */
    def ask(opcode: Byte, payload: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
      send(opcode, payload); recv()
    }

    def counter(name: String, delta: Long): Unit = {
      val nb = name.getBytes("UTF-8")
      send(WorkerPool.OpIncrCounter,
        java.nio.ByteBuffer.allocate(8 + nb.length).putLong(delta).put(nb).array())
    }

    def log(msg: String): Unit =
      send(WorkerPool.OpLog, msg.getBytes("UTF-8"))

    def respond(payload: Array[Byte] = Array.emptyByteArray): Unit =
      send(WorkerPool.OpResponse, payload)

    /** pull one input record ([[WorkerPool.OpReadNext]]); None at
      * end-of-input */
    def readNext(): Option[Array[Byte]] = {
      val reply = ask(WorkerPool.OpReadNext)
      if (reply.nonEmpty && reply(0) == 1)
        Some(java.util.Arrays.copyOfRange(reply, 1, reply.length))
      else None
    }

    /** pull one inbox message ([[WorkerPool.OpGetMsg]]); None when drained */
    def getMsg(): Option[Array[Byte]] = {
      val reply = ask(WorkerPool.OpGetMsg)
      if (reply.nonEmpty && reply(0) == 1)
        Some(java.util.Arrays.copyOfRange(reply, 1, reply.length))
      else None
    }
  }

  /** The outer protocol loop every child main runs: serve one parent
    * frame (a request payload, or a chunk/superstep opener) per call to
    * `serve` until the parent closes the pipe, then exit cleanly. */
  def foreachFrame(serve: (Conn, Array[Byte]) => Unit): Unit = {
    val conn = new Conn
    while (true) serve(conn, conn.recv()) // recv exits 0 on clean EOF
  }
}
