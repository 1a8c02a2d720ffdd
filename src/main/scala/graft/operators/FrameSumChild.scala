package graft.operators

/** Demo worker binary for [[WorkerPool]]'s FRAMED protocol (the
  * reference's `BinaryProtocol.java:50` length-prefixed stream): each
  * request frame is a packed float64 vector (8 bytes per component,
  * big-endian — bytes that routinely CONTAIN newlines, which the line
  * protocol cannot carry); the response frame is the 8-byte float64
  * sum of the components, accumulated in payload order. Spawned by
  * q_udf_pipe_binary as a child JVM — standing in for the arbitrary
  * user binary (C++ in the reference) a pipes deployment runs. Exits
  * cleanly on EOF. */
object FrameSumChild {
  def main(args: Array[String]): Unit =
    ChildProtocol.foreachFrame { (conn, payload) =>
      val bb = java.nio.ByteBuffer.wrap(payload)
      var s = 0.0
      while (bb.remaining() >= 8) s += bb.getDouble()
      conn.sendRaw(java.nio.ByteBuffer.allocate(8).putDouble(s).array())
    }
}
