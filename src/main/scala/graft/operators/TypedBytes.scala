package graft.operators

import java.io.{DataInputStream, DataOutputStream, EOFException}

/** The Hadoop Streaming typedbytes wire format (public spec —
  * `stream:../typedbytes/Type.java:27-43`: self-describing binary
  * records with 1-byte type codes: bytes 0, byte 1, bool 2, int 3,
  * long 4, float 5, double 6, string 7 (UTF-8, length-prefixed),
  * vector 8, list 9 (255-terminated), map 10). Original implementation
  * of the format; it exists so binary subprocess UDFs can exchange
  * typed records instead of tab-separated text lines.
  */
object TypedBytes {

  final val MarkerEnd = 255

  def write(out: DataOutputStream, v: Any): Unit = v match {
    case b: Array[Byte] =>
      out.writeByte(0); out.writeInt(b.length); out.write(b)
    case b: Byte => out.writeByte(1); out.writeByte(b.toInt)
    case b: Boolean => out.writeByte(2); out.writeBoolean(b)
    case i: Int => out.writeByte(3); out.writeInt(i)
    case l: Long => out.writeByte(4); out.writeLong(l)
    case f: Float => out.writeByte(5); out.writeFloat(f)
    case d: Double => out.writeByte(6); out.writeDouble(d)
    case s: String =>
      val b = s.getBytes("UTF-8")
      out.writeByte(7); out.writeInt(b.length); out.write(b)
    case vec: Vector[_] =>
      out.writeByte(8); out.writeInt(vec.size); vec.foreach(write(out, _))
    case seq: Seq[_] =>
      out.writeByte(9); seq.foreach(write(out, _)); out.writeByte(MarkerEnd)
    case m: Map[_, _] =>
      out.writeByte(10); out.writeInt(m.size)
      m.foreach { case (k, mv) => write(out, k); write(out, mv) }
    case other =>
      throw new IllegalArgumentException(s"unsupported typedbytes value: $other")
  }

  /** Read one value; None at clean EOF (stream exhausted before a type
    * code).
    */
  def read(in: DataInputStream): Option[Any] = {
    val code = try in.readUnsignedByte() catch { case _: EOFException => return None }
    Some(readBody(in, code))
  }

  private def readBody(in: DataInputStream, code: Int): Any = code match {
    case 0 =>
      val b = new Array[Byte](in.readInt()); in.readFully(b); b
    case 1 => in.readByte()
    case 2 => in.readBoolean()
    case 3 => in.readInt()
    case 4 => in.readLong()
    case 5 => in.readFloat()
    case 6 => in.readDouble()
    case 7 =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      new String(b, "UTF-8")
    case 8 =>
      Vector.fill(in.readInt())(read(in).getOrElse(
        throw new EOFException("truncated vector")))
    case 9 =>
      val buf = scala.collection.mutable.ListBuffer.empty[Any]
      var c = in.readUnsignedByte()
      while (c != MarkerEnd) { buf += readBody(in, c); c = in.readUnsignedByte() }
      buf.toList
    case 10 =>
      (0 until in.readInt()).map { _ =>
        val k = read(in).getOrElse(throw new EOFException("truncated map key"))
        val v = read(in).getOrElse(throw new EOFException("truncated map value"))
        k -> v
      }.toMap
    case other => throw new IllegalArgumentException(s"bad typedbytes code $other")
  }
}
