package graft.index

import com.esotericsoftware.kryo.{Kryo, KryoSerializable}
import com.esotericsoftware.kryo.io.{Input, Output}

/** Mutable aggregation buffer for posting builds: primitive growable
  * parallel arrays (no per-element boxing — an `ArrayBuffer[Long]` buffer
  * boxed every docId and dominated GC at sf0.1). Custom Kryo serialization
  * writes only the live prefix, so shuffled partial buffers carry no slack
  * capacity.
  */
final class PostingBuf extends KryoSerializable with Serializable {
  var docIds: Array[Long] = new Array[Long](8)
  var tfs: Array[Int] = new Array[Int](8)
  var dls: Array[Long] = new Array[Long](8)
  var size: Int = 0

  private def ensure(n: Int): Unit = {
    if (n > docIds.length) {
      val cap = math.max(n, docIds.length * 2)
      docIds = java.util.Arrays.copyOf(docIds, cap)
      tfs = java.util.Arrays.copyOf(tfs, cap)
      dls = java.util.Arrays.copyOf(dls, cap)
    }
  }

  def add(d: Long, t: Int, l: Long): Unit = {
    ensure(size + 1)
    docIds(size) = d; tfs(size) = t; dls(size) = l
    size += 1
  }

  def addAll(o: PostingBuf): Unit = {
    ensure(size + o.size)
    System.arraycopy(o.docIds, 0, docIds, size, o.size)
    System.arraycopy(o.tfs, 0, tfs, size, o.size)
    System.arraycopy(o.dls, 0, dls, size, o.size)
    size += o.size
  }

  override def write(kryo: Kryo, out: Output): Unit = {
    out.writeInt(size, true)
    var i = 0
    while (i < size) { out.writeLong(docIds(i)); i += 1 }
    i = 0
    while (i < size) { out.writeInt(tfs(i), true); i += 1 }
    i = 0
    while (i < size) { out.writeLong(dls(i), true); i += 1 }
  }

  override def read(kryo: Kryo, in: Input): Unit = {
    size = in.readInt(true)
    docIds = new Array[Long](math.max(size, 8))
    tfs = new Array[Int](math.max(size, 8))
    dls = new Array[Long](math.max(size, 8))
    var i = 0
    while (i < size) { docIds(i) = in.readLong(); i += 1 }
    i = 0
    while (i < size) { tfs(i) = in.readInt(true); i += 1 }
    i = 0
    while (i < size) { dls(i) = in.readLong(true); i += 1 }
  }
}
