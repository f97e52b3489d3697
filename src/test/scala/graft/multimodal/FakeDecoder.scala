package graft.multimodal

/** Test-only stand-in codec (demoted from main in round 4 when
  * [[ImageIoDecoder]] became the production default): dimensions and
  * pixels derive from the content hash — stable across runs, machines,
  * and partitionings. Exercises the decoder-agnostic plumbing for
  * formats the JDK cannot decode (e.g. mp4 video). */
object FakeDecoder extends MediaDecoder {
  private def h(bytes: Array[Byte], salt: Int): Int =
    java.util.Arrays.hashCode(bytes) * 31 + salt

  override def decodeImage(bytes: Array[Byte]): DecodedImage = {
    val w = 8 + math.floorMod(h(bytes, 1), 8)
    val ht = 8 + math.floorMod(h(bytes, 2), 8)
    val px = Array.tabulate[Byte](w * ht * 3)(i =>
      (math.floorMod(h(bytes, i), 256) - 128).toByte)
    DecodedImage("", w, ht, 3, px)
  }
  override def frameCount(bytes: Array[Byte]): Int =
    2 + math.floorMod(h(bytes, 99), 4)
  override def decodeFrame(bytes: Array[Byte], idx: Int): DecodedImage =
    decodeImage(bytes :+ idx.toByte)
}
