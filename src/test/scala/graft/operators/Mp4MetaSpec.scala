package graft.operators

import graft.SparkSpec

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.US_ASCII

/** The ISO-BMFF box walk (Multimodal.parseMp4Meta) against hand-planted
  * boxes: standard v0 layout, v1 (64-bit) mvhd, largesize framing,
  * audio-only files, and the malformed shapes that must degrade to None
  * (truncation, child overrunning parent, missing moov). */
class Mp4MetaSpec extends SparkSpec {

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length).put(typ.getBytes(US_ASCII)).put(payload)
    b.array()
  }
  private def full(typ: String, payload: Array[Byte], version: Byte = 0) =
    box(typ, Array[Byte](version, 0, 0, 0) ++ payload)
  private def be32(vs: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * vs.length); vs.foreach(b.putInt); b.array()
  }
  private def be64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(v).array()

  private val ftyp = box("ftyp", "isom".getBytes(US_ASCII) ++ be32(0x200))

  private def mvhdV0(timescale: Int, duration: Int) =
    full("mvhd", be32(0, 0, timescale, duration) ++ new Array[Byte](80))
  private def mvhdV1(timescale: Int, duration: Long) =
    full("mvhd", be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration) ++
      new Array[Byte](80), version = 1)
  private def tkhd(id: Int, w: Int, h: Int) =
    full("tkhd", be32(0, 0, id, 0, 0) ++ new Array[Byte](52) ++
      be32(w << 16, h << 16))
  private val mdhd = full("mdhd", be32(0, 0, 1000, 1000))
  private def hdlr(kind: String) =
    full("hdlr", be32(0) ++ kind.getBytes(US_ASCII) ++ be32(0, 0, 0))
  private def trak(id: Int, w: Int, h: Int, kind: String) =
    box("trak", tkhd(id, w, h) ++ box("mdia", mdhd ++ hdlr(kind)))

  test("standard v0 file: duration, dimensions, track tallies") {
    val bytes = ftyp ++ box("moov",
      mvhdV0(600, 1500) ++ trak(1, 1920, 1080, "vide") ++
        trak(2, 0, 0, "soun") ++ trak(3, 0, 0, "soun"))
    val m = Multimodal.parseMp4Meta(bytes).get
    assert(m.timescale == 600)
    assert(m.durationMs == 2500) // 1500/600 s
    assert((m.nTracks, m.nVideo, m.nAudio) == ((3, 1, 2)))
    assert((m.width, m.height) == ((1920, 1080)))
  }

  test("v1 mvhd (64-bit times) parses") {
    val bytes = ftyp ++ box("moov",
      mvhdV1(90000, 90000L * 3600) ++ trak(1, 640, 480, "vide"))
    val m = Multimodal.parseMp4Meta(bytes).get
    assert(m.durationMs == 3600000L)
    assert((m.width, m.height) == ((640, 480)))
  }

  test("largesize (size==1) box framing parses") {
    val moovPayload = mvhdV0(1000, 2000) ++ trak(1, 0, 0, "soun")
    val b = ByteBuffer.allocate(16 + moovPayload.length)
    b.putInt(1).put("moov".getBytes(US_ASCII))
      .putLong(16L + moovPayload.length).put(moovPayload)
    val m = Multimodal.parseMp4Meta(ftyp ++ b.array()).get
    assert(m.durationMs == 2000 && m.nAudio == 1 && m.width == 0)
  }

  test("audio-only (m4a shape): zero dimensions, soun tally") {
    val bytes = ftyp ++ box("moov", mvhdV0(44100, 44100 * 7) ++
      trak(1, 0, 0, "soun"))
    val m = Multimodal.parseMp4Meta(bytes).get
    assert((m.width, m.height, m.nVideo, m.nAudio) == ((0, 0, 0, 1)))
    assert(m.durationMs == 7000)
  }

  test("malformed shapes degrade to None") {
    val good = ftyp ++ box("moov", mvhdV0(1000, 1000) ++ trak(1, 10, 10, "vide"))
    assert(Multimodal.parseMp4Meta(good).nonEmpty, "fixture sanity")
    // truncated mid-box
    assert(Multimodal.parseMp4Meta(good.dropRight(7)).isEmpty)
    // child box claims a size overrunning its parent
    val overrun = ftyp ++ box("moov",
      be32(0x7fffffff) ++ "mvhd".getBytes(US_ASCII))
    assert(Multimodal.parseMp4Meta(overrun).isEmpty)
    // no moov at all
    assert(Multimodal.parseMp4Meta(ftyp ++ box("free", new Array[Byte](32))).isEmpty)
    // not a bmff file
    assert(Multimodal.parseMp4Meta("not an mp4 file at all".getBytes(US_ASCII)).isEmpty)
    assert(Multimodal.parseMp4Meta(Array.emptyByteArray).isEmpty)
  }

  test("decodeMp4Meta feature row: metadata vector, stub fallback intact") {
    val good = ftyp ++ box("moov", mvhdV0(1000, 2500) ++
      trak(1, 320, 240, "vide") ++ trak(2, 0, 0, "soun"))
    val (w, h, _, feats) = Multimodal.decodeMp4Meta(good).get
    assert((w, h) == ((320, 240)))
    assert(feats.length == 8)
    assert(feats(0) == 2.5f && feats(1) == 2f && feats(2) == 1f && feats(3) == 1f)
    assert(Multimodal.decodeMp4Meta("garbage".getBytes(US_ASCII)).isEmpty)
  }
}
