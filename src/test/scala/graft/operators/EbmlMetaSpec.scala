package graft.operators

/** The EBML element walk (Multimodal.parseMkvMeta) against hand-planted
  * Matroska/WebM elements: standard layout, float32 and float64
  * Duration, non-default TimestampScale, the default-scale fallback,
  * unknown-size Segment framing, and the malformed shapes that must
  * degrade to None (truncation, child overrunning parent, missing Info,
  * unknown-size non-container). */
class EbmlMetaSpec extends graft.SparkSpec {

  private def idBytes(id: Long): Array[Byte] = {
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte)
  }
  // 1-byte (<127) or 2-byte size vint — all the fixture needs
  private def sizeBytes(sz: Int): Array[Byte] =
    if (sz < 127) Array((0x80 | sz).toByte)
    else { require(sz < 16383); Array((0x40 | (sz >> 8)).toByte, (sz & 0xff).toByte) }
  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ sizeBytes(payload.length) ++ payload
  private def uintPayload(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
  private def f32(v: Float): Array[Byte] =
    uintPayload(java.lang.Float.floatToIntBits(v) & 0xffffffffL, 4)
  private def f64(v: Double): Array[Byte] =
    uintPayload(java.lang.Double.doubleToLongBits(v), 8)

  private val ebmlHeader = el(0x1A45DFA3L, Array.emptyByteArray)
  private def info(scale: Option[Long], dur: Array[Byte]) =
    el(0x1549A966L,
      scale.map(s => el(0x2AD7B1L, uintPayload(s, 4))).getOrElse(Array.emptyByteArray)
        ++ el(0x4489L, dur))
  private def videoTrack(w: Int, h: Int) =
    el(0xAEL, el(0x83L, uintPayload(1, 1)) ++
      el(0xE0L, el(0xB0L, uintPayload(w, 2)) ++ el(0xBAL, uintPayload(h, 2))))
  private val audioTrack = el(0xAEL, el(0x83L, uintPayload(2, 1)))
  private def segment(payload: Array[Byte]) = el(0x18538067L, payload)

  test("standard layout: duration, dimensions, track tallies") {
    val bytes = ebmlHeader ++ segment(
      info(Some(1000000L), f32(2500f)) ++
        el(0x1654AE6BL, videoTrack(320, 240) ++ audioTrack))
    val m = Multimodal.parseMkvMeta(bytes).get
    assert(m.timestampScaleNs == 1000000L)
    assert(m.durationMs == 2500L) // 2500 ms-units × 1e6 ns
    assert((m.nTracks, m.nVideo, m.nAudio) == ((2, 1, 1)))
    assert((m.width, m.height) == ((320, 240)))
  }

  test("float64 Duration with a non-default TimestampScale") {
    // 100 units × 50ms/unit = 5000 ms
    val bytes = ebmlHeader ++ segment(
      info(Some(50000000L), f64(100.0)) ++
        el(0x1654AE6BL, videoTrack(1920, 1080)))
    val m = Multimodal.parseMkvMeta(bytes).get
    assert(m.durationMs == 5000L)
    assert((m.width, m.height) == ((1920, 1080)))
  }

  test("TimestampScale absent: Matroska ms default applies") {
    val bytes = ebmlHeader ++ segment(info(None, f32(1234f)) ++
      el(0x1654AE6BL, audioTrack))
    val m = Multimodal.parseMkvMeta(bytes).get
    assert(m.timestampScaleNs == 1000000L && m.durationMs == 1234L)
    assert((m.nTracks, m.nVideo, m.nAudio) == ((1, 0, 1)))
  }

  test("unknown-size Segment (streaming mux) extends to EOF") {
    val payload = info(Some(1000000L), f32(777f)) ++
      el(0x1654AE6BL, videoTrack(640, 360))
    val bytes = ebmlHeader ++ idBytes(0x18538067L) ++
      Array(0xff.toByte) ++ payload
    val m = Multimodal.parseMkvMeta(bytes).get
    assert(m.durationMs == 777L && m.width == 640)
  }

  test("malformed shapes degrade to None") {
    val good = ebmlHeader ++ segment(
      info(Some(1000000L), f32(2500f)) ++
        el(0x1654AE6BL, videoTrack(320, 240)))
    // truncated mid-element
    assert(Multimodal.parseMkvMeta(good.dropRight(3)).isEmpty)
    // child overrunning its parent: Info claims 2 bytes but its first
    // child (TimestampScale, 7 bytes) runs past that end
    val overrun = ebmlHeader ++ segment(
      idBytes(0x1549A966L) ++ sizeBytes(2) ++ el(0x2AD7B1L, uintPayload(1L, 3)))
    assert(Multimodal.parseMkvMeta(overrun).isEmpty)
    // missing Info (no duration/scale): no metadata to report
    assert(Multimodal.parseMkvMeta(
      ebmlHeader ++ segment(el(0x1654AE6BL, audioTrack))).isEmpty)
    // unknown-size NON-container is unskippable
    val badUnknown = ebmlHeader ++ segment(
      info(Some(1000000L), f32(1f)) ++
        idBytes(0x4489L) ++ Array(0xff.toByte))
    assert(Multimodal.parseMkvMeta(badUnknown).isEmpty)
    // empty / non-EBML bytes
    assert(Multimodal.parseMkvMeta(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseMkvMeta("not matroska".getBytes("UTF-8")).isEmpty)
  }

  test("decodeMkvMeta feature-row shape matches the mp4 layout") {
    val bytes = ebmlHeader ++ segment(
      info(Some(1000000L), f32(3000f)) ++
        el(0x1654AE6BL, videoTrack(640, 360) ++ audioTrack))
    val (w, h, _, feats) = Multimodal.decodeMkvMeta(bytes).get
    assert((w, h) == ((640, 360)))
    assert(feats(0) == 3f && feats(1) == 2f && feats(2) == 1f && feats(3) == 1f)
    assert(feats(4) == 1000000f)
  }
}
