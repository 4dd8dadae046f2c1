package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphBuilder, GraphStore, PropertyGraph}

/** Multimodal gates (BMP/WAV/PNG/JPEG/MP4 decode over binary columns, fingerprints, frame plumbing).
  *
  * Split from the former single-object SparkEntry (round 14) — a pure
  * refactor: every entry body is byte-identical, gate names and oracle
  * SQL unchanged; [[SparkEntry]] composes the family maps back together.
  */
private[graft] object GatesMultimodal extends GateFamily {
  import GateSupport._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multimodal: opaque blob + metadata pass (size + digest).
    "m1_media_meta" -> ((s, dir) => {
      operators.Multimodal.mediaMeta(
        operators.Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text"))
    }),

    // Multimodal: frame-sampling explode (every 64th char code).
    "m2_frame_sample" -> ((s, dir) => {
      operators.Multimodal.frameSample(t(s, dir, "documents"), "doc_id", "text", 64)
    }),

    // Multimodal: REAL MP4 container metadata — each document encoded as
    // a valid ISO BMFF box tree (ftyp/moov/mvhd/trak/tkhd/mdat), then
    // decodeMp4's version-aware box walk reads back brand, timescale,
    // duration, 16.16 dimensions, and mdat byte count. The oracle
    // recomputes every field from the text's byte length alone, so the
    // walk is verified against an independent engine (the m4/m5 pattern).
    "m12_mp4_boxwalk" -> ((s, dir) => {
      operators.Multimodal.decodeMp4(s,
        operators.Multimodal.encodeMp4(s, t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
    }),

    // Multimodal: real feature extraction on the opaque blob — 4-bucket
    // byte-value histogram (no codec required).
    "m3_byte_histogram" -> ((s, dir) => {
      operators.Multimodal.byteHistogram(
        operators.Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text"))
    }),

    // REAL media decode, hash-verified end-to-end: text → valid 24-bit BMP
    // bytes → pure-JVM decoder (magic/offset/bpp parse, bottom-up un-flip)
    // → exact per-channel sums. The oracle recomputes the sums straight
    // from the text, so the byte-level encode∘decode must invert exactly.
    "m4_bmp_roundtrip" -> ((s, dir) => {
      val media = operators.Multimodal.encodeBmp(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.decodeBmp(s, media).toDF()
    }),

    // COMPRESSED-image twin of m4: text → real PNG bytes (JDK ImageIO
    // writer, genuinely deflate-compressed) → real ImageIO decoder →
    // exact per-channel sums. PNG is lossless and the raster layout is
    // identical to the BMP twin's, so the oracle recomputing the sums
    // straight from the text proves the whole compressed codec path —
    // encode, deflate, inflate, decode — inverts exactly.
    // REAL resize on the decoded-pixel path: PNG → ImageIO decode →
    // nearest-neighbor ×½ (pixel (2x, 2y) sampled — exact integer
    // arithmetic, no interpolation) → PNG re-encode → decode → exact
    // channel sums. The oracle recomputes the sampled positions straight
    // from the text, so decode∘resize∘encode∘decode must all invert.
    "m11_png_resize" -> ((s, dir) => {
      val media = operators.Multimodal.encodeImage(
        s, t(s, dir, "documents"), "doc_id", "text", format = "png")
      operators.Multimodal.decodeImage(s,
        operators.Multimodal.resizeImage(s, media, factor = 2)).toDF()
    }),

    "m10_png_roundtrip" -> ((s, dir) => {
      val media = operators.Multimodal.encodeImage(
        s, t(s, dir, "documents"), "doc_id", "text", format = "png")
      operators.Multimodal.decodeImage(s, media).toDF()
    }),

    // Audio twin: text → valid RIFF/WAVE PCM16 → chunk-walking decoder →
    // exact sample count + energy sum.
    "m5_wav_roundtrip" -> ((s, dir) => {
      val media = operators.Multimodal.encodeWav(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.decodeWav(s, media).toDF()
    }),

    // Perceptual average-hash over REAL decoded BMPs: 8×8 luminance grid,
    // bit = cell brighter than the image (exact integer cross-multiply) —
    // the image near-dup fingerprint.
    "m8_ahash" -> ((s, dir) => {
      val media = operators.Multimodal.encodeBmp(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.decodeBmpAHash(s, media).toDF()
    }),

    // Image near-dup: the aHash fingerprints through the SAME banded
    // hamming-ball join the text simhash uses (Dedup.hammingNearDup,
    // bits=64, radius 3) — recall 1 within the ball, capped hot bands.
    "m8b_image_neardup" -> ((s, dir) => {
      val media = operators.Multimodal.encodeBmp(s, t(s, dir, "documents"), "doc_id", "text")
      val fps = operators.Multimodal.decodeBmpAHash(s, media).toDF()
        .select(col("id"), col("ahash"))
      operators.Dedup.hammingNearDup(fps, "id", "ahash", bits = 64, maxHamming = 3)
    }),

    // Audio fingerprint (Shazam-lite energy-delta hash): bit i = frame
    // i+1 louder than frame i over the REAL decoded PCM16 frames — the
    // audio member of the near-dup fingerprint triple (text simhash,
    // image aHash, audio energy-delta), exact integers end to end.
    // 8-sample frames throughout: the synthetic docs are 48-550 chars, so
    // 256-sample frames would leave 1-3 frames (a 1-2 bit fingerprint);
    // 8 samples give the full 64 delta bits real audio would get from
    // longer frames.
    "m9_audio_fp" -> ((s, dir) => {
      val media = operators.Multimodal.encodeWav(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.audioDeltaFingerprint(s, media, frameLen = 8)
    }),

    // Audio near-dup: the energy-delta fingerprints through the same
    // banded hamming-ball join as text and images (radius 3).
    "m9b_audio_neardup" -> ((s, dir) => {
      val media = operators.Multimodal.encodeWav(s, t(s, dir, "documents"), "doc_id", "text")
      val fps = operators.Multimodal.audioDeltaFingerprint(s, media, frameLen = 8)
      operators.Dedup.hammingNearDup(fps, "id", "afp", bits = 64, maxHamming = 3)
    }),

    // M13 — REAL video frame decode: documents → a genuine RIFF/AVI
    // container with uncompressed bottom-up DIB frames (the one video
    // tier that needs zero codecs), then the real chunk walk extracts
    // every SECOND frame (the frame-sampling stage of a video curation
    // pipeline) and reduces it to exact per-channel sums. Every pixel is
    // a pure function of the text, so the oracle recomputes the sampled
    // frame statistics from the text alone — the m7 formula with a
    // 192-byte frame offset. asciiDocs: the oracle counts CHARACTERS
    // while encodeAvi frames UTF-8 BYTES — audited, not assumed.
    "m13_avi_frames" -> ((s, dir) => {
      val media = operators.Multimodal.encodeAvi(s, asciiDocs(s, dir),
        "doc_id", "text", width = 16, frameH = 4)
      operators.Multimodal.decodeAviFrames(s, media, sampleEvery = 2).toDF()
    }),

    // Tiled image statistics over REAL decoded BMP pixels: 8×8 blocks,
    // exact per-channel sums — patch-level pre-compute; tiles, not
    // pixels, leave the decode task. asciiDocs: same chars==bytes audit
    // as m13 (this oracle indexes text by character position).
    "m7_image_tiles" -> ((s, dir) => {
      val media = operators.Multimodal.encodeBmp(s, asciiDocs(s, dir), "doc_id", "text")
      operators.Multimodal.decodeBmpTiles(s, media, tile = 8).toDF()
    }),

    // Framed audio features over REAL decoded PCM16: 256-sample frames,
    // integer-exact energy and zero-crossing counts — the VAD/silence
    // front-end, computed inside the decode task (samples never shuffle).
    "m6_audio_features" -> ((s, dir) => {
      val media = operators.Multimodal.encodeWav(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.decodeWavFrames(s, media, frameLen = 256).toDF()
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "m8_ahash" -> s"$AHASH_CTES\nSELECT id, ahash, n_px FROM ah",

    "m9_audio_fp" -> s"$AUDIOFP_CTES\nSELECT id, afp FROM afp",

    "m9b_audio_neardup" ->
      s"""$AUDIOFP_CTES
         |SELECT x.id AS id_a, y.id AS id_b,
         |  CAST(bit_count(xor(x.afp, y.afp)) AS BIGINT) AS hamming
         |FROM afp x JOIN afp y ON x.id < y.id
         |WHERE bit_count(xor(x.afp, y.afp)) <= 3""".stripMargin,

    "m8b_image_neardup" ->
      s"""$AHASH_CTES
         |SELECT x.id AS id_a, y.id AS id_b,
         |  CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming
         |FROM ah x JOIN ah y ON x.id < y.id
         |WHERE bit_count(xor(x.ahash, y.ahash)) <= 3""".stripMargin,

    // frame f byte k (k in 0..191, channel k%3: 0=B,1=G,2=R) is payload
    // byte 192f+k, zero past the text; frames = max(1, ceil(len/192)),
    // sampled every 2nd; the decoder's bottom-up un-flip restores exactly
    // this order, so the sums recompute straight from the text.
    "m13_avi_frames" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |f AS (SELECT doc_id, text, len,
        |  unnest(generate_series(0, greatest(1, CAST(ceil(len / 192.0) AS BIGINT)) - 1)) AS fno
        |  FROM t),
        |s AS (SELECT * FROM f WHERE fno % 2 = 0),
        |k AS (SELECT doc_id, fno, text, len, unnest(generate_series(0, 191)) AS k FROM s),
        |c AS (SELECT doc_id, fno, k,
        |  CASE WHEN 192 * fno + k + 1 <= len
        |       THEN unicode(substr(text, CAST(192 * fno + k + 1 AS INTEGER), 1))
        |       ELSE 0 END AS v FROM k)
        |SELECT doc_id AS id, CAST(fno AS BIGINT) AS frame_no,
        |  CAST(16 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        |  CAST(64 AS BIGINT) AS n_px,
        |  CAST(sum(CASE WHEN k % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
        |  CAST(sum(CASE WHEN k % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
        |  CAST(sum(CASE WHEN k % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_r
        |FROM c GROUP BY doc_id, fno""".stripMargin,

    // pixel i of doc = payload bytes 3i..3i+2 (b,g,r), laid out 16-wide
    // top-down; the decoder's bottom-up un-flip restores exactly this
    // order, so tile (x/8, y/8) sums recompute straight from the text.
    "m7_image_tiles" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len,
        |  greatest(1, CAST(ceil(length(text) / 48.0) AS BIGINT)) AS h FROM documents),
        |px AS (SELECT doc_id, text, len, unnest(generate_series(0, 16 * h - 1)) AS i FROM t),
        |c AS (SELECT doc_id, i,
        |  CASE WHEN 3*i + 1 <= len THEN unicode(substr(text, CAST(3*i + 1 AS INTEGER), 1)) ELSE 0 END AS b,
        |  CASE WHEN 3*i + 2 <= len THEN unicode(substr(text, CAST(3*i + 2 AS INTEGER), 1)) ELSE 0 END AS g,
        |  CASE WHEN 3*i + 3 <= len THEN unicode(substr(text, CAST(3*i + 3 AS INTEGER), 1)) ELSE 0 END AS r
        |  FROM px)
        |SELECT doc_id AS id, CAST((i % 16) // 8 AS INTEGER) AS tile_x,
        |  CAST((i // 16) // 8 AS INTEGER) AS tile_y, count(*) AS n_px,
        |  CAST(sum(b) AS BIGINT) AS sum_b, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(r) AS BIGINT) AS sum_r
        |FROM c GROUP BY 1, 2, 3""".stripMargin,

    // Sample i (1-based) is (unicode(char_i) - 64) * 256; frame = (i-1)//256;
    // a crossing belongs to the frame of its SECOND sample.
    "m6_audio_features" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |g AS (SELECT doc_id, text, unnest(generate_series(1, len)) AS i FROM t),
        |c AS (SELECT doc_id, i, unicode(substr(text, CAST(i AS INTEGER), 1)) - 64 AS d FROM g),
        |l AS (SELECT doc_id, i, d, lag(d) OVER (PARTITION BY doc_id ORDER BY i) AS pd FROM c),
        |f AS (SELECT doc_id, (i - 1) // 256 AS frame_no, d,
        |  CASE WHEN pd IS NOT NULL AND pd * d < 0 THEN 1 ELSE 0 END AS x FROM l)
        |SELECT doc_id AS id, CAST(frame_no AS BIGINT) AS frame_no,
        |  count(*) AS n_samples,
        |  CAST(sum(CAST(d AS BIGINT) * d * 65536) AS BIGINT) AS energy,
        |  CAST(sum(x) AS BIGINT) AS crossings
        |FROM f GROUP BY doc_id, frame_no""".stripMargin,

    "m1_media_meta" ->
      """SELECT doc_id AS id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |sha256(text) AS sha256 FROM documents""".stripMargin,

    "m2_frame_sample" ->
      """SELECT doc_id AS id, CAST(u.i AS BIGINT) AS frame_no,
        |CAST(ascii(substr(text, CAST(u.i * 64 + 1 AS INTEGER), 1)) AS BIGINT) AS frame_code
        |FROM documents, UNNEST(generate_series(0, (length(text) - 1) // 64)) AS u(i)""".stripMargin,

    // every encodeMp4 field is a pure function of the utf-8 byte length,
    // so the box walk's output is recomputable without parsing anything
    "m12_mp4_boxwalk" ->
      """SELECT doc_id AS id, 'isom' AS brand, CAST(1000 AS BIGINT) AS timescale,
        |  CAST(len AS BIGINT) AS duration,
        |  CAST(16 * (1 + len % 30) AS BIGINT) AS width,
        |  CAST(16 * (1 + (len // 7) % 30) AS BIGINT) AS height,
        |  CAST(len AS BIGINT) AS n_mdat
        |FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM documents)""".stripMargin,

    "m3_byte_histogram" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |c AS (SELECT doc_id, list_transform(generate_series(1, CAST(length(hx) // 2 AS INTEGER)),
        |  i -> ('0x' || substr(hx, CAST((i - 1) * 2 + 1 AS INTEGER), 2))::BIGINT) AS codes FROM h)
        |SELECT doc_id AS id,
        | CAST(len(list_filter(codes, c -> c >= 0 AND c < 64)) AS BIGINT) AS h0,
        | CAST(len(list_filter(codes, c -> c >= 64 AND c < 128)) AS BIGINT) AS h1,
        | CAST(len(list_filter(codes, c -> c >= 128 AND c < 192)) AS BIGINT) AS h2,
        | CAST(len(list_filter(codes, c -> c >= 192 AND c < 256)) AS BIGINT) AS h3
        |FROM c""".stripMargin,

    // the round-trip invariant straight from the text: byte p of the
    // payload lands in BMP channel p%3 (0=B,1=G,2=R); height =
    // ceil(len/48) with stride 48 (width 16), n_px counts padding.
    "m4_bmp_roundtrip" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |g AS (SELECT doc_id, text, len, unnest(generate_series(1, greatest(len, 1))) AS i FROM t),
        |c AS (SELECT doc_id, i - 1 AS p,
        |  CASE WHEN i <= len THEN unicode(substr(text, CAST(i AS INTEGER), 1)) ELSE 0 END AS code
        |  FROM g),
        |sums AS (SELECT doc_id,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 0 THEN code END), 0) AS BIGINT) AS sum_b,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 1 THEN code END), 0) AS BIGINT) AS sum_g,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 2 THEN code END), 0) AS BIGINT) AS sum_r
        |  FROM c GROUP BY doc_id),
        |dims AS (SELECT doc_id, greatest(1, CAST(ceil(len / 48.0) AS BIGINT)) AS h FROM t)
        |SELECT d.doc_id AS id, 16 AS width, CAST(d.h AS INTEGER) AS height,
        |  16 * d.h AS n_px, s.sum_b, s.sum_g, s.sum_r
        |FROM dims d JOIN sums s ON d.doc_id = s.doc_id""".stripMargin,

    // Nearest-neighbor ×½ of the 16-wide raster: out pixel (x, y) is in
    // pixel (2x, 2y), i.e. payload byte (2y)·48 + (2x)·3 + channel —
    // recomputed straight from the text.
    "m11_png_resize" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len,
        |  greatest(1, CAST(ceil(length(text) / 48.0) AS BIGINT)) AS h FROM documents),
        |d AS (SELECT doc_id, text, len, CAST(ceil(h / 2.0) AS BIGINT) AS oh FROM t),
        |px AS (SELECT doc_id, text, len, oh,
        |  unnest(generate_series(0, oh * 8 - 1)) AS q FROM d),
        |ch AS (SELECT doc_id, oh, text, len,
        |  (2 * (q // 8)) * 48 + (2 * (q % 8)) * 3 + cc.c AS p, cc.c
        |  FROM px CROSS JOIN (SELECT unnest([0, 1, 2]) AS c) cc),
        |v AS (SELECT doc_id, oh, c,
        |  CASE WHEN p < len THEN unicode(substr(text, CAST(p + 1 AS INTEGER), 1)) ELSE 0 END AS code
        |  FROM ch)
        |SELECT doc_id AS id, 8 AS width, CAST(oh AS INTEGER) AS height,
        |  8 * oh AS n_px,
        |  CAST(coalesce(sum(CASE WHEN c = 0 THEN code END), 0) AS BIGINT) AS sum_b,
        |  CAST(coalesce(sum(CASE WHEN c = 1 THEN code END), 0) AS BIGINT) AS sum_g,
        |  CAST(coalesce(sum(CASE WHEN c = 2 THEN code END), 0) AS BIGINT) AS sum_r
        |FROM v GROUP BY doc_id, oh""".stripMargin,

    // The PNG round trip decodes to the SAME raster as the BMP twin
    // (lossless compression, identical 16-wide BGR layout), so its
    // oracle is m4's verbatim: channel sums recomputed from the text.
    "m10_png_roundtrip" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |g AS (SELECT doc_id, text, len, unnest(generate_series(1, greatest(len, 1))) AS i FROM t),
        |c AS (SELECT doc_id, i - 1 AS p,
        |  CASE WHEN i <= len THEN unicode(substr(text, CAST(i AS INTEGER), 1)) ELSE 0 END AS code
        |  FROM g),
        |sums AS (SELECT doc_id,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 0 THEN code END), 0) AS BIGINT) AS sum_b,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 1 THEN code END), 0) AS BIGINT) AS sum_g,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 2 THEN code END), 0) AS BIGINT) AS sum_r
        |  FROM c GROUP BY doc_id),
        |dims AS (SELECT doc_id, greatest(1, CAST(ceil(len / 48.0) AS BIGINT)) AS h FROM t)
        |SELECT d.doc_id AS id, 16 AS width, CAST(d.h AS INTEGER) AS height,
        |  16 * d.h AS n_px, s.sum_b, s.sum_g, s.sum_r
        |FROM dims d JOIN sums s ON d.doc_id = s.doc_id""".stripMargin,

    // PCM16 energy: sample = (code-64)*256, so sum_sq = 65536 * Σ(code-64)².
    "m5_wav_roundtrip" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |g AS (SELECT doc_id, text, unnest(generate_series(1, len)) AS i FROM t),
        |c AS (SELECT doc_id, unicode(substr(text, CAST(i AS INTEGER), 1)) - 64 AS d FROM g)
        |SELECT t.doc_id AS id, 16000 AS sample_rate, 1 AS n_channels,
        |  CAST(t.len AS BIGINT) AS n_samples,
        |  CAST(coalesce(sum(CAST(c.d AS BIGINT) * c.d * 65536), 0) AS BIGINT) AS sum_sq
        |FROM t LEFT JOIN c ON t.doc_id = c.doc_id
        |GROUP BY t.doc_id, t.len""".stripMargin,
  )
}
