"""Multimodal plumbing: binary columns, Arrow-batched decode stage,
frame sampling — real schemas and batch shapes, stubbed codec."""

import pytest

from crypto_etl_airflow_spark.operators import multimodal
from crypto_etl_airflow_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _media(spark):
    return multimodal.documents_as_media(load_table(spark, SF_SMOKE, "documents"))


def test_media_schema_binary_payload(spark):
    media = _media(spark)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "media_type", "width", "height", "n_frames",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    row = media.limit(1).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))


def test_extract_features_fake_decoder_is_deterministic(spark):
    media = _media(spark).limit(50)
    f1 = {r.media_id: r.features for r in multimodal.extract_features(media).collect()}
    f2 = {r.media_id: r.features for r in multimodal.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == multimodal.FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_extract_features_custom_decoder(spark):
    media = _media(spark).limit(5)

    def decoder(payload: bytes, media_type: str):
        return [float(len(payload)), float(len(media_type))] + [0.0] * 6

    out = multimodal.extract_features(media, decoder=decoder).collect()
    assert all(r.features[0] == r.payload_bytes for r in out)


def test_extract_features_decoder_errors_surface(spark):
    media = _media(spark).limit(5)

    def broken(payload: bytes, media_type: str):
        raise NotImplementedError("real codec not available in container")

    with pytest.raises(Exception, match="real codec not available"):
        multimodal.extract_features(media, decoder=broken).collect()


def test_sample_frames_every_other(spark):
    frames = multimodal.sample_frames(_media(spark), every_nth=2)
    rows = frames.collect()
    assert rows, "video rows exist"
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for media_id, group in by_media.items():
        idxs = sorted(r.frame_idx for r in group)
        total = group[0].total_frames
        assert idxs == list(range(0, total, 2))


def test_resize_images_stub_plumbing(spark):
    from crypto_etl_airflow_spark.operators.multimodal import (
        documents_as_media,
        resize_images,
    )
    from crypto_etl_airflow_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    media = documents_as_media(load_table(spark, SF_SMOKE, "documents"))
    out = resize_images(media, 32, 24)
    rows = out.collect()
    n_images = media.filter("media_type = 'image'").count()
    assert len(rows) == n_images > 0
    # every output payload is exactly w*h bytes and deterministic
    assert all(len(r.payload) == 32 * 24 for r in rows)
    again = {r.media_id: bytes(r.payload) for r in resize_images(media, 32, 24).collect()}
    assert all(bytes(r.payload) == again[r.media_id] for r in rows)


def test_resize_accepts_real_resizer(spark):
    from crypto_etl_airflow_spark.operators.multimodal import (
        documents_as_media,
        resize_images,
    )
    from crypto_etl_airflow_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    media = documents_as_media(load_table(spark, SF_SMOKE, "documents")).limit(30)
    out = resize_images(media, 4, 4, resizer=lambda p, w, h: p[: w * h])
    assert all(len(r.payload) <= 16 for r in out.collect())


# --- stdlib WAV / PPM codecs (real byte parsing, no libraries) -------

def test_wav_roundtrip_exact():
    from crypto_etl_airflow_spark.operators.multimodal import wav_decode, wav_encode

    samples = [((7 * 31 + i * 17) % 65536) - 32768 for i in range(100)]
    payload = wav_encode(samples, 9000, junk=b"xyz")  # odd-length junk → pad byte
    stats = wav_decode(payload)
    assert stats["sample_rate"] == 9000
    assert stats["n_channels"] == 1
    assert stats["bit_depth"] == 16
    assert stats["n_samples"] == 100
    assert stats["peak_abs"] == max(abs(s) for s in samples)
    assert stats["sum_abs"] == sum(abs(s) for s in samples)
    assert stats["duration_us"] == 100 * 1_000_000 // 9000
    assert stats["data_bytes"] == 200


def test_wav_decode_rejects_malformed():
    import pytest as _pytest

    from crypto_etl_airflow_spark.operators.multimodal import wav_decode, wav_encode

    with _pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"not a wav at all")
    good = wav_encode([0, 1, -1], 8000)
    with _pytest.raises(ValueError, match="size mismatch|truncated"):
        wav_decode(good[:-3])


def test_ppm_roundtrip_exact():
    from crypto_etl_airflow_spark.operators.multimodal import ppm_decode, ppm_encode

    w, h = 5, 4
    px = bytes((11 * 13 + k * 7) % 256 for k in range(3 * w * h))
    stats = ppm_decode(ppm_encode(w, h, px))
    assert (stats["width"], stats["height"], stats["maxval"]) == (5, 4, 255)
    assert stats["n_pixels"] == 20
    assert stats["sum_r"] == sum(px[0::3])
    assert stats["sum_g"] == sum(px[1::3])
    assert stats["sum_b"] == sum(px[2::3])
    assert stats["sum_all"] == sum(px)


def test_ppm_decode_rejects_malformed():
    import pytest as _pytest

    from crypto_etl_airflow_spark.operators.multimodal import ppm_decode, ppm_encode

    with _pytest.raises(ValueError, match="P6"):
        ppm_decode(b"P5\n1 1\n255\n\x00")
    good = ppm_encode(2, 2, bytes(range(12)))
    with _pytest.raises(ValueError, match="size mismatch"):
        ppm_decode(good + b"\x00")  # trailing garbage


def test_synthesized_media_decodes_in_spark(spark):
    """End-to-end through the Arrow stage: synthesize real WAV/PPM
    bytes executor-side, decode them back, check sample-accurate stats
    for one known doc_id of each parity."""
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators.multimodal import (
        extract_features,
        synthesize_codec_media,
    )

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id").isin([2, 3])
    )
    fixture = {int(r.doc_id): int(r.n_chars) for r in docs.collect()}
    assert set(fixture) == {2, 3}
    out = {
        int(r.media_id): r.features
        for r in extract_features(synthesize_codec_media(docs), strict=True).collect()
    }
    # doc 2 → WAV: rate 8000 + (2%8)*1000, n = n_chars%240+16
    n = fixture[2] % 240 + 16
    samples = [((2 * 31 + i * 17) % 65536) - 32768 for i in range(n)]
    assert out[2][0] == 8000 + 2 * 1000
    assert out[2][3] == n
    assert out[2][4] == max(abs(s) for s in samples)
    assert out[2][5] == sum(abs(s) for s in samples)
    # doc 3 → PPM: w = 3%16+4 = 7, h = 3%12+3 = 6
    px = bytes((3 * 13 + k * 7) % 256 for k in range(3 * 7 * 6))
    assert out[3][0] == 7 and out[3][1] == 6
    assert out[3][4] == sum(px[0::3])
    assert out[3][6] == sum(px[2::3])


def test_default_decoder_falls_back_on_non_media_payloads(spark):
    """Text payloads (documents_as_media) carry no RIFF/P6 magic —
    the default decoder must keep yielding the sha256 stub features
    (all in [0,1]), preserving multimodal_features' certified values."""
    media = _media(spark).limit(20)
    out = multimodal.extract_features(media).collect()
    assert all(0.0 <= x <= 1.0 for r in out for x in r.features)


def test_extract_features_null_payload_yields_null_features(spark):
    """Null payloads (failed fetch, absent modality) must flow
    through the Arrow stage as null-feature rows, not crash the
    worker on bytes(None)."""
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, b"payload-bytes", "image"), (2, None, "image")],
        "media_id long, payload binary, media_type string",
    )
    got = {r.media_id: r for r in extract_features(media).collect()}
    assert got[1].features is not None and got[1].payload_bytes == 13
    assert got[2].features is None and got[2].payload_bytes == 0


def _png_ref_sums(px: bytes, ch: int):
    sums = [sum(px[c::ch]) for c in range(ch)] + [0] * (3 - min(ch, 3))
    return sums[:3], sum(px)


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_roundtrip_exact_all_color_types(color_type, ch):
    from crypto_etl_airflow_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    w, h = 6, 7  # h ≥ 5 → the encoder's r % 5 cycling hits ALL filters
    px = bytes((k * 37 + 11) % 256 for k in range(w * h * ch))
    stats = png_decode(png_encode(w, h, color_type, px))
    assert (stats["width"], stats["height"], stats["channels"]) == (w, h, ch)
    assert stats["n_pixels"] == w * h
    chans, total = _png_ref_sums(px, ch)
    assert [stats["sum_c0"], stats["sum_c1"], stats["sum_c2"]][:ch] == [
        sum(px[c::ch]) for c in range(min(ch, 3))
    ]
    assert stats["sum_all"] == total


def test_png_decode_rejects_malformed():
    import struct
    import zlib

    from crypto_etl_airflow_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"GIF89a....")
    good = png_encode(4, 4, 2, bytes(range(48)))
    # flip one pixel byte inside an IDAT chunk: CRC must catch it
    idat_at = good.index(b"IDAT")
    corrupted = bytearray(good)
    corrupted[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        png_decode(bytes(corrupted))
    with pytest.raises(ValueError, match="truncated|missing"):
        png_decode(good[:-8])
    # out-of-profile headers are refused, not mis-decoded
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    interlaced = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    )
    with pytest.raises(ValueError, match="interlaced"):
        png_decode(interlaced + chunk(b"IDAT", b"x") + chunk(b"IEND", b""))
    sixteen = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    )
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(sixteen + chunk(b"IDAT", b"x") + chunk(b"IEND", b""))


def test_png_filters_actually_exercised():
    """The fixture's claim that row filters cycle r % 5 — and that
    decode reconstructs them — must hold byte-for-byte: re-inflate the
    IDAT stream and check the stored per-row filter tags."""
    import struct
    import zlib

    from crypto_etl_airflow_spark.operators.multimodal import png_encode

    w, h, ch = 5, 7, 3
    payload = png_encode(w, h, 2, bytes((k * 3) % 256 for k in range(w * h * ch)))
    idat = bytearray()
    pos = 8
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    tags = [raw[r * (stride + 1)] for r in range(h)]
    assert tags == [r % 5 for r in range(h)]  # all five filter types


def test_synthesized_png_decodes_in_spark(spark):
    """End-to-end through the Arrow stage: real PNG bytes built
    executor-side (deflate + CRC framing), decoded back through the
    five-filter reconstruction, channel sums exact for one doc_id of
    each color type."""
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators.multimodal import (
        extract_features,
        synthesize_png_media,
    )

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id").isin([3, 4, 5])  # %3 → 0, 1, 2: gray, RGB, RGBA
    )
    out = {
        int(r.media_id): r.features
        for r in extract_features(
            synthesize_png_media(docs), strict=True
        ).collect()
    }
    assert set(out) == {3, 4, 5}
    for doc_id, ch in ((3, 1), (4, 3), (5, 4)):
        w, h = doc_id % 13 + 4, doc_id % 9 + 3
        px = bytes((doc_id * 11 + k * 5) % 256 for k in range(w * h * ch))
        f = out[doc_id]
        assert (f[0], f[1], f[2], f[3]) == (w, h, ch, w * h)
        for c in range(min(ch, 3)):
            assert f[4 + c] == sum(px[c::ch])
        assert f[7] == sum(px)


def _jpeg_flat_px(doc_id: int, w: int, h: int, ncomp: int):
    """The fixture's flat-per-block pixel construction + its expected
    per-channel sum (each block decodes bit-exactly to its flat v)."""
    import numpy as np

    px = np.empty((h, w, ncomp), dtype=np.uint8)
    vals, b = [], 0
    for by in range(h // 8):
        for bx in range(w // 8):
            v = (doc_id * 7 + b * 13) % 256
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = v
            vals.append(v)
            b += 1
    return px, 64 * sum(vals)


@pytest.mark.parametrize("ncomp", [1, 3])
def test_jpeg_flat_blocks_bit_exact(ncomp):
    """Flat 8x8 blocks survive the lossy format EXACTLY (all AC = 0,
    DC quant step 8): decoded channel sums equal the closed form the
    SQL oracle predicts — through real Huffman DC-difference coding."""
    from crypto_etl_airflow_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    w, h = 24, 16  # 6 blocks -> 6 distinct DC diffs through Huffman
    px, expect = _jpeg_flat_px(9, w, h, ncomp)
    stats = jpeg_decode(jpeg_encode(w, h, ncomp, px.tobytes()))
    assert (stats["width"], stats["height"], stats["channels"]) == (w, h, ncomp)
    assert stats["n_pixels"] == w * h
    assert stats["sum_c0"] == expect
    if ncomp == 3:
        assert stats["sum_c1"] == expect and stats["sum_c2"] == expect
    assert stats["sum_all"] == ncomp * expect


def _jpeg_gray_reference(px):
    """Independent dequant/IDCT reference (test-local math, shares
    nothing with the codec under test but the T.81 definitions)."""
    import numpy as np

    x = np.arange(8)
    T = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    T[0, :] *= 1 / np.sqrt(2.0)
    Q = np.array([8] + [16] * 63, dtype=np.float64)
    ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
    h, w = px.shape
    total = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)
            F = T @ (blk - 128.0) @ T.T
            qc = np.rint(F.reshape(64)[ZZ] / Q)
            deq = (qc * Q)[np.argsort(np.array(ZZ))].reshape(8, 8)
            rec = np.clip(np.rint(T.T @ deq @ T + 128.0), 0, 255)
            total += int(rec.sum())
    return total


def test_jpeg_arbitrary_gray_matches_independent_reference():
    """Non-flat images exercise the AC Huffman path (run/size symbols,
    EOB, magnitude extension): decode(encode(px)) must equal a
    test-local dequant+IDCT reference, not just 'not crash'."""
    import numpy as np

    from crypto_etl_airflow_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    rng = np.random.RandomState(42)
    for _ in range(5):
        h, w = 8 * rng.randint(1, 4), 8 * rng.randint(1, 4)
        px = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        stats = jpeg_decode(jpeg_encode(w, h, 1, px.tobytes()))
        assert stats["sum_c0"] == _jpeg_gray_reference(px)


def test_jpeg_sparse_high_frequency_zero_runs():
    """A block that is DC + one late-zigzag coefficient forces long
    AC zero runs (ZRL symbols) — the reference compare catches a
    wrong run-length walk."""
    import numpy as np

    from crypto_etl_airflow_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    x = np.arange(8)
    T = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    T[0, :] *= 1 / np.sqrt(2.0)
    coef = np.zeros((8, 8))
    coef[0, 0] = 160.0  # DC
    coef[7, 6] = 320.0  # zigzag position 61: a ~60-zero run before it
    blk = T.T @ coef @ T
    px = np.clip(np.rint(blk + 128.0), 0, 255).astype(np.uint8)
    stats = jpeg_decode(jpeg_encode(8, 8, 1, px.tobytes()))
    assert stats["sum_c0"] == _jpeg_gray_reference(px)


def test_jpeg_flat_color_exact_for_non_gray_rgb():
    """Flat blocks with R!=G!=B: the YCbCr planes are flat rounded
    ints, each survives the DC path exactly, and the test recomputes
    the inverse transform independently."""
    import numpy as np

    from crypto_etl_airflow_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    r, g, b = 200, 60, 140
    y = int(np.rint(0.299 * r + 0.587 * g + 0.114 * b))
    cb = int(np.rint(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))
    cr = int(np.rint(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))
    exp = [
        int(np.clip(np.rint(y + 1.402 * (cr - 128)), 0, 255)),
        int(np.clip(np.rint(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255)),
        int(np.clip(np.rint(y + 1.772 * (cb - 128)), 0, 255)),
    ]
    px = np.empty((8, 8, 3), dtype=np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = r, g, b
    stats = jpeg_decode(jpeg_encode(8, 8, 3, px.tobytes()))
    assert [stats["sum_c0"], stats["sum_c1"], stats["sum_c2"]] == [
        64 * v for v in exp
    ]


def test_jpeg_decode_rejects_malformed():
    import numpy as np

    from crypto_etl_airflow_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG\r\n\x1a\nnope")
    px = np.full((8, 8), 77, dtype=np.uint8)
    good = jpeg_encode(8, 8, 1, px.tobytes())

    # progressive (SOF2) is out of profile, refused not mis-decoded
    prog = bytearray(good)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(prog))

    # 2x2 subsampling in the frame header
    sub = bytearray(good)
    sub[sub.index(b"\xff\xc0") + 11] = 0x22
    with pytest.raises(ValueError, match="subsampled"):
        jpeg_decode(bytes(sub))

    # restart intervals (DRI) are out of profile
    dri = good[:2] + b"\xff\xdd\x00\x04\x00\x10" + good[2:]
    with pytest.raises(ValueError, match="restart"):
        jpeg_decode(dri)

    # truncated entropy-coded data
    with pytest.raises(ValueError, match="truncated|missing"):
        jpeg_decode(good[: len(good) - 4])

    # truncated SOS header (ADVICE r14): bare indexing here raised
    # IndexError, which escapes extract_features' ValueError fallback
    # net and kills the whole mapInPandas task instead of stubbing.
    # SOS with segment length 3 → 1-byte body → body[0] read the
    # component count but body[1 + 2*ci] walked off the end.
    sos_short = good[:2] + b"\xff\xda\x00\x03\x01" + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated SOS"):
        jpeg_decode(sos_short)
    # empty SOS body (length 2) must also refuse, not IndexError
    sos_empty = good[:2] + b"\xff\xda\x00\x02" + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated SOS"):
        jpeg_decode(sos_empty)
    # declared component count larger than the body provides
    sos_nc = good[:2] + b"\xff\xda\x00\x05\x03\x01\x00" + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated SOS"):
        jpeg_decode(sos_nc)


def test_jpeg_truncated_sos_falls_back_to_stub_in_spark(spark):
    """A JPEG-magic payload with a corrupt SOS header must flow to
    the default sha256 stub (the pre-codec contract), never crash the
    Arrow task (ADVICE r14 regression test)."""
    from crypto_etl_airflow_spark.operators.multimodal import (
        extract_features,
    )

    bad = b"\xff\xd8\xff\xda\x00\x03\x01\xff\xd9"
    df = spark.createDataFrame(
        [(1, "image", bad)],
        "media_id long, media_type string, payload binary",
    )
    rows = extract_features(df).collect()
    assert len(rows) == 1  # task survived; stub features present
    assert rows[0]["features"] is not None


def test_synthesized_jpeg_decodes_in_spark(spark):
    """End-to-end through the Arrow stage: real baseline-JPEG bytes
    built executor-side (Huffman DC coding, byte stuffing), decoded
    back through the marker walk + IDCT, sums exact for one even
    (gray) and one odd (color) doc_id."""
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators.multimodal import (
        extract_features,
        synthesize_jpeg_media,
    )

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id").isin([4, 5])
    )
    out = {
        int(r.media_id): r.features
        for r in extract_features(
            synthesize_jpeg_media(docs), strict=True
        ).collect()
    }
    assert set(out) == {4, 5}
    for doc_id in (4, 5):
        w, h = 8 * (doc_id % 3 + 1), 8 * (doc_id % 2 + 1)
        ncomp = 1 if doc_id % 2 == 0 else 3
        _, expect = _jpeg_flat_px(doc_id, w, h, ncomp)
        f = out[doc_id]
        assert (f[0], f[1], f[2], f[3]) == (w, h, ncomp, w * h)
        assert f[4] == expect
        assert f[7] == ncomp * expect
