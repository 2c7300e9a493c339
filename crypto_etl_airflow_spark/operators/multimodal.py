"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video travel through the engine as ``binary`` columns
with a typed metadata struct alongside (BASELINE.json ``north_star``;
SURVEY.md §7.5). The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` decode stage, partition-sized batches, frame
explosion — is real and tested. The codec step is REAL for every
format stdlib can express byte-for-byte: RIFF/WAV (PCM-16 chunk
walk), binary PPM (P6), and PNG (zlib inflate + CRC-32 chunk
framing + all five scanline filters). Formats that need codec
libraries the container lacks (JPEG's DCT/huffman, MP3) fall back to
a deterministic sha256 feature stub, or a user-supplied ``decoder=``
callable for real deployments.

Scale posture: binary payloads ride the columnar format untouched
(parquet keeps them compressed); decode happens ONCE per row inside
an Arrow batch on the executor, and only the extracted features —
not the blobs — flow into downstream shuffles.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Deterministic media fixture: wrap each document's text bytes
    as an opaque binary payload with synthesized metadata — the shape
    a real image/audio table would have (FIXTURES.md §4 note)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 16).cast("int").alias("height"),
        (F.col("n_chars") % 10 + 1).cast("int").alias("n_frames"),
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Decode / feature-extract stage over binary payloads.

    Arrow-batched ``mapInPandas``: each batch of (payload, type) rows
    is decoded inside one Python worker call; only features leave the
    stage. The DEFAULT decoder does real byte parsing for the formats
    stdlib can handle — RIFF/WAV payloads yield
    ``[sample_rate, n_channels, bit_depth, n_samples, peak_abs,
    sum_abs, duration_us, data_bytes]``, binary PPM (P6) payloads
    yield ``[width, height, maxval, n_pixels, sum_r, sum_g, sum_b,
    sum_all]``, and PNG payloads (8-bit gray/gray+alpha/RGB/RGBA,
    non-interlaced — full five-filter reconstruction, zlib+struct
    only) yield ``[width, height, channels, n_pixels, sum_c0, sum_c1,
    sum_c2, sum_all]`` (all exact integers, hash-stable as doubles);
    anything else falls back to the deterministic sha256 feature stub
    (JPEG/MP3/... remain env-blocked: no codec libs). With
    ``strict=True`` a payload whose magic matches WAV/PPM but fails to
    parse raises instead of falling back — use for pipelines that own
    their payload formats. ``decoder(payload, media_type) ->
    list[float]`` overrides everything for real deployments.
    """

    # NOTE: this closure ships to Python workers via cloudpickle. It
    # must be fully self-contained — module-level helpers would pickle
    # BY REFERENCE to this package, which executors outside the repo
    # root cannot import. The codec functions are factory-made
    # ``<locals>`` closures, which cloudpickle serializes by value.
    feature_dim = FEATURE_DIM
    _, wav_dec, _, ppm_dec = _make_codecs()
    _, png_dec = _make_png_codec()

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        import hashlib as _hashlib
        import struct as _struct

        def fake_features(payload: bytes) -> list[float]:
            digest = _hashlib.sha256(payload).digest()
            return [
                int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
                for i in range(feature_dim)
            ]

        def default_decode(payload: bytes) -> list[float]:
            is_wav = payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
            is_ppm = payload[:2] == b"P6" and payload[2:3].isspace()
            is_png = payload[:8] == b"\x89PNG\r\n\x1a\n"
            try:
                if is_png:
                    s = png_dec(payload)
                    return [
                        float(s["width"]),
                        float(s["height"]),
                        float(s["channels"]),
                        float(s["n_pixels"]),
                        float(s["sum_c0"]),
                        float(s["sum_c1"]),
                        float(s["sum_c2"]),
                        float(s["sum_all"]),
                    ]
                if is_wav:
                    s = wav_dec(payload)
                    return [
                        float(s["sample_rate"]),
                        float(s["n_channels"]),
                        float(s["bit_depth"]),
                        float(s["n_samples"]),
                        float(s["peak_abs"]),
                        float(s["sum_abs"]),
                        float(s["duration_us"]),
                        float(s["data_bytes"]),
                    ]
                if is_ppm:
                    s = ppm_dec(payload)
                    return [
                        float(s["width"]),
                        float(s["height"]),
                        float(s["maxval"]),
                        float(s["n_pixels"]),
                        float(s["sum_r"]),
                        float(s["sum_g"]),
                        float(s["sum_b"]),
                        float(s["sum_all"]),
                    ]
            # struct.error is NOT a ValueError subclass: a magic-
            # matching payload whose fmt/data chunk is too short for
            # the fixed-size unpack raises it from struct.unpack_from,
            # and letting it escape would crash the mapInPandas task
            # instead of honoring the documented fallback contract
            except (ValueError, _struct.error):
                if strict:
                    raise
            return fake_features(payload)

        for pdf in batches:
            feats, sizes = [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                # null payloads are routine in a real corpus (failed
                # fetch, absent modality): preserve the row with null
                # features instead of crashing the Arrow worker on
                # bytes(None)
                if payload is None:
                    feats.append(None)
                    sizes.append(0)
                    continue
                raw = bytes(payload)
                sizes.append(len(raw))
                if decoder is not None:
                    feats.append(decoder(raw, mtype))
                else:
                    feats.append(default_decode(raw))
            out = pdf[["media_id", "media_type"]].copy()
            out["payload_bytes"] = sizes
            out["features"] = feats
            yield out

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def _make_codecs():
    """Stdlib-only codecs for the two formats simple enough to parse
    byte-for-byte without external libraries: WAV (RIFF container +
    16-bit PCM) and binary PPM (P6). Real byte parsing — chunk
    walking, word alignment, header tokenization — not a stub.

    Built inside a factory so the returned functions are ``<locals>``
    closures: cloudpickle serializes those BY VALUE into mapInPandas
    stages (a module-level ``def`` pickles by reference, which Python
    workers without this repo on PYTHONPATH cannot import).
    """
    import struct

    def wav_encode(
        samples: list[int], sample_rate: int, junk: bytes = b""
    ) -> bytes:
        """Mono 16-bit PCM WAV. ``junk`` adds a LIST chunk before
        ``data`` so decoders must genuinely walk chunks."""
        frames = struct.pack(f"<{len(samples)}h", *samples)
        chunks = [
            b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
        ]
        if junk:
            chunks.append(
                b"LIST"
                + struct.pack("<I", len(junk))
                + junk
                + (b"\x00" if len(junk) % 2 else b"")
            )
        chunks.append(b"data" + struct.pack("<I", len(frames)) + frames)
        body = b"WAVE" + b"".join(chunks)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def wav_decode(payload: bytes) -> dict:
        """Parse RIFF/WAVE: validate magic, walk word-aligned chunks,
        read fmt_, unpack PCM int16 frames. Raises ValueError on
        malformed input."""
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        (riff_size,) = struct.unpack_from("<I", payload, 4)
        if riff_size + 8 != len(payload):
            raise ValueError("RIFF size mismatch")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError(f"truncated chunk {cid!r}")
            if cid == b"fmt ":
                audio_fmt, ch, rate, _, _, bits = struct.unpack_from(
                    "<HHIIHH", body, 0
                )
                if audio_fmt != 1 or bits != 16:
                    raise ValueError("only PCM-16 supported")
                fmt = (ch, rate, bits)
            elif cid == b"data":
                data = body
            pos += 8 + size + (size % 2)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("missing fmt /data chunk")
        ch, rate, bits = fmt
        samples = struct.unpack(f"<{len(data) // 2}h", data)
        n = len(samples) // ch
        return {
            "sample_rate": rate,
            "n_channels": ch,
            "bit_depth": bits,
            "n_samples": n,
            "peak_abs": max((abs(s) for s in samples), default=0),
            "sum_abs": sum(abs(s) for s in samples),
            "duration_us": n * 1_000_000 // rate,
            "data_bytes": len(data),
        }

    def ppm_encode(width: int, height: int, pixels: bytes) -> bytes:
        """Binary PPM (P6) with a comment line in the header, so
        decoders must tokenize, not just split."""
        if len(pixels) != 3 * width * height:
            raise ValueError("pixel buffer size mismatch")
        return (
            b"P6\n# synthetic fixture\n"
            + f"{width} {height}\n255\n".encode("ascii")
            + pixels
        )

    def ppm_decode(payload: bytes) -> dict:
        """Parse P6: tokenize the header (whitespace + '#' comments),
        then read exactly 3*w*h raw bytes. Raises ValueError on
        malformed input."""
        if payload[:2] != b"P6":
            raise ValueError("not a P6 payload")

        pos = 2
        tokens: list[int] = []
        while len(tokens) < 3:
            if pos >= len(payload):
                raise ValueError("truncated PPM header")
            c = payload[pos : pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isdigit():
                start = pos
                while payload[pos : pos + 1].isdigit():
                    pos += 1
                tokens.append(int(payload[start:pos]))
            else:
                raise ValueError(f"bad header byte {c!r}")
        width, height, maxval = tokens
        if maxval != 255:
            raise ValueError("only 8-bit PPM supported")
        pos += 1  # single whitespace after maxval
        pixels = payload[pos : pos + 3 * width * height]
        if len(pixels) != 3 * width * height or pos + len(pixels) != len(payload):
            raise ValueError("pixel data size mismatch")
        return {
            "width": width,
            "height": height,
            "maxval": maxval,
            "n_pixels": width * height,
            "sum_r": sum(pixels[0::3]),
            "sum_g": sum(pixels[1::3]),
            "sum_b": sum(pixels[2::3]),
            "sum_all": sum(pixels),
        }

    return wav_encode, wav_decode, ppm_encode, ppm_decode


wav_encode, wav_decode, ppm_encode, ppm_decode = _make_codecs()


def _make_png_codec():
    """Stdlib-only PNG codec (zlib + struct are all PNG needs for the
    non-interlaced 8-bit profile): chunk framing with CRC-32
    validation, IDAT concatenation, zlib inflate, and full
    reconstruction of ALL FIVE scanline filter types (None/Sub/Up/
    Average/Paeth, RFC 2083 §6). Supported profile: bit depth 8,
    color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
    non-interlaced — anything else raises ValueError (JPEG remains
    the one genuinely env-blocked codec: no DCT/huffman lib in the
    container, and stdlib has none).

    Factory-scoped for the same cloudpickle reason as
    :func:`_make_codecs`; the per-byte filter loops are fine for the
    fixture-sized images here — a production decode stage would swap
    in numpy rows via the ``decoder=`` injection point, same
    plumbing.
    """
    import struct
    import zlib

    SIG = b"\x89PNG\r\n\x1a\n"
    CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    def _chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def png_encode(
        width: int, height: int, color_type: int, pixels: bytes
    ) -> bytes:
        """8-bit non-interlaced PNG. Each scanline r is filtered with
        type ``r % 5``, so a decoder must implement every filter to
        get the pixel values back — the property the oracle checks.
        IDAT is split in two chunks so decoders must concatenate."""
        ch = CHANNELS[color_type]
        stride = width * ch
        if len(pixels) != stride * height:
            raise ValueError("pixel buffer size mismatch")
        raw = bytearray()
        prior = bytes(stride)
        for r in range(height):
            row = pixels[r * stride : (r + 1) * stride]
            ft = r % 5
            raw.append(ft)
            for i in range(stride):
                x = row[i]
                a = row[i - ch] if i >= ch else 0
                b = prior[i]
                c = prior[i - ch] if i >= ch else 0
                if ft == 0:
                    f = x
                elif ft == 1:
                    f = x - a
                elif ft == 2:
                    f = x - b
                elif ft == 3:
                    f = x - (a + b) // 2
                else:
                    f = x - _paeth(a, b, c)
                raw.append(f & 0xFF)
            prior = row
        comp = zlib.compress(bytes(raw))
        split = max(1, len(comp) // 2)
        ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
        return (
            SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", comp[:split])
            + _chunk(b"IDAT", comp[split:])
            + _chunk(b"IEND", b"")
        )

    def png_decode(payload: bytes) -> dict:
        """Parse + reconstruct: signature, CRC-checked chunk walk,
        IDAT concatenation, inflate, per-row unfilter. Returns channel
        sums over the RECONSTRUCTED pixels, so any filter-math error
        shows up as a value mismatch, not a crash. Raises ValueError
        on any malformed or out-of-profile input."""
        if payload[:8] != SIG:
            raise ValueError("not a PNG payload")
        pos = 8
        ihdr = None
        idat = bytearray()
        ended = False
        while pos + 12 <= len(payload):
            (length,) = struct.unpack_from(">I", payload, pos)
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) != length or pos + 12 + length > len(payload):
                raise ValueError(f"truncated chunk {typ!r}")
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
            if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"CRC mismatch in {typ!r}")
            if typ == b"IHDR":
                w, h, depth, color_type, comp_m, filt_m, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
                if depth != 8:
                    raise ValueError("only bit depth 8 supported")
                if color_type not in CHANNELS:
                    raise ValueError(f"unsupported color type {color_type}")
                if comp_m != 0 or filt_m != 0:
                    raise ValueError("unknown compression/filter method")
                if interlace != 0:
                    raise ValueError("interlaced PNG not supported")
                ihdr = (w, h, color_type)
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                ended = True
                break
            pos += 12 + length
        if ihdr is None or not idat or not ended:
            raise ValueError("missing IHDR/IDAT/IEND")
        w, h, color_type = ihdr
        ch = CHANNELS[color_type]
        stride = w * ch
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error as exc:
            raise ValueError(f"bad IDAT stream: {exc}") from exc
        if len(raw) != (stride + 1) * h:
            raise ValueError("scanline data size mismatch")
        sums = [0, 0, 0, 0]
        total = 0
        prior = bytearray(stride)
        for r in range(h):
            ft = raw[r * (stride + 1)]
            line = raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
            recon = bytearray(stride)
            for i in range(stride):
                a = recon[i - ch] if i >= ch else 0
                b = prior[i]
                c = prior[i - ch] if i >= ch else 0
                if ft == 0:
                    x = line[i]
                elif ft == 1:
                    x = line[i] + a
                elif ft == 2:
                    x = line[i] + b
                elif ft == 3:
                    x = line[i] + (a + b) // 2
                elif ft == 4:
                    x = line[i] + _paeth(a, b, c)
                else:
                    raise ValueError(f"bad filter type {ft}")
                x &= 0xFF
                recon[i] = x
                sums[i % ch] += x
                total += x
            prior = recon
        return {
            "width": w,
            "height": h,
            "channels": ch,
            "color_type": color_type,
            "n_pixels": w * h,
            "sum_c0": sums[0],
            "sum_c1": sums[1],
            "sum_c2": sums[2],
            "sum_all": total,
        }

    return png_encode, png_decode


png_encode, png_decode = _make_png_codec()


def synthesize_codec_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-format media fixture: even doc_ids become
    mono PCM-16 WAV payloads, odd doc_ids become binary PPM images —
    every byte derived from (doc_id, n_chars) in closed form, so a SQL
    oracle can predict the decoded stats without parsing bytes:

    - WAV: rate = 8000 + (doc_id%8)*1000, n = n_chars%240 + 16,
      sample_i = (doc_id*31 + i*17) % 65536 - 32768
    - PPM: w = doc_id%16 + 4, h = doc_id%12 + 3,
      byte_k = (doc_id*13 + k*7) % 256

    Arrow-batched mapInPandas; payload generation happens executor-side
    (the driver never holds blobs).
    """
    wav_enc, _, ppm_enc, _ = _make_codecs()

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        payloads, types, widths, heights, nframes = [], [], [], [], []

        def synth(doc_id: int, n_chars: int):
            if doc_id % 2 == 0:
                rate = 8000 + (doc_id % 8) * 1000
                n = n_chars % 240 + 16
                samples = [
                    (doc_id * 31 + i * 17) % 65536 - 32768 for i in range(n)
                ]
                junk = bytes([doc_id % 256] * (doc_id % 5 + 1))
                return wav_enc(samples, rate, junk=junk), "audio", 0, 0, n
            w, h = doc_id % 16 + 4, doc_id % 12 + 3
            px = bytes((doc_id * 13 + k * 7) % 256 for k in range(3 * w * h))
            return ppm_enc(w, h, px), "image", w, h, 1

        for pdf in batches:
            out = pdf[["doc_id"]].rename(columns={"doc_id": "media_id"})
            payloads, types, widths, heights, nframes = [], [], [], [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                p, t, w, h, nf = synth(int(doc_id), int(n_chars))
                payloads.append(p)
                types.append(t)
                widths.append(w)
                heights.append(h)
                nframes.append(nf)
            out["payload"] = payloads
            out["media_type"] = types
            out["width"] = widths
            out["height"] = heights
            out["n_frames"] = nframes
            yield out

    return docs.select("doc_id", "n_chars").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def synthesize_png_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-PNG fixture: every doc_id becomes an 8-bit
    non-interlaced PNG whose pixel bytes are closed-form in doc_id —
    so a SQL oracle predicts the DECODED channel sums analytically
    while the Spark side genuinely deflates, chunk-frames (split
    IDAT, CRC-32), and on read re-inflates and unfilters:

    - color type cycles doc_id % 3 → 0 (gray, 1ch), 2 (RGB, 3ch),
      6 (RGBA, 4ch)
    - w = doc_id % 13 + 4, h = doc_id % 9 + 3  (h ≥ 3 and the encoder
      filters row r with type r % 5, so the corpus exercises every
      filter; h ≥ 5 rows hit all five in one image)
    - byte_k = (doc_id*11 + k*5) % 256 over k < w*h*channels

    Arrow-batched mapInPandas; payloads are built executor-side."""
    png_enc, _ = _make_png_codec()

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        def synth(doc_id: int):
            color_type = (0, 2, 6)[doc_id % 3]
            ch = {0: 1, 2: 3, 6: 4}[color_type]
            w, h = doc_id % 13 + 4, doc_id % 9 + 3
            px = bytes(
                (doc_id * 11 + k * 5) % 256 for k in range(w * h * ch)
            )
            return png_enc(w, h, color_type, px), w, h

        for pdf in batches:
            out = pdf[["doc_id"]].rename(columns={"doc_id": "media_id"})
            payloads, widths, heights = [], [], []
            for doc_id in pdf["doc_id"]:
                p, w, h = synth(int(doc_id))
                payloads.append(p)
                widths.append(w)
                heights.append(h)
            out["payload"] = payloads
            out["media_type"] = "image"
            out["width"] = widths
            out["height"] = heights
            out["n_frames"] = 1
            yield out[
                ["media_id", "payload", "media_type", "width", "height", "n_frames"]
            ]

    return docs.select("doc_id").mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video payloads: explode each media
    row into its sampled frame indices (metadata-driven — the real
    frame decode would run per exploded row in a downstream
    ``extract_features``). Pure expressions, no Python."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.col("n_frames").alias("total_frames"),
        F.explode(frames).alias("frame_idx"),
    )


def binary_stats(media: DataFrame) -> DataFrame:
    """Metadata/size profile per media type — pure column expressions
    over the binary column (no decode).

    The mean payload size is emitted as integer micro-bytes: the exact
    long sum divided by the count is one correctly-rounded IEEE
    division in any engine, so scaling to 1e-6 bytes and casting to
    BIGINT keeps the value hash engine-independent (a raw double mean
    can differ in decimal rendering across engines).
    """
    ol = F.octet_length("payload")
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(ol).alias("total_bytes"),
        F.round(F.sum(ol).cast("double") / F.count("*") * 1e6)
        .cast("long")
        .alias("avg_micro_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Decode → resize → re-encode stage for image payloads.

    Same Arrow-batched ``mapInPandas`` shape as ``extract_features``:
    binary in, binary out, metadata updated to the target dimensions.
    ``resizer(payload, w, h) -> bytes`` plugs in a real codec
    (PIL/opencv); the stub emits a deterministic pseudo-bitmap of
    exactly ``w*h`` bytes derived from the payload digest, so output
    sizes — the property downstream partitioning cares about — are
    real.
    """

    # self-contained closure: ships by value, workers never import us
    def run(batches: Iterator[Any]) -> Iterator[Any]:
        import hashlib as _hashlib

        def fake_resize(payload: bytes, w: int, h: int) -> bytes:
            seed = _hashlib.sha256(payload).digest()
            reps = (w * h) // len(seed) + 1
            return (seed * reps)[: w * h]

        do = resizer or fake_resize
        for pdf in batches:
            out = pdf[["media_id", "media_type"]].copy()
            out["width"] = target_w
            out["height"] = target_h
            out["payload"] = [
                do(bytes(p), target_w, target_h) for p in pdf["payload"]
            ]
            yield out

    images = media.filter(F.col("media_type") == "image")
    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


def audio_windows(
    media: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Overlapping analysis windows over audio payloads — the
    metadata-driven plumbing for STFT/feature stages (the per-window
    decode would run in a downstream ``extract_features``). Audio
    duration rides the ``n_frames`` metadata field as seconds. Pure
    expressions: sequence + explode, no Python."""
    duration_ms = F.col("n_frames") * 1000
    starts = F.sequence(
        F.lit(0), duration_ms - F.lit(window_ms), F.lit(hop_ms)
    )
    return (
        media.filter(
            (F.col("media_type") == "audio") & (duration_ms >= window_ms)
        )
        .select(
            "media_id",
            (duration_ms).cast("int").alias("duration_ms"),
            F.explode(starts).alias("window_start_ms"),
        )
        .withColumn(
            "window_end_ms", F.col("window_start_ms") + F.lit(window_ms)
        )
    )
