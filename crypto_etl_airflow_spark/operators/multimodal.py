"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video travel through the engine as ``binary`` columns
with a typed metadata struct alongside (BASELINE.json ``north_star``;
SURVEY.md §7.5). The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` decode stage, partition-sized batches, frame
explosion — is real and tested. The codec step is REAL for every
format stdlib can express byte-for-byte: RIFF/WAV (PCM-16 chunk
walk), binary PPM (P6), PNG (zlib inflate + CRC-32 chunk
framing + all five scanline filters), and baseline JPEG (marker
walk, stream-declared Huffman tables, dequant + numpy IDCT, YCbCr
reconstruction — ITU T.81 implemented directly; no codec library).
Formats that genuinely need external libraries (MP3, video codecs)
fall back to a deterministic sha256 feature stub, or a user-supplied
``decoder=`` callable for real deployments.

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

from .parallel import widen_small_input

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
    only) and baseline JPEG payloads (SOF0, 8-bit, gray or YCbCr
    4:4:4 — marker walk, stream-declared Huffman tables, dequant,
    numpy IDCT, color reconstruction) both yield ``[width, height,
    channels, n_pixels, sum_c0, sum_c1, sum_c2, sum_all]`` (integers,
    hash-stable as doubles); anything else falls back to the
    deterministic sha256 feature stub (MP3/video remain env-blocked:
    those need real codec libs). With
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
    _, jpeg_dec = _make_jpeg_codec()

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
            is_jpeg = payload[:3] == b"\xff\xd8\xff"
            try:
                if is_png or is_jpeg:
                    s = (png_dec if is_png else jpeg_dec)(payload)
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
    non-interlaced — anything else raises ValueError. (JPEG, once
    thought env-blocked, is handled by :func:`_make_jpeg_codec`
    below — baseline DCT needs only Huffman coding + an IDCT.)

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


def _make_jpeg_codec():
    """Baseline-sequential JPEG codec from first principles (ITU T.81
    is a public spec; no codec library involved — numpy supplies the
    8×8 DCT matmuls, stdlib ``struct`` the marker framing). This
    closes the last env-blocked codec: the container lacks libjpeg,
    but baseline JPEG needs only Huffman coding + an IDCT, both
    implementable directly.

    Supported decode profile: baseline DCT (SOF0), 8-bit precision,
    1 (gray) or 3 (YCbCr 4:4:4) components, no subsampling, no
    restart intervals, no progressive — anything else raises
    ValueError. Huffman/quant tables are read from the stream (any
    spec-valid tables work, not just this encoder's). The encoder
    exists to build fixtures: it writes spec-compliant streams with
    canonical Huffman tables (12 DC symbols at 4 bits, the standard
    162 AC symbols at 8 bits — the all-ones code stays unused, as
    T.81 requires) and a DC quant step of 8, which makes flat 8×8
    blocks reconstruct BIT-EXACTLY (flat value v → DC = 8·(v−128) →
    quantized (v−128) with zero AC → IDCT returns v everywhere), so a
    SQL oracle can predict decoded sums through the lossy format.

    Factory-scoped for the same cloudpickle reason as
    :func:`_make_codecs` (ships by value into mapInPandas workers;
    numpy is resolved by module name on the worker).
    """
    import struct

    import numpy as np

    ZIGZAG = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    # Orthonormal 8-point DCT-II matrix: FDCT F = T @ f @ T.T matches
    # T.81's (1/4)C(u)C(v)ΣΣ definition; IDCT f = T.T @ F @ T.
    _x = np.arange(8)
    T_DCT = 0.5 * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)
    T_DCT[0, :] *= 1 / np.sqrt(2.0)

    # Canonical fixture tables (decoder reads whatever the stream
    # declares; these are only what the encoder writes).
    DC_BITS = [0, 0, 0, 12] + [0] * 12  # 12 symbols, all length 4
    DC_VALS = list(range(12))
    AC_BITS = [0] * 7 + [162] + [0] * 8  # 162 symbols, all length 8
    AC_VALS = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    QTAB = np.array([8] + [16] * 63, dtype=np.int32)  # zigzag order

    def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
        """symbol -> (code, length), canonical assignment (T.81 C.2)."""
        out, code = {}, 0
        i = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[vals[i]] = (code, ln)
                code += 1
                i += 1
            code <<= 1
        return out

    def _magnitude(v: int) -> tuple[int, int]:
        """DC/AC amplitude coding: (size, size-bit code) per T.81 F.12."""
        if v == 0:
            return 0, 0
        size = int(v if v > 0 else -v).bit_length()
        return size, v if v > 0 else v + (1 << size) - 1

    class _BitWriter:
        def __init__(self) -> None:
            self.out = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, code: int, length: int) -> None:
            self.acc = (self.acc << length) | (code & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                self.n -= 8
                b = (self.acc >> self.n) & 0xFF
                self.acc &= (1 << self.n) - 1  # drop emitted bits
                self.out.append(b)
                if b == 0xFF:  # byte stuffing
                    self.out.append(0x00)

        def flush(self) -> bytes:
            if self.n:  # pad to a byte boundary with 1-bits (T.81 F.1.2.3)
                pad = 8 - self.n
                self.put((1 << pad) - 1, pad)
            return bytes(self.out)

    def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        return np.clip(
            np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255
        ).astype(np.uint8)

    def jpeg_encode(
        width: int, height: int, ncomp: int, pixels: bytes
    ) -> bytes:
        """Fixture encoder: baseline JPEG, 4:4:4, w/h multiples of 8
        (keeps edge padding out of the decoded-value contract)."""
        if ncomp not in (1, 3):
            raise ValueError("ncomp must be 1 or 3")
        if width % 8 or height % 8:
            raise ValueError("fixture encoder needs w, h multiples of 8")
        if len(pixels) != width * height * ncomp:
            raise ValueError("pixel buffer size mismatch")
        px = np.frombuffer(pixels, dtype=np.uint8).reshape(
            height, width, ncomp
        )
        planes = (
            [px[..., 0]] if ncomp == 1
            else list(np.moveaxis(_rgb_to_ycbcr(px), -1, 0))
        )

        dc_map = _huff_codes(DC_BITS, DC_VALS)
        ac_map = _huff_codes(AC_BITS, AC_VALS)
        q = QTAB.astype(np.float64)
        w = _BitWriter()
        pred = [0] * ncomp
        for by in range(height // 8):
            for bx in range(width // 8):
                for ci, plane in enumerate(planes):  # interleaved MCU
                    blk = plane[
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ].astype(np.float64) - 128.0
                    coef = T_DCT @ blk @ T_DCT.T
                    zz = coef.reshape(64)[ZIGZAG]
                    qc = np.rint(zz / q).astype(np.int64)
                    diff = int(qc[0]) - pred[ci]
                    pred[ci] = int(qc[0])
                    size, bitsv = _magnitude(diff)
                    w.put(*dc_map[size])
                    if size:
                        w.put(bitsv, size)
                    run = 0
                    for k in range(1, 64):
                        v = int(qc[k])
                        if v == 0:
                            run += 1
                            continue
                        while run >= 16:
                            w.put(*ac_map[0xF0])  # ZRL
                            run -= 16
                        size, bitsv = _magnitude(v)
                        w.put(*ac_map[(run << 4) | size])
                        w.put(bitsv, size)
                        run = 0
                    if run:
                        w.put(*ac_map[0x00])  # EOB
        data = w.flush()

        def seg(marker: int, body: bytes) -> bytes:
            return struct.pack(">HH", marker, len(body) + 2) + body

        qt = bytes([0]) + bytes(int(v) for v in QTAB)
        sof_comps = b"".join(
            struct.pack("BBB", cid + 1, 0x11, 0) for cid in range(ncomp)
        )
        dht = (
            bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
            + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
        )
        sos_comps = b"".join(
            struct.pack("BB", cid + 1, 0x00) for cid in range(ncomp)
        )
        return (
            b"\xff\xd8"
            + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + seg(0xFFDB, qt)
            + seg(
                0xFFC0,
                struct.pack(">BHHB", 8, height, width, ncomp) + sof_comps,
            )
            + seg(0xFFC4, dht)
            + seg(
                0xFFDA,
                bytes([ncomp]) + sos_comps + bytes([0, 63, 0]),
            )
            + data
            + b"\xff\xd9"
        )

    class _BitReader:
        def __init__(self, buf: bytes, pos: int) -> None:
            self.buf = buf
            self.pos = pos
            self.acc = 0
            self.n = 0

        def bit(self) -> int:
            if self.n == 0:
                if self.pos >= len(self.buf):
                    raise ValueError("truncated entropy-coded data")
                b = self.buf[self.pos]
                self.pos += 1
                if b == 0xFF:
                    if (
                        self.pos >= len(self.buf)
                        or self.buf[self.pos] != 0x00
                    ):
                        raise ValueError(
                            "marker inside entropy-coded data"
                        )
                    self.pos += 1  # stuffed zero
                self.acc = b
                self.n = 8
            self.n -= 1
            return (self.acc >> self.n) & 1

        def bits(self, k: int) -> int:
            v = 0
            for _ in range(k):
                v = (v << 1) | self.bit()
            return v

    def _extend(v: int, size: int) -> int:
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    def jpeg_decode(payload: bytes) -> dict:
        """Parse markers, Huffman-decode the scan, dequantize, IDCT,
        color-convert; return per-channel sums over the RECONSTRUCTED
        pixels (a wrong Huffman table walk, zigzag, or IDCT shows up
        as a value mismatch). Raises ValueError on malformed or
        out-of-profile input."""
        if payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG payload")
        pos = 2
        qtabs: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        sof = None
        scan = None
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("bad marker alignment")
            marker = payload[pos + 1]
            if marker == 0xD9:
                break
            (length,) = struct.unpack_from(">H", payload, pos + 2)
            body = payload[pos + 4 : pos + 2 + length]
            if len(body) != length - 2:
                raise ValueError("truncated segment")
            if marker == 0xDB:  # DQT (possibly several tables)
                at = 0
                while at < len(body):
                    pq, tq = body[at] >> 4, body[at] & 0x0F
                    if pq != 0:
                        raise ValueError("only 8-bit quant tables")
                    qtabs[tq] = np.frombuffer(
                        body[at + 1 : at + 65], dtype=np.uint8
                    ).astype(np.float64)
                    if qtabs[tq].size != 64:
                        raise ValueError("truncated quant table")
                    at += 65
            elif marker == 0xC4:  # DHT (possibly several tables)
                at = 0
                while at < len(body):
                    tc, th = body[at] >> 4, body[at] & 0x0F
                    bits = list(body[at + 1 : at + 17])
                    nval = sum(bits)
                    vals = list(body[at + 17 : at + 17 + nval])
                    if len(bits) != 16 or len(vals) != nval:
                        raise ValueError("truncated huffman table")
                    table: dict[tuple[int, int], int] = {}
                    code, i = 0, 0
                    for ln in range(1, 17):
                        for _ in range(bits[ln - 1]):
                            table[(ln, code)] = vals[i]
                            code += 1
                            i += 1
                        code <<= 1
                    huff[(tc, th)] = table
                    at += 17 + nval
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
                if prec != 8:
                    raise ValueError("only 8-bit precision")
                if nc not in (1, 3):
                    raise ValueError("only 1 or 3 components")
                comps = []
                for ci in range(nc):
                    cid, hv, tq = struct.unpack_from(
                        "BBB", body, 6 + 3 * ci
                    )
                    if hv != 0x11:
                        raise ValueError(
                            "subsampled JPEG not supported (4:4:4 only)"
                        )
                    comps.append((cid, tq))
                sof = (w, h, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError("only baseline (SOF0) supported")
            elif marker == 0xDD:
                raise ValueError("restart intervals not supported")
            elif marker == 0xDA:  # SOS — entropy data follows
                # bounds first (ADVICE r14): bare indexing raised
                # IndexError on a truncated SOS header, which escapes
                # extract_features' ValueError fallback net and kills
                # the whole mapInPandas task instead of falling back
                # to the stub
                if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                    raise ValueError("truncated SOS header")
                nc = body[0]
                tables = {}
                for ci in range(nc):
                    cid, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                    tables[cid] = (tt >> 4, tt & 0x0F)
                if tuple(body[1 + 2 * nc : 4 + 2 * nc]) != (0, 63, 0):
                    raise ValueError("non-sequential spectral selection")
                scan = (tables, pos + 2 + length)
                break
            pos += 2 + length
        if sof is None or scan is None:
            raise ValueError("missing SOF0/SOS")
        w, h, comps = sof
        tables, data_pos = scan
        if any(cid not in tables for cid, _ in comps):
            raise ValueError("scan is missing a frame component")
        for cid, tq in comps:
            if tq not in qtabs:
                raise ValueError("missing quant table")
            dct, act = tables[cid]
            if (0, dct) not in huff or (1, act) not in huff:
                raise ValueError("missing huffman table")
        if w % 8 or h % 8:
            # edge replication would be needed; the profile keeps the
            # decoded-value contract exact instead
            raise ValueError("only multiple-of-8 dimensions supported")

        def decode_huff(r: _BitReader, table: dict) -> int:
            code, ln = 0, 0
            while ln < 16:
                code = (code << 1) | r.bit()
                ln += 1
                if (ln, code) in table:
                    return table[(ln, code)]
            raise ValueError("invalid huffman code")

        r = _BitReader(payload, data_pos)
        nc = len(comps)
        planes = [np.empty((h, w), dtype=np.uint8) for _ in range(nc)]
        pred = [0] * nc
        inv_zz = np.argsort(np.array(ZIGZAG))
        for by in range(h // 8):
            for bx in range(w // 8):
                for ci, (cid, tq) in enumerate(comps):
                    dc_t = huff[(0, tables[cid][0])]
                    ac_t = huff[(1, tables[cid][1])]
                    zz = np.zeros(64, dtype=np.float64)
                    size = decode_huff(r, dc_t)
                    diff = _extend(r.bits(size), size) if size else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = decode_huff(r, ac_t)
                        run, size = rs >> 4, rs & 0x0F
                        if size == 0:
                            if run == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(r.bits(size), size)
                        k += 1
                    coef = (zz * qtabs[tq])[inv_zz].reshape(8, 8)
                    blk = T_DCT.T @ coef @ T_DCT
                    planes[ci][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = np.clip(np.rint(blk + 128.0), 0, 255).astype(
                        np.uint8
                    )
        if nc == 3:
            y = planes[0].astype(np.float64)
            cb = planes[1].astype(np.float64) - 128.0
            cr = planes[2].astype(np.float64) - 128.0
            rgb = np.stack(
                [
                    y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb,
                ],
                axis=-1,
            )
            out = np.clip(np.rint(rgb), 0, 255).astype(np.int64)
            sums = [int(out[..., c].sum()) for c in range(3)]
        else:
            sums = [int(planes[0].astype(np.int64).sum()), 0, 0]
        return {
            "width": w,
            "height": h,
            "channels": nc,
            "n_pixels": w * h,
            "sum_c0": sums[0],
            "sum_c1": sums[1],
            "sum_c2": sums[2],
            "sum_all": sums[0] + sums[1] + sums[2],
        }

    return jpeg_encode, jpeg_decode


jpeg_encode, jpeg_decode = _make_jpeg_codec()


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

    # widen BEFORE the kernel (guide §2): the documents table arrives
    # in one file partition at fixture scale, so without this every
    # per-row codec (encode here, decode in extract_features, which
    # inherits this partitioning) runs on 1 core of N. Shuffles only
    # (doc_id, n_chars); no-op when the scan is already wide.
    return widen_small_input(docs.select("doc_id", "n_chars")).mapInPandas(
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

    # widen BEFORE the kernel (guide §2) — see synthesize_codec_media
    return widen_small_input(docs.select("doc_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def synthesize_jpeg_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-JPEG fixture: every doc_id becomes a
    baseline JPEG whose DECODED pixels are closed-form in doc_id —
    possible through a lossy format because each 8×8 block is FLAT
    (all AC coefficients are exactly zero) and the encoder's DC quant
    step of 8 makes the DC path bit-exact (flat v → DC 8·(v−128) →
    quantized v−128 → IDCT returns v everywhere; for color, R=G=B=v
    keeps Y=v and Cb=Cr=128 exact through the JFIF transform). The
    Spark side still genuinely Huffman-codes every DC difference,
    byte-stuffs, and on read walks markers, rebuilds the
    stream-declared Huffman tables, dequantizes and runs the IDCT:

    - grayscale (1 comp) if doc_id is even, YCbCr 4:4:4 (3 comps,
      R=G=B) if odd
    - w = 8·(doc_id % 3 + 1), h = 8·(doc_id % 2 + 1)
    - block b (row-major) is flat at v_b = (doc_id*7 + b*13) % 256

    Arrow-batched mapInPandas; payloads are built executor-side."""
    jpeg_enc, _ = _make_jpeg_codec()

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        def synth(doc_id: int):
            import numpy as _np

            w, h = 8 * (doc_id % 3 + 1), 8 * (doc_id % 2 + 1)
            ncomp = 1 if doc_id % 2 == 0 else 3
            px = _np.empty((h, w, ncomp), dtype=_np.uint8)
            b = 0
            for by in range(h // 8):
                for bx in range(w // 8):
                    v = (doc_id * 7 + b * 13) % 256
                    px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = v
                    b += 1
            return jpeg_enc(w, h, ncomp, px.tobytes()), w, h

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

    # widen BEFORE the kernel (guide §2) — see synthesize_codec_media
    return widen_small_input(docs.select("doc_id")).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


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
