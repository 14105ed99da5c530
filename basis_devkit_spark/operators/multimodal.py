"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata (SURVEY §2.D D5).

The Spark-side plumbing is real and tested: the typed struct schema, the
``binaryFile`` loader, partition-size guards, and Arrow-batched
``mapInPandas`` UDF signatures. Image DIMENSIONS are decoded for real by
``parse_image_header`` (pure-Python PNG/JPEG/GIF header parsing — no
codec library). Pixel-level decode (PIL/ffmpeg/librosa) still sits
behind the ``decode_fn`` hook — those libraries are not in this
container — pass a real decoder in production, or the deterministic
fake (``fake_image_features``) in tests.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed multimodal reference column (D5): uri + mime + size + optional bytes
MEDIA_REF_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

_MIME_BY_EXT = {
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "webp": "image/webp", "mp3": "audio/mpeg",
    "wav": "audio/wav", "flac": "audio/flac", "mp4": "video/mp4",
    "mkv": "video/x-matroska", "webm": "video/webm",
}


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Load a directory of media files as (media struct, content bytes).

    Uses Spark's ``binaryFile`` source — distributed read, one row per
    file; `pathGlobFilter` prunes at listing time."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime_map = F.create_map(
        *[F.lit(x) for kv in _MIME_BY_EXT.items() for x in kv]
    )
    return raw.select(
        F.struct(
            F.col("path").alias("uri"),
            F.element_at(mime_map, ext).alias("mime"),
            F.col("length").alias("size"),
            F.sha2(F.col("content"), 256).alias("sha256"),
        ).alias("media"),
        F.col("content"),
    )


# Magic-byte prefixes (uppercase hex) → format. The when-chain is built
# longest-prefix-first (sorted below), so more specific signatures win
# over any shorter prefix of themselves.
_MAGIC_BYTES: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "png"),
    ("474946383761", "gif"),
    ("474946383961", "gif"),
    ("FFD8FF", "jpeg"),
    ("52494646", "riff"),  # wav/avi/webp containers
    ("494433", "mp3"),
    ("664C6143", "flac"),
]


def sniff_format(content_col: str | Column) -> Column:
    """Content-based format detection from magic bytes — no filename or
    metadata trust. Pure column expression; only the first 8 BYTES of the
    blob are sliced and hex-encoded (``hex(substring(blob, 1, 8))``), so
    cost is O(1) per row no matter how large the media blob is, and the
    blob itself never leaves the JVM. Returns 'bin' for unknown
    signatures."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    hx = F.hex(F.substring(c, 1, 8))
    out: Column | None = None
    for prefix, fmt in sorted(_MAGIC_BYTES, key=lambda t: -len(t[0])):
        cond = F.substring(hx, 1, len(prefix)) == prefix
        out = F.when(cond, fmt) if out is None else out.when(cond, fmt)
    assert out is not None
    return out.otherwise(F.lit("bin"))


def attach_media_ref(
    df: DataFrame, uri_col: str, bytes_col: str | None = None
) -> DataFrame:
    """Build the typed media struct from a uri (and optional bytes) column."""
    ext = F.lower(F.element_at(F.split(F.col(uri_col), r"\."), -1))
    mime_map = F.create_map(*[F.lit(x) for kv in _MIME_BY_EXT.items() for x in kv])
    size = F.length(F.col(bytes_col)).cast("long") if bytes_col else F.lit(None).cast("long")
    sha = F.sha2(F.col(bytes_col), 256) if bytes_col else F.lit(None).cast("string")
    return df.withColumn(
        "media",
        F.struct(
            F.col(uri_col).alias("uri"),
            F.element_at(mime_map, ext).alias("mime"),
            size.alias("size"),
            sha.alias("sha256"),
        ),
    )


# JPEG start-of-frame markers that carry dimensions (C4=DHT, C8=JPG,
# CC=DAC are NOT SOF despite being in the Cx range).
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # by IHDR color type


def parse_image_header(content: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from PNG/JPEG/GIF header bytes — pure
    Python over the blob already in hand, no codec library. PNG reads the
    IHDR chunk (always first, per spec); JPEG walks the marker segments to
    the first start-of-frame; GIF reads the logical screen descriptor.
    Raises ``NotImplementedError`` for other formats (webp/audio/video
    need real codecs) and ``ValueError`` for truncated/corrupt headers."""
    b = content or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) < 26 or b[12:16] != b"IHDR":
            raise ValueError("png: truncated or non-IHDR-first header")
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return w, h, _PNG_CHANNELS.get(b[25], 3)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) < 10:
            raise ValueError("gif: truncated header")
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
            3,
        )
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker in (0xD8,) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2  # standalone markers carry no length
                continue
            if marker in _JPEG_SOF:
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return w, h, b[i + 9]
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        raise ValueError("jpeg: no start-of-frame marker found")
    raise NotImplementedError(
        f"unsupported image format (magic {b[:8].hex()}); pass decode_fn= "
        "with a real codec for this media type"
    )


def image_header_features(content: bytes) -> tuple[int, int, int, list[float]]:
    """Default ``decode_fn``: real header-parsed dimensions, no pixel
    features (a real embedding model would fill them)."""
    w, h, c = parse_image_header(content)
    return w, h, c, []


def fake_image_features(content: bytes, dim: int = 8) -> tuple[int, int, int, list[float]]:
    """Deterministic decode fake: derives (width, height, channels,
    features) from a sha256 of the bytes. Stands in for a real decoder so
    the distributed plumbing is testable in this container."""
    h = hashlib.sha256(content or b"").digest()
    width = 64 + h[0]
    height = 64 + h[1]
    feats = [round(b / 255.0, 6) for b in h[2 : 2 + dim]]
    return width, height, 3, feats


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    uri_col: str = "media.uri",
    decode_fn: Callable[[bytes], tuple[int, int, int, list[float]]] | None = None,
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode/feature-extract over ``mapInPandas`` (Arrow batches).

    ``decode_fn`` contract: bytes → (width, height, channels, features).
    Default is ``image_header_features`` — REAL pure-Python PNG/JPEG/GIF
    header parsing for dimensions (no codec library needed); it raises
    ``NotImplementedError`` for formats that need real codecs (webp,
    audio, video) — pass a production decoder for those, or
    ``fake_image_features`` for deterministic pixel-feature tests.
    The batch shape (iterator of pandas DataFrames) is what a real
    PIL/torchvision decode would consume.
    """
    uri_expr, content_expr = uri_col, content_col
    fn = decode_fn or image_header_features

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"uri": [], "width": [], "height": [], "channels": [], "features": []}
            for uri, content in zip(pdf["__uri"], pdf["__content"]):
                w, h, c, feats = fn(content)
                out["uri"].append(uri)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    prepared = df.select(
        F.col(uri_expr).alias("__uri"), F.col(content_expr).alias("__content")
    )
    return prepared.mapInPandas(_decode, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    frame_count_col: str = "frame_count",
) -> DataFrame:
    """Frame-sampling plan for video rows: expands each video into frame
    index rows (0, n, 2n, …) — pure ``sequence`` + ``explode``; the frame
    *decode* is the stubbed boundary, the expansion is real Spark."""
    return df.withColumn(
        "frame_index",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(frame_count_col) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ),
    )


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: a sha256-seeded byte buffer of the
    target pixel count (RGB). Real pipelines pass a PIL/torchvision
    resizer; this keeps the distributed plumbing testable here."""
    seed = hashlib.sha256(content or b"").digest()
    n = width * height * 3
    reps = n // len(seed) + 1
    return (seed * reps)[:n]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    uri_col: str = "media.uri",
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Batch image resize over ``mapInPandas`` (Arrow) — the training-data
    preprocessing shape: bytes in, fixed-size bytes out, embarrassingly
    parallel, no shuffle. ``resize_fn(bytes, w, h) -> bytes`` is the codec
    boundary (same contract as ``decode_fn``): pass a real
    PIL/torchvision implementation in production; the default raises
    ``NotImplementedError`` for real formats — use ``fake_resize`` for
    deterministic plumbing tests."""

    def _default(content: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError(
            "pixel-level resize needs a codec library; pass resize_fn="
        )

    fn = resize_fn or _default

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"uri": [], "width": [], "height": [], "resized": []}
            for uri, content in zip(pdf["__uri"], pdf["__content"]):
                out["uri"].append(uri)
                out["width"].append(width)
                out["height"].append(height)
                out["resized"].append(fn(content, width, height))
            yield pd.DataFrame(out)

    prepared = df.select(
        F.col(uri_col).alias("__uri"), F.col(content_col).alias("__content")
    )
    return prepared.mapInPandas(_resize, RESIZED_IMAGE_SCHEMA)


def flac_streaminfo_fields(content_col: str | Column) -> Column:
    """Decode-free FLAC metadata: parse the mandatory STREAMINFO block
    (the first metadata block of every FLAC stream — public spec,
    RFC 9639) as PURE column expressions, no UDF, no codec. Only the
    first 26 bytes are sliced — O(1) per row regardless of blob size.

    Field layout is big-endian bit-packed: after the ``fLaC`` magic and
    the 4-byte metadata-block header, bytes 19-26 (1-based) hold
    sample rate (20 bits), channels-1 (3 bits), bits-per-sample-1
    (5 bits) and total samples (36 bits); the bit surgery is integer
    div/mod over ``conv(hex, 16, 10)`` windows. Returns a struct
    ``(is_flac, sample_rate, channels, bits, total_samples)`` — all
    NULL when the magic or STREAMINFO block type is absent."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    hx = F.hex(F.substring(c, 1, 26))

    def be(start_byte: int, n_bytes: int) -> Column:
        pos = (start_byte - 1) * 2 + 1
        return F.conv(F.substring(hx, pos, n_bytes * 2), 16, 10).cast("long")

    is_flac = (F.substring(hx, 1, 8) == "664C6143") & (
        (be(5, 1) % 128) == 0  # block type 0 = STREAMINFO (7 low bits)
    )
    v1 = be(19, 3)  # sample_rate(20) | channels-1(3) | bps high bit
    v2 = be(21, 2)  # bps low bits | total_samples high nibble
    return F.struct(
        is_flac.alias("is_flac"),
        F.when(is_flac, (v1 / 16).cast("int")).alias("sample_rate"),
        F.when(is_flac, ((v1 / 2).cast("long") % 8 + 1).cast("int")).alias(
            "channels"
        ),
        F.when(is_flac, ((v2 / 16).cast("long") % 32 + 1).cast("int")).alias(
            "bits"
        ),
        F.when(
            is_flac,
            ((v2 % 16) * F.lit(4294967296).cast("long") + be(23, 4)).cast(
                "long"
            ),
        ).alias("total_samples"),
    )


def mp4_ftyp_fields(content_col: str | Column, max_brands: int = 4) -> Column:
    """Decode-free ISO-BMFF (MP4/MOV/HEIF/AVIF) container sniff: parse
    the mandatory leading ``ftyp`` box (ISO/IEC 14496-12, public spec)
    as PURE column expressions — no UDF, no codec, first 16 +
    4·``max_brands`` bytes touched per row regardless of blob size.

    Box layout (big-endian): bytes 1-4 box size, 5-8 the literal
    ``ftyp``, 9-12 the major brand (4 ASCII chars, e.g. ``isom`` /
    ``mp42`` / ``avif`` / ``heic``), 13-16 the minor version, then one
    4-byte compatible brand per remaining 4 bytes. Returns a struct
    ``(is_isobmff, major_brand, minor_version, n_compatible_brands,
    brands_csv)`` — ``brands_csv`` lists the first ``max_brands``
    compatible brands comma-joined (bounded output whatever the box
    claims); all fields NULL when the magic is absent or the size
    field is malformed (< 16 or not 4-aligned)."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    head = F.substring(c, 1, 16 + 4 * max_brands)
    hx = F.hex(head)

    def be(start_byte: int, n_bytes: int) -> Column:
        pos = (start_byte - 1) * 2 + 1
        return F.conv(F.substring(hx, pos, n_bytes * 2), 16, 10).cast("long")

    size = be(1, 4)
    is_box = (
        (F.substring(hx, 9, 8) == "66747970")  # 'ftyp'
        & (size >= 16)
        & (size % 4 == 0)
        & (F.octet_length(c) >= 16)
    )
    n_brands = ((size - 16) / 4).cast("int")
    listed = F.least(n_brands, F.lit(int(max_brands)))
    brands = F.when(
        listed > 0,
        F.transform(
            F.sequence(F.lit(0), listed - 1),
            lambda i: F.decode(c.substr(F.lit(17) + i * 4, F.lit(4)), "UTF-8"),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.struct(
        is_box.alias("is_isobmff"),
        F.when(is_box, F.decode(F.substring(c, 9, 4), "UTF-8")).alias(
            "major_brand"
        ),
        F.when(is_box, be(13, 4).cast("long")).alias("minor_version"),
        F.when(is_box, n_brands).alias("n_compatible_brands"),
        F.when(is_box, F.concat_ws(",", brands)).alias("brands_csv"),
    )


def wav_header_fields(content_col: str | Column) -> Column:
    """Decode-free AUDIO metadata: parse a PCM WAV (RIFF) header's format
    chunk — channels, sample rate, bits/sample, byte rate — as PURE
    column expressions (hex-slice + little-endian byte swap + conv), no
    UDF, no codec. Only the first 36 bytes are sliced, so cost is O(1)
    per row regardless of blob size (same contract as sniff_format).

    Returns a struct ``(is_wav, channels, sample_rate, bits, byte_rate)``
    — all NULL when the RIFF/WAVE magic is absent. Duration derives as
    ``(octet_length - 44) / byte_rate`` for the canonical 44-byte-header
    layout the fixtures use.
    """
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    hx = F.hex(F.substring(c, 1, 36))

    def le(hexstr: Column, start_byte: int, n_bytes: int) -> Column:
        # bytes are stored little-endian: swap byte pairs, then conv base 16
        pos = (start_byte - 1) * 2 + 1
        pairs = [F.substring(hexstr, pos + 2 * i, 2) for i in range(n_bytes)]
        return F.conv(F.concat(*reversed(pairs)), 16, 10).cast("int")

    is_wav = (F.substring(hx, 1, 8) == "52494646") & (
        F.substring(hx, 17, 8) == "57415645"
    )
    return F.struct(
        is_wav.alias("is_wav"),
        F.when(is_wav, le(hx, 23, 2)).alias("channels"),
        F.when(is_wav, le(hx, 25, 4)).alias("sample_rate"),
        F.when(is_wav, le(hx, 35, 2)).alias("bits"),
        F.when(is_wav, le(hx, 29, 4)).alias("byte_rate"),
    )


# bitrate tables (kbps), ISO/IEC 11172-3 / 13818-3 (public spec);
# index 0 = "free" (emitted NULL), index 15 = invalid (header rejected)
_MP3_BITRATES = {
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
               384, 416, 448],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
               320, 384],
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
               224, 256],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160],
}
_MP3_SAMPLE_RATES = {
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}


def mp3_frame_fields(content_col: str | Column) -> Column:
    """Decode-free MPEG-audio (MP3) metadata: locate the first frame
    header — skipping a leading ID3v2 tag by its syncsafe size (plus
    the 10-byte footer when the flags byte advertises one), never by
    scanning — and parse version / layer / bitrate / sample rate /
    channel mode / padding as PURE column expressions (hex-slice +
    conv + bit arithmetic), no UDF, no codec. Bytes touched per row:
    the 10-byte ID3 probe plus the 4-byte header at the computed
    offset, O(1) whatever the blob size (the sniff_format contract).

    Returns a struct ``(is_mp3, has_id3v2, id3_size, mpeg_version,
    layer, bitrate_kbps, sample_rate, channel_mode, padding)``.
    ``is_mp3`` requires the 11-bit sync AND non-reserved version /
    layer / sample-rate / bitrate fields; parse fields are NULL when
    it is false. Free-format frames (bitrate index 0) are valid with
    NULL ``bitrate_kbps``. MPEG2.5 shares the MPEG2 bitrate tables
    (both specs, public)."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    probe = F.hex(F.substring(c, 1, 10))
    pb = lambda i: F.conv(
        F.substring(probe, (i - 1) * 2 + 1, 2), 16, 10
    ).cast("long")
    # syncsafe size bytes MUST have their MSBs clear (ID3v2 §3.1) — a
    # set MSB means a corrupt tag whose size cannot be trusted
    has_id3 = (
        (F.substring(probe, 1, 6) == "494433")
        & (F.octet_length(c) >= 10)
        & (pb(7) < 128) & (pb(8) < 128) & (pb(9) < 128) & (pb(10) < 128)
    )
    id3_size = (
        pb(7) * 2097152 + pb(8) * 16384 + pb(9) * 128 + pb(10)
    )
    # flags byte bit 0x10 (ID3v2.4 §3.1): the tag carries a 10-byte
    # FOOTER after the body, so the first frame starts 10 bytes later
    footer_pad = F.when(
        pb(6).bitwiseAND(F.lit(16)) != 0, F.lit(10)
    ).otherwise(F.lit(0))
    off = (
        F.when(has_id3, id3_size + 11 + footer_pad)
        .otherwise(F.lit(1))
        .cast("int")
    )
    fh = F.hex(c.substr(off, F.lit(4)))
    fb = lambda i: F.conv(
        F.substring(fh, (i - 1) * 2 + 1, 2), 16, 10
    ).cast("int")
    b1, b2, b3, b4 = fb(1), fb(2), fb(3), fb(4)
    vbits = F.shiftright(b2, 3).bitwiseAND(F.lit(3))
    lbits = F.shiftright(b2, 1).bitwiseAND(F.lit(3))
    br_idx = F.shiftright(b3, 4).bitwiseAND(F.lit(15))
    sr_idx = F.shiftright(b3, 2).bitwiseAND(F.lit(3))
    pad = F.shiftright(b3, 1).bitwiseAND(F.lit(1))
    mode = F.shiftright(b4, 6).bitwiseAND(F.lit(3))
    version = (
        F.when(vbits == 3, "1").when(vbits == 2, "2").when(vbits == 0, "2.5")
    )
    layer = (
        F.when(lbits == 3, 1).when(lbits == 2, 2).when(lbits == 1, 3)
    ).cast("int")
    is_mp3 = (
        (F.octet_length(c) >= off + 3)
        & (b1 == 255)
        & (b2.bitwiseAND(F.lit(0xE0)) == 0xE0)
        & (vbits != 1)
        & (lbits != 0)
        & (sr_idx != 3)
        & (br_idx != 15)
    )
    arr = lambda xs: F.array(*[F.lit(int(x)) for x in xs])
    bitrate = F.lit(None).cast("int")
    for (v, l), tab in _MP3_BITRATES.items():
        vmatch = (version == "1") if v == "1" else version.isin("2", "2.5")
        bitrate = F.when(
            vmatch & (layer == l), F.element_at(arr(tab), br_idx + 1)
        ).otherwise(bitrate)
    bitrate = F.when(br_idx == 0, F.lit(None).cast("int")).otherwise(bitrate)
    srate = F.lit(None).cast("int")
    for v, tab in _MP3_SAMPLE_RATES.items():
        srate = F.when(version == v, F.element_at(arr(tab), sr_idx + 1)).otherwise(
            srate
        )
    chmode = (
        F.when(mode == 0, "stereo")
        .when(mode == 1, "joint_stereo")
        .when(mode == 2, "dual_channel")
        .when(mode == 3, "mono")
    )
    g = lambda col: F.when(is_mp3, col)
    return F.struct(
        is_mp3.alias("is_mp3"),
        has_id3.alias("has_id3v2"),
        F.when(has_id3, id3_size).alias("id3_size"),
        g(version).alias("mpeg_version"),
        g(layer).alias("layer"),
        g(bitrate).alias("bitrate_kbps"),
        g(srate).alias("sample_rate"),
        g(chmode).alias("channel_mode"),
        # int flag, not boolean: NULL booleans round-trip differently
        # through pandas (None vs NaN) across engines
        g(pad).alias("padding"),
    )


def webp_dimensions(content_col: str | Column) -> Column:
    """Decode-free WebP dimensions for all three container variants
    (RIFF spec, public): ``VP8 `` lossy (14-bit LE fields after the
    0x9D012A start code), ``VP8L`` lossless (14-bit packed fields in
    the LE32 after the 0x2F signature), ``VP8X`` extended (24-bit LE
    canvas minus-one fields). PURE column expressions — hex-slice +
    little-endian reassembly + bit arithmetic, no UDF, no codec; only
    the first 30 bytes are touched per row (the sniff_format
    contract). Returns a struct ``(is_webp, variant, width, height)``
    — all NULL when the RIFF/WEBP magic is absent; an unknown first
    chunk keeps ``is_webp`` true with NULL variant/dims."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    hx = F.hex(F.substring(c, 1, 30))
    b = lambda i: F.conv(
        F.substring(hx, (i - 1) * 2 + 1, 2), 16, 10
    ).cast("long")
    fourcc = lambda i: F.substring(hx, (i - 1) * 2 + 1, 8)
    is_webp = (
        (fourcc(1) == "52494646")          # 'RIFF'
        & (fourcc(9) == "57454250")        # 'WEBP'
        & (F.octet_length(c) >= 30)
    )
    chunk = fourcc(13)
    le16 = lambda i: b(i) + b(i + 1) * 256
    le24 = lambda i: b(i) + b(i + 1) * 256 + b(i + 2) * 65536
    le32 = lambda i: le24(i) + b(i + 3) * 16777216
    # VP8 lossy: 0x9D012A start code, then 14-bit LE width/height
    vp8_ok = F.substring(hx, 47, 6) == "9D012A"  # bytes 24-26
    vp8_w = le16(27).bitwiseAND(F.lit(0x3FFF))
    vp8_h = le16(29).bitwiseAND(F.lit(0x3FFF))
    # VP8L lossless: 0x2F signature, 14+14 bits packed little-endian
    vp8l_ok = b(21) == 0x2F
    bits = le32(22)
    vp8l_w = bits.bitwiseAND(F.lit(0x3FFF)) + 1
    vp8l_h = F.shiftrightunsigned(bits, 14).bitwiseAND(F.lit(0x3FFF)) + 1
    # VP8X extended: 24-bit LE canvas minus-one
    vp8x_w = le24(25) + 1
    vp8x_h = le24(28) + 1
    variant = (
        F.when(chunk == "56503820", "vp8")    # 'VP8 '
        .when(chunk == "5650384C", "vp8l")    # 'VP8L'
        .when(chunk == "56503858", "vp8x")    # 'VP8X'
    )
    width = (
        F.when((variant == "vp8") & vp8_ok, vp8_w)
        .when((variant == "vp8l") & vp8l_ok, vp8l_w)
        .when(variant == "vp8x", vp8x_w)
    ).cast("int")
    height = (
        F.when((variant == "vp8") & vp8_ok, vp8_h)
        .when((variant == "vp8l") & vp8l_ok, vp8l_h)
        .when(variant == "vp8x", vp8x_h)
    ).cast("int")
    g = lambda col: F.when(is_webp, col)
    return F.struct(
        is_webp.alias("is_webp"),
        g(variant).alias("variant"),
        g(width).alias("width"),
        g(height).alias("height"),
    )


def ogg_opus_fields(content_col: str | Column) -> Column:
    """Decode-free Ogg/Opus metadata (RFC 3533 Ogg framing + RFC 7845
    OpusHead, both public): validate the ``OggS`` capture pattern and
    page version 0, locate the first packet by the SEGMENT-TABLE
    LENGTH (byte 26 holds n_segments; the packet starts right after
    the table — a computed offset, never a scan), then parse the
    ``OpusHead`` identification header: version, channel count,
    pre-skip (LE16), input sample rate (LE32), mapping family. PURE
    column expressions — hex-slice + little-endian reassembly; bytes
    touched per row: 27 + n_segments + 19, O(1) whatever the blob
    size (the sniff_format contract).

    Returns a struct ``(is_ogg, is_opus, opus_version, channels,
    pre_skip, input_sample_rate, mapping_family)``. ``is_ogg``
    requires the magic, version 0, and a complete header; a non-Opus
    first packet (e.g. Vorbis) keeps ``is_ogg`` with ``is_opus``
    false and NULL fields."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    head = F.hex(F.substring(c, 1, 27))
    hb = lambda i: F.conv(
        F.substring(head, (i - 1) * 2 + 1, 2), 16, 10
    ).cast("int")
    nsegs = hb(27)
    is_ogg = (
        (F.substring(head, 1, 8) == "4F676753")   # 'OggS'
        & (hb(5) == 0)                             # stream version 0
        & (F.octet_length(c) >= 27)
    )
    # first packet begins right after the segment table
    pkt = F.hex(c.substr(nsegs + 28, F.lit(19)))
    pb = lambda i: F.conv(
        F.substring(pkt, (i - 1) * 2 + 1, 2), 16, 10
    ).cast("int")
    le16 = lambda i: pb(i) + pb(i + 1) * 256
    le32 = lambda i: (
        pb(i) + pb(i + 1) * 256 + pb(i + 2) * 65536
        + pb(i + 3) * 16777216
    )
    is_opus = is_ogg & (
        F.substring(pkt, 1, 16) == "4F70757348656164"  # 'OpusHead'
    ) & (F.octet_length(c) >= nsegs + 27 + 19)
    g = lambda col: F.when(is_opus, col)
    return F.struct(
        is_ogg.alias("is_ogg"),
        F.coalesce(is_opus, F.lit(False)).alias("is_opus"),
        g(pb(9)).alias("opus_version"),
        g(pb(10)).alias("channels"),
        g(le16(11)).alias("pre_skip"),
        g(le32(13).cast("long")).alias("input_sample_rate"),
        g(pb(19)).alias("mapping_family"),
    )


def _let(value, body):
    """Expression-level let-binding: evaluate ``value`` ONCE and pass
    it to ``body`` as a higher-order-function lambda variable
    (transform over a one-element array). Column expressions have no
    native let; without this, a parser that reuses a derived value
    re-EMBEDS its whole subtree per reference — for the EXIF parser
    the nesting (tag lookup × entry walk × endian reads × hex slices)
    multiplied to ~10⁶ expression nodes and OOMed the JVM during
    analysis. HOF lambda vars are evaluated once per element, so each
    binding level collapses the fan-out to 1."""
    return F.element_at(F.transform(F.array(value), body), 1)


def exif_tiff_fields(content_col: str | Column, max_entries: int = 64) -> Column:
    """Decode-free EXIF/TIFF metadata from a JPEG blob (JPEG/JFIF
    marker framing + the TIFF 6.0 IFD layout inside the APP1 "Exif"
    segment — all public specs): the ORIENTATION tag drives the only
    rotation-correct crop/resize path a multimodal pipeline has before
    pixel decode, and byte order + entry count are the standard
    corruption screens. Markers scanned: SOI, then up to TWO leading
    segments (APP0/JFIF commonly precedes APP1) located by computed
    segment lengths — never a byte scan. Inside APP1: the ``Exif\0\0``
    magic, the TIFF header (``II``/``MM`` byte order, the 0x002A
    check, IFD0 offset), then IFD0's 12-byte entries walked as a
    bounded ``transform`` over ``least(n_entries, max_entries)`` —
    per-row work is O(max_entries) whatever the blob size (the
    sniff_format contract). Tags read: 0x0112 Orientation, 0x0100
    ImageWidth, 0x0101 ImageLength (SHORT or LONG, honoring byte
    order). Internally staged through :func:`_let` bindings — shared
    derived values (hex window, APP1 offset, endianness, IFD0 offset,
    entry array) are bound once as lambda variables instead of
    re-embedding their subtrees per reference.

    Returns a struct ``(is_jpeg, has_exif, byte_order, n_ifd_entries,
    orientation, image_width, image_length)`` — ``byte_order`` is
    ``'II'``/``'MM'``; missing tags are NULL; a JPEG without a valid
    APP1/Exif keeps ``is_jpeg`` with ``has_exif`` false."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col

    def build(hx: Column) -> Column:
        b = lambda off: F.conv(
            F.substring(hx, (off - 1) * 2 + 1, 2), 16, 10
        ).cast("int")
        be16 = lambda off: b(off) * 256 + b(off + 1)
        is_jpeg = (F.substring(hx, 1, 4) == "FFD8") & (
            F.octet_length(c) >= 4
        )
        m1 = be16(3)
        l1 = be16(5)
        app1_off = (
            F.when(m1 == 0xFFE1, F.lit(3))
            .when(
                (m1 >= 0xFFE0) & (m1 <= 0xFFEF),
                F.when(be16(5 + l1) == 0xFFE1, 5 + l1),
            )
        )

        def with_seg(seg: Column) -> Column:
            has_magic = (
                F.substring(hx, (seg + 4 - 1) * 2 + 1, 12)
                == "457869660000"
            )
            tiff = seg + 10
            bo = F.substring(hx, (tiff - 1) * 2 + 1, 4)
            is_le = bo == "4949"
            u16 = lambda off: F.when(
                is_le, b(off) + b(off + 1) * 256
            ).otherwise(b(off) * 256 + b(off + 1))
            u32 = lambda off: F.when(
                is_le,
                b(off) + b(off + 1) * 256 + b(off + 2) * 65536
                + b(off + 3) * 16777216,
            ).otherwise(
                b(off) * 16777216 + b(off + 1) * 65536
                + b(off + 2) * 256 + b(off + 3),
            )
            tiff_ok = (bo.isin("4949", "4D4D")) & (u16(tiff + 2) == 42)
            has_exif = (
                is_jpeg
                & seg.isNotNull()
                & has_magic
                & tiff_ok
                & (F.octet_length(c) >= 32)
            )

            def with_ifd(ifd0: Column) -> Column:
                n_entries = u16(ifd0)
                ncap = F.least(n_entries, F.lit(int(max_entries)))
                ent = lambda off: F.struct(
                    u16(off).alias("tag"),
                    F.when(u16(off + 2) == 3, u16(off + 8))
                    .when(u16(off + 2) == 4, u32(off + 8))
                    .alias("val"),
                )
                entries = F.when(
                    has_exif & (ncap > 0),
                    F.transform(
                        F.sequence(F.lit(1), ncap),
                        lambda i: ent(ifd0 + 2 + (i - 1) * 12),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<tag:int,val:int>>")
                )

                def with_entries(es: Column) -> Column:
                    tagval = lambda t: F.try_element_at(
                        F.filter(es, lambda e: e["tag"] == t), F.lit(1)
                    )["val"]
                    g = lambda col: F.when(has_exif, col)
                    return F.struct(
                        F.coalesce(is_jpeg, F.lit(False)).alias(
                            "is_jpeg"
                        ),
                        F.coalesce(has_exif, F.lit(False)).alias(
                            "has_exif"
                        ),
                        g(
                            F.when(is_le, F.lit("II")).otherwise(
                                F.lit("MM")
                            )
                        ).alias("byte_order"),
                        g(n_entries).alias("n_ifd_entries"),
                        g(tagval(0x0112)).alias("orientation"),
                        g(tagval(0x0100).cast("long")).alias(
                            "image_width"
                        ),
                        g(tagval(0x0101).cast("long")).alias(
                            "image_length"
                        ),
                    )

                return _let(entries, with_entries)

            return _let(tiff + u32(tiff + 4), with_ifd)

        return _let(app1_off, with_seg)

    return _let(F.hex(F.substring(c, 1, 2048)), build)
