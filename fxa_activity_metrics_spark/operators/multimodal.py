"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention: a multimodal table carries
  - `blob BINARY` — the raw image/audio/video bytes,
  - `media_type STRING`, plus a typed metadata struct.

Decode / feature-extraction runs as Arrow-batched `mapInPandas`
(never row-at-a-time UDFs): each batch is a pandas DataFrame, the
codec library is invoked per batch, and partitioning is preserved so
a 100 TB corpus decodes embarrassingly parallel with zero shuffle.

Kernel status: image decode / resize are REAL, with no codec
library, for four formats behind one dispatch (`_image_parse`):
binary PPM (P6); 8-bit PNG (stdlib zlib inflate + numpy scanline
unfiltering of all five RFC 2083 filters — `_png_parse`, with
`png_encode` as the writing twin); 24-bit BI_RGB BMP; and BASELINE
JPEG (`_jpeg_parse` / `jpeg_encode` — the full ITU T.81 baseline
sequential pipeline from the public spec: Annex K quant + Huffman
tables, canonical code construction, DC-differential + AC
run-length entropy coding with byte stuffing, orthonormal 8×8 DCT,
YCbCr; 4:4:4 only — progressive, subsampled, and restart-interval
streams raise documented NotImplementedErrors). JPEG is lossy, so
it has PSNR-floor and determinism tests rather than an exact pixel
oracle (PNG/BMP/PPM hash-match the pixel-rule oracle exactly).
Audio features are REAL for RIFF PCM16 WAV. COMPRESSED blobs are
REAL for the zlib container format (magic ``FXZ1`` + DEFLATE
stream): every decode kernel transparently decompresses it first,
so the compress→store→decompress→decode chain runs end-to-end and
is oracle-checked (`blob_stats_compressed`, `phash_compressed`,
`phash_png`). VIDEO frame sampling is REAL for MJPEG-in-AVI
(`avi_encode` / `_avi_parse` / `sample_frames_batch`): the RIFF
container walk plus the in-repo JPEG decoder, emitting sampled
frames as P6 so they feed straight back into the image kernels;
inter-coded codecs (H.264/VP9) genuinely need ffmpeg and raise.
mp3/ogg audio still needs torchaudio/soundfile and raises — the
remaining stubs keep deterministic fake kernels pinning the Spark
plumbing (schema, batching, UDF signature, 1→N fan-out).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("blob_md5", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Testing helper: fabricate a binary payload column from a text
    column (`encode(text, 'utf-8')`). Real pipelines read blob columns
    straight from Parquet — BINARY is a first-class Parquet type."""
    return docs.withColumn("blob", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def blob_stats(docs: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Byte-level stats via mapInPandas — the canonical multimodal
    batch shape. Arrow moves the binary column in columnar batches;
    Python touches each batch once (vectorized), no per-row serde."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[blob_col].map(len).astype("int64"),
                    "blob_md5": pdf[blob_col].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return docs.select(id_col, blob_col).mapInPandas(compute, BLOB_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Compressed-blob container (the one REAL compressed codec path:
# stdlib zlib, no external library)
# ---------------------------------------------------------------------------

#: 4-byte container magic for a zlib-compressed blob. Chosen to be
#: distinct from every format the decode kernels dispatch on (P6 PPM,
#: RIFF WAV) so compressed and raw payloads can share a blob column.
ZLIB_MAGIC = b"FXZ1"


def maybe_decompress(b: bytes) -> bytes:
    """Transparent decompression: an ``FXZ1``-wrapped blob yields its
    DEFLATE-decompressed payload; anything else passes through
    unchanged. Every decode kernel calls this first, which is what
    makes compressed blobs first-class in the decode pipeline."""
    if b.startswith(ZLIB_MAGIC):
        import zlib

        return zlib.decompress(b[len(ZLIB_MAGIC) :])
    return b


def compress_blobs(
    docs: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    level: int = 6,
) -> DataFrame:
    """Wrap every blob as ``FXZ1`` + zlib stream — Arrow-batched
    mapInPandas, partition-preserving, zero shuffle (the storage-side
    half of the compressed-blob path; `maybe_decompress` in the
    decode kernels is the read-side half). Lossless by construction:
    tests + the `blob_stats_compressed` / `phash_compressed` oracles
    pin round-trip == identity."""
    import zlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    blob_col: pdf[blob_col].map(
                        lambda b: ZLIB_MAGIC + zlib.compress(bytes(b), level)
                    ),
                }
            )

    return docs.select(id_col, blob_col).mapInPandas(
        kernel, f"{id_col} long, {blob_col} binary"
    )


def decompress_blobs(
    docs: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Inverse of `compress_blobs`; non-``FXZ1`` blobs pass through."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    blob_col: pdf[blob_col].map(
                        lambda b: maybe_decompress(bytes(b))
                    ),
                }
            )

    return docs.select(id_col, blob_col).mapInPandas(
        kernel, f"{id_col} long, {blob_col} binary"
    )


def compressed_blob_stats(
    docs: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """`blob_stats` over compressed blobs: decompress in-kernel, then
    digest the DECOMPRESSED payload — (doc_id, n_bytes, blob_md5)
    describe the logical content, so the oracle is the same SQL as
    plain blob_stats and a broken codec shows up as a hash mismatch.
    One Arrow pass; no intermediate decompressed column is
    materialized."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf[blob_col].map(lambda b: maybe_decompress(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": raw.map(len).astype("int64"),
                    "blob_md5": raw.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return docs.select(id_col, blob_col).mapInPandas(compute, BLOB_STATS_SCHEMA)


def _ppm_parse(b: bytes):
    """Parse a binary PPM (P6) image: header tokens (magic, width,
    height, maxval; '#' comments allowed), then one whitespace byte,
    then h×w×3 raw samples. Pure numpy — no codec library."""
    import numpy as np

    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    i, tokens = 0, []
    while len(tokens) < 4:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        tokens.append(b[i:j])
        i = j
    i += 1  # exactly one whitespace byte after maxval
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )
    return w, h, maxval, data


# ---------------------------------------------------------------------------
# PNG codec — REAL, stdlib-only (zlib inflate + numpy scanline
# unfilter). No Pillow/libpng: the container lacks codec libraries,
# but PNG's format is simple enough to implement from the public spec
# (RFC 2083): chunked container, DEFLATE-compressed scanlines, five
# per-scanline predictive filters (None/Sub/Up/Average/Paeth).
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a, b, c):
    """Paeth predictor (RFC 2083 §6.6), vectorized over numpy arrays:
    pick whichever of left/up/up-left is closest to a + b - c."""
    import numpy as np

    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_encode(img, filter_mode: str = "mixed", level: int = 6) -> bytes:
    """Minimal PNG writer for 8-bit RGB (color type 2, non-interlaced).
    ``filter_mode='mixed'`` cycles the scanline filter as row % 5 —
    deliberately exercising every unfilter path in ``_png_parse`` (a
    single-filter file would leave four of them untested);
    ``'none'`` emits filter 0 everywhere. Used by ``synth_png_images``
    and tests; a production writer would pick filters per-row by
    heuristic, which only changes compression, not content."""
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    assert ch == 3, "png_encode writes 8-bit RGB"
    raw = img.reshape(h, w * 3).astype(np.int16)
    zero = np.zeros(w * 3, dtype=np.int16)
    out_rows = []
    for r in range(h):
        row, prior = raw[r], (raw[r - 1] if r else zero)
        left = np.concatenate([zero[:3], row[:-3]])
        ul = np.concatenate([zero[:3], prior[:-3]])
        f = (r % 5) if filter_mode == "mixed" else 0
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prior
        elif f == 3:
            filt = row - ((left + prior) >> 1)
        else:
            filt = row - _paeth(left, prior, ul)
        out_rows.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
    idat = zlib.compress(b"".join(out_rows), level)

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + tag + body + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, RGB, deflate, adaptive, no interlace
    )
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def _png_chunks(b: bytes):
    """Container half of the PNG decode: chunk walk (CRC-verified),
    header validation, zlib inflate of the concatenated IDATs.
    Returns (w, h, channels, ctype, stream) for the unfilter stage —
    shared by the single-image and batched decoders."""
    import zlib

    if not b.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    i, ihdr, idat = len(PNG_MAGIC), None, []
    while i + 8 <= len(b):
        size = int.from_bytes(b[i : i + 4], "big")
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + size]
        crc = int.from_bytes(b[i + 8 + size : i + 12 + size], "big")
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        i += 12 + size
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
    if depth != 8 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ctype} not supported")
    stream = zlib.decompress(b"".join(idat))
    if len(stream) != h * (w * channels + 1):
        raise ValueError("PNG pixel stream length mismatch")
    return w, h, channels, ctype, stream


def _png_parse_batch(blobs):
    """Batched REAL PNG decode, stdlib+numpy only: the container walk
    runs per image (streams differ), but same-shape images unfilter
    TOGETHER — each scanline's filter subsets are applied across the
    whole (n, rowbytes) stack, so the per-pixel Average/Paeth walks
    (intra-row data dependency, irreducible along x) cost one
    (n, bpp)-wide numpy op per pixel step instead of a 3-wide op per
    image (guide §4.2: batch the kernel, don't loop rows). Identical
    arithmetic to the historical per-image loop — same dtypes, same
    wraparound (uint8 add mod 256, int32 average >> 1, int64 cumsum
    & 0xFF) — so decoded pixels are bit-identical. Returns a list of
    (w, h, 255, h×w×3 uint8) in input order."""
    import numpy as np

    metas = [_png_chunks(b) for b in blobs]
    out: list = [None] * len(blobs)
    groups: dict = {}
    for i, (w, h, ch, _ct, _st) in enumerate(metas):
        groups.setdefault((w, h, ch), []).append(i)
    for (w, h, bpp), idxs in groups.items():
        rowbytes = w * bpp
        n = len(idxs)
        sl = np.stack(
            [
                np.frombuffer(metas[i][4], dtype=np.uint8).reshape(
                    h, rowbytes + 1
                )
                for i in idxs
            ]
        )
        recon = np.zeros((n, h, rowbytes), dtype=np.uint8)
        zero_row = np.zeros((n, rowbytes), dtype=np.uint8)
        for r in range(h):
            f = sl[:, r, 0]
            if np.any(f > 4):
                bad = int(f[f > 4][0])
                raise ValueError(f"PNG filter type {bad} invalid")
            raw = sl[:, r, 1:]
            prior = recon[:, r - 1] if r else zero_row
            m = f == 0
            if m.any():
                recon[m, r] = raw[m]
            m = f == 1  # Sub: per-channel prefix sum mod 256
            if m.any():
                recon[m, r] = (
                    (
                        np.cumsum(
                            raw[m].reshape(-1, w, bpp).astype(np.int64),
                            axis=1,
                        )
                        & 0xFF
                    )
                    .astype(np.uint8)
                    .reshape(-1, rowbytes)
                )
            m = f == 2  # Up
            if m.any():
                recon[m, r] = raw[m] + prior[m]  # uint8 wraps mod 256
            m = f == 3  # Average — intra-row dependency, walk pixels
            if m.any():
                rm = raw[m].astype(np.int32)
                pm = prior[m].astype(np.int32)
                row = np.empty((rm.shape[0], rowbytes), dtype=np.uint8)
                left = np.zeros((rm.shape[0], bpp), dtype=np.int32)
                for x in range(0, rowbytes, bpp):
                    px = (rm[:, x : x + bpp] + ((left + pm[:, x : x + bpp]) >> 1)) & 0xFF
                    row[:, x : x + bpp] = px
                    left = px
                recon[m, r] = row
            m = f == 4  # Paeth — intra-row dependency, walk pixels
            if m.any():
                rm = raw[m]
                pm = prior[m]
                row = np.empty((rm.shape[0], rowbytes), dtype=np.uint8)
                left = np.zeros((rm.shape[0], bpp), dtype=np.uint8)
                ul = np.zeros((rm.shape[0], bpp), dtype=np.uint8)
                for x in range(0, rowbytes, bpp):
                    up = pm[:, x : x + bpp]
                    px = rm[:, x : x + bpp] + _paeth(left, up, ul).astype(np.uint8)
                    row[:, x : x + bpp] = px
                    left, ul = px, up
                recon[m, r] = row
        for j, i in enumerate(idxs):
            ctype = metas[i][3]
            px = recon[j].reshape(h, w, bpp)
            if ctype == 0:
                px = np.repeat(px, 3, axis=2)
            elif ctype == 6:
                px = px[:, :, :3]
            out[i] = (w, h, 255, np.ascontiguousarray(px))
    return out


def _png_parse(b: bytes):
    """REAL PNG decode, stdlib+numpy only: chunk walk (CRC-verified),
    zlib inflate of the concatenated IDATs, then per-scanline
    unfiltering — Sub and Up vectorize fully (per-channel cumsum /
    row add); Average and Paeth carry an intra-row data dependency by
    design, so they walk pixels with numpy ops. 8-bit only; color
    types 0 (gray, replicated), 2 (RGB), 6 (RGBA, alpha dropped);
    non-interlaced. Returns (w, h, 255, h×w×3 uint8) — the same
    contract as ``_ppm_parse`` so every downstream kernel is
    format-blind. (Thin wrapper over the batch-of-one decode so the
    single-image API and the batched kernels share one code path.)"""
    return _png_parse_batch([b])[0]


def _bmp_parse(b: bytes):
    """REAL BMP decode for the classic uncompressed case: 24-bit
    BI_RGB with a BITMAPINFOHEADER. Rows are 4-byte padded, stored
    bottom-up (negative height = top-down, also handled), samples in
    BGR order — all pure numpy slicing. Returns the shared
    (w, h, 255, h×w×3 RGB uint8) contract."""
    import numpy as np

    if not b.startswith(b"BM"):
        raise ValueError("not a BMP")
    pix_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (got {bpp}-bit, "
            f"compression {compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    data = np.frombuffer(b, dtype=np.uint8, count=h * stride, offset=pix_off)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return w, h, 255, np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def bmp_encode(img) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer (bottom-up, 4-byte-padded
    rows) — the testing twin of ``_bmp_parse``."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    assert ch == 3, "bmp_encode writes 24-bit RGB"
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = body.tobytes()
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pix).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    off = 14 + 40
    hdr = (
        b"BM"
        + (off + len(pix)).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + off.to_bytes(4, "little")
    )
    return hdr + info + pix


# ---------------------------------------------------------------------------
# Baseline JPEG codec — REAL, numpy-only (ITU T.81 baseline
# sequential DCT, Annex K tables). No libjpeg: the full baseline
# pipeline — YCbCr, 8×8 orthonormal DCT, quality-scaled quantization,
# zigzag, DC-differential + AC run-length Huffman entropy coding with
# byte stuffing — is implemented from the public spec. 4:4:4 only
# (each component full resolution); subsampled (4:2:0) streams raise
# a documented NotImplementedError. JPEG is LOSSY, so unlike PNG/BMP
# there is no exact pixel oracle — tests pin PSNR floors, phash
# robustness, and decode determinism instead.
# ---------------------------------------------------------------------------

#: Annex K quantization tables (luminance / chrominance), row-major.
_JPEG_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K Huffman specs: (BITS[1..16], HUFFVAL). Encoder and decoder
#: derive canonical codes from the same spec, so self-consistency is
#: structural; the import-time asserts below pin len(vals)==sum(bits).
_JPEG_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_JPEG_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_JPEG_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
for _bits, _vals in (_JPEG_DC_LUMA, _JPEG_DC_CHROMA, _JPEG_AC_LUMA, _JPEG_AC_CHROMA):
    assert len(_vals) == sum(_bits), "Huffman spec BITS/HUFFVAL mismatch"


def _jpeg_zigzag():
    """The 8×8 zigzag scan order, generated (not hardcoded): walk
    anti-diagonals, alternating direction."""
    order = []
    for s in range(15):
        idxs = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and 0 <= j < 8]
        if s % 2 == 0:
            idxs.reverse()
        order.extend(r * 8 + c for r, c in idxs)
    return order


_ZIGZAG = _jpeg_zigzag()


def _jpeg_dct_matrix():
    """Orthonormal 8×8 DCT-II matrix M (F = M·B·Mᵀ, B = Mᵀ·F·M):
    M[u,x] = 0.5·C(u)·cos((2x+1)uπ/16), C(0)=1/√2 else 1 — the exact
    T.81 §A.3.3 definition in matrix form."""
    import math

    import numpy as np

    m = np.empty((8, 8))
    for u in range(8):
        c = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


def _jpeg_canonical_codes(bits, vals):
    """JPEG canonical Huffman assignment (T.81 Annex C): symbols in
    spec order get consecutive codes per length; code doubles when
    length grows. Returns {symbol: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_quant_tables(quality: int):
    """libjpeg-convention quality scaling of the Annex K tables."""
    import numpy as np

    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_JPEG_QT_LUMA, _JPEG_QT_CHROMA):
        t = [(min(255, max(1, (v * scale + 50) // 100))) for v in base]
        out.append(np.array(t, dtype=np.int32).reshape(8, 8))
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _jpeg_magnitude(v: int):
    """(category, value-bits) per T.81 §F.1.2.1: s = bit length of
    |v|; negatives are stored one's-complemented."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def jpeg_encode(img, quality: int = 90) -> bytes:
    """Baseline sequential JFIF encoder: 8-bit RGB in, 4:4:4, Annex K
    quant (quality-scaled) + Huffman tables. Pure numpy DCT path;
    the entropy coder is a per-block Python loop (encode is a test /
    synthesis tool — the hot decode path is the batch kernel)."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    assert ch == 3, "jpeg_encode writes 8-bit RGB"
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    comps = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    qt_l, qt_c = _jpeg_quant_tables(quality)
    m = _jpeg_dct_matrix()
    dc_specs = (_JPEG_DC_LUMA, _JPEG_DC_CHROMA, _JPEG_DC_CHROMA)
    ac_specs = (_JPEG_AC_LUMA, _JPEG_AC_CHROMA, _JPEG_AC_CHROMA)
    dc_codes = [_jpeg_canonical_codes(*s) for s in dc_specs]
    ac_codes = [_jpeg_canonical_codes(*s) for s in ac_specs]
    qts = (qt_l, qt_c, qt_c)

    bw = _BitWriter()
    pred = [0, 0, 0]
    bh, bwd = (h + 7) // 8, (w + 7) // 8
    padded = []
    for comp in comps:
        p = np.empty((bh * 8, bwd * 8))
        p[:h, :w] = comp
        p[h:, :w] = comp[h - 1 : h, :]  # edge-replicate pad
        p[:, w:] = p[:, w - 1 : w]
        padded.append(p)
    for by in range(bh):
        for bx in range(bwd):
            for ci in range(3):
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = m @ (block - 128.0) @ m.T
                qc = np.round(coef / qts[ci]).astype(np.int64)
                zz = qc.flatten()[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, vb = _jpeg_magnitude(diff)
                c, ln = dc_codes[ci][s]
                bw.put(c, ln)
                if s:
                    bw.put(vb, s)
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
                for i in range(1, last_nz + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[ci][0xF0]  # ZRL
                        bw.put(c, ln)
                        run -= 16
                    s, vb = _jpeg_magnitude(v)
                    c, ln = ac_codes[ci][(run << 4) | s]
                    bw.put(c, ln)
                    bw.put(vb, s)
                    run = 0
                if last_nz < 63:
                    c, ln = ac_codes[ci][0x00]  # EOB
                    bw.put(c, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tid: int, table) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(table.flatten()[z]) for z in _ZIGZAG))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3])
        + bytes([1, 0x11, 0])  # component 1: 1x1 sampling, QT 0
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qt_l)
        + dqt(1, qt_c)
        + dht(0, 0, _JPEG_DC_LUMA)
        + dht(1, 0, _JPEG_AC_LUMA)
        + dht(0, 1, _JPEG_DC_CHROMA)
        + dht(1, 1, _JPEG_AC_CHROMA)
        + sof
        + sos
        + scan
        + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing. Restart
    markers raise: this engine's encoder never emits DRI/RSTn, and a
    silently-approximate predictor reset would be worse than a loud
    boundary (T.81 §B.2.1.2 restart support is a documented gap)."""

    def __init__(self, data: bytes, start: int):
        self.d = data
        self.i = start
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.i >= len(self.d):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.n += 8
                continue
            byte = self.d[self.i]
            if byte == 0xFF:
                nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.i += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn
                    raise NotImplementedError(
                        "JPEG restart markers (DRI/RSTn) not supported"
                    )
                else:  # EOI / next marker: stop consuming
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            else:
                self.i += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_decode_huffman(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """Inverse of _jpeg_magnitude (T.81 §F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_parse(b: bytes):
    """REAL baseline JPEG decode: marker walk (DQT/DHT/SOF0/DRI/SOS),
    Huffman entropy decode with unstuffing and RST handling, dequant,
    de-zigzag, orthonormal IDCT, YCbCr→RGB. 4:4:4 (all sampling
    factors 1×1) only; progressive (SOF2) and subsampled streams
    raise NotImplementedError. Returns the shared
    (w, h, 255, h×w×3 uint8) contract."""
    import numpy as np

    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    i = 2
    qt: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    comps = []
    while i < len(b):
        if b[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = b[i + 1]
        if marker == 0xD9:
            raise ValueError("JPEG EOI before SOS")
        size = int.from_bytes(b[i + 2 : i + 4], "big")
        body = b[i + 4 : i + 2 + size]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tid = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                t = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    t[_ZIGZAG[k]] = body[j + 1 + k]
                qt[tid] = t.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                codes = _jpeg_canonical_codes(bits, vals)
                huff[(cls, tid)] = {(c, ln): sym for sym, (c, ln) in codes.items()}
                j += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:
            depth = body[0]
            hh = int.from_bytes(body[1:3], "big")
            ww = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if depth != 8 or nc not in (1, 3):
                raise NotImplementedError("only 8-bit 1/3-component JPEG")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (non-4:4:4) not supported"
                    )
                comps.append({"id": cid, "tq": tq})
            sof = (ww, hh, nc)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential JPEG (SOF0)")
        elif marker == 0xDA:
            ns = body[0]
            sel = {}
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 0xF)
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ww, hh, nc = sof
            m = _jpeg_dct_matrix()
            bh, bwd = (hh + 7) // 8, (ww + 7) // 8
            planes = [np.empty((bh * 8, bwd * 8)) for _ in range(nc)]
            br = _BitReader(b, i + 2 + size)
            pred = [0] * nc
            for by in range(bh):
                for bx in range(bwd):
                    for ci in range(nc):
                        dc_t = huff[(0, sel[comps[ci]["id"]][0])]
                        ac_t = huff[(1, sel[comps[ci]["id"]][1])]
                        zz = np.zeros(64, dtype=np.int64)
                        s = _jpeg_decode_huffman(br, dc_t)
                        diff = _jpeg_extend(br.bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _jpeg_decode_huffman(br, ac_t)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            s = rs & 0xF
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _jpeg_extend(br.bits(s), s)
                            k += 1
                        qtab = qt[comps[ci]["tq"]]
                        block = np.zeros(64, dtype=np.int64)
                        block[_ZIGZAG] = zz
                        coef = block.reshape(8, 8) * qtab
                        px = m.T @ coef.astype(np.float64) @ m + 128.0
                        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
            if nc == 1:
                y = np.clip(planes[0][:hh, :ww], 0, 255)
                rgb = np.repeat(y[:, :, None], 3, axis=2)
            else:
                y = planes[0][:hh, :ww]
                cb = planes[1][:hh, :ww] - 128.0
                cr = planes[2][:hh, :ww] - 128.0
                rgb = np.stack(
                    [
                        y + 1.402 * cr,
                        y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb,
                    ],
                    axis=2,
                )
                rgb = np.clip(rgb, 0, 255)
            return ww, hh, 255, np.ascontiguousarray(rgb.round().astype(np.uint8))
        i += 2 + size
    raise ValueError("JPEG missing SOS")


def _image_parse(b: bytes):
    """Format dispatch shared by every image kernel: P6 PPM, PNG,
    BMP, or baseline JPEG in, (w, h, maxval, h×w×3 uint8) out.
    Compressed container handled by the caller via
    ``maybe_decompress``."""
    if b.startswith(b"P6"):
        return _ppm_parse(b)
    if b.startswith(PNG_MAGIC):
        return _png_parse(b)
    if b.startswith(b"BM"):
        return _bmp_parse(b)
    if b.startswith(b"\xff\xd8"):
        return _jpeg_parse(b)
    raise NotImplementedError(
        "only PPM(P6), PNG (8-bit), BMP (24-bit BI_RGB), and baseline "
        "JPEG (SOF0, 4:4:4), optionally FXZ1/zlib-wrapped, decode "
        f"without external codec libraries; got magic {b[:2]!r}"
    )


def decode_image_batch(blobs: pd.Series) -> pd.DataFrame:
    """Image decode kernel. REAL for binary PPM (P6), 8-bit PNG,
    24-bit BMP, and baseline JPEG — pure-numpy parsers behind
    ``_image_parse``, no codec library needed; feature = (mean R,
    mean G, mean B, mean luminance), maxval-normalized. Unknown
    containers raise the documented boundary.
    """
    rows = []
    for b in blobs:
        b = maybe_decompress(bytes(b))
        w, h, maxval, data = _image_parse(b)
        means = data.reshape(-1, 3).mean(axis=0) / maxval
        luma = float(0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2])
        rows.append(
            {
                "width": w,
                "height": h,
                "feature": [float(means[0]), float(means[1]), float(means[2]), luma],
            }
        )
    return pd.DataFrame(rows)


def _fake_decode_image_batch(blobs: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode used by tests: derives (width,
    height, 4-dim feature) from the blob digest. Same signature and
    output shape as decode_image_batch."""
    rows = []
    for b in blobs:
        d = hashlib.md5(bytes(b)).digest()
        rows.append(
            {
                "width": 16 + d[0] % 64,
                "height": 16 + d[1] % 64,
                "feature": [float(d[i]) / 255.0 for i in range(4)],
            }
        )
    return pd.DataFrame(rows)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.FloatType()),
    ]
)


def resize_image_batch(blobs: pd.Series, width: int, height: int) -> pd.Series:
    """Resize kernel. REAL for PPM, PNG, BMP, and baseline JPEG:
    nearest-neighbor via numpy fancy indexing over the shared
    ``_image_parse`` decode. Output is re-emitted as P6 bytes
    regardless of input format (the cheap container — resize output
    is pipeline-internal)."""
    import numpy as np

    def resize_one(b) -> bytes:
        b = maybe_decompress(bytes(b))
        src_w, src_h, maxval, data = _image_parse(b)
        ys = (np.arange(height) * src_h) // height
        xs = (np.arange(width) * src_w) // width
        out = data[ys][:, xs]
        return f"P6\n{width} {height}\n{maxval}\n".encode() + out.tobytes()

    return blobs.map(resize_one)


def _fake_resize_batch(blobs: pd.Series, width: int, height: int) -> pd.Series:
    """Deterministic fake: 'resized' blob = md5(blob) || dims tag."""
    tag = f":{width}x{height}".encode()
    return blobs.map(lambda b: hashlib.md5(bytes(b)).digest() + tag)


def resize_images(
    docs: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    kernel=None,
) -> DataFrame:
    """Batch image resize over mapInPandas: blob in → resized blob
    out, partition-parallel, zero shuffle."""
    k = kernel or resize_image_batch

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "blob": k(pdf[blob_col], width, height),
                    "width": width,
                    "height": height,
                }
            )

    return docs.select(id_col, blob_col).mapInPandas(compute, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video — REAL, no external library: the RIFF container
# walk the WAV parser already does, with our own baseline-JPEG codec
# per frame. avi_encode writes the classic AVI layout (hdrl: avih +
# strl(vids/MJPG), movi: 00dc chunks); _avi_parse recovers the frame
# period and the per-frame JPEG streams. Modern inter-coded codecs
# (H.264/VP9) genuinely need ffmpeg and still raise — but frame
# sampling itself is no longer a stub.
# ---------------------------------------------------------------------------


def avi_encode(frames, fps: int = 10, quality: int = 90) -> bytes:
    """Minimal MJPEG-AVI writer: each frame (h×w×3 uint8, uniform
    dims) is JPEG-encoded into a word-aligned '00dc' chunk."""
    import numpy as np

    assert frames, "avi_encode needs at least one frame"
    h, w, _ = np.asarray(frames[0]).shape
    payloads = [jpeg_encode(np.asarray(f, dtype=np.uint8), quality) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + len(body).to_bytes(4, "little") + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    period_us = 1_000_000 // fps
    avih = chunk(
        b"avih",
        period_us.to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 3
        + len(frames).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (1).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4,
    )
    strh = chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + (0).to_bytes(4, "little") * 3  # flags, prio/lang, initial
        + (1).to_bytes(4, "little")  # dwScale
        + fps.to_bytes(4, "little")  # dwRate
        + (0).to_bytes(4, "little")  # start
        + len(frames).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 3  # bufsize, quality, sampleSize
        + (0).to_bytes(2, "little") * 2
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little"),
    )
    strf = chunk(
        b"strf",
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"MJPG"
        + (0).to_bytes(4, "little") * 5,
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _avi_parse(b: bytes):
    """Parse an MJPEG AVI: (frame_period_ms, [per-frame JPEG bytes]).
    Generic RIFF chunk walk (the WAV parser's shape, recursive into
    LISTs); the video stream must be MJPG — inter-coded codecs raise
    the documented boundary."""
    if b[0:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    period_us = None
    codec = None
    frames: list[bytes] = []

    def walk(data: bytes) -> None:
        nonlocal period_us, codec
        i = 0
        while i + 8 <= len(data):
            tag = data[i : i + 4]
            size = int.from_bytes(data[i + 4 : i + 8], "little")
            body = data[i + 8 : i + 8 + size]
            if tag == b"LIST":
                walk(body[4:])
            elif tag == b"avih":
                period_us = int.from_bytes(body[0:4], "little")
            elif tag == b"strh" and body[0:4] == b"vids":
                codec = body[4:8]
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                frames.append(body)
            i += 8 + size + (size & 1)  # word-aligned

    walk(b[12:])
    if period_us is None or not frames:
        raise ValueError("AVI missing avih header or frame chunks")
    if codec is not None and codec not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"only MJPEG AVI decodes without ffmpeg (stream codec {codec!r})"
        )
    return period_us / 1000.0, frames


def sample_frames_batch(blobs: pd.Series, every_ms: int) -> pd.DataFrame:
    """REAL video frame-sampling kernel for MJPEG AVI: walk the RIFF
    container, pick the frame under each every_ms timestamp
    (idx = floor(ts / period)), decode it with the in-repo baseline
    JPEG decoder, and emit it re-encoded as P6 — so sampled frames
    feed straight back into the image kernels (features / resize /
    pHash). One row PER SAMPLE with `_src` back-references, the 1→N
    contract `sample_video_frames` fans out."""
    rows = []
    for i, b in enumerate(blobs):
        b = maybe_decompress(bytes(b))
        period_ms, frames = _avi_parse(b)
        duration_ms = int(round(period_ms * len(frames)))
        for idx, ts in enumerate(range(0, duration_ms, every_ms)):
            fi = min(int(ts / period_ms), len(frames) - 1)
            w, h, _mx, px = _jpeg_parse(frames[fi])
            rows.append(
                {
                    "_src": i,
                    "frame_idx": idx,
                    "frame_ts_ms": ts,
                    "frame": f"P6\n{w} {h}\n255\n".encode() + px.tobytes(),
                }
            )
    return pd.DataFrame(rows, columns=["_src", "frame_idx", "frame_ts_ms", "frame"])


def _fake_sample_frames_batch(blobs: pd.Series, every_ms: int) -> pd.DataFrame:
    """Deterministic fake: blob length picks a fake duration; one
    'frame' (digest slice) per every_ms step. Returns one row PER
    FRAME with a `_src` index back into the input batch."""
    rows = []
    for i, b in enumerate(blobs):
        b = bytes(b)
        duration_ms = 1000 + (len(b) % 5) * 1000
        for idx, ts in enumerate(range(0, duration_ms, every_ms)):
            d = hashlib.md5(b + ts.to_bytes(8, "big")).digest()
            rows.append({"_src": i, "frame_idx": idx, "frame_ts_ms": ts, "frame": d})
    return pd.DataFrame(rows, columns=["_src", "frame_idx", "frame_ts_ms", "frame"])


def sample_video_frames(
    docs: DataFrame,
    every_ms: int = 1000,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    kernel=None,
) -> DataFrame:
    """Frame sampling: one input row fans out to N frame rows — the
    mapInPandas iterator shape handles 1→N naturally (no explode of a
    giant materialized array)."""
    k = kernel or sample_frames_batch

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = k(pdf[blob_col], every_ms)
            frames.insert(0, "doc_id", pdf[id_col].values[frames["_src"].values])
            yield frames.drop(columns=["_src"]).astype(
                {"frame_idx": "int32", "frame_ts_ms": "int64"}
            )

    return docs.select(id_col, blob_col).mapInPandas(compute, FRAMES_SCHEMA)


def audio_features_batch(blobs: pd.Series) -> pd.DataFrame:
    """Audio feature kernel. REAL for RIFF/WAVE PCM16 — a pure-numpy
    chunk parser (fmt + data), yielding duration_ms / sample_rate /
    rms over normalized samples. Compressed audio (mp3/ogg/flac)
    needs torchaudio/soundfile and raises."""
    import numpy as np

    rows = []
    for b in blobs:
        b = maybe_decompress(bytes(b))
        if b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise NotImplementedError(
                "only PCM WAV decodes without torchaudio/soundfile"
            )
        i, fmt, data = 12, None, None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            size = int.from_bytes(b[i + 4 : i + 8], "little")
            body = b[i + 8 : i + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        channels = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if bits != 16:
            raise NotImplementedError("only PCM16 WAV supported")
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        n_frames = len(samples) // max(channels, 1)
        rows.append(
            {
                "duration_ms": int(n_frames * 1000 // max(rate, 1)),
                "sample_rate": rate,
                "rms": float(np.sqrt((samples * samples).mean())) if len(samples) else 0.0,
            }
        )
    return pd.DataFrame(rows)


def _fake_audio_features_batch(blobs: pd.Series) -> pd.DataFrame:
    rows = []
    for b in blobs:
        d = hashlib.md5(bytes(b)).digest()
        rows.append(
            {
                "duration_ms": 500 + int.from_bytes(d[:2], "big") % 10000,
                "sample_rate": [8000, 16000, 44100][d[2] % 3],
                "rms": float(d[3]) / 255.0,
            }
        )
    return pd.DataFrame(rows)


def audio_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    kernel=None,
) -> DataFrame:
    k = kernel or audio_features_batch

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = k(pdf[blob_col])
            feats.insert(0, "doc_id", pdf[id_col].values)
            yield feats

    return docs.select(id_col, blob_col).mapInPandas(compute, AUDIO_FEATURES_SCHEMA)


def _phash_dct_table(n: int = 16, k: int = 8, scale: int = 64) -> list[list[int]]:
    """Integer-quantized DCT-II basis: q[u][x] = round(scale ·
    cos(π(2x+1)u / 2n)) for u < k, x < n. Quantizing to integers
    makes the whole pHash INTEGER arithmetic — bit-exact across
    numpy, the JVM, and the DuckDB oracle (the same trick JPEG
    integer-DCT hardware uses). The table is generated here once and
    the oracle SQL embeds these exact integers."""
    import math

    return [
        [round(scale * math.cos(math.pi * (2 * x + 1) * u / (2 * n))) for x in range(n)]
        for u in range(k)
    ]


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.StringType()),
        T.StructField("phash_hi", T.LongType()),
        T.StructField("phash_lo", T.LongType()),
    ]
)


# Sub-chunk width for the batched pHash kernel (ADVICE r14): the
# Arrow batch is up to 10k rows, and decoding the WHOLE batch before
# hashing holds every decoded pixel array (plus, for PNG, every
# inflated IDAT stream and the per-group recon stacks) at once —
# O(batch) peak task memory, multiple GB on large images. Chunking
# bounds the peak to O(chunk) while keeping the batching wins (the
# stack-wide unfilter/DCT amortization saturates well below this
# width). Per-image arithmetic is composition-independent, so hashes
# are bit-identical at any chunk width (pinned by
# test_phash_batch_matches_per_image_across_mixed_batches).
_PHASH_CHUNK = 512


def phash_batch(blobs: pd.Series) -> pd.DataFrame:
    """Perceptual image hash kernel (classic 8×8-DCT pHash over the
    real decode — P6 PPM or PNG, format-blind via ``_image_parse``):
    decode → integer luminance (299R+587G+114B)
    → nearest-neighbor 16×16 → integer DCT → 8×8 low-frequency block
    → bit u·8+v set iff its coefficient exceeds the median of the 63
    AC coefficients (the 32nd-smallest value; DC excluded and its bit
    always 0). All-integer, so the 64-bit hash is bit-exact across
    engines. Perceptually-identical images (1-pixel jitter, small
    noise) collide; different images are distant in Hamming space."""
    import numpy as np

    vals = list(blobs)
    parts = [
        _phash_chunk(vals[i : i + _PHASH_CHUNK])
        for i in range(0, len(vals), _PHASH_CHUNK)
    ]
    hashes = (
        np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint64)
    )
    return pd.DataFrame(
        {
            "phash": [f"{int(v):016x}" for v in hashes],
            "phash_hi": (hashes >> np.uint64(32)).astype(np.int64),
            "phash_lo": (hashes & np.uint64(0xFFFFFFFF)).astype(np.int64),
        },
        columns=["phash", "phash_hi", "phash_lo"],
    )


def _phash_chunk(blobs: list) -> "np.ndarray":
    """Decode + hash one bounded sub-chunk; returns uint64 hashes in
    input order. Intermediates (inflated streams, decoded pixel
    stacks) die with the chunk."""
    import numpy as np

    q = np.array(_phash_dct_table(), dtype=np.int64)  # 8 × 16
    raws = [maybe_decompress(bytes(b)) for b in blobs]
    n = len(raws)
    # Decode: PNGs batch (the per-pixel Average/Paeth unfilter walks
    # amortize across same-shape images); other containers are cheap
    # header-and-slice parses, decoded per image.
    decoded: list = [None] * n
    png_idx = [i for i, b in enumerate(raws) if b.startswith(PNG_MAGIC)]
    if png_idx:
        for i, parsed in zip(
            png_idx, _png_parse_batch([raws[i] for i in png_idx])
        ):
            decoded[i] = parsed
    for i, b in enumerate(raws):
        if decoded[i] is None:
            decoded[i] = _image_parse(b)
    # Hash: everything after decode is shape-uniform linear algebra —
    # stack same-shape images and run ONE batched resize/luma/DCT/
    # median/bitpack instead of ~30 tiny numpy calls per image
    # (guide §4.2). All-integer int64 arithmetic: the batched matmuls
    # sum the same integers, so hashes are bit-identical to the
    # historical per-image loop.
    hashes = np.zeros(n, dtype=np.uint64)
    groups: dict = {}
    for i, (w, h, _mv, _data) in enumerate(decoded):
        groups.setdefault((h, w), []).append(i)
    for (h, w), idxs in groups.items():
        ys = (np.arange(16) * h) // 16
        xs = (np.arange(16) * w) // 16
        stack = np.stack([decoded[i][3] for i in idxs])  # (k, h, w, 3)
        img = stack[:, ys][:, :, xs].astype(np.int64)  # (k, 16, 16, 3)
        luma = (
            299 * img[..., 0] + 587 * img[..., 1] + 114 * img[..., 2]
        )  # (k, 16, 16) indexed [y, x]
        # C[u][v] = Σ_x Σ_y luma[y][x] · q[u][x] · q[v][y], idx = u*8+v
        tmp = np.matmul(q, luma)  # (k, 8, 16): Σ_y q[v,y]·luma[y,x]
        coef = (
            np.matmul(tmp, q.T).transpose(0, 2, 1).reshape(len(idxs), 64)
        )  # [k, u, v]
        med = np.sort(coef[:, 1:], axis=1)[:, 31]  # 32nd-smallest AC
        bits = coef > med[:, None]
        bits[:, 0] = False
        b8 = np.packbits(bits, axis=1, bitorder="little")  # (k, 8) uint8
        hv = np.zeros(len(idxs), dtype=np.uint64)
        for byte in range(8):
            hv |= b8[:, byte].astype(np.uint64) << np.uint64(8 * byte)
        hashes[idxs] = hv
    return hashes


def phash_images(
    docs: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    kernel=None,
) -> DataFrame:
    """Perceptual hashes over mapInPandas — partition-parallel, zero
    shuffle; feeds ``phash_pairs`` (the multimodal arm of the dedup
    family)."""
    k = kernel or phash_batch

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = k(pdf[blob_col])
            hashes.insert(0, "doc_id", pdf[id_col].values)
            yield hashes

    return docs.select(id_col, blob_col).mapInPandas(compute, PHASH_SCHEMA)


def phash_pairs(hashes: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Perceptual near-duplicate pairs: every (id_a < id_b) with
    Hamming(phash_a, phash_b) ≤ max_hamming.

    Banded like the text-side MinHash-LSH: the 64-bit hash splits
    into 8 bands of 8 bits; by pigeonhole a pair within Hamming
    ``max_hamming ≤ 7`` shares at least one UNTOUCHED band, so the
    band equi-join is EXACT (identical rows to the all-pairs scan —
    that is the oracle). The Hamming verify is JVM-side bit_count
    over the xor'd halves.

    The band join runs over DISTINCT hashes, not over documents:
    each 8-bit band has only 256 values, so banding N document rows
    directly saturates at corpus scale — at 500k docs every band
    bucket holds ~2000 rows and the join emits ~10⁹ intermediate
    pairs (measured 400 s / gate-flagged on the sf10 organic corpus;
    the r13 gate's first real catch). Duplicate images collapse to
    one hash row here, so the quadratic-in-bucket term scales with
    hash DIVERSITY, not with duplicate mass; candidate hash pairs
    (including the equal-hash pair) then expand back to id pairs
    through two equi-joins — output-bound, since those rows ARE the
    answer. Output identical to the document-banded form (oracle
    unchanged).
    """
    if max_hamming >= 8:
        raise ValueError("banded join is exact only for max_hamming <= 7")
    # The hash frame feeds THREE consumers (the distinct band base and
    # the two id-expansion sides) whose exchange subtrees differ, so
    # without a persist the upstream decode/DCT pipeline — by far the
    # expensive part — executes once per consumer (measured 4x the
    # single-pass executor time at sf0.1). Persist the tiny
    # (id, 16-byte hash) proxy once and decide everything on it: the
    # guide-§8 shape — heavy bytes decoded once, decisions on small
    # rows. Tracked for the caller's cacheutil.release_all().
    from fxa_activity_metrics_spark import cacheutil

    hashes = cacheutil.track(
        hashes.select("doc_id", "phash_hi", "phash_lo").persist()
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("b"),
                F.shiftright(F.col("phash_hi"), 8 * i)
                .bitwiseAND(F.lit(255))
                .alias("v"),
            )
            for i in range(4)
        ],
        *[
            F.struct(
                F.lit(4 + i).alias("b"),
                F.shiftright(F.col("phash_lo"), 8 * i)
                .bitwiseAND(F.lit(255))
                .alias("v"),
            )
            for i in range(4)
        ],
    )
    dh = hashes.select("phash_hi", "phash_lo").distinct()
    base = dh.select("phash_hi", "phash_lo", F.explode(bands).alias("k"))
    a = base.select(
        F.col("phash_hi").alias("hi_a"), F.col("phash_lo").alias("lo_a"), "k"
    )
    b = base.select(
        F.col("phash_hi").alias("hi_b"), F.col("phash_lo").alias("lo_b"), "k"
    )
    ham = F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))) + F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    )
    # canonical unordered hash pairs, INCLUDING the equal-hash pair
    # (hamming 0 — exact perceptual duplicates expand through it)
    hp = (
        a.join(b, "k")
        .filter(
            (F.col("hi_a") < F.col("hi_b"))
            | (
                (F.col("hi_a") == F.col("hi_b"))
                & (F.col("lo_a") <= F.col("lo_b"))
            )
        )
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("hi_a", "lo_a", "hi_b", "lo_b", "hamming")
        .dropDuplicates(["hi_a", "lo_a", "hi_b", "lo_b"])
    )
    ma = hashes.select(
        F.col("doc_id").alias("id_x"),
        F.col("phash_hi").alias("hi_a"),
        F.col("phash_lo").alias("lo_a"),
    )
    mb = hashes.select(
        F.col("doc_id").alias("id_y"),
        F.col("phash_hi").alias("hi_b"),
        F.col("phash_lo").alias("lo_b"),
    )
    return (
        hp.join(ma, ["hi_a", "lo_a"])
        .join(mb, ["hi_b", "lo_b"])
        .filter(F.col("id_x") != F.col("id_y"))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
            "hamming",
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def _synth_pixels(d: int, xx, yy, groups: int, height: int, width: int):
    """The shared synthetic pixel rule (group pattern + per-member
    one-pixel jitter) — ONE definition feeding both the PPM and PNG
    synthesizers, so the two encodings are pixel-identical twins and
    the format-independent pHash oracle covers both."""
    import numpy as np

    g = d % groups
    img = np.empty((height, width, 3), np.uint8)
    # the linear terms wrap mod 256, so g and g+256 would render the
    # SAME pattern — the quadratic (g//256)-scaled term keeps patterns
    # perceptually distinct past 256 groups (it is exactly zero for
    # g < 256, so every oracle-pinned use — groups ≤ 256 — is
    # bit-identical to the pre-r13 rule)
    hi = g // 256
    img[:, :, 0] = (g * 31 + xx * 7 + yy * 13 + hi * xx * yy) % 256
    img[:, :, 1] = (g * 17 + xx * 11 + yy * 5 + hi * (xx + 3) * yy) % 256
    img[:, :, 2] = (g * 23 + xx * 3 + yy * 19 + hi * xx * (yy + 5)) % 256
    m = d // groups
    img[(m * 13) % height, (m * 7) % width, 0] ^= 4
    return img


def synth_ppm_images(
    docs: DataFrame,
    id_col: str = "doc_id",
    width: int = 24,
    height: int = 24,
    groups: int = 50,
) -> DataFrame:
    """Deterministic synthetic P6 blobs with KNOWN duplicate groups:
    the pixel pattern depends on ``doc_id % groups`` (so ids sharing
    a group are perceptually identical), plus a per-member one-pixel
    jitter (xor 4 on one red sample) that pHash must shrug off. Used
    by the phash queries/tests; real pipelines read blob columns
    straight from Parquet."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:height, 0:width]
        for pdf in batches:
            blobs = [
                f"P6\n{width} {height}\n255\n".encode()
                + _synth_pixels(int(d), xx, yy, groups, height, width).tobytes()
                for d in pdf[id_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "blob": blobs})

    return docs.select(id_col).mapInPandas(
        kernel, f"{id_col} long, blob binary"
    )


def synth_png_images(
    docs: DataFrame,
    id_col: str = "doc_id",
    width: int = 24,
    height: int = 24,
    groups: int = 50,
) -> DataFrame:
    """PNG twin of ``synth_ppm_images``: the SAME pixel rule, encoded
    as real PNG with the scanline filter cycling row % 5 — every
    decode must run zlib inflate plus all five unfilters to recover
    the pixels, so a pHash over these matching the format-independent
    oracle proves the PNG decode end-to-end."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:height, 0:width]
        for pdf in batches:
            blobs = [
                png_encode(
                    _synth_pixels(int(d), xx, yy, groups, height, width),
                    filter_mode="mixed",
                )
                for d in pdf[id_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "blob": blobs})

    return docs.select(id_col).mapInPandas(
        kernel, f"{id_col} long, blob binary"
    )


def image_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    kernel=None,
) -> DataFrame:
    """Image decode + feature extraction over mapInPandas.

    ``kernel`` is a batch function pd.Series[bytes] → pd.DataFrame
    (width, height, feature); defaults to the real (stubbed) decoder.
    Partition-parallel, shuffle-free; batch size follows
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    k = kernel or decode_image_batch

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = k(pdf[blob_col])
            feats.insert(0, "doc_id", pdf[id_col].values)
            yield feats

    return docs.select(id_col, blob_col).mapInPandas(compute, IMAGE_FEATURES_SCHEMA)
