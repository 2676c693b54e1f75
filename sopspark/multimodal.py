"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side machinery here is real and tested — schema, partitioning,
UDF signatures, batch shapes, error quarantine. Codec status: PNG
(:func:`decode_png`), baseline AND progressive JPEG
(:mod:`sopspark.jpegcodec` — numpy Huffman+IDCT; SOF0/SOF1/SOF2 incl.
spectral selection and successive approximation), WAV
(:func:`decode_wav`), and APNG video frames (:func:`decode_apng_frames`)
decode FOR REAL with stdlib+numpy code; the remaining formats
(arithmetic-coded JPEG, mp3, mp4) need codec libraries absent from this
container, so ``decode_image`` raises ``NotImplementedError`` for them
unless ``fake=True``, in which
case a deterministic fake decoder (seeded from the bytes) produces stable
"features" so the distributed plumbing can still be exercised end-to-end.

Schema convention (one row per asset):
    asset_id: bigint, modality: string(image|audio|video), payload: binary,
    mime: string, width/height/duration_ms: nullable metadata, err: string

At 100 TB: payloads are large → ``spark.sql.files.maxPartitionBytes`` keeps
scan partitions bounded; feature extraction is per-row independent →
``mapInPandas`` with modest Arrow batch sizes (payload bytes dominate
memory, so cap ``maxRecordsPerBatch`` low for binary-heavy tables);
frame-sampling explodes one video row into N frame rows — an iterator UDF
yields incrementally, never materializing a whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id bigint, modality string, payload binary, mime string, "
    "width int, height int, duration_ms int, err string"
)

FEATURE_SCHEMA = "asset_id bigint, feature array<float>, feat_dim int, err string"
FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame_payload binary, err string"


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> np.ndarray:
    """Pure-python PNG decoder (stdlib zlib only) → HxWx3 uint8.

    Supports the common web profile: 8-bit depth, color types 0/2/3/4/6
    (gray, RGB, palette, gray+alpha, RGBA), all five scanline filters,
    non-interlaced. Alpha is dropped; gray replicates to RGB. Interlaced /
    16-bit / sub-byte-depth PNGs raise ``ValueError`` (quarantined by the
    ``err`` channel upstream, never a job kill)."""
    import zlib

    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr, plte = 8, [], None, None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bitd, ctype, _comp, _filt, interlace = ihdr[8:13]
    if bitd != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (bit depth {bitd}, interlace {interlace})")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(h):
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1)
        off += stride + 1
        if f == 0:
            cur = line.copy()
        elif f == 2:  # Up — uint8 addition wraps mod 256, exactly the spec
            cur = line + prev
        elif f == 1:  # Sub — per-channel prefix sum mod 256, vectorized
            cur = np.cumsum(line.reshape(w, nch), axis=0, dtype=np.uint64).astype(np.uint8).reshape(stride)
        elif f in (3, 4):  # Average / Paeth — sequential in x by pixel
            l2 = line.reshape(w, nch).astype(np.int16)
            p2 = prev.reshape(w, nch).astype(np.int16)
            c2 = np.empty((w, nch), np.int16)
            zero = np.zeros(nch, np.int16)
            for x in range(w):
                a = c2[x - 1] if x > 0 else zero
                b = p2[x]
                if f == 3:
                    c2[x] = (l2[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = p2[x - 1] if x > 0 else zero
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                    c2[x] = (l2[x] + pred) & 0xFF
            cur = c2.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"bad PNG filter {f}")
        img[y] = cur
        prev = cur
    px = img.reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return pal[px[..., 0]]
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    if ctype == 6:
        return px[..., :3].copy()
    return px


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (RGB, filter 0 per scanline) — the test/synth
    twin of :func:`decode_png`."""
    import zlib

    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h))
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


WAV_SIG = b"RIFF"


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Pure-python WAV (RIFF PCM) decoder → (sample_rate, float32 mono in
    [-1, 1]).

    Supports the common profile: PCM uint8 / int16 / int32 and IEEE
    float32, any channel count (averaged to mono). Compressed codecs
    (ADPCM, mp3-in-wav) raise ``ValueError`` — quarantined via the ``err``
    channel upstream, same as undecodable PNGs."""
    if data[:4] != WAV_SIG or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        ln = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    nch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if nch < 1:
        raise ValueError("WAV with zero channels")
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(pcm, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(pcm, "<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(pcm, "<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV (format {audio_fmt}, {bits}-bit)")
    n = (x.size // nch) * nch
    return rate, x[:n].reshape(-1, nch).mean(axis=1)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal 16-bit PCM mono WAV encoder — the test/synth twin of
    :func:`decode_wav`."""
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


AUDIO_FEATURE_SCHEMA = (
    "asset_id bigint, sample_rate int, duration_ms int, rms float, "
    "zcr float, peak float, bands array<float>, err string"
)


def extract_audio_features(assets: DataFrame, n_bands: int = 12) -> DataFrame:
    """Decode WAV → per-asset acoustic features, Arrow-batched: RMS,
    zero-crossing rate, peak amplitude, and ``n_bands`` log-spaced FFT
    magnitude bands (numpy rfft — no external DSP libs). Per-row
    independent → mapInPandas; undecodable payloads quarantine in ``err``."""

    def one(aid, payload):
        try:
            rate, x = decode_wav(bytes(payload))
            if x.size == 0:
                raise ValueError("empty WAV data chunk")
            rms = float(np.sqrt(np.mean(x * x)))
            zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            peak = float(np.max(np.abs(x)))
            mag = np.abs(np.fft.rfft(x))
            edges = np.unique(
                np.geomspace(1, mag.size, n_bands + 1).astype(int)
            )
            bands = [
                float(np.mean(mag[a:b])) if b > a else 0.0
                for a, b in zip(edges[:-1], edges[1:])
            ]
            bands += [0.0] * (n_bands - len(bands))
            dur = int(round(1000.0 * x.size / rate))
            return (aid, rate, dur, rms, zcr, peak, bands, None)
        except Exception as e:  # quarantine, don't kill the job
            return (aid, None, None, None, None, None, None, f"decode error: {e}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [one(a, p) for a, p in zip(pdf["asset_id"].values, pdf["payload"].values)]
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "sample_rate", "duration_ms", "rms", "zcr",
                    "peak", "bands", "err",
                ],
            )

    return (
        assets.where(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array.

    PNG payloads decode for real (:func:`decode_png`, stdlib-only — the
    round-2 codec stub is gone for PNG), and JPEG decodes for real too
    (:mod:`sopspark.jpegcodec`, numpy Huffman+IDCT — baseline since
    round 4, progressive/SOF2 since round 5; arithmetic-coded JPEG still
    raises). Other formats (mp3/mp4 in image
    position, webp, ...) need codec libraries absent from this container:
    ``fake=True`` falls back to a deterministic 8x8x3 array seeded by the
    payload digest — stable across executors/runs — and ``fake=False``
    raises ``NotImplementedError``.
    """
    if payload[:8] == PNG_SIG:
        return decode_png(bytes(payload))
    if payload[:3] == b"\xff\xd8\xff":
        from sopspark.jpegcodec import decode_jpeg

        return decode_jpeg(bytes(payload))
    if not fake:
        raise NotImplementedError(
            "non-PNG/JPEG image decoding requires an imaging library not present in "
            "this environment; use PNG/JPEG payloads or fake=True for plumbing tests"
        )
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def resize_image(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy — no external libs)."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]


def extract_features(
    assets: DataFrame, feat_dim: int = 16, fake: bool = True
) -> DataFrame:
    """Decode → resize → mean-pool feature vector per asset, batched.

    Errors (undecodable payloads) land in the ``err`` column — the same
    inline quarantine channel the RDF parser uses."""

    def one(aid, payload):
        try:
            img = decode_image(bytes(payload), fake=fake)
            small = resize_image(img, 4, 4)
            feat = small.astype("float32").reshape(-1)[:feat_dim]
            feat = np.pad(feat, (0, max(0, feat_dim - feat.size)))
            return (aid, feat.tolist(), feat_dim, None)
        except Exception as e:  # quarantine, don't kill the job
            return (aid, None, None, f"decode error: {e}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decoding is inherently per-asset; iterate over raw numpy buffers
            # (zip of .values) — no pandas Series boxing per row (iterrows)
            out = [one(a, p) for a, p in zip(pdf["asset_id"].values, pdf["payload"].values)]
            yield pd.DataFrame(out, columns=["asset_id", "feature", "feat_dim", "err"])

    return assets.select("asset_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def _chunk(typ: bytes, body: bytes) -> bytes:
    """One PNG chunk: length + type + body + CRC (shared by every encoder
    in this module)."""
    import zlib

    return (
        len(body).to_bytes(4, "big") + typ + body
        + zlib.crc32(typ + body).to_bytes(4, "big")
    )


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        yield typ, data[pos + 8:pos + 8 + ln]
        pos += 12 + ln


def decode_apng_frames(data: bytes) -> list[tuple[int, bytes]]:
    """APNG (animated PNG) → [(delay_ms, single-frame PNG bytes)].

    Real, stdlib-only: each frame's fdAT chunks are re-wrapped as IDAT
    under a frame-sized IHDR, yielding standalone PNGs that
    :func:`decode_png` decodes. Supported profile: full-canvas frames
    (blend SOURCE over the whole canvas — the common screen-capture /
    synthetic shape); partial-canvas or blend-OVER frames raise
    ``ValueError`` (quarantined upstream, never a job kill)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG/APNG (bad signature)")
    ihdr = plte = None
    actl = False
    frames: list[tuple[int, bytes]] = []
    cur: dict | None = None  # {'w','h','delay','data':[...]}
    first_is_frame = False
    default_idat: list[bytes] = []

    for typ, chunk in _png_chunks(data):
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"acTL":
            actl = True
        elif typ == b"fcTL":
            # malformed layouts are ValueErrors (the documented quarantine
            # contract), never TypeError/IndexError
            if ihdr is None:
                raise ValueError("malformed APNG (fcTL before IHDR)")
            if len(chunk) < 26:
                raise ValueError("malformed APNG (truncated fcTL)")
            if cur is not None:
                frames.append((cur["delay"], _frame_png(ihdr, plte, cur)))
            w = int.from_bytes(chunk[4:8], "big")
            h = int.from_bytes(chunk[8:12], "big")
            cw = int.from_bytes(ihdr[0:4], "big")
            ch = int.from_bytes(ihdr[4:8], "big")
            if (w, h) != (cw, ch) or chunk[12:20] != b"\x00" * 8:
                raise ValueError("unsupported APNG (partial-canvas frame)")
            blend = chunk[25]
            if blend != 0:  # APNG_BLEND_OP_SOURCE only
                raise ValueError("unsupported APNG (blend OVER)")
            num = int.from_bytes(chunk[20:22], "big")
            den = int.from_bytes(chunk[22:24], "big") or 100
            delay_ms = int(1000 * num / den)
            cur = {"w": w, "h": h, "delay": delay_ms, "data": []}
            if not default_idat:
                first_is_frame = True
        elif typ == b"IDAT":
            default_idat.append(chunk)
            if cur is not None and first_is_frame and not frames:
                cur["data"].append(chunk)
        elif typ == b"fdAT":
            if cur is None:
                raise ValueError("fdAT before fcTL")
            cur["data"].append(chunk[4:])  # strip the sequence number
        elif typ == b"IEND":
            break
    if not actl:
        raise ValueError("not animated (no acTL chunk)")
    if cur is not None:
        frames.append((cur["delay"], _frame_png(ihdr, plte, cur)))
    if not frames:
        raise ValueError("APNG with no frames")
    return frames


def _frame_png(ihdr: bytes, plte: bytes | None, cur: dict) -> bytes:
    """Assemble a standalone PNG for one APNG frame."""
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    for d in cur["data"]:
        out += _chunk(b"IDAT", d)
    return out + _chunk(b"IEND", b"")


def encode_apng(frames: list[np.ndarray], delay_ms: int = 100) -> bytes:
    """Minimal APNG encoder (RGB full-canvas frames, blend SOURCE) — the
    synth/test twin of :func:`decode_apng_frames`."""
    import zlib

    h, w, _ = frames[0].shape
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", len(frames).to_bytes(4, "big") + (0).to_bytes(4, "big"))
    seq = 0
    for i, img in enumerate(frames):
        fctl = (
            seq.to_bytes(4, "big")
            + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
            + delay_ms.to_bytes(2, "big") + (1000).to_bytes(2, "big")
            + bytes([0, 0])  # dispose NONE, blend SOURCE
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        raw = b"".join(b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h))
        comp = zlib.compress(raw)
        if i == 0:
            out += _chunk(b"IDAT", comp)
        else:
            out += _chunk(b"fdAT", seq.to_bytes(4, "big") + comp)
            seq += 1
    return out + _chunk(b"IEND", b"")


def sample_frames(assets: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video → frame rows (1 per ``every_ms``). The explode happens inside
    an iterator UDF — rows yielded incrementally, bounded memory.

    APNG payloads decode FOR REAL (:func:`decode_apng_frames` — each
    emitted frame_payload is a standalone PNG, and event-time sampling
    picks the nearest frame at each ``every_ms`` tick). Other containers
    (mp4 etc.) need codec libraries absent here: ``fake=True`` emits
    deterministic digests so the plumbing still runs; ``fake=False``
    quarantines them via the err column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            cols = zip(
                pdf["asset_id"].values, pdf["payload"].values, pdf["duration_ms"].values
            )
            for aid, payload, dur in cols:
                base = bytes(payload)
                if base[:8] == PNG_SIG:
                    try:
                        frames = decode_apng_frames(base)
                        # frame timeline → nearest frame per sampling tick
                        starts, t = [], 0
                        for delay, png in frames:
                            starts.append((t, png))
                            t += max(1, delay)
                        total = t
                        k = 0
                        for i, tick in enumerate(range(0, total, every_ms)):
                            while k + 1 < len(starts) and starts[k + 1][0] <= tick:
                                k += 1
                            out.append((aid, i, starts[k][1], None))
                    except Exception as e:
                        out.append((aid, None, None, f"decode error: {e}"))
                    continue
                if not fake:
                    out.append((aid, None, None, "decode error: no video codec"))
                    continue
                n = max(1, int(dur or 0) // every_ms)
                out.extend(
                    (aid, i, hashlib.sha256(base + i.to_bytes(4, "big")).digest()[:16], None)
                    for i in range(n)
                )
            yield pd.DataFrame(out, columns=["asset_id", "frame_idx", "frame_payload", "err"])

    return assets.where(F.col("modality") == "video").select(
        "asset_id", "payload", "duration_ms"
    ).mapInPandas(run, schema=FRAME_SCHEMA)


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for plumbing tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        dur = None
        if modality == "image":
            # real payloads, rotating PNG / baseline JPEG / progressive
            # JPEG — all three decode paths exercised for real
            px_seed = int.from_bytes(hashlib.sha256(f"{seed}:{i}".encode()).digest()[:8], "big")
            img = np.random.default_rng(px_seed).integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
            if (i // 3) % 3:
                from sopspark.jpegcodec import encode_jpeg

                payload = encode_jpeg(
                    img, quality=90,
                    progressive=(i // 3) % 3 == 2,
                    successive=(i // 3) % 3 == 2,
                )
                mime = "image/jpeg"
            else:
                payload = encode_png(img)
                mime = "image/png"
        elif modality == "audio":
            mime = "audio/wav"
            # real 16-bit PCM WAV payload — a deterministic sine burst
            t = np.arange(1600, dtype=np.float32) / 16000.0
            hz = 200.0 + 50.0 * (i % 7)
            payload = encode_wav(0.5 * np.sin(2 * np.pi * hz * t), rate=16000)
        else:
            # real APNG payload: duration_ms/1000 full-canvas frames of
            # 1000 ms each, so frame sampling decodes for real
            mime = "image/apng"
            dur = rng.randint(1000, 10000)
            fr_seed = int.from_bytes(hashlib.sha256(f"{seed}:v{i}".encode()).digest()[:8], "big")
            frng = np.random.default_rng(fr_seed)
            n_frames = max(1, dur // 1000)
            payload = encode_apng(
                [frng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8) for _ in range(n_frames)],
                delay_ms=1000,
            )
        rows.append(
            (
                i,
                modality,
                bytearray(payload),
                mime,
                64 if modality == "image" else None,
                64 if modality == "image" else None,
                dur,
                None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
