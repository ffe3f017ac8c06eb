"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an
opaque ``binary`` column (or an object-store pointer) with typed
metadata alongside; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages so Python touches data
one columnar batch at a time — never row-at-a-time, never on the
driver. Partitioning, schema, and batch shape here are real and
tested; only the codec itself is stubbed because no image/audio
library ships in this container.

``fake_decode_image_meta(real_decode=True)`` raises
NotImplementedError where PIL/libav would be invoked; the default is
a clearly-marked DETERMINISTIC FAKE that derives dimensions from the
payload bytes, so the full pipeline (including the Arrow exchange)
stays value-checkable by the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "id string, n_bytes long, width int, height int, channels int"
)


def attach_binary(
    df: DataFrame, id_col: str = "id", text_col: str = "text"
) -> DataFrame:
    """→ (id, payload binary, n_bytes, content_md5, mime).

    In the harness the payload is the utf-8 document bytes; in a real
    pipeline it is the image/audio blob — everything downstream only
    assumes ``binary``.
    """
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _pil_module():
    """Capability probe: PIL.Image if importable, else None."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except Exception:
        return None


_PNG_COLORTYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_image_meta(buf: bytes) -> tuple[int, int, int] | None:
    """Pure-stdlib header decode → (width, height, channels) for
    PNG / GIF / BMP / JPEG payloads, None if the format is not
    recognized. This is a REAL parser of the real container formats
    (IHDR chunk, logical screen descriptor, DIB header, SOF scan) —
    no codec library needed for metadata — used as the fallback when
    PIL is absent."""
    import struct  # noqa: PLC0415

    if buf[:8] == b"\x89PNG\r\n\x1a\n" and len(buf) >= 26:
        w, h = struct.unpack(">II", buf[16:24])
        return w, h, _PNG_COLORTYPE_CHANNELS.get(buf[25], 3)
    if buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) >= 10:
        w, h = struct.unpack("<HH", buf[6:10])
        return w, h, 3
    if buf[:2] == b"BM" and len(buf) >= 30:
        w, h = struct.unpack("<ii", buf[18:26])
        bits = struct.unpack("<H", buf[28:30])[0]
        return w, abs(h), max(1, bits // 8)
    if buf[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF marker
        i = 2
        while i + 1 < len(buf):
            if buf[i] != 0xFF:
                return None
            # The spec allows any number of 0xFF FILL bytes before a
            # marker byte — skip them, or a padded-but-valid JPEG
            # misreads a bogus segment length and fails to sniff.
            while i + 1 < len(buf) and buf[i + 1] == 0xFF:
                i += 1
            if i + 9 >= len(buf):
                break
            marker = buf[i + 1]
            # TEM (0x01) and RST0-7 (0xD0-0xD7) are STANDALONE
            # length-less markers: advance past the 2 marker bytes only.
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", buf[i + 5 : i + 9])
                return w, h, buf[i + 9]
            i += 2 + struct.unpack(">H", buf[i + 2 : i + 4])[0]
    return None


def _decode_one(buf: bytes, backend: str, pil) -> tuple[int, int, int]:
    """One payload → (width, height, channels) under the backend
    contract; raises on 'real' + unrecognized format."""
    if backend != "fake":
        if pil is not None:
            import io  # noqa: PLC0415

            try:
                with pil.open(io.BytesIO(buf)) as im:
                    return im.width, im.height, len(im.getbands())
            except Exception:
                pass  # fall through to the stdlib sniffer
        meta = sniff_image_meta(buf)
        if meta is not None:
            return meta
        if backend == "real":
            raise NotImplementedError(
                "unrecognized image format and no codec library "
                "available (PIL probe failed; stdlib sniffer knows "
                "PNG/GIF/BMP/JPEG)"
            )
    n = len(buf)
    return 64 + n % 577, 64 + (n * 31) % 449, 3


def decode_image_meta(
    binary_df: DataFrame, backend: str = "fake"
) -> DataFrame:
    """mapInPandas decode stage → (id, n_bytes, width, height, channels).

    ``backend``:

    - ``"fake"`` (default, the oracle-gated path): DETERMINISTIC FAKE —
      width/height derived arithmetically from the payload size so
      results are reproducible and value-checkable by the DuckDB
      oracle regardless of installed codecs.
    - ``"real"``: capability-probed real decode — ``PIL.Image`` when
      importable, else a pure-stdlib header parser for PNG/GIF/BMP/
      JPEG (:func:`sniff_image_meta`); unrecognized payloads raise
      ``NotImplementedError`` instead of silently faking.
    - ``"auto"``: real where the payload is a recognized image,
      deterministic fake otherwise — the migration setting for mixed
      corpora.

    The Spark shape is identical for all three: one Arrow-batched
    ``mapInPandas`` pass, schema and partitioning unchanged.
    """
    if backend not in ("fake", "real", "auto"):
        raise ValueError(f"unknown backend {backend!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _pil_module() if backend != "fake" else None
        for pdf in batches:
            dims = [
                _decode_one(bytes(buf), backend, pil)
                for buf in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series(
                        [d[0] for d in dims], dtype="int32"
                    ),
                    "height": pd.Series(
                        [d[1] for d in dims], dtype="int32"
                    ),
                    "channels": pd.Series(
                        [d[2] for d in dims], dtype="int32"
                    ),
                }
            )

    return binary_df.select("id", "payload").mapInPandas(
        decode, schema=IMAGE_META_SCHEMA
    )


def fake_decode_image_meta(
    binary_df: DataFrame, real_decode: bool = False
) -> DataFrame:
    """Back-compat wrapper: the registry's oracle-gated fake path
    (``real_decode=True`` → the capability-probed real backend)."""
    return decode_image_meta(
        binary_df, backend="real" if real_decode else "fake"
    )


def frame_sample(
    binary_df: DataFrame, fps_every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing → one row per sampled frame
    (id, frame_idx, frame_offset).

    For a real video column this would seek keyframes; the fan-out
    shape (explode bounded by max_frames, computed per row JVM-side)
    is the part that matters for the plan — no UDF needed at all.
    """
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest(
            F.lit(1), (F.col("n_bytes") / fps_every_n_bytes).cast("int")
        ),
    )
    return binary_df.select(
        "id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias(
            "frame_idx", "frame_offset_units"
        ),
    ).select(
        "id",
        "frame_idx",
        (F.col("frame_offset_units") * fps_every_n_bytes).alias("frame_offset"),
    )


FEATURES_SCHEMA = "id string, features array<double>"


def byte_histogram_features(
    binary_df: DataFrame, bins: int = 16, round_to: int = 6
) -> DataFrame:
    """Feature-extraction stage → (id, features[bins]).

    A REAL (non-stub) extractor: the normalized byte-value histogram
    of the payload (bin = byte >> 4 for 16 bins), computed with numpy
    over Arrow batches in ``mapInPandas`` — the exact plumbing a CNN/
    CLIP embedding stage would use, with the model swapped for an
    arithmetic feature so the full path stays oracle-checkable.
    Empty payloads yield all-zero features.
    """
    import numpy as np

    shift = 8 - bins.bit_length() + 1  # 16 bins -> shift 4

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                if len(b) == 0:
                    feats.append([0.0] * bins)
                    continue
                hist = np.bincount(b >> shift, minlength=bins).astype(
                    np.float64
                )
                feats.append(list(hist / len(b)))
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    raw = binary_df.select("id", "payload").mapInPandas(
        extract, schema=FEATURES_SCHEMA
    )
    # round JVM-side: Spark/DuckDB round() is HALF_UP, while numpy's
    # is half-to-even — rounding in numpy would drift from the oracle
    return raw.select(
        "id",
        F.transform("features", lambda x: F.round(x, round_to)).alias(
            "features"
        ),
    )


def resize_plan(
    meta_df: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Aspect-preserving resize planning → (id, width, height, out_w,
    out_h, scale). Pure column arithmetic (no UDF): the real resample
    kernel would run in the same mapInPandas stage as the decoder;
    the planning math — what the pipeline schema carries — is JVM-side.
    """
    scale = F.least(
        F.lit(float(target_w)) / F.col("width"),
        F.lit(float(target_h)) / F.col("height"),
    )
    return meta_df.select(
        "id",
        "width",
        "height",
        F.greatest(
            F.lit(1), F.floor(F.col("width") * scale).cast("int")
        ).alias("out_w"),
        F.greatest(
            F.lit(1), F.floor(F.col("height") * scale).cast("int")
        ).alias("out_h"),
        F.round(scale, 6).alias("scale"),
    )


AUDIO_META_SCHEMA = (
    "id string, n_bytes long, n_channels int, sample_rate int, "
    "n_samples long"
)


def sniff_wav_meta(buf: bytes) -> tuple[int, int, int] | None:
    """Stdlib WAV decode → (n_channels, sample_rate, n_samples), None
    if the payload is not a RIFF/WAVE container. Uses the standard
    library ``wave`` module — a REAL decoder, present in every
    CPython — as the fallback when soundfile is absent."""
    import io  # noqa: PLC0415
    import wave  # noqa: PLC0415

    try:
        with wave.open(io.BytesIO(buf)) as w:
            return w.getnchannels(), w.getframerate(), w.getnframes()
    except Exception:
        return None


def _soundfile_module():
    """Capability probe: soundfile if importable, else None."""
    try:
        import soundfile  # noqa: PLC0415

        return soundfile
    except Exception:
        return None


def _decode_audio_one(buf: bytes, backend: str, sf) -> tuple[int, int, int]:
    if backend != "fake":
        if sf is not None:
            import io  # noqa: PLC0415

            try:
                info = sf.info(io.BytesIO(buf))
                return info.channels, info.samplerate, info.frames
            except Exception:
                pass  # fall through to the stdlib wave decoder
        meta = sniff_wav_meta(buf)
        if meta is not None:
            return meta
        if backend == "real":
            raise NotImplementedError(
                "unrecognized audio format and no codec library "
                "available (soundfile probe failed; stdlib wave "
                "knows RIFF/WAVE)"
            )
    n = len(buf)
    return 1 + n % 2, 16000, n // 2


def decode_audio_meta(
    binary_df: DataFrame, backend: str = "fake"
) -> DataFrame:
    """mapInPandas audio-decode stage →
    (id, n_bytes, n_channels, sample_rate, n_samples).

    Same tri-backend contract as :func:`decode_image_meta`:
    ``"fake"`` (default, oracle-gated) derives the fields
    deterministically from the byte length; ``"real"`` probes
    soundfile then falls back to the stdlib ``wave`` decoder (real
    WAV parsing, available in every container) and raises on
    unrecognized formats; ``"auto"`` decodes real WAVs and fakes the
    rest. One Arrow-batched pass, no shuffle.
    """
    if backend not in ("fake", "real", "auto"):
        raise ValueError(f"unknown backend {backend!r}")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sf = _soundfile_module() if backend != "fake" else None
        for pdf in batches:
            metas = [
                _decode_audio_one(bytes(buf), backend, sf)
                for buf in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "n_channels": pd.Series(
                        [m[0] for m in metas], dtype="int32"
                    ),
                    "sample_rate": pd.Series(
                        [m[1] for m in metas], dtype="int32"
                    ),
                    "n_samples": pd.Series(
                        [m[2] for m in metas], dtype="int64"
                    ),
                }
            )

    return binary_df.select("id", "payload").mapInPandas(
        decode, schema=AUDIO_META_SCHEMA
    )


AUDIO_RMS_SCHEMA = "id string, n_frames long, mean_rms double, max_rms double"


def audio_window_rms(
    binary_df: DataFrame, frame: int = 256, hop: int = 128
) -> DataFrame:
    """Audio-shaped windowed feature extraction →
    (id, n_frames, mean_rms, max_rms): the payload bytes are treated
    as 8-bit PCM samples (centered at 128), sliced into overlapping
    frames of ``frame`` samples at ``hop`` stride, per-frame RMS
    energy computed, then summarized per clip — the exact windowing /
    batch shape an MFCC or speech-embedding stage uses, with the
    codec swapped for arithmetic so the whole Arrow path stays
    oracle-checkable (a real pipeline decodes with libav where the
    byte view is produced).

    Scale shape: Arrow-batched ``mapInPandas``, one pass per
    partition, no shuffle at all — output is one summary row per
    clip; frames never materialize as DataFrame rows. Payloads
    shorter than one frame are a single truncated frame; empty
    payloads yield (0, 0.0, 0.0).
    """
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "n_frames": [], "mean_rms": [], "max_rms": []}
            for id_, buf in zip(pdf["id"], pdf["payload"]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8).astype(
                    np.float64
                ) - 128.0
                n = len(b)
                if n == 0:
                    rms = np.zeros(0)
                elif n < frame:
                    rms = np.array([np.sqrt(np.mean(b * b))])
                else:
                    starts = range(0, n - frame + 1, hop)
                    rms = np.array(
                        [
                            np.sqrt(np.mean(b[s : s + frame] ** 2))
                            for s in starts
                        ]
                    )
                out["id"].append(id_)
                out["n_frames"].append(len(rms))
                out["mean_rms"].append(
                    float(rms.mean()) if len(rms) else 0.0
                )
                out["max_rms"].append(
                    float(rms.max()) if len(rms) else 0.0
                )
            yield pd.DataFrame(out)

    raw = binary_df.select("id", "payload").mapInPandas(
        extract, schema=AUDIO_RMS_SCHEMA
    )
    # round JVM-side (HALF_UP parity with the oracle, like the
    # histogram extractor above)
    r6 = lambda c: F.floor(F.col(c) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return raw.select(
        "id", "n_frames", r6("mean_rms").alias("mean_rms"),
        r6("max_rms").alias("max_rms"),
    )


SHOT_SCHEMA = "id string, n_frames long, n_shots long, first_boundary long"


def video_shot_boundaries(
    binary_df: DataFrame, frame_bytes: int = 64, threshold: float = 0.5
) -> DataFrame:
    """Video-shaped temporal segmentation →
    (id, n_frames, n_shots, first_boundary): the payload bytes are
    sliced into fixed ``frame_bytes`` frames (the deterministic
    stand-in for decoded video frames), each frame summarized by its
    16-bin byte histogram, and a SHOT BOUNDARY declared wherever the
    L1 distance between consecutive frame histograms exceeds
    ``threshold`` — the classic histogram-difference shot detector,
    with the codec swapped for byte arithmetic so the Arrow path
    stays oracle-checkable. n_shots = boundaries + 1 (a clip with
    frames has at least one shot); first_boundary = frame index of
    the first cut (−1 if none; 0 frames ⇒ 0 shots).

    Scale shape: same contract as audio_window_rms — one Arrow
    ``mapInPandas`` pass, per-clip summaries out, frames never
    materialize as rows, zero shuffle."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": [], "n_frames": [], "n_shots": [],
                "first_boundary": [],
            }
            for id_, buf in zip(pdf["id"], pdf["payload"]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                n = len(b) // frame_bytes
                frames = b[: n * frame_bytes].reshape(n, frame_bytes)
                if n == 0:
                    out["id"].append(id_)
                    out["n_frames"].append(0)
                    out["n_shots"].append(0)
                    out["first_boundary"].append(-1)
                    continue
                hists = np.stack(
                    [
                        np.bincount(f >> 4, minlength=16) / frame_bytes
                        for f in frames
                    ]
                )
                d = np.abs(np.diff(hists, axis=0)).sum(axis=1)
                cuts = np.where(d > threshold)[0]
                out["id"].append(id_)
                out["n_frames"].append(n)
                out["n_shots"].append(len(cuts) + 1)
                out["first_boundary"].append(
                    int(cuts[0]) + 1 if len(cuts) else -1
                )
            yield pd.DataFrame(out)

    return binary_df.select("id", "payload").mapInPandas(
        extract, schema=SHOT_SCHEMA
    )
