"""Multimodal columns: opaque binary payloads through actor-pool stages.

Images/audio/video are treated as opaque ``binary`` columns with typed
metadata.  The decode step needs codec libraries (cv2 / PIL / ffmpeg) that
are NOT in this container, so decode is STUBBED: ``ImageFeatureStage``
raises ``NotImplementedError`` when asked for real decoding and otherwise
computes real, deterministic byte-level features (length, blake2 digest,
byte-entropy) so the Ray-side plumbing — schema, actor signature, batch
sizing, output layout — is real and tested.

Batch-size guidance for binary payloads: keep ``batch_size`` small
(e.g. 16-64) so batch × concurrency of decoded frames fits the worker heap;
the payload column stays zero-copy Arrow until the feature kernel touches it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def base64_data_uri_to_bytes(base64_data: str) -> np.ndarray:
    """base64 data-URI → uint8 byte array.

    Mirrors /root/reference/src/page_renderer.py:111-124
    (``convert_base64_image_to_matlike_image``): split off the
    ``data:image/...;base64,`` header, decode, wrap as a numpy uint8
    buffer.  The cv2.imdecode step is the stubbed codec boundary — see
    ``base64_to_image``."""
    import base64

    _header, encoded = base64_data.split(",", 1)
    return np.frombuffer(base64.b64decode(encoded), np.uint8)


def base64_to_image(base64_data: str, decode: bool = True) -> np.ndarray:
    """Full reference semantics: data-URI → decoded BGR image.

    ``decode=False`` returns the raw byte buffer (the testable part);
    ``decode=True`` needs cv2, which this container lacks."""
    arr = base64_data_uri_to_bytes(base64_data)
    if not decode:
        return arr
    try:
        import cv2
    except ImportError as exc:  # pragma: no cover - no cv2 in sandbox
        raise NotImplementedError(
            "image decoding requires cv2, which is not available in this "
            "container — use decode=False for the raw byte buffer"
        ) from exc
    return cv2.imdecode(arr, cv2.IMREAD_COLOR)


class ImageFeatureStage:
    """Actor-pool stage: binary payload column → feature columns.

    ``__init__`` is where real model/codec state would load (once per
    actor); ``decode=True`` demonstrates the stubbed decode path.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 decode: bool = False) -> None:
        self.payload_col = payload_col
        self.id_col = id_col
        self.decode = decode
        if decode:
            try:
                import cv2  # noqa: F401
            except ImportError as exc:  # pragma: no cover - no cv2 in sandbox
                raise NotImplementedError(
                    "real image decoding requires cv2, which is not available "
                    "in this container — run with decode=False for byte-level "
                    "features"
                ) from exc

    @staticmethod
    def _entropy_milli(data: bytes) -> int:
        if not data:
            return 0
        counts = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
        counts = counts[counts > 0]
        p = counts / len(data)
        ent = float(-(p * np.log2(p)).sum())
        return int(round(ent * 1000))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        n_bytes, digests, entropies = [], [], []
        for p in payloads:
            data = p if isinstance(p, (bytes, bytearray)) else bytes(str(p), "utf-8")
            n_bytes.append(len(data))
            # md5, not a crypto use: content digest recomputable by the
            # DuckDB oracle's built-in md5()
            digests.append(hashlib.md5(data).hexdigest())
            entropies.append(self._entropy_milli(data))
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "digest": pa.array(digests, pa.string()),
                "entropy_milli": pa.array(entropies, pa.int64()),
            }
        )


class VideoFrameSampleStage:
    """Actor-pool stage: opaque video payloads → sampled per-frame rows.

    The real decoder (ffmpeg/cv2 VideoCapture) would load ONCE per actor in
    ``__init__`` and yield frames in ``__call__``; this container has no
    codec, so decode is a deterministic fake at exactly that boundary: the
    payload "decodes" to its utf-8 text, each consecutive run of
    ``frame_chars`` characters is one frame, and every ``sample_rate``-th
    frame is emitted as (doc_id, frame_idx, n_frames, frame_md5) — md5 of
    the frame's utf-8 bytes, so the DuckDB oracle replays it with
    ``md5(substring(text, ...))``.  Trailing partial frames are dropped
    (a real sampler emits whole frames only).

    1 row in → k rows out: the flat-map shape of real frame sampling, so
    downstream batch sizing sees the true output fan-out.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 frame_chars: int = 32, sample_rate: int = 4,
                 decode: bool = False) -> None:
        self.payload_col = payload_col
        self.id_col = id_col
        self.frame_chars = frame_chars
        self.sample_rate = sample_rate
        if decode:
            try:
                import cv2  # noqa: F401
            except ImportError as exc:  # pragma: no cover - no cv2 in sandbox
                raise NotImplementedError(
                    "real video decoding requires cv2/ffmpeg, which this "
                    "container lacks — run with decode=False for the "
                    "deterministic fake decode"
                ) from exc

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        out_ids, out_idx, out_n, out_md5 = [], [], [], []
        fc, sr = self.frame_chars, self.sample_rate
        for doc_id, p in zip(ids, payloads):
            data = p if isinstance(p, (bytes, bytearray)) else str(p).encode()
            text = bytes(data).decode("utf-8")  # the stubbed decode boundary
            n_frames = len(text) // fc
            for i in range(0, n_frames, sr):
                frame = text[i * fc : (i + 1) * fc]
                out_ids.append(doc_id)
                out_idx.append(i)
                out_n.append(n_frames)
                # md5: content digest recomputable by DuckDB's md5(), not a
                # crypto use
                out_md5.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
        return pa.table(
            {
                self.id_col: pa.array(out_ids, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "n_frames": pa.array(out_n, pa.int64()),
                "frame_md5": pa.array(out_md5, pa.string()),
            }
        )


def video_frame_sample(sf_dir: str):
    """Demo query: documents' utf-8 bytes as fake video containers through
    the frame-sampling actor pool (small batches — payload-heavy rows)."""
    import pandas as pd
    import ray.data

    from .. import ensure_picklable
    from ..sources.pages import read_table

    ensure_picklable()

    def to_payload(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "payload": [t.encode("utf-8") for t in df["text"]]}
        )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(to_payload, batch_format="pandas")
    return ds.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs=dict(payload_col="payload", id_col="doc_id"),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 2),
    )


def sql_video_frame_sample() -> str:
    """DuckDB replay of the fake decode: 32-char frames, every 4th."""
    return (
        "WITH m AS (SELECT doc_id, text, "
        "CAST(length(text) // 32 AS BIGINT) AS n_frames FROM documents) "
        "SELECT doc_id, i AS frame_idx, n_frames, "
        "md5(substring(text, CAST(1 + i * 32 AS BIGINT), 32)) AS frame_md5 "
        "FROM m, UNNEST(range(0, n_frames, 4)) AS r(i)"
    )


class AudioWindowFeatureStage:
    """Actor-pool stage: opaque audio payloads → per-window feature rows.

    The real decoder (soundfile/ffmpeg → PCM samples) would load once per
    actor in ``__init__``; without codecs the fake decode treats the
    payload's utf-8 text as the sample stream — one sample per character,
    value = codepoint — and emits per-window integer aggregates
    (sum, max, count) over fixed ``window`` sample frames (the windowed-RMS
    shape of real audio feature extraction, integer-exact for the oracle).
    The kernel is vectorized: one numpy reduceat per batch, no per-sample
    Python loop.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 window: int = 100, decode: bool = False) -> None:
        self.payload_col = payload_col
        self.id_col = id_col
        self.window = window
        if decode:
            try:
                import soundfile  # noqa: F401
            except ImportError as exc:  # pragma: no cover - not in sandbox
                raise NotImplementedError(
                    "real audio decoding requires soundfile/ffmpeg, which "
                    "this container lacks — run with decode=False for the "
                    "deterministic fake decode"
                ) from exc

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        payloads = batch.column(self.payload_col).to_pylist()
        out: dict[str, list] = {
            self.id_col: [], "win": [], "v_sum": [], "v_max": [], "n_samples": [],
        }
        w = self.window
        for doc_id, p in zip(ids, payloads):
            data = p if isinstance(p, (bytes, bytearray)) else str(p).encode()
            text = bytes(data).decode("utf-8")  # the stubbed decode boundary
            if not text:
                continue
            samples = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
            samples = samples.astype(np.int64)
            starts = np.arange(0, len(samples), w)
            sums = np.add.reduceat(samples, starts)
            maxs = np.maximum.reduceat(samples, starts)
            counts = np.diff(np.append(starts, len(samples)))
            out[self.id_col].extend([doc_id] * len(starts))
            out["win"].extend(range(len(starts)))
            out["v_sum"].extend(sums)
            out["v_max"].extend(maxs)
            out["n_samples"].extend(counts)
        return pa.table(
            {
                self.id_col: pa.array(out[self.id_col], pa.int64()),
                "win": pa.array(out["win"], pa.int64()),
                "v_sum": pa.array([int(v) for v in out["v_sum"]], pa.int64()),
                "v_max": pa.array([int(v) for v in out["v_max"]], pa.int64()),
                "n_samples": pa.array([int(v) for v in out["n_samples"]], pa.int64()),
            }
        )


def audio_window_features(sf_dir: str):
    """Demo query: documents' utf-8 bytes as fake audio through the
    windowed-feature actor pool."""
    import pandas as pd
    import ray.data

    from .. import ensure_picklable
    from ..sources.pages import read_table

    ensure_picklable()

    def to_payload(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "payload": [t.encode("utf-8") for t in df["text"]]}
        )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(to_payload, batch_format="pandas")
    return ds.map_batches(
        AudioWindowFeatureStage,
        fn_constructor_kwargs=dict(payload_col="payload", id_col="doc_id"),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 2),
    )


def sql_audio_window_features() -> str:
    """DuckDB replay of the fake decode: codepoint samples, 100-per-window
    integer aggregates (partial trailing window kept)."""
    return (
        "WITH s AS (SELECT doc_id, i, "
        "unicode(substring(text, CAST(i AS BIGINT), 1)) AS v "
        "FROM documents, UNNEST(range(1, length(text) + 1)) AS r(i)) "
        "SELECT doc_id, CAST((i - 1) // 100 AS BIGINT) AS win, "
        "CAST(SUM(v) AS BIGINT) AS v_sum, CAST(MAX(v) AS BIGINT) AS v_max, "
        "CAST(COUNT(*) AS BIGINT) AS n_samples "
        "FROM s GROUP BY doc_id, win"
    )


def image_features(sf_dir: str):
    """Demo query: documents' utf-8 bytes as the opaque payload through the
    actor-pool feature stage."""
    import pandas as pd
    import ray.data

    from .. import ensure_picklable
    from ..sources.pages import read_table

    ensure_picklable()

    def to_payload(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "payload": [t.encode("utf-8") for t in df["text"]]}
        )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(to_payload, batch_format="pandas")
    return ds.map_batches(
        ImageFeatureStage,
        fn_constructor_kwargs=dict(payload_col="payload", id_col="doc_id"),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 2),
    )
