"""Multimodal (image/audio/video) column operators.

Design (BASELINE north star): media travel as opaque ``binary`` columns
with a typed metadata struct beside them; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so the
bytes never round-trip through Python row objects. At 100 TB the binary
column dominates I/O — the schema keeps metadata in separate (prunable)
columns so metadata-only queries never read the blobs, and each stage
declares an output schema that DROPS the payload as soon as it is consumed.

The actual codecs (PIL/ffmpeg/soundfile) are not in this container, so the
decode kernels are STUBS: ``decoder="fake"`` is a deterministic
header-parsing fake used by tests; ``decoder="pil"`` raises
NotImplementedError unless PIL is importable (import-gated, never a hard
dependency). The Spark-side plumbing — schemas, batch iteration,
partitioning, column pruning — is real and tested.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: metadata columns carried beside every media payload
MEDIA_META_SCHEMA = (
    "media_id long, media_type string, mime string, width int, height int, "
    "n_frames int, sample_rate int"
)

IMAGE_FEATURES_DIM = 8


def pack_fake_image(media_id: int, width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake 'image': 12-byte header (magic, w, h) + payload.
    Stands in for PNG/JPEG bytes in tests."""
    header = struct.pack("<4sii", b"FIMG", width, height)
    payload = bytes((media_id * 31 + seed + i) % 256 for i in range(16))
    return header + payload


def attach_media_meta(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """Parse header metadata WITHOUT decoding payloads — pure Column
    expressions over the first bytes (the cheap pre-pass that lets
    downstream partition/filter decisions avoid touching pixel data)."""
    magic = F.substring(F.col(binary_col), 1, 4).cast("string")

    # little-endian int32 at 1-based byte offset: hex() the 4 bytes (cannot
    # go through a string cast — non-ASCII bytes are not valid UTF-8),
    # reverse the byte pairs, parse base-16
    def _le_int(offset: int):
        hx = F.hex(F.substring(F.col(binary_col), offset, 4))
        be = F.concat(
            F.substring(hx, 7, 2),
            F.substring(hx, 5, 2),
            F.substring(hx, 3, 2),
            F.substring(hx, 1, 2),
        )
        return F.conv(be, 16, 10).cast("long")

    return df.withColumn(
        "media_type",
        F.when(magic == "FIMG", "image").otherwise("unknown"),
    ).withColumn("width", _le_int(5).cast("int")).withColumn(
        "height", _le_int(9).cast("int")
    )


def decode_and_featurize(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "media_id",
    decoder: str = "fake",
) -> DataFrame:
    """Decode each payload and emit a fixed-dim feature vector —
    ``mapInPandas`` so every Arrow batch is processed vectorized and the
    binary column is dropped from the output schema (payloads die here).

    decoder="fake": deterministic features from the payload bytes.
    decoder="pil": real image decode, import-gated.
    """
    out_schema = f"{id_col} long, width int, height int, features array<double>"

    if decoder == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "PIL not available in this environment; use decoder='fake' "
                "(the container ships no image codecs)"
            ) from e

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, widths, heights, feats = [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(blob)
                magic, w, h = struct.unpack("<4sii", raw[:12])
                if magic != b"FIMG":
                    continue  # quarantine path in production
                payload = raw[12:]
                # deterministic fake "embedding": byte-histogram moments
                feats.append(
                    [
                        float(sum(payload) % 997) / 997.0,
                        float(len(payload)),
                        float(max(payload)),
                        float(min(payload)),
                        float(payload[0]),
                        float(payload[-1]),
                        float(w),
                        float(h),
                    ]
                )
                ids.append(mid)
                widths.append(w)
                heights.append(h)
            if not ids:
                # an all-corrupt batch: yield nothing (an empty frame's
                # numpy-typed columns can't convert to Arrow list types)
                continue
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": widths,
                    "height": heights,
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def resize_stub(
    df: DataFrame, binary_col: str = "media", target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize stage stub: rewrites the fake header to the target size and
    passes the payload through (a real kernel decodes+resamples here; the
    schema contract — same columns, mutated payload — is what downstream
    stages depend on)."""

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            def rewrite(blob):
                raw = bytes(blob)
                return struct.pack("<4sii", b"FIMG", target_w, target_h) + raw[12:]

            pdf = pdf.copy()
            pdf[binary_col] = pdf[binary_col].map(rewrite)
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def frame_sample_stub(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "media_id",
    every_n: int = 8,
    n_frames: int = 32,
) -> DataFrame:
    """Video frame-sampling stub: emits one row per sampled frame index
    (a real kernel emits decoded frames; the 1→N fan-out schema and the
    payload-dropping output are the real contract)."""
    out_schema = f"{id_col} long, frame_index int, frame_bytes binary"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(blob)
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    # fake frame payload: slice of source, tagged by index
                    blobs.append(raw[12:] + bytes([k % 256]))
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame_bytes": blobs})

    return df.mapInPandas(run, schema=out_schema)


RGB_MAGIC = b"FRGB"


def pack_raw_rgb(media_id: int, width: int, height: int, seed: int = 0) -> bytes:
    """Uncompressed RGB image: 12-byte header + width·height·3 bytes of
    deterministic pixel data (row-major, RGB interleaved). Unlike the
    FIMG fake, this payload IS decodable pixel math — no codec needed."""
    import numpy as np

    header = struct.pack("<4sii", RGB_MAGIC, width, height)
    n = width * height * 3
    payload = (
        ((media_id * 131 + seed + 7 * np.arange(n)) % 256).astype(np.uint8).tobytes()
    )
    return header + payload


def decode_raw_rgb(raw: bytes):
    """bytes → (H, W, 3) uint8 numpy array. Raises on wrong magic or a
    size mismatch (truncated payload) — corrupt rows must be loud."""
    import numpy as np

    if len(raw) < 12:
        raise ValueError(f"payload too short for a raw-RGB header: {len(raw)} bytes")
    magic, w, h = struct.unpack("<4sii", raw[:12])
    if magic != RGB_MAGIC:
        raise ValueError(f"not a raw-RGB payload: magic={magic!r}")
    arr = np.frombuffer(raw[12:], dtype=np.uint8)
    if arr.size != w * h * 3:
        raise ValueError(f"payload size {arr.size} != {w}x{h}x3")
    return arr.reshape(h, w, 3)


def resize_rgb(
    df: DataFrame, binary_col: str = "media", target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """REAL image resize — nearest-neighbor resampling in pure numpy (no
    codec dependency): decode the raw-RGB payload, gather source pixels
    via index arrays (vectorized, no per-pixel Python), re-encode with
    the new header. Same mapInPandas stage contract as the codec-gated
    path, but the pixel math genuinely runs — this is the kernel the PIL
    variant swaps in for, exercised end-to-end in tests.

    Nearest-neighbor index: src_i = floor((i + 0.5) · src/dst), the
    center-aligned mapping (what OpenCV INTER_NEAREST computes)."""
    import numpy as np

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            def rewrite(blob):
                img = decode_raw_rgb(bytes(blob))
                h, w = img.shape[:2]
                yi = ((np.arange(target_h) + 0.5) * h / target_h).astype(np.int64)
                xi = ((np.arange(target_w) + 0.5) * w / target_w).astype(np.int64)
                out = img[yi[:, None], xi[None, :]]
                return (
                    struct.pack("<4sii", RGB_MAGIC, target_w, target_h)
                    + out.tobytes()
                )

            pdf = pdf.copy()
            pdf[binary_col] = pdf[binary_col].map(rewrite)
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def rgb_channel_stats(
    df: DataFrame, binary_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """Per-image channel means/stds from decoded pixels — the
    feature-extraction stage run on REAL decoded arrays (normalization
    stats every vision pipeline computes before training). Payload is
    dropped from the output schema the moment pixels are consumed."""
    import numpy as np

    out_schema = (
        f"{id_col} long, width int, height int, "
        "mean_r double, mean_g double, mean_b double, std_gray double"
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[binary_col]):
                img = decode_raw_rgb(bytes(blob))
                # dtype=float64 accumulators — no full-image float64 copy
                means = img.mean(axis=(0, 1), dtype=np.float64)
                gray = img.mean(axis=2, dtype=np.float64)
                rows.append(
                    (
                        mid,
                        img.shape[1],
                        img.shape[0],
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        float(gray.std()),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        id_col, "width", "height",
                        "mean_r", "mean_g", "mean_b", "std_gray",
                    ],
                )

    return df.mapInPandas(run, schema=out_schema)


def media_features_to_embedding_table(features_df: DataFrame) -> DataFrame:
    """Bridge decoded media features into the similarity-search operators
    (q46–q48 take any (vec_id, embedding array<float>) table)."""
    return features_df.select(
        F.col("media_id").alias("vec_id"),
        F.transform("features", lambda x: x.cast("float")).alias("embedding"),
    )


# --- audio: raw PCM16 payloads (codec-free, REAL byte math) ---------------


def pack_pcm16(samples) -> bytes:
    """Pack an int sequence into little-endian 16-bit PCM bytes — the
    payload format every WAV body uses after its 44-byte header. Real
    packing (numpy .tobytes), not a stub: raw PCM needs no codec."""
    import numpy as np

    return np.asarray(samples, dtype="<i2").tobytes()


def pack_pcm16_stream(
    df: DataFrame,
    id_col: str = "user_id",
    sample_col: str = "smp",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    out_id: str = "media_id",
    pcm_col: str = "pcm",
) -> DataFrame:
    """Pack each id's ordered int samples into one little-endian PCM16
    binary blob — the partition-STREAM form (guide §4.1/§4.5, built for
    q145 in r12 and factored here in r13 so q480 sheds its per-group
    ``applyInPandas``): one ``mapInPandas`` kernel per task walks ordered
    Arrow batches over ``repartition(id) + sortWithinPartitions(id,
    *order)``, carrying the open id across batch seams, instead of one
    Python call + one tiny pandas frame per media id. Same shuffle (hash
    on id), same per-id sample order (the within-partition sort totally
    orders each id's rows), byte-identical blobs."""
    import numpy as np
    import pandas as pd

    s = df.repartition(id_col).sortWithinPartitions(id_col, *order_cols)

    def pack_stream(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        open_id, open_chunks = None, []
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            smp = pdf[sample_col].to_numpy()
            if not len(ids):
                continue
            # run boundaries within this batch (rows arrive ordered)
            cuts = np.flatnonzero(ids[1:] != ids[:-1]) + 1
            starts = np.concatenate(([0], cuts))
            ends = np.concatenate((cuts, [len(ids)]))
            out_ids, out_pcm = [], []
            for a, b in zip(starts, ends):
                uid = int(ids[a])
                if open_id is not None and uid == open_id:
                    open_chunks.append(smp[a:b])
                    continue
                if open_id is not None:
                    out_ids.append(open_id)
                    out_pcm.append(pack_pcm16(np.concatenate(open_chunks)))
                open_id, open_chunks = uid, [smp[a:b]]
            # everything but the still-open trailing user is complete
            if out_ids:
                yield pd.DataFrame({out_id: out_ids, pcm_col: out_pcm})
        if open_id is not None:
            yield pd.DataFrame(
                {
                    out_id: [open_id],
                    pcm_col: [pack_pcm16(np.concatenate(open_chunks))],
                }
            )

    return s.mapInPandas(pack_stream, schema=f"{out_id} long, {pcm_col} binary")


def pcm16_features(
    df: DataFrame, id_col: str = "media_id", pcm_col: str = "pcm"
) -> DataFrame:
    """Audio feature extraction over raw PCM16 binary columns as an
    Arrow-batched ``mapInPandas`` stage: decode = one zero-copy
    ``np.frombuffer``; features are the classic frame-level trio —
    RMS energy, zero-crossing count (strict sign flips), peak
    amplitude. Output schema DROPS the payload (the multimodal rule:
    bytes die in the stage that consumes them); at 100 TB this stage
    pipelines with the scan and shuffles nothing.

    r13 (guide §4.2 — an Arrow binary column is one contiguous buffer
    plus offsets): the kernel decodes the WHOLE batch with one
    ``b"".join`` + one ``frombuffer`` and computes every row's features
    from segment boundaries over batch-level cumulative sums (energy,
    sign flips) — no per-row Python loop. Cross-row sample pairs are
    excluded from the flip count by construction (per-row pair span is
    [start, end-1)), so the per-row numbers are bit-identical to the
    row-at-a-time form (int64 sums; rms is the same int64/len double
    division). A mixed batch with odd-length payloads fails loudly, as
    the per-row frombuffer did."""
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{id_col} long, n_samples long, rms double, zero_crossings long, "
        "peak long"
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf[pcm_col]]
            nbytes = np.fromiter(
                (len(b) for b in blobs), dtype=np.int64, count=len(blobs)
            )
            if (nbytes % 2).any():
                bad = int(np.flatnonzero(nbytes % 2)[0])
                raise ValueError(
                    f"odd-length PCM16 payload ({int(nbytes[bad])} bytes)"
                )
            keep = nbytes > 0  # empty payloads emit no row (unchanged)
            if not keep.any():
                continue
            ids = pdf[id_col].to_numpy()[keep].astype(np.int64)
            s = np.frombuffer(b"".join(blobs), dtype="<i2").astype(np.int64)
            lens = (nbytes[keep] // 2).astype(np.int64)
            ends = np.cumsum(lens)
            starts = ends - lens
            # Σ s² per segment via one exclusive-prefix cumsum (int64,
            # exact: max batch ~1e9 samples x 2.7e8 per square < 2^63)
            csq = np.concatenate(([0], np.cumsum(s * s)))
            esum = csq[ends] - csq[starts]
            rms = np.sqrt(esum / lens)
            # strict sign flips: global adjacent-pair products, per-row
            # pairs live at flip indices [start, end-1) — the boundary
            # pair (end-1) spans two rows and is excluded on both sides
            if len(s) > 1:
                cfl = np.concatenate(
                    ([0], np.cumsum((s[:-1] * s[1:]) < 0, dtype=np.int64))
                )
                zc = cfl[np.maximum(ends - 1, starts)] - cfl[starts]
            else:
                zc = np.zeros(len(lens), dtype=np.int64)
            peak = np.maximum.reduceat(np.abs(s), starts)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_samples": lens,
                    "rms": rms,
                    "zero_crossings": zc,
                    "peak": peak,
                }
            )

    return df.mapInPandas(kernel, schema=out_schema)


def pcm16_frame_energy(
    df: DataFrame,
    id_col: str = "media_id",
    pcm_col: str = "pcm",
    frame: int = 16,
) -> DataFrame:
    """Frame-level energy over raw PCM16 binary columns, the front half
    of every VAD (voice-activity detection) pipeline: decode is one
    zero-copy ``np.frombuffer``; the waveform cuts into fixed frames
    (last frame ragged) and each frame emits its EXACT int64 energy
    Σs² plus its sample count — downstream thresholding/segmentation
    stays declarative DataFrame algebra. Bytes die in this stage (the
    multimodal rule); output is (id, frame_idx, n, energy) rows."""
    import numpy as np
    import pandas as pd

    out_schema = f"{id_col} long, frame_idx long, n long, energy long"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # r13 (guide §4.2): decode the whole batch with one join+frombuffer
        # and emit every frame from ONE exclusive-prefix cumsum of squares —
        # frame energy = csq[frame_end] - csq[frame_start] — instead of a
        # per-row Python loop with a per-FRAME inner loop (the hottest
        # Python path in the audio leg: rows x frames iterations). Frame
        # boundaries, ragged tails and int64 exactness are unchanged.
        for pdf in batches:
            blobs = [bytes(b) for b in pdf[pcm_col]]
            nbytes = np.fromiter(
                (len(b) for b in blobs), dtype=np.int64, count=len(blobs)
            )
            if (nbytes % 2).any():
                bad = int(np.flatnonzero(nbytes % 2)[0])
                raise ValueError(
                    f"odd-length PCM16 payload ({int(nbytes[bad])} bytes)"
                )
            lens = nbytes // 2
            nframes = (lens + frame - 1) // frame  # empty rows -> 0 frames
            total = int(nframes.sum())
            if not total:
                continue
            s = np.frombuffer(b"".join(blobs), dtype="<i2").astype(np.int64)
            row_ends = np.cumsum(lens)
            row_starts = row_ends - lens
            csq = np.concatenate(([0], np.cumsum(s * s)))
            # per-frame global offsets: row_start + frame * (0..nframes-1)
            fbase = np.cumsum(nframes) - nframes
            fidx = np.arange(total, dtype=np.int64) - np.repeat(fbase, nframes)
            fstart = np.repeat(row_starts, nframes) + fidx * frame
            fend = np.minimum(fstart + frame, np.repeat(row_ends, nframes))
            yield pd.DataFrame(
                {
                    id_col: np.repeat(
                        pdf[id_col].to_numpy().astype(np.int64), nframes
                    ),
                    "frame_idx": fidx,
                    "n": fend - fstart,
                    "energy": csq[fend] - csq[fstart],
                }
            )

    return df.mapInPandas(kernel, out_schema)
