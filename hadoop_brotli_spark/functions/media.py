"""Media decode helpers for multimodal binary columns.

The execution container ships no image/audio/video libraries, so the
actual pixel/sample decode is STUBBED: ``fake_decode_meta`` derives
deterministic metadata from payload length (the oracle reproduces the
same arithmetic), and ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless a real backend (PIL / soundfile) is
importable. The Spark-side plumbing — binary columns, Arrow batch
shapes, typed schemas — is real and tested.
"""

from __future__ import annotations

import pandas as pd

try:  # real decoders, if the environment has them
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def fake_decode_meta(payload: pd.Series) -> pd.DataFrame:
    """Deterministic fake media metadata from an opaque blob column.

    Stands in for an image/video header parse; keep the formula in
    sync with the q90/q91 oracles.
    """
    n = payload.map(len).astype("int64")
    return pd.DataFrame(
        {
            "n_bytes": n,
            "width": 64 + n % 576,
            "height": 48 + (n * 7) % 432,
            "n_frames": 1 + n % 15,
        }
    )


def decode_image(payload: bytes) -> "Image.Image":
    """Decode an image blob. STUB: requires PIL, absent in this
    container."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this environment has no image "
            "libraries — use fake_decode_meta for metadata plumbing"
        )
    import io

    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes):
    """Decode an audio blob to samples. STUB: no audio backend in
    this container."""
    raise NotImplementedError(
        "audio decode requires soundfile/librosa; absent in this environment"
    )
