"""Text normalization (the analog of the reference's BGR→RGB color-space
normalization before feature extraction, ``face_recognition_custom.py:79``).

Vectorized with ``pyarrow.compute`` kernels; NFC unicode normalization falls
back to a Python loop only for batches that contain non-ASCII rows.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc


def normalize_array(texts: pa.Array) -> pa.Array:
    """lowercase → collapse whitespace runs to single spaces → strip.

    Null-safe: nulls stay null (the corrupted-record branch handles them).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # NFC only when needed (synthetic fixtures are ASCII; real data may not be)
    if not _all_ascii(texts):
        texts = pa.array(
            [None if t is None else unicodedata.normalize("NFC", t) for t in texts.to_pylist()],
            type=pa.string(),
        )
    t = pc.utf8_lower(texts)
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    return t


def _all_ascii(arr: pa.Array) -> bool:
    try:
        valid = pc.drop_null(arr)
        if len(valid) == 0:
            return True
        return bool(pc.all(pc.string_is_ascii(valid)).as_py())
    except (pa.ArrowNotImplementedError, AttributeError):
        return False


def normalize_text(text: str) -> str:
    """Scalar twin of :func:`normalize_array` (oracle + tests)."""
    import re

    t = unicodedata.normalize("NFC", text).lower()
    return re.sub(r"\s+", " ", t).strip()
