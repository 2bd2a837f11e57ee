"""Boilerplate shingle mask for the flagship pipeline (SURVEY §4 skew row:
"optionally mask top boilerplate shingles before signatures").

Turn texts shared verbatim across many conversations (system prompts,
canned tool headers) are exactly the texts that explode LSH band buckets:
every conversation carrying the same prompt shares its shingles, so those
shingles dominate MinHash signatures and pile band rows into mega-buckets
(the skew the gated salting in ``stages/lsh.py`` then has to absorb).
This stage computes the set of shingle hashes contributed by such turns
so the signature stage can drop them at the source.

Detection is the same distributed shape as
``pipelines.transcripts.boilerplate_turns`` (the standalone diagnostic):
blocks pre-reduce to distinct (turn_md5, conv_id) rows plus ONE
representative text per md5, one hash shuffle on ``turn_md5`` co-locates
each text's rows, and the fold keeps texts seen in at least
``min_convs`` distinct conversations.  The driver collects only the
qualifying texts — bounded by total_turns / min_convs rows — as Arrow
(never per-row dicts), normalizes them with the reassembly's own
``normalize_array`` and shingles them with the signature stage's own
tokenizer, so a masked hash is bit-identical to the hash the same turn
would contribute inside a document.

Approximation (documented, deliberate): shingles SPANNING a boilerplate
turn's boundary (k-grams straddling into the neighboring turn) are not
masked — they are position-dependent and rare (≤ k−1 per boundary), and
leaving them keeps the mask a pure function of the turn text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.ray_utils import keyed_blocks


def boilerplate_shingle_mask(turns_ds, cfg: DedupConfig) -> np.ndarray:
    """sorted uint64 shingle hashes of every turn text appearing in at
    least ``cfg.boilerplate_mask_min_convs`` distinct conversations."""
    import ray

    from raydedup.functions.shingle import batch_shingles_flat_arrow
    from raydedup.functions.textnorm import normalize_array

    min_convs = cfg.boilerplate_mask_min_convs

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"turn_md5": pd.Series([], dtype=object),
                              "conv_id": pd.Series([], dtype=object),
                              "text": pd.Series([], dtype=object)})
        if len(df) == 0:
            return empty
        texts = df["text"]
        md5s = [hashlib.md5(("" if t is None else t).encode("utf-8")).hexdigest()
                for t in texts]
        out = pd.DataFrame({"turn_md5": md5s,
                            "conv_id": df["conv_id"].to_numpy(dtype=object),
                            "text": texts.to_numpy(dtype=object)})
        # distinct (md5, conv) + any representative text (identical by md5)
        return out.drop_duplicates(["turn_md5", "conv_id"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"text": pd.Series([], dtype=object)})
        if len(df) == 0:
            return empty
        g = (df.groupby("turn_md5", sort=False)
               .agg(n_convs=("conv_id", "nunique"), text=("text", "first"))
               .reset_index())
        g = g[g["n_convs"] >= min_convs]
        return g[["text"]]

    pairs = turns_ds.select_columns(["conv_id", "text"]).map_batches(
        pre, batch_format="pandas"
    )
    hot = keyed_blocks(pairs, ["turn_md5"], cfg.num_partitions).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )
    tables = [t for t in ray.get(hot.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.empty(0, np.uint64)
    texts = pa.concat_tables(tables)["text"].combine_chunks()
    flat, _offsets, _capped = batch_shingles_flat_arrow(
        normalize_array(texts.cast(pa.string())), cfg.shingle_k, 0
    )
    return np.unique(flat.astype(np.uint64, copy=False))
