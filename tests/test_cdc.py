"""Content-defined chunking (cdc.py): tiling/bounds/determinism
properties plus the shift-resistance property that motivates CDC."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pqw

SF = "/root/testdata/sf0.001"

AVG_BITS, MIN_LEN, MAX_LEN = 6, 16, 256


def _brute_chunks(text: str):
    """Sequential reference: the h = (h << 1) + GEAR[b] recurrence with
    greedy min/max clamping — the classic formulation the vectorized
    kernel must reproduce bit-for-bit."""
    from raydedup.pipelines.cdc import _GEAR

    raw = ("" if text is None else text).encode("utf-8")
    n = len(raw)
    mask = (1 << AVG_BITS) - 1
    cuts, last = [], 0
    h = 0
    pos_hash = []
    for b in raw:
        h = ((h << 1) + int(_GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        pos_hash.append(h)
    while last < n:
        cut = None
        for i in range(last + MIN_LEN - 1, min(last + MAX_LEN, n)):
            if pos_hash[i] & mask == 0 and i + 1 < n and i + 1 >= last + MIN_LEN:
                cut = i + 1
                break
        if cut is None:
            cut = min(last + MAX_LEN, n)
        cuts.append(cut)
        last = cut
    return cuts, raw


def test_cdc_matches_sequential_reference(ray_session):
    from raydedup.pipelines.cdc import cdc_chunks

    got = (cdc_chunks(SF, AVG_BITS, MIN_LEN, MAX_LEN).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    src = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(src["doc_id"], src["text"]):
        cuts, raw = _brute_chunks(text)
        last = 0
        for i, cut in enumerate(cuts):
            rows.append((doc_id, i, last, cut - last,
                         hashlib.md5(raw[last:cut]).hexdigest()))
            last = cut
    want = (pd.DataFrame(rows, columns=["doc_id", "chunk_idx", "start",
                                        "length", "chunk_md5"])
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cdc_tiles_documents_exactly(ray_session):
    from raydedup.pipelines.cdc import cdc_chunks

    got = cdc_chunks(SF).to_pandas().sort_values(["doc_id", "chunk_idx"])
    src = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    byte_len = {
        d: len(("" if t is None else t).encode("utf-8"))
        for d, t in zip(src["doc_id"], src["text"])
    }
    for doc_id, g in got.groupby("doc_id"):
        starts = g["start"].to_numpy()
        lens = g["length"].to_numpy()
        # contiguous tiling: each chunk starts where the last ended
        assert starts[0] == 0
        assert (starts[1:] == starts[:-1] + lens[:-1]).all()
        assert lens.sum() == byte_len[doc_id]
        # bounds: every chunk ≤ max; all but the final ≥ min
        assert (lens <= MAX_LEN).all()
        assert (lens[:-1] >= MIN_LEN).all()
    # every non-empty doc is covered
    assert set(got["doc_id"]) == {d for d, n in byte_len.items() if n > 0}


def test_cdc_deterministic_across_partitioning(ray_session):
    from raydedup.pipelines.cdc import cdc_dedup

    a = (cdc_dedup(SF, num_partitions=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (cdc_dedup(SF, num_partitions=17).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_cdc_shift_resistance_vs_fixed_windows(ray_session, tmp_path):
    """THE property CDC exists for: a copy with an inserted prefix still
    shares most chunk hashes with its original (boundaries re-sync),
    while fixed-position windows share none."""
    from raydedup.pipelines.cdc import cdc_chunks

    rng = np.random.default_rng(7)
    words = ["".join(rng.choice(list("abcdefghij"), size=5)) for _ in range(400)]
    original = " ".join(words)
    shifted = "THE INSERTED PREFIX CHANGES EVERY BYTE OFFSET " + original
    pqw.write_table(
        pa.table({"doc_id": [1, 2], "text": [original, shifted]}),
        str(tmp_path / "documents.parquet"),
    )
    ch = cdc_chunks(str(tmp_path)).to_pandas()
    h1 = set(ch.loc[ch["doc_id"] == 1, "chunk_md5"])
    h2 = set(ch.loc[ch["doc_id"] == 2, "chunk_md5"])
    shared = len(h1 & h2) / len(h1)
    assert shared >= 0.5, f"CDC chunks failed to re-sync: {shared:.2f}"
    # fixed BYTE windows at the same granularity share nothing
    raw1, raw2 = original.encode(), shifted.encode()
    f1 = {raw1[i:i + 64] for i in range(0, len(raw1), 64)}
    f2 = {raw2[i:i + 64] for i in range(0, len(raw2), 64)}
    assert len(f1 & f2) == 0


def test_cdc_dedup_counts_planted_duplicate(ray_session, tmp_path):
    from raydedup.pipelines.cdc import cdc_dedup

    rng = np.random.default_rng(11)
    words = ["".join(rng.choice(list("abcdefghij"), size=5)) for _ in range(400)]
    text = " ".join(words)
    unique = " ".join("".join(rng.choice(list("qrstuvwxyz"), size=5))
                      for _ in range(400))
    pqw.write_table(
        pa.table({"doc_id": [1, 2, 3], "text": [text, text, unique]}),
        str(tmp_path / "documents.parquet"),
    )
    got = cdc_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    # verbatim copies: every chunk duplicated
    assert got.loc[1, "dup_ratio"] == 1.0
    assert got.loc[2, "dup_ratio"] == 1.0
    # the unique doc shares no chunks
    assert got.loc[3, "n_dup_chunks"] == 0
