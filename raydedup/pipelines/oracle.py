"""Sequential reference-semantics oracle (SURVEY.md §2.6 rules 1-6).

A pure-Python behavioral twin of the reference's greedy first-match star
clustering (``duplicate_face.py:57-82``, ``face_recognition_custom.py:102-117``):

1. records processed in input order (here: conv_id sort order);
2. each record yields 0..k features (here: its exact shingle-hash set);
3. a record is compared against canonicals *in first-seen order*; the first
   canonical with exact Jaccard >= threshold claims it (the reference's
   ``break`` at duplicate_face.py:75);
4. otherwise the record becomes a new canonical;
5. output clusters are stars keyed by the canonical;
6. zero-feature records are singleton uniques with a status
   (duplicate_face.py:46-52); corrupted records are quarantined singletons
   (duplicate_face.py:84-89).

An inverted shingle→canonical index prunes the linear scan (a canonical
sharing no shingle has Jaccard 0 < τ), which changes nothing semantically
but makes the oracle usable at test scale.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np

from raydedup.functions.shingle import doc_shingles, exact_jaccard
from raydedup.functions.textnorm import normalize_text


@dataclass
class OracleResult:
    pairs: list          # (canonical, dup, sim) — the reference's duplicates dict as edges
    canonicals: list     # conv_ids that became canonicals, in first-seen order
    status: dict         # conv_id -> 'ok' | 'no_content'


def greedy_star_pairs(docs: "list[tuple[str, str]]", shingle_k: int, threshold: float,
                      max_shingles: int = 0) -> OracleResult:
    """``docs``: (conv_id, raw_doc_text) — will be normalized + shingled here.

    Input order is the given list order (callers pass conv_id-sorted docs,
    the analog of the reference's directory-listing order,
    duplicate_face.py:159).
    """
    pairs, canonicals, status = [], [], {}
    canon_sets: dict[str, np.ndarray] = {}
    canon_order: dict[str, int] = {}
    index: dict[int, list] = defaultdict(list)  # shingle -> canonical conv_ids (first-seen order)

    for conv_id, text in docs:
        sh = doc_shingles(normalize_text(text or ""), shingle_k, max_shingles)
        if len(sh) == 0:
            status[conv_id] = "no_content"
            continue
        status[conv_id] = "ok"
        # candidates = canonicals sharing >= 1 shingle, scanned in first-seen order
        cand_ids = {c for s in sh.tolist() for c in index[s]}
        matched = None
        for c in sorted(cand_ids, key=canon_order.__getitem__):
            sim = exact_jaccard(sh, canon_sets[c])
            if sim >= threshold:
                matched = (c, sim)
                break  # first match wins — duplicate_face.py:75
        if matched is not None:
            pairs.append((matched[0], conv_id, matched[1]))
        else:
            canon_order[conv_id] = len(canonicals)
            canonicals.append(conv_id)
            canon_sets[conv_id] = sh
            for s in sh.tolist():
                index[s].append(conv_id)
    return OracleResult(pairs=pairs, canonicals=canonicals, status=status)


def pair_recall(oracle_pairs, engine_clusters: dict) -> float:
    """Fraction of oracle (canonical, dup) pairs co-clustered by the engine.

    ``engine_clusters``: conv_id -> cluster_id.  Connected components are a
    superset of every reference star (SURVEY.md §2.6 correctness argument),
    so this is the scored direction.
    """
    if not oracle_pairs:
        return 1.0
    hit = sum(
        1
        for c, d, _ in oracle_pairs
        if engine_clusters.get(c) is not None and engine_clusters.get(c) == engine_clusters.get(d)
    )
    return hit / len(oracle_pairs)
