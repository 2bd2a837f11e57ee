"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Produces the engine's primary input table — one row per conversation turn,
exactly the ``BASELINE.json: input_hint`` schema — with planted duplicate
families and a ground-truth table.  Everything derives from a single seed;
two calls with the same (seed, n_convs) are byte-identical, so tests and
benches can cache the Parquet under /tmp keyed by those parameters.

Planted families (FIXTURES.md §1 table):
  exact      — verbatim copy under a new conv_id (fresh ts)
  near       — copy with per-turn token edit rate eps in {0.02, 0.05, 0.10}
  chain      — A→B→C, eps per hop (transitive; scored on pair recall only)
  longrep    — unrelated convs sharing one verbatim ~800-char span
  boiler     — share only a boilerplate system prompt (must NOT cluster)
  singleton  — unique conversations
  zero       — all-empty/whitespace text (status no_content)
  corrupt    — null text or non-dense turn_idx (status corrupted)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raydedup.schema import TRANSCRIPTS

_ROLES_POOL = ["user", "assistant"]
_TOOLS = ["search", "calc", "browse", "exec", "lookup", "fetch", "db", "mail"]
_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)

# family mixture (fractions of conversations *before* copies are added)
_FAMILY_FRACS = [
    ("singleton", 0.47),
    ("exact", 0.10),     # each spawns 1 copy
    ("near", 0.15),      # each spawns 1 edited copy
    ("chain", 0.05),     # each spawns 2 chained copies
    ("longrep", 0.05),   # pairs share a long span
    ("boiler", 0.08),    # plain convs; boilerplate skew comes from system turns anyway
    ("zero", 0.05),
    ("corrupt", 0.05),
]


def _make_vocab(rng: np.random.RandomState, n: int = 5000) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = set()
    while len(words) < n:
        ln = rng.randint(3, 9)
        words.add("".join(rng.choice(letters, size=ln)))
    return np.array(sorted(words), dtype=object)


def _sentence(rng, vocab, n_words):
    return " ".join(rng.choice(vocab, size=n_words))


def _base_conv(rng, vocab, boilerplates):
    """One conversation: list of (role, text, tool). First turn = system boilerplate."""
    n_turns = int(np.clip(2 + rng.geometric(0.15), 2, 40))
    turns = [("system", boilerplates[rng.randint(len(boilerplates))], "")]
    for t in range(1, n_turns):
        if rng.rand() < 0.10:
            tool = _TOOLS[rng.randint(len(_TOOLS))]
            payload = f'{{"tool": "{tool}", "args": "{_sentence(rng, vocab, rng.randint(2, 6))}"}}'
            turns.append(("tool", payload, tool))
        else:
            role = _ROLES_POOL[t % 2]
            turns.append((role, _sentence(rng, vocab, 5 + int(rng.geometric(0.04))), ""))
    return turns


def _edit_tokens(rng, text, eps):
    """Per-token edits at rate eps: substitution / deletion / insertion."""
    toks = text.split()
    out = []
    for tok in toks:
        r = rng.rand()
        if r < eps / 3:
            continue  # delete
        if r < 2 * eps / 3:
            out.append("x%05d" % rng.randint(100000))  # substitute
        else:
            out.append(tok)
        if rng.rand() < eps / 3:
            out.append("y%05d" % rng.randint(100000))  # insert
    return " ".join(out) if out else text


def _edit_conv(rng, turns, eps):
    return [(r, _edit_tokens(rng, txt, eps) if r != "system" else txt, tool) for r, txt, tool in turns]


def generate(seed: int = 42, n_convs: int = 2000):
    """Return ``(turns_table, truth_table)`` as pyarrow Tables.

    truth columns: conv_id, family, group_id — group_id ties duplicate-family
    members together; scoring uses within-group pairs of dup-producing
    families (exact/near/chain).
    """
    rng = np.random.RandomState(seed)
    vocab = _make_vocab(rng)
    # B≈5 boilerplate system prompts, 200-380 chars: shared across most convs
    boilerplates = []
    while len(boilerplates) < 5:
        s = _sentence(rng, vocab, rng.randint(34, 56))
        if 200 <= len(s) <= 380:
            boilerplates.append(s)

    convs = []  # list of (family, group_id, turns, corrupt_kind)
    gid = 0
    for fam, frac in _FAMILY_FRACS:
        count = max(1, int(n_convs * frac))
        for _ in range(count):
            gid += 1
            if fam == "zero":
                n = int(rng.randint(2, 6))
                turns = [("user" if i % 2 else "system", " " * int(rng.randint(0, 3)), "") for i in range(n)]
                convs.append((fam, gid, turns, None))
            elif fam == "corrupt":
                turns = _base_conv(rng, vocab, boilerplates)
                kind = ["null_text", "gap_idx", "dup_idx"][rng.randint(3)]
                convs.append((fam, gid, turns, kind))
            elif fam == "exact":
                base = _base_conv(rng, vocab, boilerplates)
                convs.append((fam, gid, base, None))
                convs.append((fam, gid, [t for t in base], None))
            elif fam == "near":
                base = _base_conv(rng, vocab, boilerplates)
                eps = [0.02, 0.05, 0.10][rng.randint(3)]
                convs.append((fam, gid, base, None))
                convs.append((fam, gid, _edit_conv(rng, base, eps), None))
            elif fam == "chain":
                # hop edit rate 0.02 → hop Jaccard ≈ 0.88 (matches at τ=0.8);
                # A↔C ≈ 0.78 (does not) — a true transitive chain.
                a = _base_conv(rng, vocab, boilerplates)
                b = _edit_conv(rng, a, 0.02)
                c = _edit_conv(rng, b, 0.02)
                convs.append((fam, gid, a, None))
                convs.append((fam, gid, b, None))
                convs.append((fam, gid, c, None))
            elif fam == "longrep":
                span = _sentence(rng, vocab, 130)  # ~800+ chars verbatim span
                for _i in range(2):
                    t = _base_conv(rng, vocab, boilerplates)
                    pos = rng.randint(1, len(t) + 1)
                    t.insert(pos, ("assistant", span, ""))
                    convs.append((fam, gid, t, None))
            else:  # singleton / boiler
                convs.append((fam, gid, _base_conv(rng, vocab, boilerplates), None))

    # interleave deterministically so family members aren't adjacent conv_ids
    order = rng.permutation(len(convs))

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    t_conv, t_fam, t_gid = [], [], []
    ts_cursor = _EPOCH_US
    for new_i, old_i in enumerate(order):
        fam, g, turns, corrupt_kind = convs[old_i]
        cid = f"conv-{new_i:08d}"
        t_conv.append(cid)
        t_fam.append(fam)
        t_gid.append(g)
        idxs = list(range(len(turns)))
        if corrupt_kind == "gap_idx" and len(idxs) > 2:
            idxs[-1] += 2  # hole in the index sequence
        elif corrupt_kind == "dup_idx" and len(idxs) > 2:
            idxs[-1] = idxs[-2]  # duplicated index
        null_at = rng.randint(len(turns)) if corrupt_kind == "null_text" else -1
        for j, (role, txt, tool) in enumerate(turns):
            conv_ids.append(cid)
            turn_idxs.append(idxs[j])
            roles.append(role)
            texts.append(None if j == null_at else txt)
            tools.append(tool)
            ts_cursor += int(rng.randint(1_000, 5_000_000))
            tss.append(ts_cursor)

    turns_tbl = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        },
        schema=TRANSCRIPTS,
    )
    truth_tbl = pa.table(
        {
            "conv_id": pa.array(t_conv, pa.string()),
            "family": pa.array(t_fam, pa.string()),
            "group_id": pa.array(t_gid, pa.int64()),
        }
    )
    return turns_tbl, truth_tbl


def materialize(seed: int = 42, n_convs: int = 2000, base_dir: str = "/tmp/raydedup_fixtures"):
    """Write (or reuse) the cached Parquet fixture; returns its directory.

    Layout: ``{base_dir}/s{seed}_n{n_convs}/transcripts.parquet`` + truth.
    """
    out = os.path.join(base_dir, f"s{seed}_n{n_convs}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        tmp = out + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        turns, truth = generate(seed=seed, n_convs=n_convs)
        pq.write_table(turns, os.path.join(tmp, "transcripts.parquet"))
        pq.write_table(truth, os.path.join(tmp, "truth.parquet"))
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        if os.path.exists(out):  # lost a race with a concurrent writer; ours is equivalent
            import shutil

            shutil.rmtree(tmp)
        else:
            os.rename(tmp, out)
    return out
