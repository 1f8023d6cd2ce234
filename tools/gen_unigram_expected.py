"""Regenerate the pinned unigram-LM expectations for ``text_metrics``.

The Spark side trains the unigram tokenizer LIVE (``vocab.unigram_train``)
and counts/encodes each document under the learned pieces; the oracle
carries the expected per-document token counts and id digests computed
HERE by an independent pure-Python Kudo-style (hard-EM) reference over
the same parquet (read via duckdb, no Spark). A green driver row
therefore proves the distributed trainer reproduces the reference
end-to-end — seeding, EM counting, quantization, pruning, Viterbi
tie-breaks and id assignment included.

Re-run whenever the driver regenerates
``/root/testdata/sf0.01/documents.parquet`` or the params change:

    PYTHONPATH=/root/repo python tools/gen_unigram_expected.py
"""

from __future__ import annotations

import hashlib
import math

VOCAB_SIZE = 48
MAX_PIECE_LEN = 4
N_ITER = 2
SEED_SIZE = 200
UNK = 100_000_000  # must equal vocab.UNIGRAM_UNK_SCORE_MICRO

SF_DIR = "/root/testdata/sf0.01"
OUT = "/root/repo/sed_spark/suite/_unigram_expected.py"


def quantize(counts: dict[str, int]) -> dict[str, int]:
    total = sum(counts.values())
    return {p: int(round(-1e6 * math.log(c / total))) for p, c in counts.items()}


def viterbi(word: str, scores: dict[str, int], max_len: int) -> tuple[str, ...]:
    """Reference Viterbi with the documented tie-break: per position,
    min over (cum_cost, cum_ntok, max_len - k, pieces)."""
    dp = [(0, 0, 0, ())]
    for i in range(1, len(word) + 1):
        cands = []
        for k in range(1, min(max_len, i) + 1):
            piece = word[i - k:i]
            cost = scores.get(piece, UNK if k == 1 else None)
            if cost is None:
                continue
            prev = dp[i - k]
            cands.append(
                (prev[0] + cost, prev[1] + 1, max_len - k, prev[3] + (piece,)),
            )
        dp.append(min(cands))
    return dp[len(word)][3]


def py_unigram_train(word_tf: dict[str, int]):
    # seed: every substring up to MAX_PIECE_LEN, tf-weighted; full
    # alphabet + top SEED_SIZE multi-char by (count DESC, piece ASC)
    seed: dict[str, int] = {}
    for w, tf in word_tf.items():
        for i in range(len(w)):
            for k in range(1, min(MAX_PIECE_LEN, len(w) - i) + 1):
                p = w[i:i + k]
                seed[p] = seed.get(p, 0) + tf
    counts = {p: c for p, c in seed.items() if len(p) == 1}
    counts.update(dict(sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:SEED_SIZE]))
    # hard EM: Viterbi counts under quantized scores; unused chars keep
    # a floor count of 1, unused multi-char pieces drop
    for _ in range(N_ITER):
        scores = quantize(counts)
        new: dict[str, int] = {}
        for w, tf in word_tf.items():
            for p in viterbi(w, scores, MAX_PIECE_LEN):
                new[p] = new.get(p, 0) + tf
        for p in scores:
            if p not in new and len(p) == 1:
                new[p] = 1
        counts = new
    # prune: all single chars + best multi-char to VOCAB_SIZE, requantize
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:VOCAB_SIZE - len(chars)]
    kept = dict(chars)
    kept.update(dict(multi))
    return sorted(quantize(kept).items())


WP_N_MERGES = 12
WP_SCALE = 10**18  # must equal vocab.WORDPIECE_SCORE_SCALE


def py_wordpiece_train(word_tf: dict[str, int]) -> list[str]:
    """Reference WordPiece learner (Schuster & Nakajima likelihood
    merges): start from first-char-plain / ##-continuation symbols,
    iteratively fuse the pair maximizing the exact floor quotient
    cnt(xy)*WP_SCALE // (cnt(x)*cnt(y)), ties (l, r) lexicographic.
    Returns base symbols (sorted) + fused surfaces in merge order."""
    words = []
    for w, tf in word_tf.items():
        if w:
            words.append(([w[0]] + ["##" + c for c in w[1:]], tf))
    base = sorted({x for s, _ in words for x in s})
    merges: list[str] = []
    for _ in range(WP_N_MERGES):
        unit: dict[str, int] = {}
        pair: dict[tuple[str, str], int] = {}
        for s, tf in words:
            for x in s:
                unit[x] = unit.get(x, 0) + tf
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair[p] = pair.get(p, 0) + tf
        if not pair:
            break
        best = None
        for (l, r), c in pair.items():
            key = (-(c * WP_SCALE // (unit[l] * unit[r])), l, r)
            if best is None or key < best:
                best = key
        a, b = best[1], best[2]
        fused = a + b[2:]
        merges.append(fused)
        for idx, (s, tf) in enumerate(words):
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = fused
                else:
                    out.append(x)
            words[idx] = (out, tf)
    return base + merges


def wordpiece(word: str, pset: set, max_len: int) -> tuple[str, ...]:
    """Reference WordPiece greedy longest-match-first; continuation
    surfaces are ##-prefixed in the vocab; any uncovered position makes
    the whole word [UNK] (BERT's all-or-nothing rule)."""
    if not word:
        return ()
    out, i, n = [], 0, len(word)
    while i < n:
        hit = None
        for k in range(min(max_len, n - i), 0, -1):
            cand = word[i:i + k] if i == 0 else "##" + word[i:i + k]
            if cand in pset:
                hit = cand
                break
        if hit is None:
            return ("[UNK]",)
        out.append(hit)
        i += len(hit) - (2 if i > 0 else 0)
    return tuple(out)


def main() -> None:
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id",
    ).fetchall()
    word_tf: dict[str, int] = {}
    for _, text in rows:
        for w in text.split(" "):
            word_tf[w] = word_tf.get(w, 0) + 1
    pieces = py_unigram_train(word_tf)
    scores = dict(pieces)
    seg_cache = {w: viterbi(w, scores, MAX_PIECE_LEN) for w in word_tf}
    counts = [
        (int(doc_id), sum(len(seg_cache[w]) for w in text.split(" ")))
        for doc_id, text in rows
    ]
    # id assignment: pieces sorted lexicographically get 0..V-1
    # (vocab.unigram_vocab parity); digest = md5 of the comma-joined id
    # sequence in original word order
    p2id = {p: i for i, (p, _) in enumerate(pieces)}
    digests = []
    for doc_id, text in rows:
        ids = [p2id[p] for w in text.split(" ") for p in seg_cache[w]]
        digests.append((
            int(doc_id),
            hashlib.md5(",".join(str(i) for i in ids).encode()).hexdigest(),
        ))
    # WordPiece expectations: the reference LEARNER above trains the
    # vocab (likelihood merges), the reference greedy encoder counts
    # under it — so the pinned counts certify the Spark trainer AND the
    # expression encoder end to end
    wp_pieces = py_wordpiece_train(word_tf)
    wp_vocab = set(wp_pieces)
    wp_max = max(len(p) - (2 if p.startswith("##") else 0)
                 for p in wp_pieces)
    wp_cache = {w: wordpiece(w, wp_vocab, wp_max) for w in word_tf}
    wp_counts = [
        (int(doc_id), sum(len(wp_cache[w]) for w in text.split(" ")))
        for doc_id, text in rows
    ]
    sig = (len(rows), sum(len(text) for _, text in rows))
    with open(OUT, "w") as f:
        f.write(
            '"""Pinned unigram-LM expectations for the text_metrics row.\n\n'
            "Generated by tools/gen_unigram_expected.py (pure-Python\n"
            "Kudo-style hard-EM reference, independent of the Spark\n"
            f"implementation) from {SF_DIR}/documents.parquet. Do not\n"
            'edit by hand.\n"""\n\n'
            f"UNIGRAM_VOCAB_SIZE = {VOCAB_SIZE}\n"
            f"UNIGRAM_MAX_PIECE_LEN = {MAX_PIECE_LEN}\n"
            f"UNIGRAM_N_ITER = {N_ITER}\n"
            f"UNIGRAM_SEED_SIZE = {SEED_SIZE}\n\n"
            f"WORDPIECE_N_MERGES = {WP_N_MERGES}\n\n"
            f"UNIGRAM_CORPUS_SIG_SF0_01 = {sig!r}\n\n"
            f"UNIGRAM_PIECES_SF0_01 = {pieces!r}\n\n"
            f"WORDPIECE_PIECES_SF0_01 = {wp_pieces!r}\n\n"
            "UNIGRAM_COUNTS_SF0_01 = [\n",
        )
        for doc_id, c in counts:
            f.write(f"    ({doc_id}, {c}),\n")
        f.write("]\n\nUNIGRAM_ID_DIGESTS_SF0_01 = [\n")
        for doc_id, h in digests:
            f.write(f"    ({doc_id}, {h!r}),\n")
        f.write("]\n\nWORDPIECE_COUNTS_SF0_01 = [\n")
        for doc_id, c in wp_counts:
            f.write(f"    ({doc_id}, {c}),\n")
        f.write("]\n")
    print(
        f"wrote {len(pieces)} pieces, {len(counts)} counts, "
        f"{len(digests)} digests, {len(wp_counts)} wordpiece counts, "
        f"sig={sig} to {OUT}",
    )


if __name__ == "__main__":
    main()
