"""Pure-Python property suite for the Arrow tokenizer kernels
(operators/tokenizer_arrow): each kernel is checked against an
independent brute-force reference on randomized inputs — no Spark
session, so hypothesis can run hundreds of adversarial cases.

- bpe_merge_word vs the LITERAL fold chain (one greedy left-to-right
  pass per rank, in rank order — the definitional semantics of
  bpe.bpe_apply_merges), on arbitrary merge tables including
  duplicates and late-created lower-rank pairs;
- viterbi_word vs exhaustive enumeration of ALL segmentations under
  the pinned (score, -n_pieces, -backpointer, pieces) struct order;
- wordpiece_word vs a direct reading of the published greedy
  longest-match rule.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tf_prisma_api_data_ingestion_spark.operators.tokenizer_arrow import (
    bpe_merge_index, bpe_merge_word, viterbi_word, wordpiece_word)

ALPHA = "abc"


def fold_pass(syms: list[str], a: str, b: str) -> list[str]:
    """One greedy left-to-right non-overlapping pass — the literal
    transcription of bpe.merge_fold's aggregate lambda."""
    acc: list[str] = []
    for x in syms:
        if acc and acc[-1] == a and x == b:
            acc[-1] = a + b
        else:
            acc.append(x)
    return acc


def fold_chain(syms: list[str], pairs: list[tuple[str, str]]) -> list[str]:
    for a, b in pairs:
        syms = fold_pass(syms, a, b)
    return syms


sym = st.text(ALPHA, min_size=1, max_size=2)
word_syms = st.lists(sym, min_size=0, max_size=8)
merge_table = st.lists(st.tuples(sym, sym), min_size=0, max_size=10)


class TestBpeKernelProperty:
    @settings(max_examples=300, deadline=None)
    @given(word_syms, merge_table)
    def test_matches_literal_fold_chain(self, syms, pairs):
        rank_of, pair_at = bpe_merge_index(pairs)
        assert bpe_merge_word(list(syms), rank_of, pair_at) == \
            fold_chain(list(syms), pairs)


def viterbi_brute(word: str, pmap: dict[str, int], K: int,
                  unk_score: int):
    """Enumerate every segmentation into pieces of length 1..K (each
    multi-char piece must be in the vocabulary; length-1 falls back
    to unk_score) and pick the max under the fold's struct order:
    (score, -n_pieces, backpointer l - j of the FINAL piece, pieces).

    The fold's array_max compares candidates only at the final
    position j = n, so the third field is l_last - n; ties beyond it
    compare the pieces arrays lexicographically."""
    n = len(word)
    best = None
    stack = [(0, 0, 0, [])]  # (pos, score, npieces, pieces)
    while stack:
        pos, s, k, ps = stack.pop()
        if pos == n:
            cand = (s, -k, (len(ps[-1]) if ps else 0) - n, ps)
            if best is None or cand > best:
                best = cand
            continue
        for l in range(1, K + 1):
            if pos + l > n:
                continue
            sub = word[pos:pos + l]
            if l == 1:
                sc = pmap.get(sub, unk_score)
            else:
                if sub not in pmap:
                    continue
                sc = pmap[sub]
            stack.append((pos + l, s + sc, k + 1, ps + [sub]))
    return best[0], -best[1], best[3]


pieces_tbl = st.dictionaries(
    st.text(ALPHA, min_size=1, max_size=3),
    st.integers(min_value=-10, max_value=-1),
    min_size=1, max_size=8)


class TestViterbiKernelProperty:
    @settings(max_examples=300, deadline=None)
    @given(st.text(ALPHA, min_size=1, max_size=7), pieces_tbl)
    def test_matches_bruteforce_enumeration(self, word, pmap):
        # score and n_pieces are DP-safe under the struct order
        # (appending a suffix preserves their comparison), so the
        # global brute-force optimum must agree on BOTH. The pieces
        # array itself is only locally tie-broken by the fold — on
        # deep ties (same score, count, and final piece) the DP's
        # per-position choice can legally differ from a global
        # argmax over full arrays, e.g. 'aaab' under {'aa': -1}
        # gives ['a','aa','b'] (fold/kernel, pinned cross-engine in
        # test_tokenizer_arrow.py) vs ['aa','a','b'] (global argmax)
        # — so here we assert the pieces are a VALID optimal-scoring
        # segmentation rather than array-equal.
        K = max(len(p) for p in pmap)
        s, k, ps = viterbi_word(word, pmap, K, unk_score=-100)
        bs, bk, _ = viterbi_brute(word, pmap, K, unk_score=-100)
        assert (s, k) == (bs, bk)
        assert "".join(ps) == word
        assert len(ps) == k
        recomputed = sum(
            pmap[p] if len(p) > 1 else pmap.get(p, -100) for p in ps)
        assert recomputed == s
        for p in ps:
            assert len(p) <= K
            if len(p) > 1:
                assert p in pmap


def wordpiece_brute(word: str, vset: set[str], K: int,
                    max_word_len: int, unk: str):
    n = len(word)
    if n == 0 or n > max_word_len:
        return [unk], 1, True
    pos, ps = 0, []
    while pos < n:
        match = None
        for l in range(min(K, n - pos), 0, -1):
            sub = word[pos:pos + l]
            key = sub if pos == 0 else "##" + sub
            if pos == 0 and sub.startswith("##"):
                continue
            if key in vset:
                match = (l, key)
                break
        if match is None:
            return [unk], 1, True
        ps.append(match[1])
        pos += match[0]
    return ps, len(ps), False


wp_vocab = st.sets(
    st.one_of(st.text(ALPHA + "#", min_size=1, max_size=3),
              st.text(ALPHA, min_size=1, max_size=2).map(
                  lambda s: "##" + s)),
    min_size=1, max_size=10)


class TestWordPieceKernelProperty:
    @settings(max_examples=300, deadline=None)
    @given(st.text(ALPHA + "#", min_size=0, max_size=8), wp_vocab)
    def test_matches_direct_greedy_rule(self, word, vocab):
        vset = frozenset(vocab)
        K = max(len(v) - 2 if v.startswith("##") else len(v)
                for v in vset)
        if K < 1:
            return  # stemless-only vocab is rejected upstream
        got = wordpiece_word(word, vset, K, max_word_len=6, unk="[UNK]")
        want = wordpiece_brute(word, set(vset), K, max_word_len=6,
                               unk="[UNK]")
        assert got == want
