"""BPE vocabulary learning (tx13/tx14) — parity with a pure-Python
reference trainer over the driver's documents table.

The reference implements the textbook algorithm (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
paper): count adjacent symbol pairs over frequency-weighted word types,
merge the argmax pair greedily left-to-right, repeat.
"""

from __future__ import annotations

import pytest

import re
from collections import Counter

from ai_optimizer_spark.operators.textops import (
    BPE_PRETOKEN_RE,
    bpe_learn,
    bpe_pair_counts,
)
from ai_optimizer_spark.tables import load_tables


def _py_word_freq(texts):
    wf = Counter()
    for t in texts:
        wf.update(re.findall(BPE_PRETOKEN_RE, t))
    return wf


def _py_pair_counts(sym_freq):
    pc = Counter()
    for syms, freq in sym_freq.items():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += freq
    return pc


def _py_merge(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return tuple(out)


def _py_bpe_learn(texts, n_merges):
    """Textbook trainer: argmax pair with (count desc, a asc, b asc)
    tie-break — the same total ordering the Spark op uses."""
    wf = _py_word_freq(texts)
    sym_freq = {}
    for w, f in wf.items():
        k = tuple(w)
        sym_freq[k] = sym_freq.get(k, 0) + f
    learned = []
    for rank in range(n_merges):
        pc = _py_pair_counts(sym_freq)
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        learned.append((rank, a, b, n))
        nxt = {}
        for k, f in sym_freq.items():
            m = _py_merge(k, a, b)
            nxt[m] = nxt.get(m, 0) + f
        sym_freq = nxt
    return learned


def test_pair_counts_match_python_reference(spark, sf_small):
    t = load_tables(spark, sf_small)
    texts = [r.text for r in t["documents"].select("text").collect()]
    wf = _py_word_freq(texts)
    sym_freq = {}
    for w, f in wf.items():
        k = tuple(w)
        sym_freq[k] = sym_freq.get(k, 0) + f
    pc = _py_pair_counts(sym_freq)
    expected = sorted(
        ((n, a, b) for (a, b), n in pc.items()),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:30]
    got = [
        (r.pair_count, r.a, r.b) for r in bpe_pair_counts(t, k=30).collect()
    ]
    assert got == expected


def test_bpe_learn_matches_python_reference(spark, sf_small):
    t = load_tables(spark, sf_small)
    texts = [r.text for r in t["documents"].select("text").collect()]
    expected = _py_bpe_learn(texts, n_merges=6)
    got = [
        (r.merge_rank, r.a, r.b, r.pair_count)
        for r in bpe_learn(t, n_merges=6).collect()
    ]
    assert got == expected
    # learned merges must be multi-char from round 2 on in any real corpus;
    # sanity: counts are non-increasing is NOT guaranteed by BPE, but all
    # counts are positive and ranks are dense
    assert [g[0] for g in got] == list(range(len(got)))
    assert all(g[3] > 0 for g in got)


def test_bpe_tokenize_matches_python_reference(spark, sf_small):
    from ai_optimizer_spark.operators.textops import bpe_tokenize

    t = load_tables(spark, sf_small)
    texts = {
        r.doc_id: r.text
        for r in t["documents"].select("doc_id", "text").collect()
    }
    merges = [(a, b) for _, a, b, _ in _py_bpe_learn(list(texts.values()), 6)]

    def tok(word):
        syms = list(word)
        for a, b in merges:
            syms = list(_py_merge(syms, a, b))
        return syms

    got = {
        r.doc_id: (r.n_subwords, r.n_uniq_subwords, r.chars_per_subword)
        for r in bpe_tokenize(t, n_merges=6).collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        n_sub, uniq, n_chars = 0, set(), 0
        for w in re.findall(BPE_PRETOKEN_RE, text):
            toks = tok(w)
            n_sub += len(toks)
            uniq.update(toks)
            n_chars += len(w)
        exp_cps = round(n_chars / max(n_sub, 1), 3)
        assert got[doc_id][0] == n_sub
        assert got[doc_id][1] == len(uniq)
        assert abs(got[doc_id][2] - exp_cps) < 1e-9


@pytest.mark.slow
def test_merge_fold_property(spark):
    """Property test: the Catalyst fold in _merge_pair implements greedy
    left-to-right non-overlapping pair merging exactly — checked against
    the Python reference over randomized symbol sequences, including the
    overlap traps ('aaa' with (a,a) → [aa, a]) and merged-symbol
    collisions."""
    import random

    from pyspark.sql import functions as F

    from ai_optimizer_spark.operators.textops import _merge_pair

    rng = random.Random(42)
    alphabet = ["a", "b", "ab", "ba", "aa"]
    cases = []
    for _ in range(120):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(0, 10))]
        a, b = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((syms, a, b))
    # degenerate overlap traps, explicitly
    cases += [
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b", "a"], "a", "b"),
        ([], "a", "b"),
        (["b"], "a", "b"),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)], "i int, syms array<string>"
    )
    # group cases by (a,b) so each merge pair evaluates as one expression
    by_pair: dict = {}
    for i, (syms, a, b) in enumerate(cases):
        by_pair.setdefault((a, b), []).append(i)
    got = {}
    for (a, b), idxs in by_pair.items():
        rows = (
            df.filter(F.col("i").isin(idxs))
            .select("i", _merge_pair(F.col("syms"), a, b).alias("m"))
            .collect()
        )
        for r in rows:
            got[r.i] = list(r.m)
    for i, (syms, a, b) in enumerate(cases):
        assert got[i] == list(_py_merge(syms, a, b)), (syms, a, b, got[i])
