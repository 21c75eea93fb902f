#!/usr/bin/env python3
"""Deterministic scale fixtures for the SCALING.md curve (round 9).

The driver's /root/testdata tops out at sf0.1 (2k embeddings / 5k docs),
where per-query fixed cost dominates and every scaling claim rests on
plan-shape argument alone. This generator produces the SAME schema at
10x and 100x that size (sf1, sf10) so the headline query family can be
measured at two sizes that differ only by row count — the scaling
exponent then comes from one generator, not from comparing two
different data distributions.

Schemas mirror /root/testdata (embeddings: vec_id int64, embedding
list<float> unit-norm dim 64, label int32 0..9; documents: doc_id,
text, lang, source, n_chars) including the properties the measured
queries exercise: ~3% near-duplicate embedding pairs (cosine dedup
signal), ~3% copied-with-mutation texts (minhash/span dedup signal).

Usage: python3 tools/gen_scale_fixture.py /tmp/graft_scale
Writes  /tmp/graft_scale/sf1/{embeddings,documents}.parquet   (20k/50k)
        /tmp/graft_scale/sf10/{embeddings,documents}.parquet  (200k/500k)
        /tmp/graft_scale/sf1c, sf10c — same sizes, CLUSTERED embeddings
        (mixture of 16 Gaussian centers, sigma 0.05): the regime real
        embedding corpora live in (kmeans-able structure), added in round
        10 so hierarchical assignment can be graded on data with
        something for the coarse level to exploit (VERDICT r9 #2).
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group shuffle join filter push prune broadcast skew salt merge "
    "stream window state event click error user query vector index cell "
    "probe score token span shingle corpus quality sample pack shard tier "
    "replica flush template kernel slab bucket range page offset stride "
    "cache spill codec decode encode frame sample rate gray pixel audio "
    "doc text lang source chars count table row file byte record stage "
    "task job plan tree scan2 agg sum min max mean std drift bloom sketch"
).split()

LANGS = ["en", "en", "en", "en", "fr", "de", "zh", "es", "en", "pt"]


def gen(outdir: str, n_emb: int, n_doc: int, seed: int = 42,
        clusters: int = 0, spread: float = 0.15) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- embeddings: unit-norm dim 64 + ~3% near-dup pairs.
    # clusters=0 -> structureless isotropic gaussian (the r9 fixture);
    # clusters=k -> mixture of k unit-norm centers with gaussian spread
    # sigma=`spread` around each, points assigned round-robin so every
    # center holds ~n/k points (controllable structure, one knob) ---
    if clusters > 0:
        centers = rng.standard_normal((clusters, 64)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        which = np.arange(n_emb) % clusters
        emb = (centers[which] +
               rng.standard_normal((n_emb, 64)).astype(np.float32) * spread)
    else:
        emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    for i in range(1, n_emb, 33):  # deterministic near-dup injection
        emb[i] = emb[i - 1] + rng.standard_normal(64).astype(np.float32) * 0.01
        emb[i] /= np.linalg.norm(emb[i])
    vec_id = np.arange(n_emb, dtype=np.int64)
    # list<float> built from the flat buffer: identical values/schema to the
    # old emb.tolist() path but O(1) python objects — required at sf100
    # (2M x 64 = 128M floats) and faster at every size.
    offsets = pa.array(np.arange(n_emb + 1, dtype=np.int64) * 64)
    emb_col = pa.LargeListArray.from_arrays(
        offsets, pa.array(emb.reshape(-1))).cast(pa.list_(pa.float32()))
    pq.write_table(
        pa.table({
            "vec_id": vec_id,
            "embedding": emb_col,
            "label": (vec_id % 10).astype(np.int32),
        }),
        f"{outdir}/embeddings.parquet")

    # --- documents: vocab-sampled texts + ~3% copy-with-mutation dups ---
    v = np.array(VOCAB)
    lens = 40 + (np.arange(n_doc) * 7) % 30
    texts = []
    for i in range(n_doc):
        if i % 29 == 1 and i > 0:
            words = texts[i - 1].split()
            words[int(lens[i]) % len(words)] = v[i % len(v)]
            texts.append(" ".join(words))
        else:
            idx = rng.integers(0, len(v), int(lens[i]))
            texts.append(" ".join(v[idx]))
    doc_id = np.arange(n_doc, dtype=np.int64)
    pq.write_table(
        pa.table({
            "doc_id": doc_id,
            "text": texts,
            "lang": [LANGS[int(i) % len(LANGS)] for i in doc_id],
            "source": [f"src{int(i) % 10}" for i in doc_id],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }),
        f"{outdir}/documents.parquet")
    print(f"{outdir}: embeddings={n_emb} documents={n_doc}")


def gen_rich(outdir: str, n_doc: int, seed: int = 43,
             n_vocab: int = 12_000) -> None:
    """Rich-vocabulary corpus for BPE-at-scale probes: the base fixture's
    ~120-word vocabulary exhausts its mergeable pairs near 91 merges, so a
    1k-vocab training run needs words with combinatorial character
    structure. Words are 2-3 syllables drawn from an onset x vowel x coda
    grid (~2.5k syllables -> millions of possible words, n_vocab kept),
    sampled with a power-law skew so pair counts have a realistic
    Zipf-like head. A small embeddings table rides along only because the
    probe harness loads the collection unconditionally."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    onsets = list("bcdfghjklmnprstvwz") + [
        "br", "ch", "cl", "dr", "fl", "gr", "pl", "pr", "sh", "sl",
        "st", "th", "tr"]
    vowels = ["a", "e", "i", "o", "u", "ai", "ea", "ou"]
    codas = ["", "n", "r", "s", "t", "l", "m", "ck", "ng", "st"]
    syll = np.array([o + v + c for o in onsets for v in vowels for c in codas])
    n_syll = [2, 3]
    vocab = []
    seen = set()
    while len(vocab) < n_vocab:
        k = n_syll[len(vocab) % 2]
        w = "".join(syll[rng.integers(0, len(syll), k)])
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    v = np.array(vocab)
    texts = []
    for i in range(n_doc):
        ln = 40 + (i * 7) % 40
        # power-skewed rank sampling: a Zipf-ish frequency head
        idx = (len(v) * rng.random(ln) ** 2.2).astype(np.int64)
        texts.append(" ".join(v[idx]))
    doc_id = np.arange(n_doc, dtype=np.int64)
    pq.write_table(
        pa.table({
            "doc_id": doc_id,
            "text": texts,
            "lang": ["en"] * n_doc,
            "source": [f"src{int(i) % 10}" for i in doc_id],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }),
        f"{outdir}/documents.parquet")
    emb = rng.standard_normal((1000, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    vec_id = np.arange(1000, dtype=np.int64)
    pq.write_table(
        pa.table({
            "vec_id": vec_id,
            "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
            "label": (vec_id % 10).astype(np.int32),
        }),
        f"{outdir}/embeddings.parquet")
    print(f"{outdir}: documents={n_doc} vocab={n_vocab}")


def gen_headshare(outdir: str, n_doc: int, seed: int = 47,
                  n_vocab: int = 8_000) -> None:
    """HEAD-SHARING corpus for the batched-BPE worst case (VERDICT r12
    #5): natural language at small vocab is where batch acceptance
    narrows, because the top-ranked candidate pairs all share the same
    few high-frequency symbols ('e','t','a' in English -> 'th','he',
    'er','re',... every one touching 'e'/'t'/'h') and the exact commute
    rule can only accept mutually DISJOINT products per round. The rich
    sfbpe fixture deliberately avoids this (syllable grid -> disjoint
    products at depth); this one deliberately creates it: words are
    letter sequences drawn iid from a Zipf-skewed 16-letter alphabet
    (top letter ~25% of mass, like 'e'+'t' in English), so pair
    frequency mass concentrates on a tiny clique of shared-letter
    bigrams. Word usage is Zipf too (natural-language token curve)."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    letters = np.array(list("etaoinshrdlucmfw"))
    # Zipf(~1.07) over letter ranks, normalized — close to English letter
    # frequencies (e ~12.7%, t ~9.1%, ...)
    w = 1.0 / np.arange(1, len(letters) + 1) ** 1.07
    w /= w.sum()
    vocab = []
    seen = set()
    while len(vocab) < n_vocab:
        ln = 2 + int(rng.integers(0, 7))  # word length 2..8
        word = "".join(rng.choice(letters, size=ln, p=w))
        if word not in seen:
            seen.add(word)
            vocab.append(word)
    v = np.array(vocab)
    # word usage: Zipf-ish rank sampling (power 1.7 over the uniform ->
    # a heavy token-frequency head, like real text)
    texts = []
    for i in range(n_doc):
        ln = 40 + (i * 7) % 40
        idx = (len(v) * rng.random(ln) ** 1.7).astype(np.int64)
        texts.append(" ".join(v[idx]))
    doc_id = np.arange(n_doc, dtype=np.int64)
    pq.write_table(
        pa.table({
            "doc_id": doc_id,
            "text": texts,
            "lang": ["en"] * n_doc,
            "source": [f"src{int(i) % 10}" for i in doc_id],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }),
        f"{outdir}/documents.parquet")
    emb = rng.standard_normal((1000, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    vec_id = np.arange(1000, dtype=np.int64)
    pq.write_table(
        pa.table({
            "vec_id": vec_id,
            "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
            "label": (vec_id % 10).astype(np.int32),
        }),
        f"{outdir}/embeddings.parquet")
    print(f"{outdir}: documents={n_doc} vocab={n_vocab} (head-share)")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_scale"
    if len(sys.argv) > 2 and sys.argv[2] == "headshare":
        gen_headshare(f"{base}/sfbpe_head", 20_000)
    elif len(sys.argv) > 2 and sys.argv[2] == "sf100":
        # round-12 third scale point (VERDICT r11 #1): 2M vectors / 5M docs,
        # same generator + near-dup injection so the three-point exponent
        # is distribution-clean.
        gen(f"{base}/sf100", 2_000_000, 5_000_000)
    elif len(sys.argv) > 2 and sys.argv[2] == "sf100c":
        # round-14 deployment-regime fixture (VERDICT r13 #1): 2M CLUSTERED
        # vectors — the regime real embedding corpora live in, where the
        # r13 residual-PQ recall findings (measured on 200k clustered) are
        # graded at the 2M scale the cnBand store serves. Docs kept small:
        # the ANN probes this fixture exists for never read documents.
        gen(f"{base}/sf100c", 2_000_000, 200_000, clusters=16, spread=0.05)
    else:
        gen(f"{base}/sf1", 20_000, 50_000)
        gen(f"{base}/sf10", 200_000, 500_000)
        gen(f"{base}/sf1c", 20_000, 50_000, clusters=16, spread=0.05)
        gen(f"{base}/sf10c", 200_000, 500_000, clusters=16, spread=0.05)
        gen_rich(f"{base}/sfbpe", 20_000)
