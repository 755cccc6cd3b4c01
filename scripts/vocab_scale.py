"""Vocabulary at the REAL ORBvoc scale: k=10, L=6, 1,111,110 nodes.

The upstream ORBvoc.txt (absent from the mount, .MISSING_LARGE_BLOBS)
is a k=10/L=6 hierarchical tree with ~1M leaves
(ref: Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338 text format;
include/ORBVocabulary.h:31).  This script proves the array-based
equivalent at that exact geometry end-to-end:

  1. synthesize a FULL k=10/L=6 tree (every interior node has k
     children) with random descriptors, write it in the ORBvoc.txt
     format, and report the file size;
  2. time Vocabulary.load_text on it;
  3. time the batched device descent (assign_nodes) for a 2000-feature
     frame — cold (compile) and steady-state — plus bow_vector;
  4. sanity-check leaf assignment against a host tree walk.

Memory: node_desc 1.1M x 32 B = 36 MB, children table 44 MB — trivial
for HBM/host.  Runs on whatever backend is live (CPU fallback guard).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

from orb_slam2_tpu.utils import setup_compile_cache; setup_compile_cache()
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from orb_slam2_tpu.utils import ensure_live_backend

platform = ensure_live_backend()
import numpy as np

from orb_slam2_tpu.places.vocabulary import Vocabulary, _hamming_np


def main():
    k, L = 10, 6
    rng = np.random.default_rng(0)
    sizes = np.cumsum([k ** d for d in range(1, L + 1)])
    n = int(sizes[-1])                      # 1,111,110 (no root row)
    print(f"platform={platform}  nodes={n:,} (k={k}, L={L})")

    # parent ids in file order: root=0, node ids 1..n by level
    parents = np.empty(n, np.int64)
    start_prev, next_id = 0, 1
    level_starts = [1]
    prev_level = [0]
    for d in range(1, L + 1):
        cnt = k ** d
        parents[next_id - 1: next_id - 1 + cnt] = np.repeat(prev_level, k)
        prev_level = list(range(next_id, next_id + cnt))
        next_id += cnt
        level_starts.append(next_id)
    is_leaf = np.zeros(n, np.int64)
    is_leaf[level_starts[L - 1] - 1:] = 1     # last level only
    by = rng.integers(0, 256, (n, 32), np.uint8)
    w = np.where(is_leaf == 1, rng.uniform(0, 1, n), 0.0)

    path = "/tmp/vocab_scale_k10L6.txt"
    t0 = time.perf_counter()
    with open(path, "w") as f:
        f.write(f"{k} {L} 0 0\n")
        # row-wise formatting via one big join (np.savetxt is too slow
        # at 1.1M x 35 object columns)
        desc_str = [" ".join(map(str, row)) for row in by]
        f.write("\n".join(
            f"{p} {lf} {d} {wi:.6f}"
            for p, lf, d, wi in zip(parents, is_leaf, desc_str, w)))
        f.write("\n")
    t_write = time.perf_counter() - t0
    sz = os.path.getsize(path) / 1e6
    print(f"file: {sz:.0f} MB written in {t_write:.1f}s")

    t0 = time.perf_counter()
    voc = Vocabulary.load_text(path, levels_up=4)
    t_load = time.perf_counter() - t0
    assert voc.n_words == k ** L, voc.n_words
    print(f"load_text: {t_load:.1f}s  n_words={voc.n_words:,} "
          f"(upstream loadFromTextFile takes ~10s on the same format)")

    d = rng.integers(0, 2 ** 32, (2048, 8), np.uint32)
    valid = np.ones(2048, bool)
    t0 = time.perf_counter()
    node_mid, words = voc.assign_nodes(d, valid)
    t_cold = time.perf_counter() - t0
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        voc.assign_nodes(d, valid)
    t_steady = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        ids, wts = voc.bow_vector(words)
    t_bow = (time.perf_counter() - t0) / reps
    print(f"descend 2048 desc: cold {t_cold:.2f}s  "
          f"steady {t_steady*1e3:.1f} ms/frame  "
          f"bow_vector {t_bow*1e3:.2f} ms")

    # host-walk parity spot check
    for i in range(0, 2048, 256):
        cur = 0
        while True:
            ch = voc.node_children[cur]
            ch = ch[ch >= 0]
            if len(ch) == 0:
                break
            dist = _hamming_np(d[i:i + 1], voc.node_desc[ch])[0]
            cur = int(ch[np.argmin(dist)])
        assert voc.word_of_node[cur] == words[i], i
    print("host-walk parity OK")
    os.remove(path)


if __name__ == "__main__":
    main()
