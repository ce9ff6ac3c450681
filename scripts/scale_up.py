#!/usr/bin/env python3
"""Scale-probe data generator (r15 verdict task #8).

Builds sf<K*base> parquet tables at OUT by concatenating K key-shifted
copies of the BASE tables: every key column shifts by copy_index *
(max_key + 1), so join cardinalities and key-space sizes grow linearly
while value distributions stay identical. Non-key payloads (names,
texts, embeddings) duplicate across copies — fine for a TIMING probe;
dedup-family queries see a 10x duplicate corpus, which is noted in the
SURVEY ratio table rather than hidden.

With --perturb, payloads VARY per copy instead of duplicating —
documents get a per-copy token woven into the text and embeddings a
small deterministic per-copy rotation — so the dedup/ER/ANN families
see an ORGANIC corpus (near-dups within a copy only) rather than a
10x-duplicated one; use this mode when probing those families' scaling
and the plain mode when byte-identical payloads are the point.

Usage: scale_up.py BASE_DIR OUT_DIR K [--perturb]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASE, OUT, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
PERTURB = "--perturb" in sys.argv[4:]

# table -> columns shifted by copy * (max(col)+1); the per-copy shift
# of a FK uses the PK table's span so references stay aligned
KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", ("o_custkey", "customer", "c_custkey")],
    "lineitem": [("l_orderkey", "orders", "o_orderkey"),
                 ("l_partkey", "part", "p_partkey"),
                 ("l_suppkey", "supplier", "s_suppkey")],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    # vec_id IS a doc_id in the label/semdedup joins: shift by the
    # documents span so cross-copy correspondence stays aligned
    "embeddings": [("vec_id", "documents", "doc_id")],
}

spans = {}


def span(table, col):
    key = (table, col)
    if key not in spans:
        t = pq.read_table(f"{BASE}/{table}.parquet", columns=[col])
        spans[key] = pc.max(t.column(col)).as_py() + 1
    return spans[key]


import os
os.makedirs(OUT, exist_ok=True)
for table, keys in KEYS.items():
    t = pq.read_table(f"{BASE}/{table}.parquet")
    if not keys:
        pq.write_table(t, f"{OUT}/{table}.parquet")
        print(f"{table}: copied ({t.num_rows} rows)")
        continue
    copies = []
    for k in range(K):
        cols = []
        for name in t.schema.names:
            col = t.column(name)
            shift = None
            for spec in keys:
                if isinstance(spec, tuple) and spec[0] == name:
                    shift = k * span(spec[1], spec[2])
                elif spec == name:
                    shift = k * span(table, name)
            if shift:
                col = pc.add(col, pa.scalar(shift, type=col.type))
            if PERTURB and k > 0:
                if table == "documents" and name == "text":
                    # v2 (r17): interleave the per-copy token EVERY 6
                    # WORDS, not once in front — one front token left
                    # cross-copy 3-gram Jaccard at ~0.97 (still a
                    # near-dup), so the r16 probe measured a
                    # duplicated corpus anyway. Dense interleaving
                    # drops cross-copy Jaccard well below every dedup
                    # threshold: copies are organically DISTINCT docs.
                    import re as _re
                    tok = f"c{k}x"
                    def weave(s, _t=tok):
                        if s is None:
                            return None
                        w = s.split(" ")
                        out = []
                        for i, word in enumerate(w):
                            if i % 6 == 0:
                                out.append(_t)
                            out.append(word)
                        return " ".join(out)
                    col = pa.array([weave(v) for v in col.to_pylist()],
                                   type=pa.string())
                elif table == "embeddings" and name == "embedding":
                    # v2 (r17): add a copy-specific deterministic
                    # ±0.5·RMS pattern per dimension — the r16 scale
                    # jitter (×(1+k/1000)) left COSINE exactly 1.0
                    # (scaling never moves cosine), so cosine-space
                    # ops still saw 10 perfect duplicates. The
                    # pattern puts base↔copy cosine at ~0.89 and
                    # copy↔copy at ~0.80: organically related, never
                    # duplicates.
                    import numpy as np
                    lc = col.combine_chunks()
                    flat = lc.flatten().to_numpy(zero_copy_only=False)
                    offs = lc.offsets.to_numpy(zero_copy_only=False)
                    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
                    rms = float(np.sqrt(np.mean(flat ** 2))) or 1.0
                    rng = np.random.RandomState(0xC0FFEE + k)
                    pattern = rng.choice([-1.0, 1.0], size=dim) \
                        .astype(np.float32) * np.float32(0.5 * rms)
                    flat = (flat.reshape(-1, dim) + pattern) \
                        .astype(np.float32).ravel()
                    col = pa.ListArray.from_arrays(
                        lc.offsets, pa.array(flat, type=pa.float32()),
                        type=lc.type)
                elif table == "part" and name == "p_name":
                    # v2 (r17): per-copy name suffix — the ER/fuzzy
                    # family blocks and edit-distances over p_name,
                    # and unperturbed names left cross-copy parts as
                    # EXACT duplicates (quadratic true-match growth,
                    # the r16 adjudication's unmeasured caveat)
                    col = pc.binary_join_element_wise(
                        col, pa.scalar(f"c{k}"), pa.scalar(" "))
                elif table == "part" and name == "p_size":
                    # spread sizes too (deterministic ±2 per copy):
                    # size agreement must not survive copying either
                    col = pc.add(col, pa.scalar((k * 3) % 5 - 2,
                                                type=col.type))
            cols.append(col)
        copies.append(pa.table(dict(zip(t.schema.names, cols)),
                               schema=t.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{OUT}/{table}.parquet")
    print(f"{table}: {t.num_rows} -> {out.num_rows} rows")
