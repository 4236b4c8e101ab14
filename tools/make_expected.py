#!/usr/bin/env python3
"""Independent oracle generator for the hash-seeded §2D operators.

Re-implements the deterministic kernels (fnv1a64, splitmix64, simhash,
hyperplane signatures, cosine, IVF assignment, the langid heuristic) in
pure Python — no Spark, no JVM — directly from the documents/embeddings
parquet, and writes the expected operator outputs as parquet fixtures
under expected/sf*/.  SparkEntry.oracleSql points DuckDB at these files,
which turns the locality-sensitive operators (whose semantics are not
ANSI-SQL-expressible) into hard hash-checked entries of the driver's
correctness gate.

The arithmetic mirrors graft.functions.TextHashes bit-for-bit:
  * 64-bit ops run unsigned mod 2^64 (Java two's-complement wraparound),
    signed comparisons where Java compares signed longs;
  * float32 -> float64 widening is exact, accumulation order is the
    array index order, so doubles are bit-identical;
  * round(x, 4) uses HALF_UP on the shortest decimal repr, matching
    Spark's round (scala BigDecimal(Double.toString(d))).

Usage: python3 tools/make_expected.py [sf ...]   (default: all three)
       python3 tools/make_expected.py /path/to/derivedDir [name ...]

An absolute path runs the generators against THAT corpus dir (e.g. a
tools/make_sf_derived.py output like /tmp/sf2hd) and writes fixtures to
expected/<basename>/ — which tools/check_oracle_25x.py picks up to turn
its fixture-SKIP class into hard compares at density. Optional trailing
names restrict which generators run (the heavy media ones can be
skipped independently).
"""
import math
import sys
import os
import re
from decimal import Decimal, ROUND_HALF_UP

import pyarrow as pa
import pyarrow.parquet as pq

M64 = (1 << 64) - 1
TESTDATA = "/root/testdata"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "expected")


def signed(x):
    x &= M64
    return x - (1 << 64) if x >= (1 << 63) else x


def fnv1a64(b: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in b:
        h ^= byte
        h = (h * 0x100000001B3) & M64
    return h


def splitmix64(seed: int) -> int:
    z = (seed + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def round4(x: float) -> float:
    # Spark round(double, 4): HALF_UP over the decimal string form.
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------- text ops

def simhash64(text: str) -> int:
    votes = [0] * 64
    for tok in text.split(" "):
        if not tok:
            continue
        h = fnv1a64(tok.encode("utf-8"))
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if votes[b] > 0:
            out |= 1 << b
    return out


def winnow_min_max(text: str, n: int):
    words = text.split(" ")
    if len(words) >= n:
        mn, mx = None, None
        for i in range(len(words) - n + 1):
            h = signed(fnv1a64(" ".join(words[i:i + n]).encode("utf-8")))
            mn = h if mn is None or h < mn else mn
            mx = h if mx is None or h > mx else mx
        return mn, mx
    h = signed(fnv1a64(text.encode("utf-8")))
    return h, h


LANG_PROFILES = [
    ("en", ["the", "and", "of", "to", "is", "in", "that", "it"]),
    ("de", ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"]),
    ("fr", ["le", "la", "et", "est", "les", "des", "un", "une"]),
    ("es", ["el", "la", "que", "de", "y", "es", "un", "una"]),
    ("zh", ["的", "是", "了", "在", "我", "有", "和", "不"]),
]


def langid(text: str):
    lower = text.lower()
    words = re.split(r"\s+", lower)
    scores = []
    for lang, profile in LANG_PROFILES:
        if lang == "zh":
            charset = set("".join(profile))
            s = sum(1 for c in lower if c in charset)
            scores.append((float(s) / len(lower), lang))
        else:
            pset = set(profile)
            s = sum(1 for w in words if w in pset)
            scores.append((float(s) / len(words), lang))
    # array_max over struct(score, lang): lexicographic (score, then lang)
    best_score, best_lang = max(scores)
    pred = best_lang if best_score > 0.0 else "und"
    return pred, round4(best_score)


def gen_dedup_simhash(docs):
    sigs = [(d["doc_id"], simhash64(d["text"])) for d in docs]
    return _mm_hamming_pairs(sigs, 3)


def gen_text_langid(docs):
    preds = [langid(d["text"]) for d in docs]
    return pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs], pa.int64()),
        "lang": pa.array([d["lang"] for d in docs], pa.string()),
        "pred_lang": pa.array([p[0] for p in preds], pa.string()),
        "lang_score": pa.array([p[1] for p in preds], pa.float64()),
    })


def gen_text_fingerprint(docs):
    cols = {"doc_id": [], "fp_exact": [], "fp_min": [], "fp_max": [], "fp_sim": []}
    for d in docs:
        mn, mx = winnow_min_max(d["text"], 5)
        cols["doc_id"].append(d["doc_id"])
        cols["fp_exact"].append(signed(fnv1a64(d["text"].encode("utf-8"))))
        cols["fp_min"].append(mn)
        cols["fp_max"].append(mx)
        cols["fp_sim"].append(signed(simhash64(d["text"])))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})


def gen_text_entropy(docs):
    """Mirror of TextHashes.charEntropy: ln(N) - (1/N)*sum(c*ln(c)) over
    code-point counts, the c*ln(c) terms summed in FIRST-APPEARANCE
    order (dict preserves insertion order, like the LinkedHashMap).
    """
    ids, ent = [], []
    for d in docs:
        text = d["text"]
        counts = {}
        for ch in text:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(text)
        if n == 0:
            e = 0.0
        else:
            acc = 0.0
            for c in counts.values():
                acc += float(c) * math.log(float(c))
            e = math.log(float(n)) - acc / float(n)
        ids.append(d["doc_id"])
        ent.append(round4(e))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "char_entropy_nats": pa.array(ent, pa.float64())})


def gen_text_tfidf(docs, k=5):
    """Mirror of TextAnalysis.tfidfKeywords: tf·ln(N/df) over word
    fingerprints, top-k by (-score, signed fp), min-word dictionary.
    """
    import math
    n = len(docs)
    tf = {}      # doc_id -> {fp: count}
    dfreq = {}   # fp -> doc count
    dict_word = {}  # fp -> min word
    for d in docs:
        counts = {}
        for w in d["text"].rstrip(" ").split(" "):
            fp = signed(fnv1a64(w.encode("utf-8")))
            counts[fp] = counts.get(fp, 0) + 1
            if fp not in dict_word or w < dict_word[fp]:
                dict_word[fp] = w
        tf[d["doc_id"]] = counts
        for fp in counts:
            dfreq[fp] = dfreq.get(fp, 0) + 1
    rows = []
    for d in docs:
        did = d["doc_id"]
        scored = [(c * math.log(float(n) / dfreq[fp]), fp)
                  for fp, c in tf[did].items()]
        top = sorted(scored, key=lambda t: (-t[0], t[1]))[:k]
        for r, (score, fp) in enumerate(top, start=1):
            rows.append((did, r, dict_word[fp], round4(score)))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "rank": pa.array([r[1] for r in rows], pa.int32()),
        "keyword": pa.array([r[2] for r in rows], pa.string()),
        "tfidf": pa.array([r[3] for r in rows], pa.float64()),
    })


# ------------------------------------------------------------- vector ops

def hyperplane_sig(vec, bits, plane_offset):
    sig = 0
    for i in range(bits):
        base = ((plane_offset + i) * 1315423911) & M64
        acc = 0.0
        for j, v in enumerate(vec):
            s = splitmix64((base + j) & M64)
            acc += v if (s & 1) == 0 else -v
        sig = (sig << 1) | (1 if acc >= 0 else 0)
    return sig


def dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def norm(a):
    acc = 0.0
    for x in a:
        acc += x * x
    return acc ** 0.5


def topk_table(rows):
    # rows: list of (query_id, rank, neighbor_id, cosine)
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "rank": pa.array([r[1] for r in rows], pa.int32()),
        "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
        "cosine": pa.array([r[3] for r in rows], pa.float64()),
    })


def rank_topk(cands, k):
    """cands: {qid: [(neighbor_id, cosine)]} -> ranked rows, ties by id asc."""
    rows = []
    for qid in sorted(cands):
        ranked = sorted(cands[qid], key=lambda t: (-t[1], t[0]))[:k]
        for r, (nid, cos) in enumerate(ranked, start=1):
            rows.append((qid, r, nid, round4(cos)))
    return rows


def gen_sim_topk_bruteforce(emb, k=5, max_query=8):
    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    queries = [e for e in emb if e["vec_id"] < max_query]
    cands = {}
    for q in queries:
        qn = norms[q["vec_id"]]
        cands[q["vec_id"]] = [
            (c["vec_id"], dot(q["embedding"], c["embedding"]) / (qn * norms[c["vec_id"]]))
            for c in emb if c["vec_id"] != q["vec_id"]]
    return topk_table(rank_topk(cands, k))


def gen_sim_topk_lsh(emb, k=5, bits=6, tables=8, max_query=64):
    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    vecs = {e["vec_id"]: e["embedding"] for e in emb}
    queries = [e for e in emb if e["vec_id"] < max_query]
    pairs = set()
    for t in range(tables):
        buckets = {}
        for e in emb:
            buckets.setdefault(hyperplane_sig(e["embedding"], bits, t * bits), []).append(e["vec_id"])
        for q in queries:
            sig = hyperplane_sig(q["embedding"], bits, t * bits)
            for nid in buckets.get(sig, []):
                if nid != q["vec_id"]:
                    pairs.add((q["vec_id"], nid))
    cands = {}
    for qid, nid in pairs:
        cos = dot(vecs[qid], vecs[nid]) / (norms[qid] * norms[nid])
        cands.setdefault(qid, []).append((nid, cos))
    return topk_table(rank_topk(cands, k))


def gen_sim_topk_ivf(emb, k=5, n_centroids=16, n_probe=4, max_query=64):
    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    vecs = {e["vec_id"]: e["embedding"] for e in emb}
    centroids = [(e["vec_id"], e["embedding"], norms[e["vec_id"]])
                 for e in emb if e["vec_id"] < n_centroids]
    cells = {}
    for e in emb:
        scored = [(dot(e["embedding"], c[1]) / c[2], c[0]) for c in centroids]
        best = max(s for s, _ in scored)
        winners = [cid for s, cid in scored if s == best]
        assert len(winners) == 1, f"centroid tie for vec {e['vec_id']}"
        cells.setdefault(winners[0], []).append(e["vec_id"])
    cands = {}
    for q in (e for e in emb if e["vec_id"] < max_query):
        qid, qn = q["vec_id"], norms[q["vec_id"]]
        scored = [(dot(q["embedding"], c[1]) / c[2], c[0]) for c in centroids]
        # row_number over (_cscore desc, cid asc)
        probes = [cid for _, cid in sorted(scored, key=lambda t: (-t[0], t[1]))[:n_probe]]
        for cid in probes:
            for nid in cells.get(cid, []):
                if nid != qid:
                    cos = dot(q["embedding"], vecs[nid]) / (qn * norms[nid])
                    cands.setdefault(qid, []).append((nid, cos))
    return topk_table(rank_topk(cands, k))


def gen_sim_topk_sq8(emb, k=5, rerank_mult=8, max_query=64):
    """Mirror of graft.operators.Sq8.topKSq8: per-dim min/max grid,
    uint8 codes floor((v-min)/scale + 0.5) clamped, norm-corrected ADC
    against the reconstruction, exact cosine re-rank of the ADC
    top-(rerank_mult*k). All double math in array-index order.
    """
    dim = len(emb[0]["embedding"])
    mins = [min(e["embedding"][j] for e in emb) for j in range(dim)]
    maxs = [max(e["embedding"][j] for e in emb) for j in range(dim)]
    scales = [(maxs[j] - mins[j]) / 255.0 for j in range(dim)]

    def encode(v):
        cs = []
        for j in range(dim):
            if scales[j] <= 0.0:
                cs.append(0)
            else:
                u = math.floor((v[j] - mins[j]) / scales[j] + 0.5)
                cs.append(0 if u < 0.0 else (255 if u > 255.0 else int(u)))
        return cs

    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    vecs = {e["vec_id"]: e["embedding"] for e in emb}
    codes, rnorms = {}, {}
    for e in emb:
        cs = encode(e["embedding"])
        codes[e["vec_id"]] = cs
        acc = 0.0
        for j in range(dim):
            v = mins[j] + float(cs[j]) * scales[j]
            acc += v * v
        rnorms[e["vec_id"]] = acc ** 0.5
    queries = [e for e in emb if e["vec_id"] < max_query]
    rows = {}
    for q in queries:
        qid, qn = q["vec_id"], norms[q["vec_id"]]
        adc = []
        for e in emb:
            nid = e["vec_id"]
            if nid == qid:
                continue
            acc = 0.0
            for j in range(dim):
                acc += q["embedding"][j] * (mins[j] + float(codes[nid][j]) * scales[j])
            adc.append((nid, acc / (qn * rnorms[nid])))
        top_r = sorted(adc, key=lambda t: (-t[1], t[0]))[:rerank_mult * k]
        rows[qid] = [
            (nid, dot(q["embedding"], vecs[nid]) / (qn * norms[nid]))
            for nid, _ in top_r]
    return topk_table(rank_topk(rows, k))


def gen_sim_topk_pq(emb, k=5, m=8, ksub=16, rerank_mult=8, max_query=64):
    """Mirror of graft.operators.Pq.topKPq: seed codebooks from the
    first ksub vectors' sub-blocks, argmin-L2 encode with (dist, cid)
    tie-break, ADC via per-query LUT summed in block order, exact
    cosine re-rank of the ADC top-(rerank_mult*k).
    """
    dim = len(emb[0]["embedding"])
    sub = dim // m
    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    vecs = {e["vec_id"]: e["embedding"] for e in emb}
    # codebooks[b] = [(cid, cent, cn2)]
    books = [[] for _ in range(m)]
    for e in emb:
        if e["vec_id"] < ksub:
            for b in range(m):
                cent = e["embedding"][b * sub:(b + 1) * sub]
                books[b].append((e["vec_id"], cent, dot(cent, cent)))
    codes = {}
    for e in emb:
        cs = []
        for b in range(m):
            s = e["embedding"][b * sub:(b + 1) * sub]
            dists = [(cn2 - 2.0 * dot(s, cent), cid) for cid, cent, cn2 in books[b]]
            cs.append(min(dists)[1])  # ties -> smaller cid, as struct-min
        codes[e["vec_id"]] = cs
    queries = [e for e in emb if e["vec_id"] < max_query]
    rows = {}
    for q in queries:
        qid, qn = q["vec_id"], norms[q["vec_id"]]
        lut = []
        for b in range(m):
            qsub = q["embedding"][b * sub:(b + 1) * sub]
            lut.append({cid: dot(qsub, cent) for cid, cent, _ in books[b]})
        adc = []
        for e in emb:
            nid = e["vec_id"]
            if nid == qid:
                continue
            acc = 0.0
            for b in range(m):
                acc += lut[b][codes[nid][b]]
            adc.append((nid, acc / (qn * norms[nid])))
        top_r = sorted(adc, key=lambda t: (-t[1], t[0]))[:rerank_mult * k]
        rows[qid] = [
            (nid, dot(q["embedding"], vecs[nid]) / (qn * norms[nid]))
            for nid, _ in top_r]
    return topk_table(rank_topk(rows, k))


def f32(x):
    """Round a double to float32 and back — mirrors Spark's
    cast(double as float) (round-to-nearest-even, like C)."""
    import struct as _struct
    return _struct.unpack("f", _struct.pack("f", x))[0]


def seed_books(emb, m, ksub, sub):
    books = [[] for _ in range(m)]
    for e in emb:
        if e["vec_id"] < ksub:
            for b in range(m):
                cent = e["embedding"][b * sub:(b + 1) * sub]
                books[b].append((e["vec_id"], cent, dot(cent, cent)))
    return books


def train_books(emb, m, ksub, sub, iters):
    """Mirror of Pq.trainCodebooks: argmin-L2 assignment with
    (dist, cid) tie-break, then per-(block, cid, dim) means accumulated
    as x*2^20 LONGS truncated toward zero (the order-free fixed-point
    sum the Spark side uses), means cast to float32. Cells that lose
    all members drop out."""
    FP = 1048576.0
    books = seed_books(emb, m, ksub, sub)
    for _ in range(iters):
        sums, counts = {}, {}
        for e in emb:
            for b in range(m):
                s = e["embedding"][b * sub:(b + 1) * sub]
                dists = [(cn2 - 2.0 * dot(s, cent), cid) for cid, cent, cn2 in books[b]]
                cid = min(dists)[1]
                key = (b, cid)
                if key not in sums:
                    sums[key] = [0] * sub
                    counts[key] = 0
                acc = sums[key]
                for d, x in enumerate(s):
                    acc[d] += int(x * FP)  # int() truncates toward zero, like Spark's cast to long
                counts[key] += 1
        books = [[] for _ in range(m)]
        for (b, cid), acc in sorted(sums.items()):
            n = counts[(b, cid)]
            cent = [f32(float(a) / (n * FP)) for a in acc]
            books[b].append((cid, cent, dot(cent, cent)))
    return books


def gen_sim_topk_ivfpq(emb, k=5, n_centroids=16, n_probe=4, m=8, ksub=16,
                       rerank_mult=8, max_query=64, train_iters=2):
    """Mirror of the gated LlmOps.sim_topk_ivfpq — the PRODUCTION
    configuration: IVF cells (seed centroids, argmax-cosine assignment,
    no ties asserted) prune the candidate set; Lloyd-TRAINED codebooks
    (fixed-point means, see train_books) ADC-score survivors in block
    order with NORM-CORRECTED denominators (reconstruction norm, not
    vector norm); exact cosine re-rank of the ADC top-(rerank_mult*k).
    """
    dim = len(emb[0]["embedding"])
    sub = dim // m
    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    vecs = {e["vec_id"]: e["embedding"] for e in emb}
    centroids = [(e["vec_id"], e["embedding"], norms[e["vec_id"]])
                 for e in emb if e["vec_id"] < n_centroids]
    cells = {}
    for e in emb:
        scored = [(dot(e["embedding"], c[1]) / c[2], c[0]) for c in centroids]
        best = max(s for s, _ in scored)
        winners = [cid for s, cid in scored if s == best]
        assert len(winners) == 1, f"centroid tie for vec {e['vec_id']}"
        cells.setdefault(winners[0], []).append(e["vec_id"])
    books = train_books(emb, m, ksub, sub, train_iters)
    codes, rnorms = {}, {}
    for e in emb:
        cs, cn2_sum = [], 0.0
        for b in range(m):
            s = e["embedding"][b * sub:(b + 1) * sub]
            dists = [(cn2 - 2.0 * dot(s, cent), cid, cn2) for cid, cent, cn2 in books[b]]
            best = min(dists)
            cs.append(best[1])
            cn2_sum += best[2]  # block order, like the Spark partial agg
        codes[e["vec_id"]] = cs
        rnorms[e["vec_id"]] = cn2_sum ** 0.5
    rows = {}
    for q in (e for e in emb if e["vec_id"] < max_query):
        qid, qn = q["vec_id"], norms[q["vec_id"]]
        cscored = [(dot(q["embedding"], c[1]) / c[2], c[0]) for c in centroids]
        probes = [cid for _, cid in sorted(cscored, key=lambda t: (-t[0], t[1]))[:n_probe]]
        lut = []
        for b in range(m):
            qsub = q["embedding"][b * sub:(b + 1) * sub]
            lut.append({cid: dot(qsub, cent) for cid, cent, _ in books[b]})
        adc = []
        for cid in probes:
            for nid in cells.get(cid, []):
                if nid == qid:
                    continue
                acc = 0.0
                for b in range(m):
                    acc += lut[b][codes[nid][b]]
                adc.append((nid, acc / (qn * rnorms[nid])))
        top_r = sorted(adc, key=lambda t: (-t[1], t[0]))[:rerank_mult * k]
        rows[qid] = [
            (nid, dot(q["embedding"], vecs[nid]) / (qn * norms[nid]))
            for nid, _ in top_r]
    return topk_table(rank_topk(rows, k))


def gen_dedup_embed_cosine(emb, threshold=0.35, tables=8):
    """Mirror of Dedup.embeddingCosine's DEFAULT (the scaled operating
    point): bits auto-sized to ceil(log2(n/16)) clamped [4, 24], 8
    independent plane families (table t at plane_offset t*bits)."""
    import math
    bits = min(24, max(4, math.ceil(math.log(max(1.0, len(emb) / 16.0)) / math.log(2.0))))
    return _embed_cosine_pairs(emb, bits, tables, threshold)


def _embed_cosine_pairs(emb, bits, tables, threshold):
    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    vecs = {e["vec_id"]: e["embedding"] for e in emb}
    pairs = set()
    for t in range(tables):
        buckets = {}
        for e in emb:
            buckets.setdefault(hyperplane_sig(e["embedding"], bits, t * bits), []).append(e["vec_id"])
        for ids in buckets.values():
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.add((ids[i], ids[j]))
    rows = []
    for a, b in pairs:
        cos = dot(vecs[a], vecs[b]) / (norms[a] * norms[b])
        if cos >= threshold:
            rows.append((a, b, round4(cos)))
    rows.sort()
    return pa.table({
        "vec_a": pa.array([r[0] for r in rows], pa.int64()),
        "vec_b": pa.array([r[1] for r in rows], pa.int64()),
        "cosine": pa.array([r[2] for r in rows], pa.float64()),
    })


def gen_dedup_embed_cosine_mt(emb, bits=10, tables=4, threshold=0.35):
    """The PINNED explicit-knob configuration of Dedup.embeddingCosine
    (bits=10, 4 plane families) gated beside the auto-sized default."""
    return _embed_cosine_pairs(emb, bits, tables, threshold)


def gen_dedup_semantic(emb, n_clusters=16, iters=2, tau=0.4):
    """Mirror of SemanticDedup.semantic: whole-vector Lloyd centroids
    via train_books(m=1) (fixed-point means), argmin-L2 assignment
    with (dist, cid) tie-break, intra-cluster cosine pairs >= tau,
    min-id union-find groups, keep = min (centroid_cosine, vec_id)
    per group (SemDeDup's farthest-from-centroid rule)."""
    dim = len(emb[0]["embedding"])
    books = train_books(emb, 1, n_clusters, dim, iters)[0]
    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    vecs = {e["vec_id"]: e["embedding"] for e in emb}
    assign, ccos = {}, {}
    for e in emb:
        v = e["embedding"]
        dists = [(cn2 - 2.0 * dot(v, cent), cid) for cid, cent, cn2 in books]
        _, cid = min(dists)
        assign[e["vec_id"]] = cid
        cent, cn2 = next((c, n2) for ci, c, n2 in books if ci == cid)
        ccos[e["vec_id"]] = dot(v, cent) / (norms[e["vec_id"]] * cn2 ** 0.5)
    clusters = {}
    for vid, cid in assign.items():
        clusters.setdefault(cid, []).append(vid)
    parent = {vid: vid for vid in assign}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in clusters.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                if dot(vecs[a], vecs[b]) / (norms[a] * norms[b]) >= tau:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        # min-id as root, mirroring componentMap labels
                        parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for vid in assign:
        groups.setdefault(find(vid), []).append(vid)
    keep = {}
    for grp, members in groups.items():
        keep[grp] = min((ccos[v], v) for v in members)[1]
    rows = sorted((vid, assign[vid], find(vid)) for vid in assign)
    return pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "cid": pa.array([r[1] for r in rows], pa.int64()),
        "grp": pa.array([r[2] for r in rows], pa.int64()),
        "keep": pa.array([keep[r[2]] == r[0] for r in rows], pa.bool_()),
    })


def gen_emb_kmeans_report(emb, n_clusters=16, iters=2):
    """Mirror of SemanticDedup.kmeansReport: per-cluster cardinality,
    inertia (sum ||v-c||^2 via the d + ||v||^2 tree, decimal-summed)
    and centroid-cosine mean/min/max over the same train_books(m=1)
    assignment as gen_dedup_semantic."""
    dim = len(emb[0]["embedding"])
    books = train_books(emb, 1, n_clusters, dim, iters)[0]
    q12 = Decimal("0.000000000001")

    def round6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    per = {}
    for e in emb:
        v = e["embedding"]
        vn = norm(v)
        dists = [(cn2 - 2.0 * dot(v, cent), cid) for cid, cent, cn2 in books]
        d, cid = min(dists)
        cent, cn2 = next((c, n2) for ci, c, n2 in books if ci == cid)
        cc = dot(v, cent) / (vn * cn2 ** 0.5)
        l2 = d + vn * vn
        rec = per.setdefault(cid, [0, Decimal(0), Decimal(0), None, None])
        rec[0] += 1
        rec[1] += Decimal(repr(l2)).quantize(q12, rounding=ROUND_HALF_UP)
        rec[2] += Decimal(repr(cc)).quantize(q12, rounding=ROUND_HALF_UP)
        rec[3] = cc if rec[3] is None else min(rec[3], cc)
        rec[4] = cc if rec[4] is None else max(rec[4], cc)
    rows = sorted(per.items())
    return pa.table({
        "cid": pa.array([c for c, _ in rows], pa.int64()),
        "n_vectors": pa.array([r[0] for _, r in rows], pa.int64()),
        "inertia": pa.array([round4(float(r[1])) for _, r in rows], pa.float64()),
        "mean_ccos": pa.array([round6(float(r[2]) / r[0]) for _, r in rows], pa.float64()),
        "min_ccos": pa.array([round6(r[3]) for _, r in rows], pa.float64()),
        "max_ccos": pa.array([round6(r[4]) for _, r in rows], pa.float64()),
    })


def gen_data_prune_prototypes(emb, n_clusters=16, iters=2, prune_frac=0.25):
    """Mirror of SemanticDedup.prunePrototypes: same train/assign as
    gen_dedup_semantic, rank per cluster by (centroid_cosine desc,
    vec_id), keep = rank > floor(prune_frac * cluster_size)."""
    import math
    dim = len(emb[0]["embedding"])
    books = train_books(emb, 1, n_clusters, dim, iters)[0]
    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    assign, ccos = {}, {}
    for e in emb:
        v = e["embedding"]
        dists = [(cn2 - 2.0 * dot(v, cent), cid) for cid, cent, cn2 in books]
        _, cid = min(dists)
        assign[e["vec_id"]] = cid
        cent, cn2 = next((c, n2) for ci, c, n2 in books if ci == cid)
        ccos[e["vec_id"]] = dot(v, cent) / (norms[e["vec_id"]] * cn2 ** 0.5)
    clusters = {}
    for vid, cid in assign.items():
        clusters.setdefault(cid, []).append(vid)
    rank, nclus = {}, {}
    for members in clusters.values():
        order = sorted(members, key=lambda v: (-ccos[v], v))
        for i, v in enumerate(order):
            rank[v] = i + 1
            nclus[v] = len(members)
    rows = sorted(assign)
    return pa.table({
        "vec_id": pa.array(rows, pa.int64()),
        "cid": pa.array([assign[v] for v in rows], pa.int64()),
        "rank": pa.array([rank[v] for v in rows], pa.int32()),
        "n_cluster": pa.array([nclus[v] for v in rows], pa.int64()),
        "keep": pa.array(
            [rank[v] > math.floor(prune_frac * nclus[v]) for v in rows], pa.bool_()),
    })


def _bpe_learn(docs, n_merges=24):
    """Mirror of Bpe.trainMerges: word counts, then per round count
    adjacent symbol pairs weighted by word frequency, take
    (count desc, pair asc), apply greedily left-to-right."""
    counts = {}
    for d in docs:
        for w in d["text"].rstrip(" ").split(" "):
            counts[w] = counts.get(w, 0) + 1
    vocab = {w: list(w) + ["</w>"] for w in counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = {}
        for w, syms in vocab.items():
            c = counts[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + c
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab, counts


def gen_bpe_train(docs):
    merges, _, _ = _bpe_learn(docs)
    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int32()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })


def gen_bpe_token_count(docs):
    _, vocab, _ = _bpe_learn(docs)
    ids, toks = [], []
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        n = sum(len(vocab[w]) for w in d["text"].rstrip(" ").split(" "))
        ids.append(d["doc_id"])
        toks.append(n)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_bpe_tokens": pa.array(toks, pa.int32()),
    })


def gen_bpe_pack_ids(docs, L=64):
    """Mirror of Bpe.packIds: symbol ids = base code-point symbols in
    UTF-8 byte order, then merge products at B+rank-1 (first producer
    wins on collision), EOS at B+|merges|; documents encoded in doc_id
    order, EOS-separated, chopped into complete length-L sequences
    (trailing partial dropped). Integer-only, so exact by construction.
    """
    merges, vocab, counts = _bpe_learn(docs)
    base = {"</w>"}
    for w in counts:
        for cp in w:
            base.add(cp)
    base = sorted(base, key=lambda s: s.encode("utf-8"))
    ids = {s: i for i, s in enumerate(base)}
    for rank, l, r, _ in merges:
        ids.setdefault(l + r, len(base) + rank - 1)
    eos = len(base) + len(merges)
    stream = []
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        for w in d["text"].rstrip(" ").split(" "):
            stream.extend(ids[s] for s in vocab[w])
        stream.append(eos)
    nfull = len(stream) // L
    return pa.table({
        "seq_id": pa.array([i // L for i in range(nfull * L)], pa.int64()),
        "pos": pa.array([i % L for i in range(nfull * L)], pa.int32()),
        "token_id": pa.array(stream[:nfull * L], pa.int32()),
    })


def gen_dsir_importance(docs, buckets=4096):
    """Mirror of Dsir.importanceWeights: hashed unigram+bigram buckets
    (fnv1a64 mod buckets), Laplace-smoothed target/raw LMs, per-gram
    log-ratio quantized to decimal(28,12) HALF_UP, exact decimal sum,
    round4. Target = source in src1..src5."""
    import math
    target = {"src1", "src2", "src3", "src4", "src5"}
    q12 = Decimal("0.000000000001")

    def doc_buckets(text):
        ws = text.rstrip(" ").split(" ")
        bs = [fnv1a64(w.encode("utf-8")) % buckets for w in ws]
        bs += [fnv1a64((ws[i] + " " + ws[i + 1]).encode("utf-8")) % buckets
               for i in range(len(ws) - 1)]
        return bs

    cr, ct = {}, {}
    for d in docs:
        t = d["source"] in target
        for b in doc_buckets(d["text"]):
            cr[b] = cr.get(b, 0) + 1
            if t:
                ct[b] = ct.get(b, 0) + 1
    R = sum(cr.values())
    T = sum(ct.values())
    ids, ngrams, weights = [], [], []
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        bs = doc_buckets(d["text"])
        acc = Decimal(0)
        for b in bs:
            term = (math.log((ct.get(b, 0) + 1) / (T + buckets))
                    - math.log((cr[b] + 1) / (R + buckets)))
            acc += Decimal(repr(term)).quantize(q12, rounding=ROUND_HALF_UP)
        ids.append(d["doc_id"])
        ngrams.append(len(bs))
        weights.append(round4(float(acc)))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_grams": pa.array(ngrams, pa.int64()),
        "dsir_weight": pa.array(weights, pa.float64()),
    })


def gen_contamination_bloom(docs, k=5, m=1 << 17, num_hashes=4):
    """Mirror of Contamination.bloomOverlap: eval split = md5 bucket
    >= 98, bloom of eval shingle fps (Kirsch-Mitzenmacher double
    hashing, power-of-two mask), count fully-hitting fps per non-eval
    doc, keep docs with >= 1 hit."""
    import hashlib

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    def shingle_set(text):
        ws = text.rstrip(" ").split(" ")
        if len(ws) <= k:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}

    def positions(h):
        h2 = (splitmix64(h) | 1) & M64
        return [((h + i * h2) & M64) & (m - 1) for i in range(num_hashes)]

    bits = set()
    for d in docs:
        if bucket(d["doc_id"]) >= 98:
            for g in shingle_set(d["text"]):
                bits.update(positions(fnv1a64(g.encode("utf-8"))))
    ids, hits = [], []
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        if bucket(d["doc_id"]) >= 98:
            continue
        n = sum(1 for g in shingle_set(d["text"])
                if all(p in bits for p in positions(fnv1a64(g.encode("utf-8")))))
        if n > 0:
            ids.append(d["doc_id"])
            hits.append(n)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_bloom_hits": pa.array(hits, pa.int32()),
    })


def gen_quality_classifier(docs, buckets=4096, iters=24, lr=0.5):
    """Mirror of QualityClassifier.train+score: hashed binary unigram
    buckets + bias + 32 length-bin indicators, Adagrad on the
    decimal(.,12) grid (scaled-long margins, quantized residuals,
    exact-decimal g^2 accumulator, one exact binary->decimal rounding
    per step), label = n_chars >= 300."""
    import math
    q12 = Decimal("0.000000000001")
    feats, ys = {}, {}
    for d in docs:
        ws = d["text"].rstrip(" ").split(" ")
        lbin = buckets + 1 + min(31, math.floor(len(ws) / 8.0))
        bs = list({fnv1a64(w.encode("utf-8")) % buckets for w in ws}) + [buckets, lbin]
        feats[d["doc_id"]] = bs
        ys[d["doc_id"]] = 1 if d["n_chars"] >= 300 else 0
    dim = buckets + 33
    w = [Decimal(0).quantize(q12)] * dim
    gacc = [Decimal(0)] * dim
    for _ in range(iters):
        scaled = [int(x.scaleb(12)) for x in w]
        grad = {}
        for did, bs in feats.items():
            m = sum(scaled[b] for b in bs) / 1e12
            r = 1.0 / (1.0 + math.exp(-m)) - ys[did]
            rq = Decimal(repr(r)).quantize(q12, rounding=ROUND_HALF_UP)
            for b in bs:
                grad[b] = grad.get(b, Decimal(0)) + rq
        for b, g in grad.items():
            gacc[b] += g * g
            if gacc[b] != 0:
                # float(Decimal) and math.sqrt are correctly rounded,
                # Decimal(float) is the exact binary expansion — all
                # value-identical to the JVM side
                step_d = lr * float(g) / math.sqrt(float(gacc[b]))
                w[b] = w[b] - Decimal(step_d).quantize(q12, rounding=ROUND_HALF_UP)
    scaled = [int(x.scaleb(12)) for x in w]
    ids, labels, scores, preds = [], [], [], []
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        m = sum(scaled[b] for b in feats[d["doc_id"]]) / 1e12
        sig = 1.0 / (1.0 + math.exp(-m))
        ids.append(d["doc_id"])
        labels.append(ys[d["doc_id"]])
        scores.append(round4(sig))
        preds.append(1 if sig >= 0.5 else 0)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "label": pa.array(labels, pa.int32()),
        "score": pa.array(scores, pa.float64()),
        "pred": pa.array(preds, pa.int32()),
    })


# ------------------------------------------------------------------ main

def pca_basis(emb, dim, r, sweeps=30):
    """Mirrors graft.operators.Pca.moments/jacobi/topComponents
    bit-for-bit: fixed-point (2^-30) integer moment sums, cyclic Jacobi
    with a fixed sweep count (same rotation program, same branch on
    exact zeros), (eigenvalue desc, index) ordering with
    largest-|component|-positive sign fixing. Returns the top-r
    components as row vectors."""
    FP = float(1 << 30)
    n = len(emb)
    s1 = [0] * dim
    s2 = [[0] * dim for _ in range(dim)]
    for e in emb:
        x = e["embedding"]
        for i in range(dim):
            s1[i] += int(x[i] * FP)
        for i in range(dim):
            xi = x[i]
            row = s2[i]
            for j in range(i, dim):
                row[j] += int((xi * x[j]) * FP)
    mean = [float(s) / (FP * float(n)) for s in s1]
    cov = [[0.0] * dim for _ in range(dim)]
    for i in range(dim):
        for j in range(i, dim):
            c = float(s2[i][j]) / (FP * float(n)) - mean[i] * mean[j]
            cov[i][j] = c
            cov[j][i] = c

    a = [row[:] for row in cov]
    v = [[1.0 if i == j else 0.0 for j in range(dim)] for i in range(dim)]
    for _ in range(sweeps):
        for pp in range(dim - 1):
            for qq in range(pp + 1, dim):
                apq = a[pp][qq]
                if apq != 0.0:
                    theta = (a[qq][qq] - a[pp][pp]) / (2.0 * apq)
                    if theta >= 0.0:
                        t = 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                    else:
                        t = 1.0 / (theta - math.sqrt(theta * theta + 1.0))
                    cth = 1.0 / math.sqrt(t * t + 1.0)
                    sth = t * cth
                    for k in range(dim):
                        akp = a[k][pp]; akq = a[k][qq]
                        a[k][pp] = cth * akp - sth * akq
                        a[k][qq] = sth * akp + cth * akq
                    for k in range(dim):
                        apk = a[pp][k]; aqk = a[qq][k]
                        a[pp][k] = cth * apk - sth * aqk
                        a[qq][k] = sth * apk + cth * aqk
                    for k in range(dim):
                        vkp = v[k][pp]; vkq = v[k][qq]
                        v[k][pp] = cth * vkp - sth * vkq
                        v[k][qq] = sth * vkp + cth * vkq
    vals = [a[i][i] for i in range(dim)]

    order = sorted(range(dim), key=lambda i: (-vals[i], i))[:r]
    comps = []
    for cix in order:
        vec = [v[i][cix] for i in range(dim)]
        best = 0
        for i in range(1, dim):
            if abs(vec[i]) > abs(vec[best]):
                best = i
        if vec[best] < 0.0:
            vec = [-x for x in vec]
        comps.append(vec)
    return comps


def gen_emb_pca(emb, dim=64, r=8, sweeps=30):
    """Fixed-point-deterministic PCA projection (see pca_basis) with
    decimal(28,16)-quantized projection terms summed exactly."""
    comps = pca_basis(emb, dim, r, sweeps)

    q16 = Decimal("0.0000000000000001")
    q6 = Decimal("0.000001")
    vec_ids, ks, projs = [], [], []
    for e in emb:
        x = e["embedding"]
        for k, comp in enumerate(comps):
            s = Decimal(0)
            for i in range(dim):
                s += Decimal(repr(x[i] * comp[i])).quantize(q16, rounding=ROUND_HALF_UP)
            vec_ids.append(e["vec_id"])
            ks.append(k)
            projs.append(float(Decimal(repr(float(s))).quantize(q6, rounding=ROUND_HALF_UP)))
    return pa.table({
        "vec_id": pa.array(vec_ids, pa.int64()),
        "k": pa.array(ks, pa.int32()),
        "proj": pa.array(projs, pa.float64()),
    })


def _mm_perturb(w, h, px):
    """The image family's +2 lattice perturbation (Multimodal
    .perturbPixels): +2 clamped to 255 wherever (x+y)%5 == 0 —
    ONE definition shared by the image and video dedup mirrors."""
    out = list(px)
    for y in range(h):
        for x in range(w):
            if (x + y) % 5 == 0:
                i = y * w + x
                out[i] = min(255, out[i] + 2)
    return out


def _mm_gray64(w, h, px):
    """8x8 area-average downsample (Multimodal.gray64), integer floor —
    ONE definition shared by the image and video dedup mirrors."""
    out = [0] * 64
    for by in range(8):
        y0, y1 = by * h // 8, (by + 1) * h // 8
        for bx in range(8):
            x0, x1 = bx * w // 8, (bx + 1) * w // 8
            if x1 > x0 and y1 > y0:
                s = sum(px[y * w + x]
                        for y in range(y0, y1) for x in range(x0, x1))
                out[by * 8 + bx] = s // ((x1 - x0) * (y1 - y0))
    return out


def _mm_ahash64(profile):
    """Average-hash of any 64-cell integer profile (Multimodal
    .aHash64): bit i set iff 64*p[i] > sum(p)."""
    total = sum(profile)
    sig = 0
    for i in range(64):
        if profile[i] * 64 > total:
            sig |= 1 << i
    return sig


def _mm_hamming_pairs(sigs, max_hamming):
    """Hamming <= max_hamming pairs over (doc_id, sig64), OUTPUT-
    IDENTICAL to the naive all-pairs scan (the operator's semantics —
    combination banding is pigeonhole-complete at this threshold) but
    generated by 16-bit-block bucketing: any pair within hamming 3
    agrees EXACTLY on >= 1 of the 4 disjoint 16-bit blocks, so
    same-block buckets are a lossless candidate set. The naive scan is
    O(n^2) — 7.8e9 sig compares at the 25x corpus; this is
    O(n + candidates). Returns the (doc_a, doc_b, hamming) table every
    mm_*_dedup mirror (and gen_dedup_simhash) emits."""
    assert max_hamming < 4, "4-block pigeonhole needs hamming < 4"
    emitted = set()
    rows = []
    for blk in range(4):
        buckets = {}
        for did, s in sigs:
            buckets.setdefault((s >> (16 * blk)) & 0xFFFF, []).append((did, s))
        for members in buckets.values():
            if len(members) < 2:
                continue
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    (ida, sa), (idb, sb) = members[i], members[j]
                    if ida > idb:
                        (ida, sa), (idb, sb) = (idb, sb), (ida, sa)
                    if (ida, idb) in emitted:
                        continue
                    h = ((sa ^ sb) & M64).bit_count()
                    if h <= max_hamming:
                        emitted.add((ida, idb))
                        rows.append((ida, idb, h))
    rows.sort()
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], pa.int64()),
        "hamming": pa.array([r[2] for r in rows], pa.int32()),
    })


def gen_mm_phash_dedup(docs, max_hamming=3, n_re=32, id_offset=10_000_000):
    """Mirror of LlmOps.mm_phash_dedup over REAL synthetic images: the
    Spark side renders one deterministic grayscale-gradient PNG per doc
    (Multimodal.withSyntheticImages), javax.imageio-decodes it back
    (PNG is lossless, so decode == generation), 8x8 area-average
    downsamples, aHash64s (bit i set iff 64*px[i] > sum(px)), and
    hamming-band-pairs at <= 3 (pigeonhole-complete, so all-pairs IS
    the candidate-set semantics). Re-encodes of the first n_re docs
    (ids + id_offset) perturb the PIXELS (+2 on the (x+y)%5==0
    lattice, clamped) before a fresh PNG encode — bytes change, raster
    moves by <= 2/px. Every step is integer arithmetic on the
    generation spec, so this mirror needs no codec:
      w = 16 + doc_id%17, h = 16 + doc_id%13
      cell(x,y) = (y*8//h)*8 + (x*8//w)
      px(x,y) = splitmix64(doc_id*64 + cell) >> 56   (top byte)"""
    def synth(doc_id):
        w = 16 + doc_id % 17
        h = 16 + doc_id % 13
        px = [splitmix64(doc_id * 64 + (y * 8 // h) * 8 + x * 8 // w) >> 56
              for y in range(h) for x in range(w)]
        return w, h, px

    imgs = [(d["doc_id"],) + synth(d["doc_id"]) for d in docs]
    imgs += [(did + id_offset, w, h, _mm_perturb(w, h, px))
             for did, w, h, px in imgs if did < n_re]
    sigs = [(did, _mm_ahash64(_mm_gray64(w, h, px))) for did, w, h, px in imgs]
    return _mm_hamming_pairs(sigs, max_hamming)


def gen_mm_audio_dedup(docs, max_hamming=3, n_re=32, id_offset=10_000_000):
    """Mirror of LlmOps.mm_audio_dedup over REAL synthetic WAV clips:
    the Spark side renders one deterministic 8-bit unsigned mono PCM
    clip per doc (Audio.withSyntheticAudio), WAV-encodes it with the
    JDK's own writer, javax.sound.sampled-decodes it back (WAV PCM is
    lossless, so decode == generation), 64-window amplitude-envelope
    profiles it, aHash64s (bit w set iff 64*e[w] > sum(e)), and
    hamming-band-pairs at <= 3. Re-encodes of the first n_re clips
    (ids + id_offset) scale every amplitude around the 128 midline by
    5/4 (integer floor on the magnitude, clamped to 8-bit) before a
    fresh WAV encode. Every step is integer arithmetic on the
    generation spec, so this mirror needs no codec:
      n = 64 + doc_id % 97
      sample(i) = (doc_id*131 + i*31) % 256"""
    def synth(doc_id):
        n = 64 + doc_id % 97
        return [(doc_id * 131 + i * 31) % 256 for i in range(n)]

    def scale_gain(pcm):
        out = []
        for x in pcm:
            a = x - 128
            s = min(127, a * 5 // 4) if a >= 0 else -min(128, (-a) * 5 // 4)
            out.append(128 + s)
        return out

    def envelope64(pcm):
        n = len(pcm)
        out = [0] * 64
        for w in range(64):
            i0, i1 = w * n // 64, (w + 1) * n // 64
            if i1 > i0:
                out[w] = sum(abs(pcm[i] - 128) for i in range(i0, i1)) // (i1 - i0)
        return out

    clips = [(d["doc_id"], synth(d["doc_id"])) for d in docs]
    clips += [(did + id_offset, scale_gain(pcm))
              for did, pcm in clips if did < n_re]
    sigs = [(did, _mm_ahash64(envelope64(pcm))) for did, pcm in clips]
    return _mm_hamming_pairs(sigs, max_hamming)


def _video_synth_frame(doc_id, f):
    """Frame f of the synthetic animated GIF (Video.scala spec):
      w = 16 + doc_id%17, h = 16 + doc_id%13
      cell(x,y) = (y*8//h)*8 + (x*8//w)
      px(f,x,y) = splitmix64((doc_id*131 + f)*64 + cell) >> 56"""
    w = 16 + doc_id % 17
    h = 16 + doc_id % 13
    px = [splitmix64(((doc_id * 131 + f) * 64 + (y * 8 // h) * 8 + x * 8 // w) & M64) >> 56
          for y in range(h) for x in range(w)]
    return w, h, px


def gen_mm_video_frame_sample(docs, k=2):
    """Mirror of LlmOps.mm_video_frame_sample over REAL synthetic
    animated GIFs: the Spark side renders n_frames = 2 + doc_id%4
    frames per doc (Video.withSyntheticVideos), GIF-encodes them with
    the JDK's own sequence writer, decodes frame src = i*n//k back
    through the LZW codec (GIF is lossless over an explicit 256-gray
    palette, so decode == generation), and reduces each sampled frame
    to its integer mean luma. Every step is integer arithmetic on the
    generation spec, so this mirror needs no codec."""
    rows = []
    for d in docs:
        did = d["doc_id"]
        n = 2 + did % 4
        for i in range(k):
            src = i * n // k
            w, h, px = _video_synth_frame(did, src)
            rows.append((did, i, src, sum(px) // (w * h)))
    rows.sort()
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "frame_idx": pa.array([r[1] for r in rows], pa.int32()),
        "src_frame": pa.array([r[2] for r in rows], pa.int32()),
        "mean_luma": pa.array([r[3] for r in rows], pa.int32()),
    })


def gen_mm_video_dedup(docs, max_hamming=3, n_re=32, id_offset=10_000_000):
    """Mirror of LlmOps.mm_video_dedup over REAL synthetic animated
    GIFs: per-frame 8x8 area-average profile (the image family's
    gray64), averaged per cell across frames (integer floor) into a
    temporal profile, aHash64'd, hamming-band-paired at <= 3.
    Re-encodes of the first n_re clips (ids + id_offset) perturb
    EVERY frame's pixels (+2 on the (x+y)%5==0 lattice, clamped)
    before a fresh GIF encode. Integer arithmetic end to end."""
    def temporal_ahash(frames):
        acc = [0] * 64
        for w, h, px in frames:
            g = _mm_gray64(w, h, px)
            for c in range(64):
                acc[c] += g[c]
        return _mm_ahash64([acc[c] // len(frames) for c in range(64)])

    clips = []
    for d in docs:
        did = d["doc_id"]
        frames = [_video_synth_frame(did, f) for f in range(2 + did % 4)]
        clips.append((did, frames))
    clips += [(did + id_offset,
               [(w, h, _mm_perturb(w, h, px)) for w, h, px in frames])
              for did, frames in clips if did < n_re]
    sigs = [(did, temporal_ahash(frames)) for did, frames in clips]
    return _mm_hamming_pairs(sigs, max_hamming)


def variance_perm(rows, m, dim):
    """Mirror of Pq.varianceBalancedPerm on float32 embeddings via the
    VecMomentsFp kernel arithmetic: each float element widens to double
    FIRST, then x*Fp and x*x*Fp truncate to longs and sum (order-free);
    (variance desc, dim) order; serpentine deal onto m blocks."""
    FP = 1048576.0
    s1 = [0] * dim
    s2 = [0] * dim
    n = float(len(rows))
    for e in rows:
        x = e["embedding"]
        for d in range(dim):
            s1[d] += int(x[d] * FP)
            s2[d] += int(x[d] * x[d] * FP)
    stats = []
    for d in range(dim):
        mean = float(s1[d]) / (n * FP)
        ex2 = float(s2[d]) / (n * FP)
        stats.append((d, ex2 - mean * mean))
    ordered = [d for d, v in sorted(stats, key=lambda t: (-t[1], t[0]))]
    blocks = [[] for _ in range(m)]
    for i, d in enumerate(ordered):
        rnd, pos = i // m, i % m
        b = pos if rnd % 2 == 0 else m - 1 - pos
        blocks[b].append(d)
    return [d for blk in blocks for d in blk]


def gen_sim_topk_opq(emb, k=5, m=8, ksub=16, rerank_mult=8, max_query=64,
                     train_iters=2, dim=None):
    """Mirror of graft.operators.Opq.topKOpq: PCA eigenbasis rotation
    (pca_basis, r=dim; y[k] = float32 of the double dot in index
    order), variance-balanced permutation (variance_perm), Lloyd-
    trained codebooks (train_books), norm-corrected ADC in block order,
    exact cosine re-rank of the ADC top-(rerank_mult*k) — all on the
    transformed vectors.
    """
    dim = dim or len(emb[0]["embedding"])
    comps = pca_basis(emb, dim, dim)
    rot = []
    for e in emb:
        x = e["embedding"]
        y = []
        for krow in range(dim):
            acc = 0.0
            row = comps[krow]
            for i in range(dim):
                acc += row[i] * x[i]
            y.append(f32(acc))
        rot.append({"vec_id": e["vec_id"], "embedding": y})
    perm = variance_perm(rot, m, dim)
    rows = [{"vec_id": e["vec_id"],
             "embedding": [e["embedding"][p] for p in perm]} for e in rot]
    sub = dim // m
    books = train_books(rows, m, ksub, sub, train_iters)
    norms = {e["vec_id"]: norm(e["embedding"]) for e in rows}
    vecs = {e["vec_id"]: e["embedding"] for e in rows}
    codes, rnorms = {}, {}
    for e in rows:
        cs, cn2_sum = [], 0.0
        for b in range(m):
            s = e["embedding"][b * sub:(b + 1) * sub]
            dists = [(cn2 - 2.0 * dot(s, cent), cid, cn2) for cid, cent, cn2 in books[b]]
            best = min(dists)
            cs.append(best[1])
            cn2_sum += best[2]
        codes[e["vec_id"]] = cs
        rnorms[e["vec_id"]] = cn2_sum ** 0.5
    out = {}
    for q in (e for e in rows if e["vec_id"] < max_query):
        qid, qn = q["vec_id"], norms[q["vec_id"]]
        lut = []
        for b in range(m):
            qsub = q["embedding"][b * sub:(b + 1) * sub]
            lut.append({cid: dot(qsub, cent) for cid, cent, _ in books[b]})
        adc = []
        for e in rows:
            nid = e["vec_id"]
            if nid == qid:
                continue
            acc = 0.0
            for b in range(m):
                acc += lut[b][codes[nid][b]]
            adc.append((nid, acc / (qn * rnorms[nid])))
        top_r = sorted(adc, key=lambda t: (-t[1], t[0]))[:rerank_mult * k]
        out[qid] = [
            (nid, dot(q["embedding"], vecs[nid]) / (qn * norms[nid]))
            for nid, _ in top_r]
    return topk_table(rank_topk(out, k))


def gen_sim_mmr_rerank(emb, k_cand=20, k=5, lam=0.7, max_query=8):
    """MMR diversity re-rank of the exact top-k_cand cosine pool.

    Mirrors operators/Mmr.scala: pool selected on RAW cosine order
    (ties id asc) like the brute-force fixture, relevance and pairwise
    sims rounded to 4 dp before scoring, greedy argmax with
    strictly-greater wins over id-ascending iteration, picked score
    rounded to 4 dp.
    """
    norms = {e["vec_id"]: norm(e["embedding"]) for e in emb}
    vecs = {e["vec_id"]: e["embedding"] for e in emb}
    queries = [e for e in emb if e["vec_id"] < max_query]
    out = []
    for q in sorted(queries, key=lambda e: e["vec_id"]):
        qid = q["vec_id"]
        qn = norms[qid]
        raw = [(c["vec_id"], dot(q["embedding"], c["embedding"]) / (qn * norms[c["vec_id"]]))
               for c in emb if c["vec_id"] != qid]
        pool = sorted(raw, key=lambda t: (-t[1], t[0]))[:k_cand]
        pool = sorted([(nid, round4(cos)) for nid, cos in pool])  # id asc
        sim = {}
        for i in range(len(pool)):
            for j in range(i + 1, len(pool)):
                a, b = pool[i][0], pool[j][0]
                s = round4(dot(vecs[a], vecs[b]) / (norm(vecs[a]) * norm(vecs[b])))
                sim[(a, b)] = sim[(b, a)] = s
        used = set()
        maxsim = {nid: 0.0 for nid, _ in pool}
        for rank in range(1, min(k, len(pool)) + 1):
            best, best_score = None, float("-inf")
            for nid, rel in pool:
                if nid in used:
                    continue
                score = lam * rel - (1 - lam) * maxsim[nid]
                if score > best_score:
                    best, best_score = nid, score
            out.append((qid, rank, best, round4(best_score)))
            used.add(best)
            for nid, _ in pool:
                if nid not in used and sim[(nid, best)] > maxsim[nid]:
                    maxsim[nid] = sim[(nid, best)]
    return pa.table({
        "query_id": pa.array([r[0] for r in out], pa.int64()),
        "rank": pa.array([r[1] for r in out], pa.int32()),
        "neighbor_id": pa.array([r[2] for r in out], pa.int64()),
        "mmr_score": pa.array([r[3] for r in out], pa.float64()),
    })


def gen_pipeline_rag_index(docs, dim=16, k=5, w=50, s=30):
    """Chunk -> feature-hash embed -> exact cosine top-k per query.

    Mirrors queries/RagOps.pipeline_rag_index: chunk starts 1,1+s,...
    with the tail rule (drop starts whose predecessor window reached
    the doc end), hashing-trick embedding bucket=(fnv1a64>>1)%dim with
    sign from the low bit, zero-norm chunks dropped, heap ranking by
    (-cosine, doc_id*1024+chunk_id), cosine rounded to 4 dp.
    """
    queries = [(1, "spark join agg"), (2, "window sort merge"),
               (3, "customer query fast"), (4, "stream batch filter")]

    def embed(words):
        acc = [0.0] * dim
        for word in words:
            h = fnv1a64(word.encode())
            acc[(h >> 1) % dim] += 1.0 if (h & 1) == 0 else -1.0
        return acc

    chunks = []
    for d in docs:
        ws = d["text"].rstrip(" ").split(" ")
        n = len(ws)
        st = 1
        while st <= n:
            if st != 1 and not (st + (w - s - 1) < n):
                break
            words = ws[st - 1: st - 1 + w]
            vec = embed(words)
            nm = norm(vec)
            if nm > 0:
                cid = d["doc_id"] * 1024 + (st - 1) // s
                chunks.append((cid, vec, nm))
            st += s

    out = []
    for qid, qtext in queries:
        qv = embed(qtext.split(" "))
        qn = norm(qv)
        cands = [(cid, dot(qv, vec) / (qn * nm)) for cid, vec, nm in chunks]
        ranked = sorted(cands, key=lambda t: (-t[1], t[0]))[:k]
        for r, (cid, cos) in enumerate(ranked, start=1):
            out.append((qid, r, cid // 1024, cid % 1024, round4(cos)))
    return pa.table({
        "query_id": pa.array([r[0] for r in out], pa.int32()),
        "rank": pa.array([r[1] for r in out], pa.int32()),
        "doc_id": pa.array([r[2] for r in out], pa.int64()),
        "chunk_id": pa.array([r[3] for r in out], pa.int32()),
        "cosine": pa.array([r[4] for r in out], pa.float64()),
    })


def _shingles3(text):
    """DISTINCT word 3-grams, the shared shingle definition of the
    corpus_delta / graph_pagerank oracles: words = DuckDB
    string_split(rtrim(text), ' ') (rtrim strips trailing SPACES only;
    split keeps empties), docs of <= 3 words collapse to one whole-text
    gram. Returned as a list (first-occurrence order, matching
    list_distinct) — callers mostly need the set/size."""
    w = text.rstrip(" ").split(" ")
    if len(w) <= 3:
        return [" ".join(w)]
    seen = set()
    out = []
    for j in range(len(w) - 2):
        g = " ".join(w[j:j + 3])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def gen_corpus_delta(docs):
    """Snapshot reconciliation mirror (corpus_delta and its _indexed /
    _stream twins — the driver gate pins all three to ONE oracle).
    old = doc_id%17<>3, new = doc_id%19<>5 with ' rev7' appended when
    doc_id%13=2; status from the id/text full-outer classification; an
    ADDED doc whose 3-gram Jaccard vs some RETAINED doc (both shingled
    on the NEW text) reaches 0.8 becomes added_near_dup with the MIN
    such retained id. Inverted-index probe: postings are retained docs
    per gram, each added doc counts intersections only against docs it
    actually shares a gram with — never all pairs."""
    base_text = {d["doc_id"]: d["text"] for d in docs}
    old_ids = {i for i in base_text if i % 17 != 3}
    new = {i: (t + " rev7" if i % 13 == 2 else t)
           for i, t in base_text.items() if i % 19 != 5}

    rows = {}
    for i in old_ids:
        if i not in new:
            rows[i] = ("removed", None)
    for i, t in new.items():
        if i not in old_ids:
            rows[i] = ("added", None)
        else:
            rows[i] = ("changed" if t != base_text[i] else "unchanged", None)

    sh = {i: _shingles3(t) for i, t in new.items()}
    post = {}
    for i in new:
        if i in old_ids:
            for g in sh[i]:
                post.setdefault(g, []).append(i)
    for i in new:
        if i in old_ids:
            continue
        cnt = {}
        for g in sh[i]:
            for r in post.get(g, ()):
                cnt[r] = cnt.get(r, 0) + 1
        na = len(sh[i])
        best = None
        for r, c in cnt.items():
            if c / (len(sh[r]) + na - c) >= 0.8 and (best is None or r < best):
                best = r
        if best is not None:
            rows[i] = ("added_near_dup", best)

    ids = sorted(rows)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "status": pa.array([rows[i][0] for i in ids], pa.string()),
        "near_dup_of": pa.array([rows[i][1] for i in ids], pa.int64()),
    })


def _dq20(x):
    """DuckDB cast(double AS decimal(38,20)) as an integer count of
    1e-20 units: the engine multiplies by 1e20 IN DOUBLE first, then
    rounds half-away-from-zero (probed: cast(2.5::double as
    decimal(18,0)) = 3) — so replicate the lossy double multiply, then
    round the EXACT value of that double."""
    import decimal
    return int(decimal.Decimal(x * 1e20)
               .to_integral_value(rounding=decimal.ROUND_HALF_UP))


_PAIRS_MEMO = {}


def _jaccard_pairs(docs, t=0.8):
    """All (doc_a < doc_b, jaccard) pairs with 3-gram Jaccard >= t —
    the shared pair set of the dedup_minhash_lsh / resolve / families
    / keep_best / weights / graph_pagerank oracles.

    AllPairs prefix filtering under a global (doc-frequency asc, gram)
    order: J >= t implies overlap >= ceil(t*max(|A|,|B|)), so the
    (n - ceil(t*n) + 1)-prefixes of BOTH docs intersect — index and
    probe prefixes only, verify the exact Jaccard on the survivors.
    No all-pairs product ever forms. Memoized on the (cached) docs
    list so the six generators shingle and pair ONCE per corpus."""
    import math as _m
    memo_key = (id(docs), t)
    if memo_key in _PAIRS_MEMO:
        return _PAIRS_MEMO[memo_key]
    sh = {d["doc_id"]: _shingles3(d["text"]) for d in docs}

    df = {}
    for grams in sh.values():
        for g in grams:
            df[g] = df.get(g, 0) + 1
    order = {g: k for k, g in enumerate(sorted(df, key=lambda g: (df[g], g)))}

    pref_post = {}
    for i, grams in sh.items():
        gs = sorted(grams, key=order.__getitem__)
        p = len(gs) - _m.ceil(t * len(gs)) + 1
        for g in gs[:p]:
            pref_post.setdefault(g, []).append(i)

    shset = {i: set(g) for i, g in sh.items()}
    pairs = []
    seen = set()
    for g, ids in pref_post.items():
        if len(ids) < 2:
            continue
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                if a > b:
                    a, b = b, a
                key = a * 4_000_000_000 + b
                if key in seen:
                    continue
                seen.add(key)
                A, B = shset[a], shset[b]
                inter = len(A & B)
                if inter / (len(A) + len(B) - inter) >= t:
                    pairs.append((a, b, inter / (len(A) + len(B) - inter)))
    pairs.sort()
    _PAIRS_MEMO[memo_key] = pairs
    return pairs


def _families(docs, t=0.8):
    """(family_id = min doc_id of the connected component) for every
    doc that has at least one J >= t edge — union-find over the
    shared pair set (the oracles' min-label transitive closure)."""
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b, _ in _jaccard_pairs(docs, t):
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {v: find(v) for v in parent}


def _rhalf(x, digits):
    """DuckDB round(double, d): scale in double, round half away from
    zero on the exact scaled value, unscale in double."""
    import decimal
    p = 10.0 ** digits
    return float(decimal.Decimal(x * p).to_integral_value(
        rounding=decimal.ROUND_HALF_UP)) / p


def gen_dedup_minhash_lsh(docs):
    """Pair table (doc_a < doc_b, round(jaccard, 4)) — the oracle of
    dedup_minhash_lsh AND dedup_stream_minhash (the engine's LSH
    banding is recall-exact at t=0.8 on this corpus, so the oracle is
    the EXACT pair set)."""
    rows = _jaccard_pairs(docs)
    return pa.table({
        "doc_a": pa.array([r[0] for r in rows], pa.int64()),
        "doc_b": pa.array([r[1] for r in rows], pa.int64()),
        "jaccard": pa.array([_rhalf(r[2], 4) for r in rows], pa.float64()),
    })


def gen_dedup_resolve(docs):
    """Survivor ids: every doc that is the MIN of its near-dup
    component (singletons survive trivially)."""
    fam = _families(docs)
    ids = sorted(d["doc_id"] for d in docs
                 if fam.get(d["doc_id"], d["doc_id"]) == d["doc_id"])
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def gen_dedup_families(docs):
    """(doc_id, family_id) for docs WITH at least one edge (the
    oracle's reach CTE never sees singletons)."""
    fam = _families(docs)
    ids = sorted(fam)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "family_id": pa.array([fam[i] for i in ids], pa.int64()),
    })


def _keep_best_quality(text):
    """The keep-best heuristic score: distinct-word ratio * 0.5 +
    0.3 length bonus + 0.2 stopword bonus, capped at 1, rounded
    half-away to 4 dp. NOTE: the oracle splits WITHOUT rtrim here."""
    w = text.split(" ")
    nw = len(w)
    dr = len(set(w)) / nw
    stop = ("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")
    sw = sum(1 for x in w if x in stop)
    q = dr * 0.5
    q = q + (0.3 if 20 <= nw <= 1000 else 0.0)
    q = q + (0.2 if sw / nw > 0.02 else 0.0)
    return _rhalf(min(1.0, q), 4)


def gen_dedup_keep_best(docs):
    """Per FAMILY (edge components only): member count and the
    highest-quality member (ties to the lower doc_id)."""
    fam = _families(docs)
    qs = {d["doc_id"]: _keep_best_quality(d["text"]) for d in docs
          if d["doc_id"] in fam}
    best = {}
    cnt = {}
    for i, f in fam.items():
        cnt[f] = cnt.get(f, 0) + 1
        cur = best.get(f)
        if cur is None or (-qs[i], i) < (-qs[cur], cur):
            best[f] = i
    fams = sorted(best)
    return pa.table({
        "family_id": pa.array(fams, pa.int64()),
        "n_members": pa.array([cnt[f] for f in fams], pa.int64()),
        "kept_doc": pa.array([best[f] for f in fams], pa.int64()),
        "best_quality": pa.array([qs[best[f]] for f in fams], pa.float64()),
    })


def gen_dedup_weights(docs):
    """Every doc: family id (self when singleton), family size, and
    train_weight = 1/size (double)."""
    fam = _families(docs)
    sizes = {}
    for f in fam.values():
        sizes[f] = sizes.get(f, 0) + 1
    ids = sorted(d["doc_id"] for d in docs)
    fids = [fam.get(i, i) for i in ids]
    fss = [sizes.get(fam[i], 1) if i in fam else 1 for i in ids]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "family_id": pa.array(fids, pa.int64()),
        "family_size": pa.array(fss, pa.int64()),
        "train_weight": pa.array([1.0 / f for f in fss], pa.float64()),
    })


def gen_graph_pagerank(docs, t=0.8, iters=10, damp=0.85):
    """Near-dup-graph pagerank mirror. Edges = 3-gram Jaccard >= 0.8
    pairs (both directions), deg = neighbor count, 10 power-iteration
    steps with the oracle's exact arithmetic: per-dst contributions and
    the dangling mass are summed as decimal(38,20) (exact integer sums
    of half-away-quantized doubles — order-independent, which is WHY
    the oracle uses decimal), everything else IEEE double in the same
    operation order, final pr rounded half-away to 8 dp. Pair
    generation: [[_jaccard_pairs]]."""
    n_docs = len(docs)
    adj = {d["doc_id"]: [] for d in docs}
    for a, b, _ in _jaccard_pairs(docs, t):
        adj[a].append(b)
        adj[b].append(a)

    deg = {i: len(v) for i, v in adj.items()}
    pr = {i: 1.0 / n_docs for i in adj}
    for _ in range(iters):
        contrib = {i: 0 for i in adj}  # exact 1e-20-unit integer sums
        dangling = 0
        for i, p in pr.items():
            d = deg[i]
            if d == 0:
                dangling += _dq20(p)
            else:
                q = _dq20(p / d)
                for j in adj[i]:
                    contrib[j] += q
        dm = float(dangling) / 1e20
        pr = {i: 0.15 / n_docs + damp * (float(contrib[i]) / 1e20 + dm / n_docs)
              for i in adj}

    import decimal
    ids = sorted(adj)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "deg": pa.array([deg[i] for i in ids], pa.int64()),
        "pr": pa.array(
            [float(decimal.Decimal(pr[i] * 1e8).to_integral_value(
                rounding=decimal.ROUND_HALF_UP)) / 1e8 for i in ids],
            pa.float64()),
    })


GENERATORS = {
    "corpus_delta": ("documents", gen_corpus_delta),
    "graph_pagerank": ("documents", gen_graph_pagerank),
    "dedup_minhash_lsh": ("documents", gen_dedup_minhash_lsh),
    "dedup_resolve": ("documents", gen_dedup_resolve),
    "dedup_families": ("documents", gen_dedup_families),
    "dedup_keep_best": ("documents", gen_dedup_keep_best),
    "dedup_weights": ("documents", gen_dedup_weights),
    "pipeline_rag_index": ("documents", gen_pipeline_rag_index),
    "sim_mmr_rerank": ("embeddings", gen_sim_mmr_rerank),
    "dedup_simhash": ("documents", gen_dedup_simhash),
    "text_langid": ("documents", gen_text_langid),
    "text_fingerprint": ("documents", gen_text_fingerprint),
    "text_entropy": ("documents", gen_text_entropy),
    "mm_phash_dedup": ("documents", gen_mm_phash_dedup),
    "mm_audio_dedup": ("documents", gen_mm_audio_dedup),
    "mm_video_frame_sample": ("documents", gen_mm_video_frame_sample),
    "mm_video_dedup": ("documents", gen_mm_video_dedup),
    "text_tfidf": ("documents", gen_text_tfidf),
    "sim_topk_bruteforce": ("embeddings", gen_sim_topk_bruteforce),
    "sim_topk_lsh": ("embeddings", gen_sim_topk_lsh),
    "sim_topk_ivf": ("embeddings", gen_sim_topk_ivf),
    "sim_topk_pq": ("embeddings", gen_sim_topk_pq),
    "sim_topk_sq8": ("embeddings", gen_sim_topk_sq8),
    "sim_topk_opq": ("embeddings", gen_sim_topk_opq),
    "sim_topk_ivfpq": ("embeddings", gen_sim_topk_ivfpq),
    "dedup_embed_cosine": ("embeddings", gen_dedup_embed_cosine),
    "dedup_embed_cosine_mt": ("embeddings", gen_dedup_embed_cosine_mt),
    "dedup_semantic": ("embeddings", gen_dedup_semantic),
    "emb_kmeans": ("embeddings", gen_emb_kmeans_report),
    "data_prune_prototypes": ("embeddings", gen_data_prune_prototypes),
    "bpe_train": ("documents", gen_bpe_train),
    "bpe_token_count": ("documents", gen_bpe_token_count),
    "bpe_pack_ids": ("documents", gen_bpe_pack_ids),
    "dsir_importance": ("documents", gen_dsir_importance),
    "contamination_bloom": ("documents", gen_contamination_bloom),
    "quality_classifier": ("documents", gen_quality_classifier),
    "emb_pca": ("embeddings", gen_emb_pca),
}


def load_dir(srcdir, table):
    t = pq.read_table(f"{srcdir}/{table}.parquet")
    rows = t.to_pylist()
    if table == "embeddings":
        for r in rows:
            r["embedding"] = [float(x) for x in r["embedding"]]
    key = "doc_id" if table == "documents" else "vec_id"
    rows.sort(key=lambda r: r[key])
    return rows


def load(sf, table):
    return load_dir(f"{TESTDATA}/sf{sf}", table)


def run_generators(srcdir, outdir, only=None):
    os.makedirs(outdir, exist_ok=True)
    cache = {}
    for name, (table, gen) in GENERATORS.items():
        if only and name not in only:
            continue
        if table not in cache:
            cache[table] = load_dir(srcdir, table)
        import time
        t0 = time.time()
        t = gen(cache[table])
        pq.write_table(t, os.path.join(outdir, f"{name}.parquet"))
        print(f"{os.path.basename(srcdir) or srcdir} {name}: {t.num_rows} rows "
              f"({time.time() - t0:.0f}s)", flush=True)


def main():
    args = sys.argv[1:]
    if args and os.path.isabs(args[0]):
        srcdir = args[0].rstrip("/")
        only = set(args[1:]) or None
        run_generators(srcdir, os.path.join(OUT, os.path.basename(srcdir)), only)
        return
    sfs = args or ["0.001", "0.01", "0.1"]
    for sf in sfs:
        run_generators(f"{TESTDATA}/sf{sf}", os.path.join(OUT, f"sf{sf}"))


if __name__ == "__main__":
    main()
