#!/usr/bin/env python3
"""Independent golden vectors for the K2 n-gram feature scorer
(graft.detect.Features): from-scratch Python re-implementation of the
hashed-template bucketing, the naive-Bayes fit, the per-position
log-softmax emission contribution, the BIO-grammar Viterbi, and the BIO
decode. Output is pasted into FeatureGoldenSpec.scala so the whole
K2-full chain (features -> emissions -> path -> mentions) is gated by
math computed OUTSIDE the Scala codebase (same contract as
golden_vectors.py for the dedup/ANN scalars).

Run: python3 tools/golden_features.py
"""
import math

M64 = (1 << 64) - 1


def mix64(z):
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return (z ^ (z >> 31)) & M64


def hash_string(s, seed=0):
    h = mix64((seed ^ 0xA0761D6478BD642F) & M64)
    for ch in s:  # BMP-only inputs: ord == UTF-16 code unit
        h = mix64(h ^ ord(ch))
    return mix64(h ^ len(s))


import struct


def f32(x):
    """Round-trip through IEEE float32 (Scala stores weights as Float)."""
    return struct.unpack("f", struct.pack("f", x))[0]


ENTITY_TYPES = ["Anatomical", "Diseases", "Drug", "Image", "Laboratory", "Operation"]
LABELS = sorted(["B-" + t for t in ENTITY_TYPES] + ["I-" + t for t in ENTITY_TYPES] + ["O"])
L = len(LABELS)
O_ID = LABELS.index("O")
SEED_BASE = 0x4B32
NEG = -1e9


def feat_bucket(text, fr, to, t, dim):
    return ((hash_string(text[fr:to], SEED_BASE + t) & M64) >> 1) % dim


def templates(i, n):
    """(from, until, template) in the EXACT order Features fires them."""
    ts = [(i, i + 1, 0)]
    if i >= 1:
        ts.append((i - 1, i, 1))
    if i + 1 < n:
        ts.append((i + 1, i + 2, 2))
    if i >= 2:
        ts.append((i - 2, i - 1, 3))
    if i + 2 < n:
        ts.append((i + 2, i + 3, 4))
    if i >= 1:
        ts.append((i - 1, i + 1, 5))
    if i + 1 < n:
        ts.append((i, i + 2, 6))
    if i >= 1 and i + 1 < n:
        ts.append((i - 1, i + 2, 7))
    return ts


def fit(corpus, dim, alpha):
    """corpus: [(text, [label_id per char])]; returns (weights{(b,y):w}, unseen[y], priors[y])."""
    counts = {}
    n_pos = [0] * L
    for text, ids in corpus:
        n = len(text)
        for i in range(n):
            y = ids[i]
            n_pos[y] += 1
            for fr, to, t in templates(i, n):
                b = feat_bucket(text, fr, to, t, dim)
                counts[(b, y)] = counts.get((b, y), 0) + 1
    n_feat = [0] * L
    for (b, y), c in counts.items():
        n_feat[y] += c
    total_pos = sum(n_pos)
    priors = [f32(math.log((n_pos[y] + alpha) / (total_pos + alpha * L))) for y in range(L)]
    unseen = [f32(math.log(alpha / (n_feat[y] + alpha * dim))) for y in range(L)]
    weights = {
        (b, y): f32(math.log((c + alpha) / (n_feat[y] + alpha * dim)))
        for (b, y), c in counts.items()
    }
    return weights, unseen, priors


def add_scores(weights, unseen, priors, dim, text, i, n, scale=1.0):
    """Per-label emission contribution at position i (log-softmax)."""
    s = [float(priors[y]) for y in range(L)]
    for fr, to, t in templates(i, n):
        b = feat_bucket(text, fr, to, t, dim)
        for y in range(L):
            s[y] += float(weights.get((b, y), unseen[y]))
    mx = max(s)
    lse = mx + math.log(sum(math.exp(v - mx) for v in s))
    return [f32(scale * f32(s[y] - lse)) for y in range(L)]


def static_transitions():
    """0 for legal BIO transitions, -1e9 otherwise; row L = start."""
    t = [[0.0] * L for _ in range(L + 1)]
    for j in range(L):
        to = LABELS[j]
        if to.startswith("I-"):
            tpe = to[2:]
            for i in range(L):
                if LABELS[i] not in ("B-" + tpe, "I-" + tpe):
                    t[i][j] = NEG
            t[L][j] = NEG
    return t


def viterbi(em, trans):
    n = len(em)
    dp = [[0.0] * L for _ in range(n)]
    bp = [[0] * L for _ in range(n)]
    for j in range(L):
        dp[0][j] = trans[L][j] + em[0][j]
    for i in range(1, n):
        for j in range(L):
            best, arg = -float("inf"), 0
            for k in range(L):
                s = dp[i - 1][k] + trans[k][j]
                if s > best:
                    best, arg = s, k
            dp[i][j] = best + em[i][j]
            bp[i][j] = arg
    best, arg = -float("inf"), 0
    for j in range(L):
        if dp[n - 1][j] > best:
            best, arg = dp[n - 1][j], j
    path = [0] * n
    path[n - 1] = arg
    for i in range(n - 1, 0, -1):
        path[i - 1] = bp[i][path[i]]
    return path


def decode_bio(text, tags):
    """Reference BIO scan (predict_enhanced.py:277-326 shape)."""
    out, cur, start = [], None, 0
    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            if cur is not None:
                out.append((cur, text[start:i0], start, i0))
            cur, start, i0 = tag[2:], i, i + 1
        elif tag.startswith("I-") and cur is not None and tag[2:] == cur:
            i0 = i + 1
        elif not tag.startswith("I-"):
            if cur is not None:
                out.append((cur, text[start:i0], start, i0))
            cur = None
    if cur is not None:
        out.append((cur, text[start:i0], start, i0))
    return out


# ---------------------------------------------------------------- corpus
def tag_seq(n, spans):
    """spans: [(start, end, type)] -> BIO tags for a length-n sentence."""
    tags = ["O"] * n
    for s, e, tpe in spans:
        tags[s] = "B-" + tpe
        for k in range(s + 1, e):
            tags[k] = "I-" + tpe
    return tags


TRAIN = [
    ("患者有高血压病史", [(3, 7, "Diseases")]),
    ("给予阿司匹林治疗", [(2, 6, "Drug")]),
    ("诊断为糖尿病", [(3, 6, "Diseases")]),
    ("行食管切除术后恢复", [(1, 3, "Anatomical"), (3, 6, "Operation")]),
]
TEST_TEXT = "患者有糖尿病史"  # 糖尿病 NOT in the (empty) gazetteer: features must find it
DIM = 1024
ALPHA = 0.1


def scala_str(s):
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def main():
    corpus = []
    for text, spans in TRAIN:
        tags = tag_seq(len(text), spans)
        corpus.append((text, [LABELS.index(t) for t in tags]))
    weights, unseen, priors = fit(corpus, DIM, ALPHA)

    print("  // generated by tools/golden_features.py — do not hand-edit")
    print(f"  val goldenDim = {DIM}")
    print(f"  val goldenAlpha = {ALPHA}")
    print("  val goldenTrain: Seq[(String, Seq[(Int, Int, String)])] = Seq(")
    rows = []
    for text, spans in TRAIN:
        sp = ", ".join(f"({s}, {e}, {scala_str(t)})" for s, e, t in spans)
        rows.append(f"    ({scala_str(text)}, Seq({sp}))")
    print(",\n".join(rows))
    print("  )")
    print(f"  val goldenTestText = {scala_str(TEST_TEXT)}")

    # bucket pins (exact)
    print("  // (text, from, until, template) -> bucket at dim=64 (exact)")
    print("  val goldenBuckets: Seq[(String, Int, Int, Int, Int)] = Seq(")
    cases = [(TEST_TEXT, 3, 4, 0), (TEST_TEXT, 2, 4, 5), (TEST_TEXT, 3, 6, 7), ("高血压病", 0, 1, 1)]
    print(",\n".join(
        f"    ({scala_str(t)}, {fr}, {to}, {tp}, {feat_bucket(t, fr, to, tp, DIM)})"
        for t, fr, to, tp in cases))
    print("  )")

    # prior vector (f32, compare ±1e-6)
    print("  // per-label log priors (float32, compare within 1e-6)")
    print("  val goldenPriors: Seq[Float] = Seq(" + ", ".join(f"{p!r}f" for p in priors) + ")")

    # a few weight cells (f32)
    print("  // (bucket, labelId) -> weight for cells exercised by the test text")
    some = sorted(weights.items())[:6]
    print("  val goldenWeightCells: Seq[(Int, Int, Float)] = Seq(")
    print(",\n".join(f"    ({b}, {y}, {w!r}f)" for (b, y), w in some))
    print("  )")

    # emission contributions on the test sentence (features only)
    n = len(TEST_TEXT)
    em_feat = [add_scores(weights, unseen, priors, DIM, TEST_TEXT, i, n) for i in range(n)]
    print("  // addScores output per position of the test text (compare within 1e-4)")
    print("  val goldenEmissions: Seq[Seq[Float]] = Seq(")
    print(",\n".join("    Seq(" + ", ".join(f"{v!r}f" for v in row) + ")" for row in em_feat))
    print("  )")

    # kernel-level: O-prior 2.0 + features, empty gazetteer -> viterbi -> mentions
    em = [[em_feat[i][y] + (2.0 if y == O_ID else 0.0) for y in range(L)] for i in range(n)]
    path = viterbi(em, static_transitions())
    tags = [LABELS[p] for p in path]
    mentions = decode_bio(TEST_TEXT, tags)
    print("  // viterbi path over (O-prior + features) emissions (exact)")
    print("  val goldenPath: Seq[Int] = Seq(" + ", ".join(str(p) for p in path) + ")")
    print("  // decoded mentions (type, text, start, end) — the off-gazetteer detection")
    print("  val goldenMentions: Seq[(String, String, Int, Int)] = Seq(")
    print(",\n".join(
        f"    ({scala_str(t)}, {scala_str(x)}, {s}, {e})" for t, x, s, e in mentions))
    print("  )")


if __name__ == "__main__":
    main()
