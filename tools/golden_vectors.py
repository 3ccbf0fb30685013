#!/usr/bin/env python3
"""Independent (second-implementation) golden vectors for the pure scalar
kernels shared between the production ops and the Fixtures oracles.

The driver's DuckDB gate re-derives all DISTRIBUTED machinery with local
loops, but those loops call the SAME Scala scalar kernels (simhash,
minhash, fingerprint, langid, signBands) as the ops under test — a bug
inside a scalar would be invisible to the gate (r2 VERDICT "What's
wrong" #1). This script is a from-scratch Python re-implementation of
each kernel (64-bit wrapping arithmetic done with explicit masking);
its outputs are pasted as literals into KernelGoldenSpec.scala, so any
change to a kernel constant breaks an sbt test computed OUTSIDE the
Scala codebase.

Run: python3 tools/golden_vectors.py   (prints Scala literal snippets)
"""

M64 = (1 << 64) - 1


def signed(x):
    x &= M64
    return x - (1 << 64) if x >= (1 << 63) else x


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


def hash2(a, b):
    return mix64(mix64(a) ^ (b & M64))


def uniform_double(h):
    return ((h & M64) >> 11) / float(1 << 53)


# ---------------------------------------------------------------- simhash
def simhash(text):
    counts = [0] * 64
    for t in text.lower().split():
        if t:
            h = hash_string(t)
            for b in range(64):
                if (h >> b) & 1:
                    counts[b] += 1
                else:
                    counts[b] -= 1
    out = 0
    for b in range(64):
        if counts[b] > 0:
            out |= 1 << b
    return signed(out)


# ---------------------------------------------------------------- minhash
def shingles(text, w):
    toks = [t for t in text.lower().split() if t]
    if len(toks) < w:
        return [] if not toks else [" ".join(toks)]
    return [" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)]


def minhash_signature(text, k, w):
    sig = [(1 << 63) - 1] * k  # Long.MaxValue, SIGNED comparisons
    for sh in shingles(text, w):
        base = hash_string(sh)
        for j in range(k):
            h = signed(mix64((base ^ ((0x9E3779B97F4A7C15 * (j + 1)) & M64)) & M64))
            if h < sig[j]:
                sig[j] = h
    return sig


# ------------------------------------------------------------ fingerprint
MOD61 = (1 << 61) - 1


def fingerprint(text):
    # true modular arithmetic — independent of the Scala 128-bit fold
    h = 0
    for ch in text:
        h = (h * 257 + ord(ch)) % MOD61
    return h


# ---------------------------------------------------------------- langid
PROFILES = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", " to", "to ", " is", "is "],
    "es": [" de", "de ", " la", "la ", " el", "el ", "os ", " qu", "que", "ue ", " en", "en ", "ión"],
    "fr": [" le", "le ", " de", "de ", " et", "et ", " la", "la ", "es ", " un", "un ", "ent", " à "],
    "de": [" de", "der", "er ", " un", "und", "nd ", " di", "die", "ie ", "ch ", "ein", "sch", " zu"],
    "zh": ["的", "了", "在", "是", "和", "有", "不", "人", "这", "中"],
}


def count_overlapping(hay, needle):
    n, i = 0, hay.find(needle)
    while i >= 0:
        n += 1
        i = hay.find(needle, i + 1)
    return n


def language_id(text):
    if not text:
        return "und"
    t = " " + text.lower() + " "
    best, best_score = "und", 0.0
    for lang in ["en", "es", "fr", "de", "zh"]:  # insertion order of the Scala Map
        hits = sum(count_overlapping(t, g) for g in PROFILES[lang])
        score = hits / max(len(t), 1)
        if score > best_score:
            best_score, best = score, lang
    return best


# -------------------------------------------------------------- signBands
def plane_vectors(seed, planes, dim):
    return [[uniform_double(hash2(seed, p * 1024 + d)) * 2 - 1 for d in range(dim)]
            for p in range(planes)]


def sign_bands(v, pv, bands):
    planes = len(pv)
    width = planes // bands
    bits = []
    for p in range(planes):
        dot = 0.0
        for d in range(min(len(pv[p]), len(v))):
            dot += pv[p][d] * v[d]  # inputs chosen exactly float32-representable
        bits.append(dot >= 0)
    keys = []
    for b in range(bands):
        key = 0
        for i in range(width):
            if bits[b * width + i]:
                key |= 1 << i
        keys.append(signed(key))
    return keys


# ----------------------------------------------- deterministic embeddings
import struct as _struct


def f32(x):
    """Round a Python double to IEEE float32 (Scala Float semantics)."""
    return _struct.unpack("f", _struct.pack("f", x))[0]


def hash_embedding(key, dim, seed=0):
    base = hash_string(key, seed)
    return [f32(uniform_double(mix64((base + i) & M64)) * 2.0 - 1.0) for i in range(dim)]


def context_embedding(text, dim):
    """Linker.contextEmbedding: hashed char-2-gram sums, float32 math."""
    acc = [0.0] * dim
    if not text:
        return acc
    for i in range(len(text)):
        g2 = text[i:min(i + 2, len(text))]
        h = hash_string(g2, 0x5EED)
        for d in range(dim):
            acc[d] = f32(acc[d] + f32(uniform_double(mix64((h + d) & M64)) * 2 - 1))
    norm = f32(sum(x * x for x in acc) ** 0.5)
    if norm > 0:
        acc = [f32(x / norm) for x in acc]
    return acc


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "la casa de la montana es de el abuelo",
    "患者的食管有病变 中段可见肿物",
    "Der Hund und die Katze sind im Garten",
    "le chat et le chien sont dans la maison",
    "deduplicate me deduplicate me deduplicate me",
    "x",
    "",
]

VECS = [
    [1.0, 0.0, 0.0, 0.0],
    [0.5, -0.25, 0.75, -1.0],
    [-0.125, 0.625, -0.5, 0.25],
]


def scala_str(s):
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def main():
    print("  // generated by tools/golden_vectors.py — do not hand-edit")
    print("  val goldenHashString: Seq[(String, Long)] = Seq(")
    print(",\n".join(f"    ({scala_str(t)}, {signed(hash_string(t))}L)" for t in TEXTS))
    print("  )")
    print("  val goldenSimhash: Seq[(String, Long)] = Seq(")
    print(",\n".join(f"    ({scala_str(t)}, {simhash(t)}L)" for t in TEXTS))
    print("  )")
    print("  val goldenFingerprint: Seq[(String, Long)] = Seq(")
    print(",\n".join(f"    ({scala_str(t)}, {fingerprint(t)}L)" for t in TEXTS))
    print("  )")
    print("  val goldenLangId: Seq[(String, String)] = Seq(")
    print(",\n".join(f"    ({scala_str(t)}, {scala_str(language_id(t))})" for t in TEXTS))
    print("  )")
    print("  val goldenMinhash: Seq[(String, Seq[Long])] = Seq(")
    rows = []
    for t in TEXTS[:6]:
        sig = minhash_signature(t, 8, 2)
        rows.append(f"    ({scala_str(t)}, Seq({', '.join(str(x) + 'L' for x in sig)}))")
    print(",\n".join(rows))
    print("  )")
    pv = plane_vectors(0xB17, 8, 4)
    print("  // planeVectors(0xB17, planes = 8, dim = 4), bands = 2")
    print("  val goldenSignBands: Seq[(Seq[Float], Seq[Long])] = Seq(")
    rows = []
    for v in VECS:
        bands = sign_bands(v, pv, 2)
        vs = ", ".join(f"{x}f" for x in v)
        bs = ", ".join(f"{b}L" for b in bands)
        rows.append(f"    (Seq({vs}), Seq({bs}))")
    print(",\n".join(rows))
    print("  )")
    pv2 = plane_vectors(0xA55, 32, 64)
    print("  // production ANN parameters: planeVectors(0xA55, 32, 64), bands = 16, one-hot dims")
    print("  val goldenSignBandsAnn: Seq[(Int, Seq[Long])] = Seq(")
    rows = []
    for hot in (0, 17, 63):
        v = [0.0] * 64
        v[hot] = 1.0
        bands = sign_bands(v, pv2, 16)
        bs = ", ".join(f"{b}L" for b in bands)
        rows.append(f"    ({hot}, Seq({bs}))")
    print(",\n".join(rows))
    print("  )")
    print("  // first components of planeVectors(0xB17, 8, 4) — pins the plane RNG itself")
    print("  val goldenPlane00: Double = %r" % pv[0][0])
    print("  val goldenPlane73: Double = %r" % pv[7][3])
    print("  // Hashing.embedding(key, 8): per-component doubles (Scala compares .toFloat)")
    print("  val goldenHashEmbedding: Seq[(String, Seq[Float])] = Seq(")
    rows = []
    for key in ("C0000001|食管", "enc|高血压病", "q"):
        e = hash_embedding(key, 8)
        rows.append(f"    ({scala_str(key)}, Seq({', '.join(repr(x) + 'f' for x in e)}))")
    print(",\n".join(rows))
    print("  )")
    print("  // Linker.contextEmbedding(text, 8): float32 accumulation replicated exactly")
    print("  val goldenCtxEmbedding: Seq[(String, Seq[Float])] = Seq(")
    rows = []
    for t in ("食管", "高血压病", "x", ""):
        e = context_embedding(t, 8)
        rows.append(f"    ({scala_str(t)}, Seq({', '.join(repr(x) + 'f' for x in e)}))")
    print(",\n".join(rows))
    print("  )")


if __name__ == "__main__":
    main()
