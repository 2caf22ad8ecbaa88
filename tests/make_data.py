"""Deterministic test-FASTA generator for golden/parity tests.

Generates small genomes with edge cases the reference handles specially:
multiple records, lowercase, non-ACGT chars (stripped + flank-joining,
/root/reference/utils.cpp:675-702), sequences shorter than k (dropped,
/root/reference/SubSampler.cpp:340-343), gzipped and plain files.
"""
import gzip
import os
import random

ALPH = "ACGT"


def random_seq(rng, n):
    return "".join(rng.choice(ALPH) for _ in range(n))


def write_fasta(path, records, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for name, seq, width in records:
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")


def make_all(outdir):
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(1312)
    paths = {}

    # Simple single-record genome.
    seq = random_seq(rng, 5000)
    p = os.path.join(outdir, "simple.fa")
    write_fasta(p, [("seq1", seq, 70)])
    paths["simple"] = p

    # Multi-record with edge cases.
    recs = [
        ("r1", random_seq(rng, 2000), 60),
        ("short", random_seq(rng, 20), 60),  # < k: dropped
        ("r2_with_N", random_seq(rng, 800) + "NNNN" + random_seq(rng, 800), 60),
        ("r3_lower", random_seq(rng, 1000).lower(), 80),
        ("r4", random_seq(rng, 3000), 100),
    ]
    p = os.path.join(outdir, "edge.fa")
    write_fasta(p, recs, gz=False)
    paths["edge"] = p

    # Gzipped larger genome.
    seq = random_seq(rng, 50000)
    p = os.path.join(outdir, "big.fa.gz")
    write_fasta(p, [("chr1", seq, 80)], gz=True)
    paths["big"] = p

    # Repetitive genome (stresses dedup/abundance and superkmer reconstruction).
    unit = random_seq(rng, 200)
    seq = (unit * 30) + random_seq(rng, 1000)
    p = os.path.join(outdir, "repeat.fa")
    write_fasta(p, [("rep", seq, 70)])
    paths["repeat"] = p

    # Family of related genomes for comparator tests (mutated copies).
    base = random_seq(rng, 20000)
    fam = []
    for i, mut in enumerate([0.0, 0.01, 0.05, 0.2]):
        s = list(base)
        for j in range(len(s)):
            if rng.random() < mut:
                s[j] = rng.choice(ALPH)
        p = os.path.join(outdir, f"fam{i}.fa")
        write_fasta(p, [(f"fam{i}", "".join(s), 75)])
        fam.append(p)
        paths[f"fam{i}"] = p
    with open(os.path.join(outdir, "fam_fof.txt"), "w") as f:
        for p in fam:
            f.write(p + "\n")
    paths["fam_fof"] = os.path.join(outdir, "fam_fof.txt")
    return paths


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/data"
    paths = make_all(out)
    for k, v in sorted(paths.items()):
        print(k, v)
