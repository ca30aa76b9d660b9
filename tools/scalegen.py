#!/usr/bin/env python3
"""Deterministic Nx explosion of the corpus tables for the scale
rehearsal (SCALE.md): builds an sf1-equivalent dataset from sf0.1 as N
statistically-identical, mutually-disjoint replicas.

Replica construction (replica 0 is the original):
- documents: per-replica LETTER BIJECTION (Caesar shift of [a-zA-Z] via
  translate). A bijection on characters preserves every within-replica
  structure the heavy queries measure — lengths, token counts, shingle
  multisets, near-dup pair structure — EXACTLY, while making
  cross-replica shingles/hashes disjoint. That is the right null model
  for a linearity measurement: 10x data that behaves like 10 independent
  sf0.1 corpora, with no artificial cross-replica duplicate blowup that
  would make pair-generating queries quadratic BY CONSTRUCTION rather
  than by plan defect.
- embeddings: per-replica CIRCULAR ROTATION of the 64 dims (an
  orthogonal permutation): pairwise cosines and L2 distances within a
  replica are preserved exactly; cross-replica sign-LSH buckets
  decorrelate because the bucket dims (first 8) differ per replica.
- events: id/user offsets per replica; ts / value / type untouched.
  Written with pyarrow, not SQL, to preserve the source's physical
  timestamp type byte-for-byte (NANOS or MICROS — the engine's
  Tables.normalizeEventTs seam adapts to either).
- remaining TPC-H tables: copied verbatim (none of the rehearsal's
  heavy queries scans them; present so any query can still run).

Usage: python3 tools/scalegen.py SRC_DIR DST_DIR FACTOR [--single-source] [--shared-vocab] [--scrambled-alpha]

--single-source rewrites documents.source to the constant 'web': the
worst-case source skew for per-source operators (q_pack_sequences'
prefix sum) — at factor N, ONE source holds every document, so any
plan whose parallelism is bounded by source cardinality degrades to a
single task. The r11 rehearsal measures the bucketed two-level prefix
sum against exactly this shape (VERDICT r10 perf-weak #2).

--shared-vocab replaces the per-replica letter bijection with a
per-replica TOKEN ROTATION (same words, rotated order): the vocabulary
is SHARED across replicas, so every term's document frequency grows
∝ factor — the in-language corpus-growth shape for RETRIEVAL operators
(q_bm25_topk's postings join: the default disjoint-vocabulary replicas
hold per-term df constant, which understates how a probe term's
candidate set grows in a real corpus — VERDICT r11 #4). tf per doc and
doc lengths are preserved exactly (token multiset unchanged). NOT for
dedup rehearsals: shared vocabulary plants cross-replica near-dup
pairs by construction, making pair-generating queries quadratic by
design rather than by plan defect.

--scrambled-alpha replaces the affine letter bijections with seeded
RANDOM letter permutations (still bijections — all within-replica
structure preserved exactly) whose byte ordering is non-monotone: the
image-perceptual rehearsal mode (VERDICT r16 #9). The default affine
maps at low r are Caesar rotations that preserve byte-order
comparisons, planting cross-replica dHash near-dups by construction;
scrambled alphabets decorrelate the gray-grid comparisons so
q_phash_groups' CC rehearsal measures the plan, not the dataset.
"""
import shutil
import string
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


# Multipliers coprime to 26: with shift b in 0..25 this gives 312
# DISTINCT affine bijections i -> (a*i + b) % 26 on the letter index.
# A plain Caesar shift repeats after 26 replicas, which would make
# replicas r and r+26 byte-identical -- planted cross-replica EXACT
# duplicates that turn every pair-generating query quadratic by
# construction at factor 100 (the 100x rehearsal, VERDICT r8 #2).
AFFINE_A = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def letters_mapped(r):
    a = AFFINE_A[(r // 26) % len(AFFINE_A)]
    b = r % 26

    def mp(alpha):
        return "".join(alpha[(a * i + b) % 26] for i in range(26))

    return mp(string.ascii_lowercase) + mp(string.ascii_uppercase)


def letters_scrambled(r):
    """Seeded per-replica random letter permutation (still a bijection,
    so every within-replica structure is preserved exactly like the
    affine map) whose byte ordering is NON-monotone: the affine maps at
    low r are Caesar rotations, which preserve most byte-order
    comparisons — exactly what the dHash grid measures — so replicas
    plant cross-replica IMAGE near-dups by construction (the r16
    q_phash_groups rehearsal measured the dataset, not the plan:
    113x pair inflation). A scrambled alphabet decorrelates the gray
    comparisons (~50% bit flips), so cross-replica phash pairs vanish
    and the CC rehearsal measures the plan (VERDICT r16 #9).
    """
    import random
    rng = random.Random(0xC0FFEE + r)
    # ONE permutation over all 52 letters (case-mixing): a case-class-
    # preserving shuffle leaves every cell mean inside the 97..122
    # lowercase byte band, so the dHash bits decided by SPACE geometry
    # (positions are replica-invariant under any bijection) still
    # dominate and ~6.9x cross-replica pair inflation survives
    # (measured). Mixing cases spreads cell means across the 65..122
    # range, decorrelating letter-cell comparisons too. Still a strict
    # bijection — all within-replica identity structure is exact; only
    # case-CLASS-dependent features change, which no phash-rehearsal
    # query reads (this mode is for the image-perceptual rehearsal
    # ONLY).
    allc = list(string.ascii_letters)
    rng.shuffle(allc)
    return "".join(allc)


def gen_documents(src, dst, factor, con, single_source=False,
                  shared_vocab=False, scrambled_alpha=False):
    assert factor <= 26 * len(AFFINE_A), "affine letter bijections exhausted"
    source = "'web' AS source" if single_source else "source"
    parts = []
    for r in range(factor):
        if r == 0:
            text = "text"
        elif shared_vocab:
            # rotate the token list by r positions: vocabulary, tf and
            # doc length preserved; DuckDB slices clamp, so for a doc
            # with <= r tokens the rotation degenerates to the original
            # (irrelevant for df growth — membership is what multiplies)
            text = ("array_to_string(string_split(text, ' ')[%d:] || "
                    "string_split(text, ' ')[1:%d], ' ')" % (r + 1, r))
        else:
            mapped = (letters_scrambled(r) if scrambled_alpha
                      else letters_mapped(r))
            text = ("translate(text, '%s', '%s')"
                    % (string.ascii_letters, mapped))
        parts.append(
            "SELECT doc_id + %d AS doc_id, %s AS text, lang, %s, n_chars "
            "FROM read_parquet('%s/documents.parquet')"
            % (r * 10_000_000, text, source, src))
    con.execute("COPY (%s) TO '%s/documents.parquet' (FORMAT PARQUET)"
                % (" UNION ALL ".join(parts), dst))


def gen_embeddings(src, dst, factor, con):
    # orthogonal transform per replica: circular rotation by r % 64
    # composed with global negation for r >= 64 (diag(-1) is orthogonal,
    # so within-replica cosines/L2 stay bit-preserved). The pre-r9 form
    # rotated by r directly; for r >= 64 the DuckDB slice clamps and the
    # "rotation" silently degenerates to the identity -- replicas 64..99
    # would be exact vector copies of replica 0.
    assert factor <= 128, "distinct orthogonal transforms exhausted"
    parts = []
    for r in range(factor):
        k = r % 64
        if k == 0:
            emb = "embedding"
        else:
            emb = "(embedding[%d:] || embedding[1:%d])" % (k + 1, k)
        if r >= 64:
            emb = "list_transform(%s, x -> -x)" % emb
        if r > 0:
            emb = "list_transform(%s, x -> CAST(x AS FLOAT))" % emb
        parts.append(
            "SELECT vec_id + %d AS vec_id, %s AS embedding, label "
            "FROM read_parquet('%s/embeddings.parquet')"
            % (r * 1_000_000, emb, src))
    con.execute("COPY (%s) TO '%s/embeddings.parquet' (FORMAT PARQUET)"
                % (" UNION ALL ".join(parts), dst))


def gen_events(src, dst, factor):
    t = pq.read_table("%s/events.parquet" % src)
    out = []
    for r in range(factor):
        rep = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                           pc.add(t["event_id"], r * 100_000_000))
        rep = rep.set_column(rep.schema.get_field_index("user_id"), "user_id",
                             pc.add(rep["user_id"], r * 10_000_000))
        out.append(rep)
    pq.write_table(pa.concat_tables(out), "%s/events.parquet" % dst)


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    single_source = "--single-source" in sys.argv[4:]
    shared_vocab = "--shared-vocab" in sys.argv[4:]
    scrambled_alpha = "--scrambled-alpha" in sys.argv[4:]
    # shared-vocab's token rotation bypasses the letter map entirely —
    # silently ignoring --scrambled-alpha would leave the byte-order-
    # preserving text untouched while the operator believes the
    # image-perceptual mode is active, invalidating the rehearsal
    assert not (shared_vocab and scrambled_alpha), \
        "--shared-vocab and --scrambled-alpha are mutually exclusive"
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    gen_documents(src, dst, factor, con, single_source, shared_vocab,
                  scrambled_alpha)
    gen_embeddings(src, dst, factor, con)
    gen_events(src, dst, factor)
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem"):
        shutil.copyfile("%s/%s.parquet" % (src, tbl),
                        "%s/%s.parquet" % (dst, tbl))
    print("wrote %s at %dx of %s" % (dst, factor, src))


if __name__ == "__main__":
    main()
