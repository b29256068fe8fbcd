#!/usr/bin/env python3
"""Adversarial oracle re-check on PERTURBED data.

The driver's testdata is fixed, so an oracle can go green vacuously
(the code path it checks never fires) or a query can silently assume a
data shape (row order, always-object JSON, short docs, unit-norm
embeddings, no NULL keys). This tool builds a mutated copy of the
sf0.001 tables, re-runs `graft.Verify` on it, and re-compares every
registered oracle with the same strict cell-equality as
check_correctness.py. Dev-only (like check_correctness.py) — the Scala
library has no Python dependency.

Perturbations:
  - every table: deterministic row-order shuffle (catches
    accumulation-order dependence in double aggregates);
  - events: appended rows with NULL user_id (the F1 reject path),
    NULL/empty/invalid/trailing-garbage props, and VALID-but-non-object
    JSON (`42`, `[1,2]`, `"s"`) — the from_json vs json_valid
    divergence ADVICE once flagged;
  - documents: appended exact duplicate, one-token near-duplicate,
    empty text, digits-only junk, punctuation noise, Cyrillic and CJK
    sentences (langId paths), a 500-token doc (multi-chunk,
    multi-pack paths — driver docs max out below 100 tokens), an
    NFD-decomposed text (both engines must land on the same NFC), and
    a single 2000-char token (unbounded-token-length paths);
  - embeddings: appended duplicate vector (kNN tie-break), zero vector,
    a scaled vector, and NaN-component / NULL-component / ragged
    vectors, all under corpus label 3 (norm-audit counts them per
    label; the finite+dim boundary excludes them from every similarity
    query in both engines), all at ids far from the 100000+ range the
    planted-row queries reserve;
  - customer: appended zero- and negative-acctbal rows (inactive-key
    boundary of the auth semi-join).

Usage:
    python3 tools/fuzz_correctness.py [src_sf_dir] [work_dir]
    (defaults: /root/testdata/sf0.001 /tmp/fuzzdata)
"""
import random
import subprocess
import sys
import unicodedata
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def shuffled(table: pa.Table, seed: int) -> pa.Table:
    idx = list(range(table.num_rows))
    random.Random(seed).shuffle(idx)
    return table.take(idx)


def append_rows(table: pa.Table, rows: list) -> pa.Table:
    cols = table.schema.names
    extra = pa.Table.from_pylist(
        [dict(zip(cols, r)) for r in rows]).cast(table.schema)
    return pa.concat_tables([table, extra])


def mutate(name: str, table: pa.Table) -> pa.Table:
    if name == "events":
        ts = table.column("ts")[0].as_py()  # stay inside the date spine
        rows = [
            # NULL user_id -> must land in the anti-join reject, both engines
            (900000001, ts, None, "click", 1.5, '{"k": 1}'),
            # NULL / empty / invalid / trailing-garbage payloads
            (900000002, ts, 7, "click", 2.5, None),
            (900000003, ts, 7, "click", 3.5, ""),
            (900000004, ts, 7, "view", 4.5, '{"k": broken'),
            (900000005, ts, 7, "view", 5.5, '{"k": 1} trailing'),
            # VALID JSON that is not an object: json_valid() says yes,
            # from_json(struct) says corrupt — the oracle must gate on
            # json_type = OBJECT to agree
            (900000006, ts, 7, "view", 6.5, "42"),
            (900000007, ts, 7, "purchase", 7.5, "[1, 2]"),
            (900000008, ts, 7, "purchase", 8.5, '"just a string"'),
            # object with overflow keys beyond the projected "k"
            (900000009, ts, 7, "purchase", 9.5, '{"k": 2, "zz": "x"}'),
        ]
        return append_rows(table, rows)
    if name == "documents":
        all_docs = {d["doc_id"]: d["text"] for d in table.to_pylist()}
        ids = sorted(all_docs)[:2]
        texts = {0: all_docs[ids[0]], 1: all_docs[ids[1]]}
        near = texts[1].split()
        near[len(near) // 2] = "perturbedtoken"
        long_doc = " ".join(
            f"alpha{i % 7} beta{i % 5} gamma{i}" for i in range(170))
        rows = [
            (800001, texts[0], "en", "fuzz-src", len(texts[0])),   # exact dup of doc 0
            (800002, " ".join(near), "en", "fuzz-src", len(texts[1])),  # near-dup of doc 1
            (800003, "", "en", "fuzz-src", 0),                     # empty text
            (800004, "1234 5678 90 42 777 0001", "en", "fuzz-src", 24),
            (800005, "!!! ??? ;;; ,,, ... :::", "en", "fuzz-src", 23),
            (800006, "и в не на я что он с как это по но она к у из",
             "ru", "fuzz-src", 46),
            (800007, "の に は を た が で て と し も な い か る",
             "ja", "fuzz-src", 29),
            (800008, long_doc, "en", "fuzz-src", len(long_doc)),   # > 500 tokens
            # NFD-decomposed text (e + combining acute, a + combining
            # ring): doc_normalize must canonicalize to the SAME NFC
            # form in both engines, and codepoint-indexed ops must not
            # split the combining mark from its base
            (800009,
             unicodedata.normalize("NFD", "café jalapeño århus resumé"),
             "en", "fuzz-src", 27),
            # one extreme token (2000 chars, no whitespace): shingle /
            # BPE / chunking / packing paths must not assume bounded
            # token length
            (800010, "start " + "x" * 2000 + " end", "en", "fuzz-src", 2010),
            # astral-plane text (4-byte UTF-8, surrogate pairs in
            # UTF-16): codepoint-indexed ops must not split an emoji,
            # and token/char counts must agree across engines
            (800011, "🎉🎊 party données 中文字 🚀🌕 end", "en", "fuzz-src", 30),
            # NULL text/lang/source are NOT planted: the analytic
            # tables sit BEHIND the ingest validation layer (the
            # reference's F1-F6 reject paths, IngestPipelineSpec), so
            # NULL required fields are out of contract here by
            # design — they are rejected (and DLQ-routed) at ingest,
            # exactly as the reference rejects them with 400/401
            # before anything reaches the warehouse.
        ]
        return append_rows(table, rows)
    if name == "embeddings":
        first = table.to_pylist()[0]
        dim = len(first["embedding"])
        rows = [
            (50001, first["embedding"], first["label"]),        # exact dup vector
            (50002, [0.0] * dim, 3),                            # zero vector, corpus label
            (50003, [x * 2.0 for x in first["embedding"]], 3),  # off-unit norm
            # NaN component under corpus label 3: every similarity /
            # norm / quantization path must keep NaN out of top-k
            # results identically in both engines (Spark and DuckDB
            # each treat NaN as greater-than-everything in their OWN
            # rankings — a divergence unless the finite boundary
            # excludes the row on both sides)
            (50004, [float("nan")] + [0.1] * (dim - 1), 3),
            # NULL component: three-valued-logic trap — Spark's
            # exists() returns NULL (row dropped by WHERE) while
            # DuckDB's list_filter drops a NULL lambda result (row
            # KEPT) unless the oracle CTE carries an explicit
            # x IS NULL arm
            (50006, [0.1] * (dim // 2) + [None] + [0.1] * (dim - dim // 2 - 1), 3),
            # ragged vector (dim-1 components): a truncated encoder
            # write. Spark explodes actual lengths while the oracles
            # index a fixed range, so without a dimension gate at the
            # boundary the two engines count different component sets
            (50005, [0.1] * (dim - 1), 3),
        ]
        return append_rows(table, rows)
    if name == "orders":
        ts = table.column("o_orderdate")[0].as_py()
        rows = [
            # all-NULL attributes: profile NULL counting, NULL-safe
            # joins/grouping downstream
            (900000001, None, None, None, None, None),
            # negative price: floor-of-cents must floor toward -inf in
            # both engines
            (900000002, 7, "Z", -123.456, ts, "0-FUZZ"),
        ]
        return append_rows(table, rows)
    if name == "customer":
        rows = [
            (900001, "Fuzz Zero", 0, 0.0, "BUILDING"),    # exactly-zero balance
            (900002, "Fuzz Debt", 0, -42.0, "BUILDING"),  # negative balance
        ]
        return append_rows(table, rows)
    return table


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/fuzzdata")
    out = work.with_name(work.name + "_verify")
    work.mkdir(parents=True, exist_ok=True)
    for i, t in enumerate(TABLES):
        table = pq.read_table(f"{src}/{t}.parquet")
        mutated = shuffled(mutate(t, table), seed=1000 + i)
        # preserve the physical types the engine must cope with
        # (notably events.ts TIMESTAMP(NANOS))
        pq.write_table(mutated, work / f"{t}.parquet",
                       coerce_timestamps=None, store_schema=True)
        print(f"fuzz {t}: {table.num_rows} -> {mutated.num_rows} rows")

    print(f"running graft.Verify on {work} ...", flush=True)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {work} {out}"],
        cwd=Path(__file__).resolve().parent.parent, capture_output=True, text=True)
    failed = [l for l in r.stderr.splitlines() if "[verify]" in l]
    for l in failed:
        print(l)
    if r.returncode != 0 or failed:
        print("VERIFY FAILED")
        return 1

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import check_correctness
    return check_correctness.main(str(work), str(out))


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
