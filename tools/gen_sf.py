"""Deterministic sf-multiplier generator: synthesize sfN parquet from sf0.1.

VERDICT r3 #7 asks for one sf1-scale suite run as hard evidence that no
headline plan has a hidden super-linear term. /root/testdata is read-only, so
this derives sf1 = 10 x sf0.1 into the repo (gitignored), preserving each
table's *statistical structure* so per-query walls are comparable:

- lineitem / part / orders / events: 10 copies with key offsets (keys stay
  unique; the querylib point-derivation hashes turn each copy's offset into a
  constant cyclic shift of the point cloud, keeping lon/lat uniform).
- documents: 10 copies; copy c>0 gets an injective per-copy vocabulary
  relabel (word -> word_<c>), which preserves within-copy shingle-Jaccard
  structure EXACTLY (duplicate-pair counts scale linearly, x10) while making
  cross-copy overlap zero -- naive replication would give every doc 9 exact
  duplicates and inflate pair counts 45x, hiding real blowups.
- embeddings: 10 copies; copy c>0 gets a seeded dimension permutation + sign
  flips (an orthogonal transform: within-copy cosines preserved exactly,
  cross-copy cosines ~ random). vec_id offsets keep the `vec_id % 50` query
  set at N/50 queries, matching how the driver generator would scale.
- region/nation/customer/supplier: fixed-content lookup tables, copied
  verbatim (no headline query scales with them).

Everything is seeded/arithmetic -- two runs produce byte-identical parquet.

Usage: python tools/gen_sf.py [--mult 10] [--src /root/testdata/sf0.1]
                              [--dst testdata_sf/sf1]
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_OFF = 1 << 24  # > every key in sf0.1 (max l_orderkey 149,999)
DOC_OFF = 1_000_000  # > max doc_id AND > textops.DUP_DOCS_CTE's +100000 /
                     # +200000 synthetic-dup shifts (offset 100_000 made
                     # copy 0's synthetic dups COLLIDE with copy 1/2's real
                     # doc_ids, polluting the sf1 dup-pair structure); NOT
                     # a multiple of 97, so the pages poison row density
                     # (doc_id % 97 == 13) stays ~1/97 in each copy

COPY_VERBATIM = ["region", "nation", "customer", "supplier"]


def _union(con, mult: int, src: str, dst: Path, table: str, select_fmt: str):
    parts = [select_fmt.format(c=c, src=f"'{src}/{table}.parquet'")
             for c in range(mult)]
    sql = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({sql}) TO '{dst / (table + '.parquet')}' (FORMAT PARQUET)")


def gen(src: str, dst: Path, mult: int) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_VERBATIM:
        shutil.copy(f"{src}/{t}.parquet", dst / f"{t}.parquet")

    _union(con, mult, src, dst, "lineitem", f"""
      SELECT l_orderkey + {{c}} * {KEY_OFF} AS l_orderkey, l_partkey,
             l_suppkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM {{src}}""")

    _union(con, mult, src, dst, "part", f"""
      SELECT p_partkey + {{c}} * {KEY_OFF} AS p_partkey, * EXCLUDE (p_partkey)
      FROM {{src}}""")

    _union(con, mult, src, dst, "orders", f"""
      SELECT o_orderkey + {{c}} * {KEY_OFF} AS o_orderkey,
             * EXCLUDE (o_orderkey)
      FROM {{src}}""")

    _union(con, mult, src, dst, "events", f"""
      SELECT event_id + {{c}} * {KEY_OFF} AS event_id, ts,
             user_id + {{c}} * {KEY_OFF} AS user_id, event_type, value, props
      FROM {{src}}""")

    # documents: injective per-copy word relabel (suffix every
    # whitespace-separated word with _<c>); n_chars recomputed
    doc_parts = []
    for c in range(mult):
        if c == 0:
            doc_parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{src}/documents.parquet'")
        else:
            newtext = f"replace(text, ' ', '_{c} ') || '_{c}'"
            doc_parts.append(
                f"SELECT doc_id + {c * DOC_OFF} AS doc_id, {newtext} AS text,"
                f" lang, source, CAST(length({newtext}) AS BIGINT) AS n_chars"
                f" FROM '{src}/documents.parquet'")
    con.execute(f"COPY ({' UNION ALL '.join(doc_parts)}) TO "
                f"'{dst / 'documents.parquet'}' (FORMAT PARQUET)")

    # embeddings: seeded orthogonal transform (dim permutation + sign flip)
    tbl = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = tbl.column("vec_id").to_numpy()
    emb = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    label = tbl.column("label").to_numpy()
    dim = emb.shape[1]
    ids_out, emb_out, lab_out = [], [], []
    for c in range(mult):
        rng = np.random.default_rng(9176 + c)
        if c == 0:
            e = emb
        else:
            perm = rng.permutation(dim)
            sign = rng.choice(np.float32([-1.0, 1.0]), size=dim)
            e = emb[:, perm] * sign
        ids_out.append(vec_id + c * DOC_OFF)
        emb_out.append(e)
        lab_out.append(label)
    out = pa.table({
        "vec_id": pa.array(np.concatenate(ids_out), pa.int64()),
        "embedding": pa.array(list(np.concatenate(emb_out)),
                              pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(lab_out), pa.int32()),
    })
    pq.write_table(out, dst / "embeddings.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=str(Path(__file__).resolve().parents[1]
                                         / "testdata_sf" / "sf1"))
    a = ap.parse_args()
    gen(a.src, Path(a.dst), a.mult)
    for p in sorted(Path(a.dst).glob("*.parquet")):
        n = duckdb.sql(f"SELECT count(*) FROM '{p}'").fetchone()[0]
        print(f"{p.name}: {n}")


if __name__ == "__main__":
    main()
