#!/usr/bin/env python3
"""Build a scale-soak corpus: N exact copies of an sf dir's documents and
embeddings (ids offset per copy so they stay unique), other tables copied
through. Exact text copies are deliberate — they are the web-boilerplate
stressor for the LSH exact-dup collapse (identical docs share all band
hashes). Driver-side tooling only; never imported by engine code.

Usage: python3 tools/make_soak.py <src_sf_dir> <out_dir> <factor>
"""
import shutil, sys
from pathlib import Path

import duckdb


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    srcp, outp = Path(src), Path(out)
    outp.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    copies = " UNION ALL ".join(
        f"SELECT doc_id + {k} * 10000000 AS doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{srcp}/documents.parquet')"
        for k in range(factor))
    con.execute(f"COPY ({copies}) TO '{outp}/documents.parquet' (FORMAT PARQUET)")

    ecopies = " UNION ALL ".join(
        f"SELECT vec_id + {k} * 10000000 AS vec_id, embedding, label "
        f"FROM read_parquet('{srcp}/embeddings.parquet')"
        for k in range(factor))
    con.execute(f"COPY ({ecopies}) TO '{outp}/embeddings.parquet' (FORMAT PARQUET)")

    for t in srcp.glob("*.parquet"):
        if t.name not in ("documents.parquet", "embeddings.parquet"):
            shutil.copy(t, outp / t.name)
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{outp}/documents.parquet')").fetchone()[0]
    print(f"soak corpus at {outp}: documents={n} (factor {factor})")


if __name__ == "__main__":
    main()
