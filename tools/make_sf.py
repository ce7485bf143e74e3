#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing sf dir by key-offset
replication of ALL 10 tables (driver-side tooling only; never imported by
engine code).

Unlike make_soak.py (EXACT duplicate documents/embeddings — the
duplicate-heavy LSH stressor), copies here are made DISTINCT so the suite
runs in the mostly-unique regime a real sf1 corpus has:

  - document copy k > 0 RENAMES every token with a per-copy suffix
    (t -> t_v{k}): a bijection on the token vocabulary, so every
    within-copy statistic (near-dup structure, df distribution, token
    Jaccard values, shingle sets) is exactly isomorphic to the base
    corpus, while copies share ZERO tokens with each other and with the
    original — no cross-copy pairs at ANY similarity granularity.
    (The previous scheme replaced every 3rd token, which killed
    cross-copy 3-shingle pairs but left copies of one base doc sharing
    exactly 2/3 of their TOKENS — token-set Jaccard exactly 0.5, i.e.
    ON qd6's threshold: at factor F that planted C(F,2) cross-copy
    pairs per base doc, a quadratic-in-F artifact that read as a fake
    super-linear scaler. Measured at factor 10: 34,002 of 116,377 qd6
    pairs were cross-copy artifacts.) n_chars is recomputed;
  - embedding copy k > 0 cyclically rotates the vector by k components:
    rotations of isotropic vectors are ~orthogonal (no cross-copy cosine
    pairs), and the per-copy successor-blend structure qs9 plants in-query
    is preserved;
  - entity/fact keys (custkey, suppkey, partkey, orderkey, event/user
    ids, doc/vec ids) offset by k * 10_000_000 CONSISTENTLY across tables
    so joins stay referentially intact; dimension tables (region, nation)
    and nation FKs copy through.

Usage: python3 tools/make_sf.py <src_sf_dir> <out_dir> <factor>
"""
import sys
from pathlib import Path

import duckdb

OFF = 10_000_000


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    srcp, outp = Path(src), Path(out)
    outp.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def rp(t: str) -> str:
        return f"read_parquet('{srcp}/{t}.parquet')"

    def write(t: str, selects: list[str]) -> None:
        q = " UNION ALL ".join(selects)
        con.execute(f"COPY ({q}) TO '{outp}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{outp}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    # dimensions copy through once
    for t in ("region", "nation"):
        write(t, [f"SELECT * FROM {rp(t)}"])

    write("customer", [
        f"SELECT c_custkey + {k * OFF} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM {rp('customer')}" for k in range(factor)])
    write("supplier", [
        f"SELECT s_suppkey + {k * OFF} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM {rp('supplier')}" for k in range(factor)])
    write("part", [
        f"SELECT p_partkey + {k * OFF} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM {rp('part')}" for k in range(factor)])
    write("orders", [
        f"SELECT o_orderkey + {k * OFF} AS o_orderkey, "
        f"o_custkey + {k * OFF} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM {rp('orders')}" for k in range(factor)])
    write("lineitem", [
        f"SELECT l_orderkey + {k * OFF} AS l_orderkey, "
        f"l_partkey + {k * OFF} AS l_partkey, "
        f"l_suppkey + {k * OFF} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM {rp('lineitem')}" for k in range(factor)])
    write("events", [
        f"SELECT event_id + {k * OFF} AS event_id, ts, "
        f"user_id + {k * OFF} AS user_id, event_type, value, props "
        f"FROM {rp('events')}" for k in range(factor)])

    # the rename scheme's disjointness invariant is only as good as the
    # base vocabulary: a base token ENDING in _v{k} (k < factor) collides
    # with copy k's rename of its prefix, and an EMPTY base token (from
    # repeated/leading spaces) renames to the bare literal '_v{k}' shared
    # across a copy's docs. Assert both impossible up front — a silent
    # violation would replant exactly the cross-copy artifact pairs the
    # r17 generator rewrite removed.
    bad = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS t "
        f"FROM {rp('documents')}) WHERE t = '' OR regexp_matches(t, '_v[0-9]+$')"
    ).fetchone()[0]
    assert bad == 0, (
        f"{bad} base token(s) collide with the per-copy rename scheme "
        "(empty, or ending in _v<digits>) — copies would share tokens")

    doc_sel = [f"SELECT * FROM {rp('documents')}"]
    for k in range(1, factor):
        doc_sel.append(
            f"SELECT doc_id + {k * OFF} AS doc_id, "
            "array_to_string(list_transform(string_split(text, ' '), "
            f"t -> t || '_v{k}'), ' ') AS text, "
            f"lang, source, 0 AS n_chars FROM {rp('documents')}")
    # n_chars participates in the qd6 length band — recompute it
    con.execute(
        f"COPY (SELECT doc_id, text, lang, source, length(text)::BIGINT AS n_chars "
        f"FROM ({' UNION ALL '.join(doc_sel)})) "
        f"TO '{outp}/documents.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{outp}/documents.parquet')").fetchone()[0]
    print(f"documents: {n} rows")

    emb_sel = [f"SELECT * FROM {rp('embeddings')}"]
    dim = con.execute(
        f"SELECT len(embedding) FROM {rp('embeddings')} LIMIT 1").fetchone()[0]
    # copies coincide iff k1 == k2 (mod 2*dim): rotation alone wraps to
    # the identity at k == dim (which would silently reintroduce exact
    # duplicates and quadratic cross-copy pairs), so odd wraps negate
    assert factor <= 2 * dim, f"distinct copies exhausted: factor {factor} > {2 * dim}"
    for k in range(1, factor):
        r = k % dim
        rot = (f"embedding[{r + 1}:{dim}] || embedding[1:{r}]" if r != 0
               else "embedding")
        if (k // dim) % 2 == 1:
            rot = f"list_transform({rot}, x -> -x)"
        emb_sel.append(
            f"SELECT vec_id + {k * OFF} AS vec_id, "
            f"{rot} AS embedding, label FROM {rp('embeddings')}")
    write("embeddings", emb_sel)


if __name__ == "__main__":
    main()
