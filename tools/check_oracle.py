#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against DuckDB executing oracle_sql.json on the same sf tables,
compare schema / row count / canonical value hash per query.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    # mirror the driver: results flow through pandas, where DuckDB HUGEINT
    # (SUM over BIGINT) and DECIMAL become float64 — canonically distinct
    # from int64. Oracles must CAST output SUMs to BIGINT to match Spark.
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return "DEC:" + str(v)  # deliberately never matches int/float canon
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # repr of float64 is exact round-trip; ints-as-floats normalized
        if v == int(v) and abs(v) < 1e15:
            return str(int(v)) + ".0"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    import datetime
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    ok = fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            print(f"[MISS] {name}: no parquet output")
            fail += 1
            continue
        gt = con.execute(
            f"select * from parquet_scan('{pdir}/*.parquet')").arrow()
        got_cols = gt.schema.names
        got = [tuple(r[c] for c in got_cols) for r in gt.to_pylist()]
        try:
            et = con.execute(sql).arrow()
            exp_cols = et.schema.names
            exp = [tuple(r[c] for c in exp_cols) for r in et.to_pylist()]
        except Exception as e:
            print(f"[ERR ] {name}: oracle SQL failed: {e}")
            fail += 1
            continue
        sus = [f for f, t in zip(et.schema.names, et.schema.types)
               if str(t).startswith("decimal")]
        if sus:
            print(f"[WARN] {name}: oracle emits decimal/hugeint cols {sus} "
                  "(driver's pandas fetch turns these into float64 -> "
                  "hash mismatch vs Spark int64; CAST to BIGINT)")
        if sorted(got_cols) != sorted(exp_cols):
            print(f"[FAIL] {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            fail += 1
            continue
        if len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} != {len(exp)}")
            fail += 1
            continue
        hg, he = frame_hash(got_cols, got), frame_hash(exp_cols, exp)
        if hg != he:
            print(f"[FAIL] {name}: hash mismatch ({len(got)} rows)")
            # show first differing row for debugging
            order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            order_e = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            gl = sorted("\x01".join(canon_value(r[i]) for i in order_g) for r in got)
            el = sorted("\x01".join(canon_value(r[i]) for i in order_e) for r in exp)
            for a, b in zip(gl, el):
                if a != b:
                    print(f"       spark : {a[:300]}")
                    print(f"       duckdb: {b[:300]}")
                    break
            fail += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
            ok += 1
    print(f"\n{ok} ok, {fail} fail / {ok + fail} total")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
