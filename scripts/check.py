#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run graft.Verify first (writes <out>/<name>/ parquet + oracle_sql.json),
then this script runs each oracle SQL in DuckDB over the same sf dir and
compares canonically (SURVEY.md §5.3: sort cols by name, sort rows,
%.6g floats, -0.0 -> 0.0, ISO-us timestamps, NULL).

Driver-fidelity rules (round 8 post-mortem — the official gate went
0/109 on a divergence THIS script used to mask):
 - Spark output is read with pandas.read_parquet(<query dir>), the exact
   call the driver makes (pyarrow.dataset under the hood). No *.parquet
   globbing: a stray non-parquet, non-underscore file in the directory
   must fail HERE the same way it fails on the driver.
 - The JVM-side canon sidecar name is parsed out of Verify.scala itself
   (the `val CanonMd5 = "..."` contract line), so a rename on either
   side is a loud failure, never a silently skipped cross-check.
 - A canon-hash mismatch or a MISSING sidecar counts toward n_bad.
"""
import duckdb, sys, os, re, json, glob, hashlib, math, datetime
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def sidecar_names():
    """The Verify.scala <-> check.py contract: grep the constants."""
    src = open(os.path.join(os.path.dirname(__file__), "..",
        "src/main/scala/graft/Verify.scala")).read()
    names = dict(re.findall(r'val\s+(CanonTxt|CanonMd5)\s*=\s*"([^"]+)"', src))
    assert set(names) == {"CanonTxt", "CanonMd5"}, \
        f"Verify.scala sidecar contract lines not found: {names}"
    for n in names.values():
        assert n.startswith(("_", ".")), \
            f"sidecar {n!r} not _-prefixed: pyarrow.dataset would fail on it"
    return names["CanonTxt"], names["CanonMd5"]

def canon_val(v):
    # NaN must canonicalize as "nan" (matching Canon.g6), NOT "NULL":
    # a Spark NaN vs oracle NULL disagreement has to FAIL the gate.
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    if v is None or v != v:  # None, pandas NaT -> NULL
        return "NULL"
    if isinstance(v, float):
        if v == 0.0: v = 0.0
        return "%.6g" % v
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)

def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(canon_val(v) for v in row) for row in
            df[cols].itertuples(index=False, name=None)]
    rows.sort()
    body = "\n".join("|".join(r) for r in rows)
    return hashlib.md5(body.encode()).hexdigest(), len(rows), cols

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    canon_txt, canon_md5 = sidecar_names()
    # Environment banner (round 19): the oracle side of every hash
    # compare depends on the DuckDB version's round()/format semantics —
    # q170 went driver-red twice on exactly that, undiagnosable from the
    # artifacts. Name both sides up front; Verify writes the JVM twin to
    # <out>/_ENV.json.
    jvm_env = {}
    env_path = os.path.join(out, "_ENV.json")
    if os.path.exists(env_path):
        try: jvm_env = json.load(open(env_path))
        except Exception as e: jvm_env = {"unreadable": str(e)[:80]}
    print(f"[env] duckdb={duckdb.__version__} python={sys.version.split()[0]} "
          f"pandas={pd.__version__} | spark-side: "
          + (" ".join(f"{k}={v}" for k, v in jvm_env.items()) or "no _ENV.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    def read_spark(d):
        # EXACTLY what the driver does: pandas -> pyarrow.dataset over the
        # whole directory. Any file pyarrow can't treat as parquet fails.
        return pd.read_parquet(d)
    # oracle-less queries (e.g. multimodal stub): rows-only check
    for d in sorted(glob.glob(f"{out}/q*")):
        name = os.path.basename(d)
        if name in oracle: continue
        try:
            n = len(read_spark(d))
            if n > 0: print(f"ok   {name} ({n} rows, rows-only)"); n_ok += 1
            else: print(f"FAIL {name}: 0 rows"); n_bad += 1
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}"); n_bad += 1
    # Oracle-side twin of Bench.slowCeilingSec (round 17, from the r16
    # post-mortem): q155/q160's chained-CTE ladders ran 190 s / ~8 min at
    # sf0.01 because DuckDB re-inlined every stage — the driver's wholesale
    # capture timed out and CORRECTNESS_r16.json came back literally `{}`.
    # Any SINGLE oracle over this budget is a gate FAILURE even when its
    # answer is right: a pathological oracle must never again silently eat
    # the round's correctness artifact. (Healthy oracles at sf0.01 run in
    # well under 5 s; the fixed ladders run in 0.1 s with AS MATERIALIZED.)
    oracle_budget_sec = 30.0
    import time as _time
    slow_oracles = []
    for name in sorted(oracle):
        t_oracle = _time.time()
        try:
            cur = con.execute(oracle[name])
            # Dtype-hazard guard (round 12, from the q126 post-mortem): a
            # DuckDB DECIMAL/HUGEINT output column (e.g. an uncast
            # sum(BIGINT)) formats differently than Spark's int64 under
            # some fetch paths and flips the hash with zero value
            # difference. The oracle author must CAST; fail loudly HERE
            # rather than mysteriously on the driver.
            hazards = [d[0] for d in (cur.description or [])
                       if "DECIMAL" in str(d[1]).upper() or "HUGEINT" in str(d[1]).upper()]
            if hazards:
                print(f"FAIL {name}: oracle emits DECIMAL/HUGEINT column(s) "
                      f"{hazards} — add CAST(... AS BIGINT/DOUBLE)")
                n_bad += 1
                continue
            exp = cur.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        dt_oracle = _time.time() - t_oracle
        if dt_oracle > oracle_budget_sec:
            print(f"FAIL {name}: oracle took {dt_oracle:.1f}s > "
                  f"{oracle_budget_sec:.0f}s budget — rewrite it (AS "
                  f"MATERIALIZED CTE hints / smaller gated slice) before "
                  f"it times out the driver's correctness capture")
            slow_oracles.append(name)
            n_bad += 1
            continue
        try:
            got = read_spark(f"{out}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable (driver-style read): "
                  f"{str(e)[:200]}"); n_bad += 1; continue
        he, re_, ce = canon(exp)
        hg, rg, cg = canon(got)
        # cross-check graft.Verify's JVM-side canon dump: a disagreement
        # means the JVM and Python canonical protocols drifted (or the
        # parquet changed between write and read) — exactly the class of
        # bug behind an undiagnosable driver hash-fail. Both a mismatch
        # AND a missing sidecar are gate failures (a rename that
        # desynchronizes the contract must not become a silent no-op).
        md5path = f"{out}/{name}/{canon_md5}"
        if not os.path.exists(md5path):
            print(f"FAIL {name}: JVM canon sidecar missing ({md5path})")
            n_bad += 1; continue
        jvm = open(md5path).read().strip()
        if jvm != hg:
            print(f"FAIL {name}: JVM canon md5 {jvm} != python canon {hg}"
                  f" — diff {out}/{name}/{canon_txt} against the parquet")
            n_bad += 1; continue
        if ce != cg:
            print(f"FAIL {name}: schema {cg} != oracle {ce}"); n_bad += 1
        elif re_ != rg:
            print(f"FAIL {name}: rows {rg} != oracle {re_}"); n_bad += 1
        elif he != hg:
            print(f"FAIL {name}: hash mismatch ({rg} rows)")
            # show first differing row
            ex = sorted([tuple(canon_val(v) for v in r) for r in exp[sorted(exp.columns)].itertuples(index=False, name=None)])
            gt = sorted([tuple(canon_val(v) for v in r) for r in got[sorted(got.columns)].itertuples(index=False, name=None)])
            for a, b in zip(ex, gt):
                if a != b:
                    print(f"  oracle: {a}\n  spark : {b}"); break
            n_bad += 1
        else:
            print(f"ok   {name} ({rg} rows)"); n_ok += 1
    if slow_oracles:
        print(f"SLOW ORACLES (> {oracle_budget_sec:.0f}s): {slow_oracles}")
    # graft.Verify writes _PARTIAL when SPARK_GRAFT_ONLY filtered the run;
    # a subset check must never read as a full verification.
    partial = os.path.join(out, "_PARTIAL")
    suffix = ""
    if os.path.exists(partial):
        flt = open(partial).read().strip()
        print(f"\n########## PARTIAL RUN ({flt}) — NOT a full verification ##########")
        suffix = " (PARTIAL — subset only)"
    print(f"\n{n_ok} ok, {n_bad} fail{suffix}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
