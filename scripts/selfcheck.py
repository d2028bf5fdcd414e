#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
corresponding oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the same sf tables, and compares values exactly (columns sorted by name,
row order as produced). Exit code 1 if any query mismatches.
"""
import json, math, re, sys, glob, os
import duckdb

def _blank_quoted(sql):
    """Copy of sql with single-quoted literal bodies replaced by spaces
    (same length, quotes kept): ')' or 'ORDER BY' inside a string constant
    must not perturb depth tracking or keyword anchoring. Handles ''
    escapes by treating the doubled quote as two adjacent literals."""
    out, in_q = [], False
    for c in sql:
        if c == "'":
            in_q = not in_q
            out.append(c)
        else:
            out.append(' ' if in_q else c)
    return ''.join(out)

def _toplevel_order_by(sql):
    """Byte offset just past the last ORDER BY at paren depth 0 (the outer
    query's trailing sort), or -1. rfind alone mis-anchors when a window
    or aggregate ORDER BY appears textually after the outer one; quoted
    literals are blanked first so their content cannot mis-anchor."""
    u = _blank_quoted(sql).upper()
    depth = 0
    for i in range(len(u) - 1, -1, -1):
        c = u[i]
        if c == ')':
            depth += 1
        elif c == '(':
            depth -= 1
        elif depth == 0 and u.startswith("ORDER BY", i):
            return i + 8
    return -1

def _split_toplevel(s, sep=','):
    """Split s on sep at paren depth 0 (ORDER BY keys may hold calls)."""
    parts, depth, cur = [], 0, []
    for c in s:
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        if c == sep and depth == 0:
            parts.append(''.join(cur)); cur = []
        else:
            cur.append(c)
    parts.append(''.join(cur))
    return parts

def sort_key_idx(sql, cols):
    """Indices of the final top-level ORDER BY keys within cols, or None if
    the query has no ORDER BY / uses expressions that aren't plain output
    columns (those can't be totality-checked from the result alone)."""
    i = _toplevel_order_by(sql)
    if i < 0:
        return None
    # split on the blanked text too: a literal in a sort expression can't
    # hold stray parens/commas; blanked keys that were plain columns are
    # byte-identical, and expression keys fail the col match either way
    tail = re.split(r"(?i)\bLIMIT\b|\bOFFSET\b", _blank_quoted(sql)[i:])[0]
    keys = []
    for part in _split_toplevel(tail):
        k = re.sub(r"(?i)\s+(DESC|ASC)(\s+NULLS\s+(FIRST|LAST))?", "",
                   part).strip().rstrip(")").strip()
        k = re.sub(r"^\w+\.", "", k)  # table qualifier
        if re.fullmatch(r"\d+", k):
            n = int(k) - 1
            if n >= len(cols):
                return None
            keys.append(n)
        elif k in cols:
            keys.append(cols.index(k))
        else:
            return None  # expression key — skip
    return keys

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    con.execute("SET TimeZone='UTC'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, passed, skipped, nontotal = [], 0, 0, []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no spark output parquet"))
            continue
        got = con.sql(f"SELECT * FROM '{files[0]}'")
        gcols = list(got.columns)
        grows = got.fetchall()
        if name not in oracle:
            skipped += 1
            if not grows:
                failures.append((name, "rows-only check: 0 rows"))
            continue
        try:
            exp = con.sql(oracle[name])
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        ecols = list(exp.columns)
        etypes = [str(t) for t in exp.types]
        gtypes = [str(t) for t in got.types]
        erows = exp.fetchall()
        if sorted(gcols) != sorted(ecols):
            failures.append((name, f"columns differ: spark={sorted(gcols)} oracle={sorted(ecols)}"))
            continue
        # The driver's hash is TYPE-sensitive (a HUGEINT SUM vs a BIGINT
        # parquet column hash-differ even when values match — round-8 escape
        # a19_histogram). Compare the DuckDB result types per column, with a
        # small equivalence map for differences the driver's materialization
        # provably erases (both sides land as the same pandas dtype).
        def canon(t):
            t = t.upper()
            if t in ("TIMESTAMP WITH TIME ZONE",):
                return "TIMESTAMP"  # UTC-pinned session: same instant values
            # int WIDTH drift is value-exact and provably accepted by the
            # driver's hash (11 round-8 green rows pair Spark INT32 against
            # DuckDB BIGINT, e.g. row_number). HUGEINT is deliberately NOT
            # in the family: a bare SUM(BIGINT) comes back as HUGEINT,
            # materializes inexactly, and is exactly the a19 escape.
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
                return "INT_FAMILY"
            return t
        tm = [(c, canon(gtypes[gcols.index(c)]), canon(etypes[ecols.index(c)]))
              for c in sorted(gcols)]
        drift = [(c, g, e) for c, g, e in tm if g != e]
        if drift:
            failures.append((name, f"column TYPES differ (driver hash is type-sensitive): {drift}"))
            continue
        gidx = [gcols.index(c) for c in sorted(gcols)]
        eidx = [ecols.index(c) for c in sorted(ecols)]
        if len(grows) != len(erows):
            failures.append((name, f"row count differs: spark={len(grows)} oracle={len(erows)}"))
            continue
        bad = None
        for i, (gr, er) in enumerate(zip(grows, erows)):
            gv = [norm(gr[j]) for j in gidx]
            ev = [norm(er[j]) for j in eidx]
            if gv != ev:
                bad = (i, gv, ev)
                break
        if bad:
            failures.append((name, f"row {bad[0]}: spark={bad[1]} oracle={bad[2]}"))
        else:
            passed += 1
            if not grows:
                print(f"  note: {name} matches but returns 0 rows")
            # Latent-SF-hazard sweep: the compare above is row-ORDER
            # sensitive, so an ORDER BY whose ties contain DIVERGENT rows
            # passes only while both engines happen to break the tie the
            # same way — a different SF can reorder them (round-11 escapes
            # p3/p10/f10). Flag it now, at the SF where it still passes.
            kidx = sort_key_idx(oracle[name], ecols)
            if kidx is not None and len(kidx) < len(ecols):
                groups = {}
                for r in erows:
                    groups.setdefault(tuple(norm(r[j]) for j in kidx),
                                      set()).add(tuple(norm(v) for v in r))
                div = sum(1 for v in groups.values() if len(v) > 1)
                if div:
                    nontotal.append((name, div))
    # an oracle whose query never produced a dump is a FAILED query (the
    # Verify run logged the error) — do not let it vanish silently
    for name in sorted(set(oracle) - set(names)):
        failures.append((name, "oracle present but no spark output dir"))
    # Verify's own failure ledger (exceptions / zero-row queries) — attach
    # its message to any failure so the diagnosis rides the report.
    errp = f"{out_dir}/errors.json"
    errs = json.load(open(errp)) if os.path.exists(errp) else {}
    print(f"PASS={passed} SKIP(no-oracle)={skipped} FAIL={len(failures)}")
    for n, d in nontotal:
        print(f"  WARN {n}: ORDER BY is non-total ({d} tie groups with "
              f"divergent rows) — may break at another SF; extend the sort")
    for n, msg in failures:
        extra = f" [verify: {errs[n]}]" if n in errs else ""
        print(f"FAIL {n}: {msg}{extra}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
